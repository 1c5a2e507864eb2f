"""Multi-host (DCN) launch flow: the exact steps a real multi-host user
follows, runnable on one machine in both modes.

Single process (the default — no env vars set):

    python examples/10_multihost_launch.py

Two processes over the documented env-var launch path
(parallel/distributed.py::initialize; see docs/scale.md), two terminals —
or let the script spawn both for you:

    # terminal 1                               # terminal 2
    LAPLACE_GNN_COORDINATOR=localhost:9876 \\   LAPLACE_GNN_COORDINATOR=localhost:9876 \\
    LAPLACE_GNN_NUM_PROCESSES=2 \\              LAPLACE_GNN_NUM_PROCESSES=2 \\
    LAPLACE_GNN_PROCESS_ID=0 \\                 LAPLACE_GNN_PROCESS_ID=1 \\
    python examples/10_multihost_launch.py     python examples/10_multihost_launch.py

    # or, self-spawning (CPU Gloo collectives, 2 processes x 2 devices):
    python examples/10_multihost_launch.py --spawn 2

Every process joins the JAX distributed runtime, builds the hybrid
('dcn', 'graph', 'model') mesh — the 'dcn' axis crosses processes, halo
exchange stays on intra-process (ICI) links — and runs the differentiable
KFAC marglik of a SparseGCN over the DCN-striped graph. The printed
checksums are replicated scalars: they must be identical across processes
AND across launch modes (that equality is pinned for real in
tests/test_distributed.py::test_multiprocess_matches_single_process).

On a real multi-host TPU pod, drop the env vars: `initialize()` falls
through to `jax.distributed.initialize()`'s cluster auto-detection.
"""

from __future__ import annotations

import os
import subprocess
import sys

# runnable from a clean checkout: `python examples/10_multihost_launch.py`
# puts examples/ (not the repo root) on sys.path, and the --spawn children
# start bare interpreters
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def compute(mesh):
    """Replicated scalars over the hybrid mesh (same math as the 2-process
    correctness test, tests/mp_worker.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from laplace_gnn_tpu.graph.container import sparse_from_edge_index
    from laplace_gnn_tpu.models import SparseGCN
    from laplace_gnn_tpu.parallel import DcnAggGraph
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn

    rng = np.random.default_rng(7)
    n, d, c = 64, 16, 4
    ei = np.stack([rng.integers(0, n, 6 * n), rng.integers(0, n, 6 * n)])
    g = sparse_from_edge_index(ei, n, normalize="sym")
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    y = jnp.asarray(rng.integers(0, c, n))

    G = DcnAggGraph(mesh, g)
    model = SparseGCN(d, 16, c, 2, G.put(X), G, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    nm_fn = make_neg_marglik_fn(model, "classification", "kron", "all", N=n)
    nm, gm = jax.jit(jax.value_and_grad(nm_fn))(params, jnp.arange(n), y)
    gnorm = jax.jit(lambda t: jnp.sqrt(sum(
        jnp.sum(l * l) for l in jax.tree_util.tree_leaves(t))))(gm)
    return float(nm), float(gnorm)


def run_worker():
    # env before importing jax: CPU platform, 2 virtual devices per process
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from laplace_gnn_tpu.parallel import initialize, make_hybrid_mesh

    multi = initialize()   # reads LAPLACE_GNN_* env vars; False if unset
    mesh = make_hybrid_mesh()
    pid, nproc = jax.process_index(), jax.process_count()
    mode = f"process {pid}/{nproc}" if multi else "single process"
    print(f"[{mode}] devices={len(jax.devices())} mesh={dict(mesh.shape)}")

    nm, gnorm = compute(mesh)
    print(f"[{mode}] neg_marglik={nm:.6f} |grad|={gnorm:.6f}  "
          "(replicated: identical on every process and launch mode)")


def spawn(n: int):
    port = 9876
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith("LAPLACE_GNN_")}
    procs = []
    for pid in range(n):
        env = dict(env_base,
                   LAPLACE_GNN_COORDINATOR=f"localhost:{port}",
                   LAPLACE_GNN_NUM_PROCESSES=str(n),
                   LAPLACE_GNN_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--spawn":
        spawn(int(sys.argv[2]))
    else:
        run_worker()
