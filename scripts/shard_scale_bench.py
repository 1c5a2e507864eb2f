"""Row-sharded dense STE hyperstep at scale (SURVEY §7 hard parts).

The flagship STE models keep a dense N x N learnable adjacency (reference
gnn/models/base_gnn.py:75); the sharding story for them is "row-shard the
adjacency over the 'graph' mesh axis and let pjit insert the collectives"
(parallel/mesh.py::shard_gnn_params). All prior multi-device evidence used
n<=64-node toys — this script runs the full differentiable KFAC-marglik
hyperstep (fit factors + marglik + d/d_adj, training/marglik_gnn.py) at
N=8192 (the int8-crossover size from BENCH_NOTES) on the 8-device virtual
CPU mesh and records:

  - per-device memory from XLA's own memory analysis (argument + temp +
    output bytes): the real scaling signal — the N x N buffers must drop
    ~8x per device or the sharding is cosmetic;
  - wall-clock single-device vs 8-device. CAVEAT: on a virtual CPU mesh all
    8 "devices" share the same host cores, so wall-clock validates program
    structure (no pathological full-tensor rematerialization), NOT ICI
    speedup — treat per-device memory as the scaling evidence and the
    single-real-chip bench (bench.py) as the absolute time anchor.

Run:  python scripts/shard_scale_bench.py [--n 8192] [--check]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon PJRT plugin (TPU tunnel) pins the platform at interpreter start;
# this config update out-ranks it (same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build(n_nodes: int, d_feat: int = 32, hidden: int = 32, n_class: int = 7,
          density: float = 14e-4, n_train: int = 1024, dtype=jnp.float32,
          model_type: str = "stegcn"):
    from laplace_gnn_tpu.models import AttSTEGCN, STEGCN
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n_nodes, d_feat)).astype(dtype)
    adj = (rng.random((n_nodes, n_nodes)) < density).astype(np.float32)
    adj = np.minimum(adj + adj.T, 1.0)
    np.fill_diagonal(adj, 0.0)
    y = jnp.asarray(rng.integers(0, n_class, n_train))
    idx = jnp.arange(n_train)
    cls = {"stegcn": STEGCN, "attstegcn": AttSTEGCN}[model_type]
    model = cls(d_feat, hidden, n_class, 2, jnp.asarray(X),
                jnp.asarray(adj, dtype), dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0), dtype)
    return model, params, idx, y


def hyperstep_fn(model, n_train: int, grad_leaf: str = "adj"):
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn
    nm = make_neg_marglik_fn(model, "classification", "kron", "all",
                             N=n_train)

    def step(params, idx, y):
        v, g = jax.value_and_grad(nm)(params, idx, y)
        # STEGCN learns params['adj'] directly; AttSTEGCN learns the
        # attention projection adj_W that CONSTRUCTS the adjacency
        gl = g[grad_leaf]
        return v, (gl["weight"] if isinstance(gl, dict) else gl)

    return step


def mem_report(compiled) -> dict:
    m = compiled.memory_analysis()
    return {
        "args_mb": m.argument_size_in_bytes / 2**20,
        "temp_mb": m.temp_size_in_bytes / 2**20,
        "out_mb": m.output_size_in_bytes / 2**20,
        "total_mb": (m.argument_size_in_bytes + m.temp_size_in_bytes
                     + m.output_size_in_bytes) / 2**20,
    }


def timed(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--check", action="store_true",
                    help="assert sharded == single-device numerics")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default="stegcn",
                    choices=["stegcn", "attstegcn"],
                    help="attstegcn: adjacency CONSTRUCTED by scaled "
                    "dot-product attention + STE (structure learning "
                    "through the adj_W projection); the N x N score "
                    "matrix is row-sharded via model.adj_constraint")
    args = ap.parse_args()

    from laplace_gnn_tpu.parallel.mesh import make_mesh, shard_gnn_params

    # make_mesh(8) silently shrinks to len(jax.devices()) — a 1-device "mesh"
    # would make the comparison below meaningless, so fail loudly instead
    assert len(jax.devices()) >= 8, \
        f"need 8 virtual devices, got {len(jax.devices())}"

    model, params, idx, y = build(args.n, model_type=args.model)
    n_train = int(idx.shape[0])
    grad_leaf = "adj_W" if args.model == "attstegcn" else "adj"
    step = hyperstep_fn(model, n_train, grad_leaf=grad_leaf)

    # single device
    single = jax.jit(step)
    lowered = single.lower(params, idx, y)
    comp1 = lowered.compile()
    t1 = timed(single, params, idx, y, reps=args.reps)
    m1 = mem_report(comp1)
    nm1, g1 = single(params, idx, y)

    # 8-device row-sharded (adj rows over 'graph'; weights replicated —
    # model TP is off: at hidden=32 the N x N terms dominate)
    mesh = make_mesh(8, model_parallel=1)
    if args.model == "attstegcn":
        from jax.sharding import NamedSharding, PartitionSpec as P
        # the N x N object is CONSTRUCTED inside the trace; row-shard it
        # at the source via the model's sharding-constraint hook
        model.adj_constraint = NamedSharding(mesh, P("graph", None))
    shardings = shard_gnn_params(mesh, params, model_axis=False)
    params_s = jax.device_put(params, shardings)
    sharded = jax.jit(step)
    comp8 = sharded.lower(params_s, idx, y).compile()
    t8 = timed(sharded, params_s, idx, y, reps=args.reps)
    m8 = mem_report(comp8)
    nm8, g8 = sharded(params_s, idx, y)

    print(f"dense {args.model} KFAC-marglik hyperstep, N={args.n}, "
          f"E~{float(jnp.sum(params['adj'] > 0.5)):.0f}, "
          f"n_train={n_train}, dtype={params['adj'].dtype}")
    print(f"{'':14s}{'wall-clock':>12s}{'args MB':>10s}{'temp MB':>10s}"
          f"{'total MB/dev':>14s}")
    print(f"{'1 device':14s}{t1 * 1e3:>10.0f}ms{m1['args_mb']:>10.0f}"
          f"{m1['temp_mb']:>10.0f}{m1['total_mb']:>14.0f}")
    print(f"{'8 dev sharded':14s}{t8 * 1e3:>10.0f}ms{m8['args_mb']:>10.0f}"
          f"{m8['temp_mb']:>10.0f}{m8['total_mb']:>14.0f}")
    print(f"per-device memory ratio: {m1['total_mb'] / m8['total_mb']:.2f}x "
          f"(ideal for the N^2 terms: ~8x)")
    print("(virtual CPU mesh: wall-clock validates program structure only; "
          "per-device memory is the scaling signal)")

    rel = abs(float(nm8) - float(nm1)) / max(abs(float(nm1)), 1.0)
    gdiff = float(jnp.max(jnp.abs(g8 - g1)))
    gref = float(jnp.max(jnp.abs(g1)))
    print(f"numerics: neg_marglik rel diff {rel:.2e}, "
          f"max|d_adj diff| {gdiff:.2e} (max|d_adj|={gref:.2e})")
    if args.check:
        assert rel < 1e-4, rel
        assert gdiff < 1e-5 + 1e-3 * gref, (gdiff, gref)
        print("check: OK")


if __name__ == "__main__":
    main()
