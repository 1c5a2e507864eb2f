"""Dense-adjacency GAT with the fused flash-attention Pallas kernels.

The reference's dense GAT materializes the full (N, N, heads) score
tensor (gnn/models/layers.py:101-124) — 8.6 GB at N=16384/H=8, an OOM
wall well below the sizes this path serves. `GATConv`'s scale knobs
remove it in stages:

  - `row_block`: exact row-blocked masked softmax, peak attention memory
    block*N*H (the default above N=4096);
  - `attention_impl="flash"`: fused Pallas online-softmax kernel — the
    forward carries running (max, denom, acc) in VMEM so NOTHING
    score-shaped touches HBM, and a second fused kernel runs the
    backward from the saved (m, l) statistics. Measured on a TPU v5e:
    fwd 31.6 -> 21.0 ms and train step 128 -> 66 ms at N=16384
    (264 ms at N=32768, where the dense layout cannot exist at all).

Everything composes with the Laplace stack: training steps run
reverse-mode through the kernel's custom VJP, while curvature products
(KFAC factors, GGN mat-vecs — forward-mode jvp, which cannot trace a
custom_vjp) are automatically routed through the mathematically
identical XLA chunked path by `BaseGNN.jvp_safe()` — no user action
needed, pinned by tests/test_pallas_attention.py.

This example runs a small N so it works on CPU too (the kernel falls
back to XLA off-TPU); change N to 16384+ on a TPU chip to see the
kernel engage (scripts/bench_gat_scale.py --flash measures it).

Run: python examples/13_flash_attention_gat.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_tpu.laplace import Laplace
from laplace_gnn_tpu.models import GAT
from laplace_gnn_tpu.training import marglik_optimization
from laplace_gnn_tpu.utils.data import ArrayLoader


def main():
    n, d, classes = 64, 8, 3
    rng = np.random.default_rng(0)
    a = (rng.random((n, n)) < 0.15).astype(np.float32)
    adj = np.minimum(a + a.T + np.eye(n, dtype=np.float32), 1.0)
    X = rng.standard_normal((n, d)).astype(np.float32)
    y = jnp.asarray(rng.integers(0, classes, n))
    tr, va = jnp.arange(40), jnp.arange(40, 64)

    model = GAT(d, 16, classes, 2, X, adj, heads=4, concat=False,
                dropout_p=0.0, attention_impl="flash")
    params = model.init(jax.random.PRNGKey(0))

    # 1) plain training + marglik hypersteps: train steps use the flash
    #    kernel; hypersteps trace the jvp-safe clone
    results, params, losses, _, nms = marglik_optimization(
        model, params, tr, y[tr], va, y[va],
        lr=0.05, lr_adj=0.1, n_epochs=12, n_hypersteps=1,
        n_epochs_burnin=4, marglik_frequency=4, model_type="gat",
        verbose=False)
    print(f"flash GAT marglik training: loss {float(losses[0]):.3f} -> "
          f"{float(losses[-1]):.3f}, neg marglik trace "
          f"{[round(float(v), 2) for v in nms]}")

    # 2) the Laplace class path fits on the same flash model
    la = Laplace(model, params, "classification",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit(ArrayLoader(tr, y[tr]))
    probs = la(va)
    print(f"Laplace on flash GAT: log marglik "
          f"{float(la.log_marginal_likelihood()):.2f}, predictive rows "
          f"sum to {float(jnp.sum(probs, axis=-1).mean()):.3f}")


if __name__ == "__main__":
    main()
