"""GGN mat-vec throughput at ogbn-arxiv scale (BASELINE.md metric 1).

One GGN mat-vec = jvp through the model + loss-Hessian + vjp back —
2 layers x (forward-mode + reverse-mode) = 4 sparse aggregations over all
E edges, riding the same sorted/ELL fast path as the forward (make_spmm's
linear primitive). Timed as chained power iterations inside one jit
(tunnel-safe); the dominant eigenvalue comes out as a byproduct.

Run: python scripts/bench_ggn_mvp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu.curvature import GGNOperator
from laplace_gnn_tpu.graph import sparse_from_edge_index, add_ell_format
from laplace_gnn_tpu.models import SparseGCN


def main():
    N, C, D, H = 169_343, 40, 128, 256
    data = G.sbm_dataset(n_nodes=N, n_classes=C, d_features=D,
                         p_in=4e-4, p_out=1e-5, seed=0)
    g = sparse_from_edge_index(data.edge_index, N, normalize="sym")
    g = add_ell_format(g)
    import dataclasses
    g = dataclasses.replace(g, agg_dtype="bfloat16")
    E = g.n_edges
    print(f"N={N} E={E} 2-layer SparseGCN h={H} C={C}")

    model = SparseGCN(D, H, C, 2, jnp.asarray(data.x), g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    idx = jnp.arange(N)
    y = jnp.asarray(np.asarray(data.y))
    op = GGNOperator(model.apply, "classification", params,
                     [(idx, y)], jit=False)
    P = op.shape[0]
    print(f"P = {P} parameters in the posterior")

    def power(v0, k):
        def body(i, v):
            w = op.matvec(v)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, k, body, v0)

    powk = jax.jit(power, static_argnums=1)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (P,))
    v0 = v0 / jnp.linalg.norm(v0)

    # warm both compilations, then time chained runs; per-matvec time is
    # the K-vs-2K difference so dispatch overhead cancels
    K = 20
    jax.block_until_ready(powk(v0, K))
    v2 = jax.block_until_ready(powk(v0, 2 * K))
    # median of 5 chained K-vs-2K differences (min is biased by delays
    # inside the first segment; see BENCH_NOTES methodology note)
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(powk(v0, K))
        t1 = time.perf_counter()
        jax.block_until_ready(powk(v0, 2 * K))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    warm = float(np.median(diffs)) / K
    lam = float(jnp.dot(v2, op.matvec(v2)))
    # 4 aggregations (2 layers x jvp fwd + vjp bwd) per matvec
    print(f"GGN matvec: {warm * 1e3:.1f} ms warm "
          f"({E * 4 / warm / 1e6:.0f} M edge-traversals/s; "
          f"lambda_max ~ {lam:.1f})")


if __name__ == "__main__":
    main()
