"""Sparse-path throughput at ogbn-arxiv scale (N=169k, E~1.2M).

Measures SparseGCN forward and train-step time / edges-per-second on the
real TPU for the 'segment' (scatter-add) and 'ell' (gather-einsum) formats.
Chained-fori_loop timing per BENCH_NOTES (no device->host fetch until all
clocks stop).

Usage: python scripts/bench_sparse.py [N] [avg_deg] [hidden] [model]
(model: gcn | sage | gat — gat runs the edge-parallel segment softmax
attention, a workload the reference's dense (N, N, heads) layout cannot
represent; sage is row-normalized mean aggregation + concat, same
SpMM/ELL kernels as gcn plus the 2x-wide first linear)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 169_343
AVG_DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 7
HIDDEN = int(sys.argv[3]) if len(sys.argv) > 3 else 256
MODEL = sys.argv[4] if len(sys.argv) > 4 else "gcn"
D, C, LAYERS = 128, 40, 3


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from laplace_gnn_tpu.graph.container import (add_ell_format,
                                                 sparse_from_edge_index)
    from laplace_gnn_tpu.models.sparse_gnn import (SparseGAT, SparseGCN,
                                                   SparseSAGE)
    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum

    rng = np.random.default_rng(0)
    E = N * AVG_DEG // 2
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    ei = np.concatenate([np.stack([src, dst]), np.stack([dst, src])], axis=1)
    X = rng.standard_normal((N, D)).astype(np.float32)
    y = jnp.asarray(rng.integers(0, C, N))

    g_seg = sparse_from_edge_index(ei, N, fmt="segment", dtype=jnp.float32)
    n_edges = g_seg.n_edges
    log(f"N={N} E={n_edges} hidden={HIDDEN} layers={LAYERS}")

    import dataclasses
    if MODEL == "gat":
        # per-edge segment softmax (no N x N score matrix — the reference
        # materializes (N, N, heads), gnn/models/layers.py:101-124, which
        # at this N would be 917 GB/head); attention normalizes itself
        g_gat = sparse_from_edge_index(ei, N, normalize=None, fmt="segment",
                                       dtype=jnp.float32)
        variants = {f"gat_h{h}": (g_gat, h) for h in (1, 4, 8)}
    else:
        if MODEL == "sage":
            # mean aggregation = row-normalized SpMM (SparseSAGEConv)
            g_seg = sparse_from_edge_index(ei, N, normalize="row",
                                           fmt="segment", dtype=jnp.float32)
        g_ell = add_ell_format(g_seg)
        variants = {
            "segment": g_seg,
            "segment_bf16": dataclasses.replace(g_seg, agg_dtype="bfloat16"),
            "ell": g_ell,
            "ell_bf16": dataclasses.replace(g_ell, agg_dtype="bfloat16"),
        }
    for fmt, g in variants.items():
        if MODEL == "gat":
            g, heads = g
            model = SparseGAT(D, HIDDEN, C, LAYERS, jnp.asarray(X), g,
                              heads=heads, concat=True, dropout_p=0.0)
        else:
            if g.ell_cols is not None:
                log(f"{fmt}: K={g.ell_cols.shape[1]} "
                    f"padding={g.ell_cols.size / n_edges:.2f}x "
                    f"remainder={int(g.rem_src.shape[0])}")
            cls = SparseSAGE if MODEL == "sage" else SparseGCN
            model = cls(D, HIDDEN, C, LAYERS, jnp.asarray(X), g,
                        dropout_p=0.0)
        params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)

        @jax.jit
        def fwd_loop(params, K):
            def body(i, carry):
                acc, p = carry
                f = model.apply(p)
                acc = acc + jnp.sum(f)
                p = jax.tree_util.tree_map(lambda w: w + 1e-30 * acc, p)
                return acc, p
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), params))
            return acc

        @jax.jit
        def train_loop(params, K):
            def body(i, carry):
                acc, p = carry
                def obj(p):
                    return cross_entropy_sum(model.apply(p), y) / N
                l, gr = jax.value_and_grad(obj)(p)
                p = jax.tree_util.tree_map(lambda w, gw: w - 1e-30 * gw,
                                           p, gr)
                return acc + l, p
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), params))
            return acc

        for name, loop, K in (("fwd", fwd_loop, 30), ("train", train_loop, 15)):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, jnp.asarray(1)))
            log(f"  {fmt} {name} compile+1it: {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, jnp.asarray(K)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(loop(params, jnp.asarray(2 * K)))
            t2 = time.perf_counter() - t0
            per = (t2 - t1) / K
            eps = LAYERS * n_edges / per
            log(f"  {fmt} {name}: {per*1e3:.2f} ms/iter "
                f"({eps/1e9:.2f}B edge-msgs/s)")


if __name__ == "__main__":
    main()
