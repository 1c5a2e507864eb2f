"""SparseGAT at ogbn-arxiv scale on one TPU chip (VERDICT r4 #1).

The last unmeasured model x scale cell: per-edge softmax attention over
N=169k nodes, with the round-5 optimizations — bf16 message aggregation
(`agg_dtype`) and the runtime-coefficient multi-level-ELL formulation of
the (E, H, F) message traffic (graph/container.py::ell_aggregate_edge_coeff).
Measures forward, train step, and the mixed-structure-KFAC marglik
hyperstep (Kron for Linear sites + exact-diag attention blocks — a
combination the reference's curvlinops KFAC crashes on, kfac.py:130).

Usage: python scripts/bench_sparse_gat.py [N] [hidden] [heads] [config_idx]
  config_idx selects ONE of {segment/f32, segment/bf16, ell/f32, ell/bf16}
  (fresh process per config: a faulted TPU program poisons the session);
  omit to run all four in-process. Results are appended to
  BENCH_SPARSE_GAT.json at the repo root (merged into bench.py extras).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 169_343
HIDDEN = int(sys.argv[2]) if len(sys.argv) > 2 else 256
HEADS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
D, C, AVG_DEG, LAYERS = 128, 40, 7, 2

CONFIGS = [("segment", None), ("segment", "bfloat16"),
           ("ell", None), ("ell", "bfloat16")]


def log(*a):
    print(*a, flush=True)


def median_diff(loop, args, K):
    """Median-of-5 chained K-vs-2K differences (BENCH_NOTES methodology)."""
    import jax
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args, K))
        t1 = time.perf_counter()
        jax.block_until_ready(loop(*args, 2 * K))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return float(np.median(diffs)) / K


def main():
    import jax
    if os.environ.get("FORCE_CPU"):   # axon plugin ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum
    from laplace_gnn_tpu.graph.container import (add_ell_format,
                                                 sparse_from_edge_index)
    from laplace_gnn_tpu.models.sparse_gnn import SparseGAT
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn

    rng = np.random.default_rng(0)
    E2 = N * AVG_DEG // 2
    s0, d0 = rng.integers(0, N, E2), rng.integers(0, N, E2)
    ei = np.concatenate([np.stack([s0, d0]), np.stack([d0, s0])], axis=1)
    # attention normalizes itself: no degree normalization, keep self-loops
    g0 = sparse_from_edge_index(ei, N, normalize=None, dtype=jnp.float32)
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    y = jnp.asarray(rng.integers(0, C, N))
    log(f"N={N} E={g0.n_edges} hidden={HIDDEN} heads={HEADS} "
        f"layers={LAYERS} C={C}")

    configs = CONFIGS
    if len(sys.argv) > 4:
        configs = [CONFIGS[int(sys.argv[4])]]

    results = {}
    for fmt, agg in configs:
        g = add_ell_format(g0) if fmt == "ell" else g0
        if agg is not None:
            g = dataclasses.replace(g, agg_dtype=agg)
        if g.ell_cols is not None:
            log(f"{fmt}: K={g.ell_cols.shape[1]} levels={len(g.ell_levels)} "
                f"remainder={int(g.rem_src.shape[0])}")
        model = SparseGAT(D, HIDDEN, C, LAYERS, X, g, heads=HEADS,
                          concat=True, dropout_p=0.0)
        params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
        tag = f"{fmt}_{agg or 'f32'}"
        row = {}

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

        n_probes = int(os.environ.get("SGAT_PROBES", "8"))
        probe_batch = int(os.environ.get("SGAT_PROBE_BATCH", "0")) or None

        def nm_of_logprior(lp, params):
            # diag_probes: the attention-parameter diagonal via k Hutchinson
            # vjps instead of ~900 exact tangent passes (curvature/kfac.py
            # ::_mixed_diag_blocks — the exact path OOMs at this scale).
            # SGAT_PROBE_BATCH vmaps that many probes per lax.map step
            # (descriptor-bound gathers amortize across batched cotangents)
            fn = make_neg_marglik_fn(
                model, "classification", "kron", "all", N=N,
                fisher_type="mc", diag_probes=n_probes,
                probe_batch=probe_batch,
                prior_precision=jnp.exp(lp))
            return fn(params, None, y)

        vg = jax.jit(jax.value_and_grad(nm_of_logprior))

        @jax.jit
        def hyper_loop(params, K):
            def body(i, carry):
                acc, lp, p = carry
                val, glp = vg(lp, p)
                p = jax.tree_util.tree_map(
                    lambda w: w + (1e-30 * val).astype(w.dtype), p)
                return acc + val, lp + 1e-30 * val + 0.0 * glp, p
            acc, _, _ = jax.lax.fori_loop(
                0, K, body, (jnp.float32(0), jnp.float32(0), params))
            return acc

        pb_tag = f"_pb{probe_batch}" if probe_batch else ""
        stages = [("fwd", fwd_loop, 20), ("train", train_loop, 10),
                  (f"hyperstep_mc_p{n_probes}{pb_tag}", hyper_loop, 10)]
        if os.environ.get("SGAT_SKIP_HYPER"):
            stages = stages[:2]
        if os.environ.get("SGAT_ONLY_HYPER"):
            stages = stages[2:]
        for name, loop, K in stages:
            try:
                t0 = time.perf_counter()
                jax.block_until_ready(loop(params, jnp.asarray(1)))
                log(f"  {tag} {name} compile+1it: "
                    f"{time.perf_counter() - t0:.1f}s")
                t = median_diff(loop, (params,), K)
                eps = LAYERS * g.n_edges / t
                log(f"  {tag} {name}: {t * 1e3:.2f} ms "
                    f"({eps / 1e6:.0f}M edge-msgs/s)")
                row[name + "_ms"] = round(t * 1e3, 2)
            except Exception as e:
                log(f"  {tag} {name}: FAILED "
                    f"({type(e).__name__}: {str(e)[:120]})")
                row[name + "_ms"] = None
        results[tag] = row

    out_fn = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SPARSE_GAT.json")
    blob = {}
    if os.path.exists(out_fn):
        with open(out_fn) as f:
            blob = json.load(f)
    blob.setdefault("shape", {"N": N, "E": g0.n_edges, "hidden": HIDDEN,
                              "heads": HEADS, "layers": LAYERS, "C": C})
    res = blob.setdefault("results", {})
    for tag, row in results.items():
        res.setdefault(tag, {}).update(row)
    with open(out_fn, "w") as f:
        json.dump(blob, f, indent=1)
    log(f"wrote {out_fn}")


if __name__ == "__main__":
    main()
