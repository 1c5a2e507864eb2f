"""Arxiv-scale SpMM roofline: the honest headline number (VERDICT r4 #6).

The Cora-sized `spmm_pct_hbm_roofline` bench.py used to publish is
launch-overhead-bound (252 us at N=2708) and reads as "30x off roofline"
when the at-scale floor argument says otherwise. This script measures, at
N=169k where launch overhead is irrelevant:

  1. one multi-level-ELL aggregation (the production SpMM path, bf16),
  2. a PURE GATHER of the same neighbor rows (the gather-engine
     descriptor-rate ceiling — the binding bound for random row access on
     this part; BENCH_NOTES "Roofline honesty": a banded graph gathers no
     faster than its shuffled isomorph, so the engine is per-row-descriptor
     limited, not HBM-row-buffer limited),
  3. the sequential-HBM-bandwidth bound for the same bytes (the
     NON-binding textbook roofline, reported for context).

Writes BENCH_SPMM_ROOFLINE.json at the repo root; bench.py merges it into
the driver artifact as `spmm_roofline_arxiv_recorded`.

Usage: python scripts/bench_spmm_roofline.py [N] [avg_deg] [d]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 169_343
AVG_DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 7
D = int(sys.argv[3]) if len(sys.argv) > 3 else 256
V5E_HBM_BW = 819e9          # bytes/s, v5e spec


def median_diff(loop, x, K):
    import jax
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, K))
        t1 = time.perf_counter()
        jax.block_until_ready(loop(x, 2 * K))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return float(np.median(diffs)) / K


def main():
    import jax
    if os.environ.get("FORCE_CPU"):   # axon plugin ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    import jax.numpy as jnp

    from laplace_gnn_tpu.graph.container import (add_ell_format,
                                                 sparse_from_edge_index)

    rng = np.random.default_rng(0)
    E2 = N * AVG_DEG // 2
    s0, d0 = rng.integers(0, N, E2), rng.integers(0, N, E2)
    ei = np.concatenate([np.stack([s0, d0]), np.stack([d0, s0])], axis=1)
    g = dataclasses.replace(
        add_ell_format(sparse_from_edge_index(ei, N, dtype=jnp.float32)),
        agg_dtype="bfloat16")
    from laplace_gnn_tpu.graph.container import make_spmm

    E = g.n_edges
    # x stays f32 and is PERTURBED (not replaced) between iterations, and
    # the aggregation goes through the SpMM primitive — the exact program
    # shape of the proven bench_sparse/bench_laplace runs; two other loop
    # formulations (all-bf16 carry; raw g.spmm with divide-normalize)
    # faulted this TPU runtime (UNAVAILABLE kernel fault)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    spmm = make_spmm(g)
    print(f"N={N} E={E} d={D} K={g.ell_cols.shape[1]} "
          f"levels={len(g.ell_levels)}", flush=True)

    @jax.jit
    def agg_loop(x, K):
        def body(i, carry):
            acc, x = carry
            o = spmm(x)
            acc = acc + jnp.sum(o)
            return acc, x + 1e-30 * acc
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), x))
        return acc

    cols = g.ell_cols

    @jax.jit
    def gather_loop(x, K):
        # pure row gather of the same level-0 neighbor rows (in the same
        # bf16 the aggregation gathers) + a cheap reduction to force
        # materialization: the descriptor-rate ceiling
        def body(i, carry):
            acc, x = carry
            o = jnp.sum(x.astype(jnp.bfloat16)[cols], axis=1)
            acc = acc + jnp.sum(o.astype(jnp.float32))
            return acc, x + 1e-30 * acc
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), x))
        return acc

    out = {}
    for name, loop, K in (("agg", agg_loop, 20), ("gather", gather_loop, 20)):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, jnp.asarray(1)))
        print(f"{name} compile+1it {time.perf_counter() - t0:.1f}s",
              flush=True)
        t = median_diff(loop, x, K)
        out[name + "_ms"] = round(t * 1e3, 2)
        print(f"{name}: {t * 1e3:.2f} ms", flush=True)

    # bytes of one aggregation: level-0 gathered rows + output write
    # (weights table and remainder are small); 2 bytes/elt bf16
    rows_gathered = int(np.prod(g.ell_cols.shape))
    for _r, c, _v in g.ell_levels:
        rows_gathered += int(np.prod(c.shape))
    bytes_moved = (rows_gathered + N) * D * 2
    t_seq_hbm = bytes_moved / V5E_HBM_BW
    out.update({
        "shape": {"N": N, "E": E, "d": D, "dtype": "bfloat16"},
        "pct_of_gather_descriptor_ceiling":
            round(100.0 * out["gather_ms"] / out["agg_ms"], 1),
        "seq_hbm_bound_ms": round(t_seq_hbm * 1e3, 2),
        "pct_of_sequential_hbm":
            round(100.0 * t_seq_hbm * 1e3 / out["agg_ms"], 1),
        "note": ("binding ceiling = gather-engine descriptor rate "
                 "(measured as the pure-gather time of the same rows); "
                 "sequential-HBM % is the non-binding textbook bound, "
                 "reported for context. Cora-size bench.py spmm numbers "
                 "are launch-overhead-bound and say nothing about the "
                 "lowering."),
    })
    fn = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SPMM_ROOFLINE.json")
    with open(fn, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {fn}")


if __name__ == "__main__":
    main()
