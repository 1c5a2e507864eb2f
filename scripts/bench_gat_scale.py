"""Dense GAT at N=8192: full (N,N,H) attention vs flash-style row-blocked.

The reference's dense GAT (gnn/models/layers.py:101-124) materializes the
(N, N, heads) score tensor — 2.1 GB at N=8192/H=8 — which caps how large a
dense-adjacency GAT can run. GATConv.row_block (models/layers.py::
_masked_attention_chunked) computes the same masked softmax per target-row
block without ever materializing it. This script measures, on the attached
TPU chip:

  - forward wall-clock, dense vs chunked (several block sizes)
  - train-step (fwd+bwd) wall-clock
  - XLA memory analysis (temp bytes) for both programs

Timing uses the chained fori_loop method of bench.py (tunnel-safe).

Run: python scripts/bench_gat_scale.py [--n 8192] [--heads 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _median_loop_time(loopfn, arg, K, reps=5):
    """Chained-fori_loop timing (bench.py method): time K and 2K iterations,
    difference out dispatch overhead, median over ``reps``."""
    jax.block_until_ready(loopfn(arg, jnp.asarray(1)))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loopfn(arg, jnp.asarray(K)))
        t1 = time.perf_counter()
        jax.block_until_ready(loopfn(arg, jnp.asarray(2 * K)))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return max(float(np.median(diffs)) / K, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--density", type=float, default=14e-4)
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[256, 512, 1024])
    ap.add_argument("--skip-dense", action="store_true",
                    help="skip the full (N,N,H) baseline (OOM guard)")
    ap.add_argument("--opt_variants", action="store_true",
                    help="also run int8-mask / bf16-attn variants of the "
                         "largest block (round-5 attribution set)")
    ap.add_argument("--flash", action="store_true",
                    help="also run the fused Pallas flash-attention kernel")
    ap.add_argument("--no_check", action="store_true",
                    help="skip the eager cross-variant correctness check "
                         "(feasibility runs at N >= 32k: the eager check's "
                         "extra device copies OOM the 16 GB chip)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kf", type=int, default=20,
                    help="forward iterations per timed loop")
    ap.add_argument("--kt", type=int, default=10,
                    help="train-step iterations per timed loop")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum
    from laplace_gnn_tpu.models import GAT

    n, d, hid, heads = args.n, args.d, args.hidden, args.heads
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    # memory-lean symmetric ER adjacency: build in f32 blocks (an (n, n)
    # f64 intermediate is 8.6 GB at n=32768 and swaps the host)
    a = np.zeros((n, n), dtype=np.float32)
    step = 4096
    for i0 in range(0, n, step):
        blk = (rng.random((min(step, n - i0), n)) < args.density)
        a[i0:i0 + len(blk)] = blk
    np.maximum(a, a.T, out=a)
    np.fill_diagonal(a, 0.0)
    # keep the host copy: each model's init makes the single device copy
    # (a second resident device adjacency is 4.3 GB at N=32768)
    adj = a
    y = jnp.asarray(rng.integers(0, 8, n))
    idx = jnp.arange(1024)

    def build(row_block, mask_dtype=None, attn_dtype=None,
              attention_impl=None):
        # row_block >= n disables chunking (apply() requires block < n),
        # so passing n forces the dense (N,N,H) baseline
        model = GAT(d, hid, 8, 2, X, adj, heads=heads, concat=True,
                    dropout_p=0.0, row_block=row_block,
                    mask_dtype=mask_dtype, attn_dtype=attn_dtype,
                    attention_impl=attention_impl)
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    def programs(model):
        @jax.jit
        def fwd_loop(params, K):
            def body(i, carry):
                acc, w = carry
                p = jax.tree_util.tree_map(lambda x: x, params)
                p["convs"][0]["lin"]["weight"] = w
                f = model.apply(p, idx)
                acc = acc + jnp.sum(f)
                return acc, w + 1e-30 * acc
            acc, _ = jax.lax.fori_loop(
                0, K, body, (0.0, params["convs"][0]["lin"]["weight"]))
            return acc

        @jax.jit
        def train_loop(params, K):
            def obj(p):
                f = model.apply(p, idx)
                return cross_entropy_sum(f, y[:idx.shape[0]]) / idx.shape[0]

            def body(i, carry):
                acc, w = carry
                p = jax.tree_util.tree_map(lambda x: x, params)
                p["convs"][0]["lin"]["weight"] = w
                loss, g = jax.value_and_grad(obj)(p)
                gw = g["convs"][0]["lin"]["weight"]
                return acc + loss, w - 1e-30 * gw
            acc, _ = jax.lax.fori_loop(
                0, K, body, (0.0, params["convs"][0]["lin"]["weight"]))
            return acc

        return fwd_loop, train_loop

    def temp_mb(jitted, params):
        m = jitted.lower(params, jnp.asarray(2)).compile().memory_analysis()
        return m.temp_size_in_bytes / 2**20

    results = {}
    variants = ([] if args.skip_dense else [("dense", (n, None, None))]) + \
        [(f"block{b}", (b, None, None)) for b in args.blocks]
    if args.opt_variants:
        b = args.blocks[-1]
        # round-5 attribution/optimization set (VERDICT r4 #4): int8 mask
        # isolates the adjacency-read HBM cost, bf16 attn isolates the
        # MXU contraction cost; the residual is the VPU softmax chain
        variants += [(f"block{b}_int8mask", (b, "int8", None)),
                     (f"block{b}_bf16attn", (b, None, "bfloat16")),
                     (f"block{b}_int8_bf16", (b, "int8", "bfloat16"))]
    if args.flash:
        variants += [("flash", (n, None, None, "flash")),
                     ("flash_bf16dot", (n, None, "bfloat16", "flash")),
                     ("flash_int8_bf16", (n, "int8", "bfloat16", "flash"))]
    out_ref = None
    for name, spec in variants:
        blk, mdt, adt = spec[:3]
        impl = spec[3] if len(spec) > 3 else None
        model, params = build(blk, mask_dtype=mdt, attn_dtype=adt,
                              attention_impl=impl)
        # correctness cross-check (first 8 output rows against dense)
        out = None if args.no_check else model.apply(params, jnp.arange(8))
        if out is None:
            pass
        elif out_ref is None:
            out_ref = out
        else:
            err = float(jnp.abs(out - out_ref).max())
            # bf16 contraction operands: bf16 tolerance; flash kernel:
            # MXU default-precision f32 dots differ ~1e-4 from XLA einsum
            # over 16k-neighbor sums
            tol = 0.05 if adt else (1e-3 if impl else 1e-4)
            assert err < tol, (name, err)
        fwd_loop, train_loop = programs(model)
        t_f = _median_loop_time(fwd_loop, params, args.kf, reps=args.reps)
        t_t = _median_loop_time(train_loop, params, args.kt, reps=args.reps)
        mb = temp_mb(fwd_loop, params)
        results[name] = (t_f, t_t, mb)
        print(f"{name:9s} fwd {t_f * 1e3:8.2f} ms  train {t_t * 1e3:8.2f} ms"
              f"  fwd temp {mb:8.0f} MB", flush=True)

    if "dense" in results and len(results) > 1:
        best = min((v for k, v in results.items() if k != "dense"),
                   key=lambda v: v[0])
        print(f"best chunked vs dense: fwd {results['dense'][0] / best[0]:.2f}x"
              f", train {results['dense'][1] / best[1]:.2f}x, "
              f"temp {results['dense'][2] / best[2]:.1f}x less")

    # record for bench.py's extras (merged as gat_scale_recorded)
    import json
    out_fn = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_GAT.json")
    rec = {}
    if os.path.exists(out_fn):
        with open(out_fn) as f:
            rec = json.load(f)
    key = f"n{n}_h{heads}"
    rec[key] = {name: {"fwd_ms": round(v[0] * 1e3, 2),
                       "train_ms": round(v[1] * 1e3, 2)}
                for name, v in results.items()}
    with open(out_fn, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"recorded to {out_fn}")


if __name__ == "__main__":
    main()
