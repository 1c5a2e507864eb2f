"""Isolate the sparse aggregation op at arxiv scale and time XLA variants:

  seg        : segment_sum, unsorted edges
  seg_sorted : segment_sum, dst-sorted edges + indices_are_sorted=True
  ell        : gather + einsum over padded neighbor lists
  *_bf16     : same with bfloat16 features

Chained-fori_loop timing (see BENCH_NOTES).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 169_343
AVG_DEG = 7
D = 256


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    E2 = N * AVG_DEG // 2
    s0 = rng.integers(0, N, E2)
    d0 = rng.integers(0, N, E2)
    src = np.concatenate([s0, d0, np.arange(N)])
    dst = np.concatenate([d0, s0, np.arange(N)])
    w = np.ones(len(src), np.float32)
    E = len(src)
    order = np.argsort(dst, kind="stable")
    srcs, dsts, ws = src[order], dst[order], w[order]

    # ELL
    counts = np.bincount(dsts, minlength=N)
    K = int(counts.max())
    cols = np.zeros((N, K), np.int32)
    vals = np.zeros((N, K), np.float32)
    offs = np.concatenate([[0], np.cumsum(counts)])
    for i in range(N):
        k = counts[i]
        cols[i, :k] = srcs[offs[i]:offs[i] + k]
        vals[i, :k] = ws[offs[i]:offs[i] + k]
    print(f"N={N} E={E} K={K} pad={cols.size/E:.2f}x", flush=True)

    X32 = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def variants(x, w_, ws_, vals_):
        src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)
        srcs_j, dsts_j = jnp.asarray(srcs), jnp.asarray(dsts)
        cols_j = jnp.asarray(cols)

        def seg(x):
            return jax.ops.segment_sum(w_[:, None] * x[src_j], dst_j,
                                       num_segments=N)

        def seg_sorted(x):
            return jax.ops.segment_sum(ws_[:, None] * x[srcs_j], dsts_j,
                                       num_segments=N,
                                       indices_are_sorted=True)

        def ell(x):
            return jnp.einsum("nk,nkd->nd", vals_, x[cols_j])

        return {"seg": seg, "seg_sorted": seg_sorted, "ell": ell}

    def bench(name, fn, x, K_it=40):
        @jax.jit
        def loop(x, K_it):
            def body(i, carry):
                acc, xx = carry
                out = fn(xx)
                acc = acc + jnp.sum(out[:1])
                xx = xx + (1e-30 * acc).astype(xx.dtype)
                return acc, xx
            acc, _ = jax.lax.fori_loop(0, K_it, body,
                                       (jnp.float32(0), x))
            return acc
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, jnp.asarray(1)))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, jnp.asarray(K_it)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, jnp.asarray(2 * K_it)))
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / K_it
        gbps = (E * D * x.dtype.itemsize * 2) / per / 1e9
        print(f"{name}: {per*1e3:.2f} ms ({E/per/1e9:.2f}B edges/s, "
              f"~{gbps:.0f} GB/s eff, compile {c:.0f}s)", flush=True)

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = X32.astype(dt)
        w_ = jnp.asarray(w).astype(dt)
        ws_ = jnp.asarray(ws).astype(dt)
        vals_ = jnp.asarray(vals).astype(dt)
        for name, fn in variants(x, w_, ws_, vals_).items():
            bench(f"{name}_{tag}", fn, x)


if __name__ == "__main__":
    main()
