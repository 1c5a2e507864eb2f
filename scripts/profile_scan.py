"""Breakdown of the whole-training scan program's device time (TPU).

The headline `marglik_optimization_scan` runs a 200-epoch Cora-sized
STE-GCN structure-learning run in one jitted fori_loop at ~0.38-0.41 s
warm (BENCH_NOTES.md). Known per-op costs (bench.py: hyperstep ~0.8 ms
x 280 marglik evals ~0.23 s, train steps ~0.33 ms x 200 ~0.07 s)
account for most of it; this script measures ablated variants of the
SAME loop to attribute the remainder per-feature:

  full        : the shipped epoch body
  no_track    : best-params where-selects replaced by scalar tracking
  no_nm       : per-epoch marglik tracking off (hypersteps kept)
  no_hyper    : hyper phases off (per-epoch marglik kept)
  train_only  : bare train steps

Each variant is its own executable; timing is one dispatch of the whole
loop (no chaining needed — the loop body repeats n_epochs times inside).

Run: python scripts/profile_scan.py [--epochs 200]
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
import optax

N_NODES, N_FEAT, HIDDEN, N_CLASS = 2708, 1433, 64, 7
DENSITY = 10556 / (2708 * 2708)


def build():
    from laplace_gnn_tpu.models import STEGCN
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N_NODES, N_FEAT), dtype=np.float32)
    adj = (rng.random((N_NODES, N_NODES)) < DENSITY).astype(np.float32)
    adj = np.minimum(adj + adj.T, 1.0)
    np.fill_diagonal(adj, 0.0)
    y = rng.integers(0, N_CLASS, N_NODES)
    model = STEGCN(N_FEAT, HIDDEN, N_CLASS, 2, jnp.asarray(X),
                   jnp.asarray(adj), dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    return model, params, jnp.arange(140), jnp.asarray(y[:140]), \
        jnp.arange(140, 640), jnp.asarray(y[140:640])


def make_variant(model, params, N, *, track=True, nm_every=True,
                 hyper=True, n_epochs=200, n_hypersteps=10,
                 burnin=50, freq=20):
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn
    from laplace_gnn_tpu.utils.pytree import path_mask
    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum

    weight_mask = path_mask(params, lambda p: "adj" not in p)
    adj_mask = path_mask(params, lambda p: p == "adj")
    weight_opt = optax.masked(
        optax.chain(optax.add_decayed_weights(5e-5), optax.adam(1e-3)),
        weight_mask)
    adj_opt = optax.masked(optax.sgd(0.8), adj_mask)
    nm_fn = make_neg_marglik_fn(model, "classification", "kron", "all", N=N)

    def zero_masked(g, mask):
        return jax.tree_util.tree_map(
            lambda gr, m: gr if m else jnp.zeros_like(gr), g, mask)

    def train_step(params, wstate, idx, yy, rng):
        def obj(p):
            f = model.apply(p, idx, rng=rng, train=True)
            return cross_entropy_sum(f, yy) / yy.shape[0]
        loss, g = jax.value_and_grad(obj)(params)
        g = zero_masked(g, weight_mask)
        updates, wstate = weight_opt.update(g, wstate, params)
        return optax.apply_updates(params, updates), wstate, loss

    def hyper_phase(params, astate, idx, yy):
        def one(_, carry):
            params, astate = carry
            g = jax.grad(nm_fn)(params, idx, yy)
            gn = jnp.sqrt(jnp.sum(g["adj"] ** 2))
            g = dict(g, adj=g["adj"] * jnp.minimum(
                1.0, 1.0 / jnp.maximum(gn, 1e-12)))
            g = zero_masked(g, adj_mask)
            updates, astate = adj_opt.update(g, astate, params)
            return optax.apply_updates(params, updates), astate
        return jax.lax.fori_loop(0, n_hypersteps, one, (params, astate))

    @jax.jit
    def run(params, idx, yy, vidx, vy):
        wstate = weight_opt.init(params)
        astate = adj_opt.init(params)
        best = {"nm": jnp.inf, "vl": jnp.inf,
                "nm_params": params, "vl_params": params}

        def body(i, carry):
            params, wstate, astate, rng, best, acc = carry
            epoch = i + 1
            rng, sub = jax.random.split(rng)
            params, wstate, loss = train_step(params, wstate, idx, yy, sub)
            if hyper:
                do = (epoch % freq == 0) & (epoch >= burnin)
                params, astate = jax.lax.cond(
                    do, lambda pa: hyper_phase(*pa, idx, yy),
                    lambda pa: pa, (params, astate))
            if nm_every:
                nm = nm_fn(params, idx, yy)
            else:
                nm = loss
            f = model.apply(params, vidx)
            vl = cross_entropy_sum(f, vy) / vy.shape[0]
            upd_m, upd_v = nm < best["nm"], vl < best["vl"]
            sel = jax.tree_util.tree_map
            if track:
                best = {
                    "nm": jnp.where(upd_m, nm, best["nm"]),
                    "vl": jnp.where(upd_v, vl, best["vl"]),
                    "nm_params": sel(lambda n, o: jnp.where(upd_m, n, o),
                                     params, best["nm_params"]),
                    "vl_params": sel(lambda n, o: jnp.where(upd_v, n, o),
                                     params, best["vl_params"]),
                }
            else:
                best = dict(best, nm=jnp.where(upd_m, nm, best["nm"]),
                            vl=jnp.where(upd_v, vl, best["vl"]))
            return params, wstate, astate, rng, best, acc + nm + vl

        out = jax.lax.fori_loop(
            0, n_epochs, body,
            (params, wstate, astate, jax.random.PRNGKey(0), best,
             jnp.asarray(0.0)))
        return out[0]["adj"][0, 0] if isinstance(out[0], dict) else 0.0, \
            out[4]["nm"], out[5]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    model, params, idx, yy, vidx, vy = build()
    N = int(yy.shape[0])
    variants = {
        "full": dict(track=True, nm_every=True, hyper=True),
        "no_track": dict(track=False, nm_every=True, hyper=True),
        "no_nm": dict(track=True, nm_every=False, hyper=True),
        "no_hyper": dict(track=True, nm_every=True, hyper=False),
        "train_only": dict(track=False, nm_every=False, hyper=False),
    }
    for name, kw in variants.items():
        run = make_variant(model, params, N, n_epochs=args.epochs, **kw)
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, idx, yy, vidx, vy))
        t_cold = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(params, idx, yy, vidx, vy))
            ts.append(time.perf_counter() - t0)
        print(f"{name:11s} warm {np.median(ts):7.3f}s "
              f"({np.median(ts) / args.epochs * 1e3:6.2f} ms/epoch)  "
              f"cold {t_cold:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
