"""End-to-end production-scale quality run on the real chip.

SparseGCN on a 50k-node SBM (clustered, informative features), full
training loop inside one jitted fori_loop (tunnel-safe timing, see
BENCH_NOTES), then KronLaplace fit + marglik prior tuning and Bayesian
predictive metrics (acc/NLL/ECE) on held-out nodes.

Run: python scripts/bench_scale_quality.py
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

import optax

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.graph import sparse_from_edge_index, add_ell_format
from laplace_gnn_tpu.models import SparseGCN
from laplace_gnn_tpu.utils.metrics import expected_calibration_error


def main():
    N, C, D, H = 50_000, 16, 16, 64
    data = G.sbm_dataset(n_nodes=N, n_classes=C, d_features=D,
                         p_in=3e-4, p_out=2e-5, seed=0)
    # harden the task: drown the class-informative features in noise so
    # the model must combine graph structure and features (MAP stays
    # imperfect and calibration is non-trivial)
    noise = np.random.default_rng(1).normal(0, 2.5, data.x.shape)
    data.x = (data.x + noise).astype(np.float32)
    g = sparse_from_edge_index(data.edge_index, N, normalize="sym")
    g = add_ell_format(g)
    import dataclasses
    g = dataclasses.replace(g, agg_dtype="bfloat16")
    print(f"SBM N={N} E={g.n_edges} (dense adj would be "
          f"{N * N * 4 / 1e9:.0f} GB)")

    rng = np.random.default_rng(0)
    perm = rng.permutation(N)
    tr, va, te = perm[:30_000], perm[30_000:40_000], perm[40_000:]
    y = jnp.asarray(np.asarray(data.y))

    model = SparseGCN(D, H, C, 2, jnp.asarray(data.x), g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    tr_j, y_tr = jnp.asarray(tr), y[jnp.asarray(tr)]

    opt = optax.adam(1e-2)

    def train_loop(params, n_steps):
        st = opt.init(params)

        def body(i, carry):
            p, s = carry

            def obj(p):
                f = model.apply(p, tr_j)
                return optax.softmax_cross_entropy_with_integer_labels(
                    f, y_tr).mean()

            _, grads = jax.value_and_grad(obj)(p)
            u, s = opt.update(grads, s)
            return optax.apply_updates(p, u), s

        p, _ = jax.lax.fori_loop(0, n_steps, body, (params, st))
        return p

    fit = jax.jit(train_loop, static_argnums=1)
    t0 = time.perf_counter()
    params = jax.block_until_ready(fit(params, 800))
    t_train = time.perf_counter() - t0
    print(f"800 full-graph train steps: {t_train:.1f}s "
          f"(incl. compile; {g.n_edges * 800 / t_train / 1e6:.0f} M "
          f"edge-aggregations/s effective)")

    t0 = time.perf_counter()
    la = Laplace(model, params, "classification",
                 subset_of_weights="last_layer", hessian_structure="kron")
    la.fit([(tr_j, y_tr)])
    la.optimize_prior_precision(method="marglik", n_steps=100)
    t_la = time.perf_counter() - t0
    print(f"last-layer KronLaplace fit + 100-step marglik prior tuning: "
          f"{t_la:.1f}s; marglik {float(la.log_marginal_likelihood()):.1f}")

    te_j = jnp.asarray(te)
    probs_map = jax.nn.softmax(model.apply(params, te_j))
    # exact GLM Jacobians for a full-graph GNN cost C x B whole-graph
    # pullbacks — at this scale the NN predictive (posterior-sample
    # forwards, 30 full-graph applies total) is the right tool
    probs_bayes = la(te_j, pred_type="nn", link_approx="mc", n_samples=30)
    y_te = np.asarray(y[te_j])
    for name, probs in (("MAP", probs_map), ("Laplace", probs_bayes)):
        p = np.asarray(probs)
        acc = float((p.argmax(-1) == y_te).mean())
        nll = float(-np.log(np.maximum(p[np.arange(len(y_te)), y_te],
                                       1e-12)).mean())
        ece = float(expected_calibration_error(jnp.asarray(p),
                                               jnp.asarray(y_te)))
        print(f"{name:8s} test acc {acc:.4f}  NLL {nll:.4f}  ECE {ece:.4f}")


if __name__ == "__main__":
    main()
