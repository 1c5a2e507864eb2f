"""Bayesian optimization with a Laplace-approximated neural surrogate.

Analog of the reference's examples/bayesopt_example.py: an MLP surrogate
refit each round, a KronLaplace posterior giving calibrated mean/variance,
and upper-confidence-bound acquisition maximized on a candidate grid.
Target: maximize f(x) = sin(5x) - (x - 0.5)^2 on [0, 1].
"""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader


def f_true(x):
    return jnp.sin(5 * x) - (x - 0.5) ** 2


def fit_surrogate(X, y, seed):
    import optax
    model = MLP([1, 32, 32, 1], act="tanh")
    params = model.init(jax.random.PRNGKey(seed))
    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        def obj(p):
            return jnp.mean((model.apply(p, X) - y) ** 2)
        l, g = jax.value_and_grad(obj)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for _ in range(500):
        params, st, _ = step(params, st)
    la = Laplace(model, params, "regression",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit(ArrayLoader(X, y))
    la.optimize_prior_precision(method="marglik")
    return la


def main():
    rng = np.random.default_rng(0)
    sigma = 0.05
    X = jnp.asarray(rng.uniform(0, 1, (5, 1)), jnp.float32)
    y = f_true(X) + sigma * jnp.asarray(rng.standard_normal((5, 1)),
                                        jnp.float32)
    candidates = jnp.linspace(0, 1, 256)[:, None]
    x_star = float(candidates[jnp.argmax(f_true(candidates[:, 0])), 0])

    for round_ in range(10):
        la = fit_surrogate(X, y, seed=round_)
        mu, var = la(candidates)
        ucb = mu[:, 0] + 2.0 * jnp.sqrt(
            jnp.diagonal(var, axis1=-2, axis2=-1)[:, 0])
        x_next = candidates[jnp.argmax(ucb)][None]
        y_next = f_true(x_next) + sigma * jnp.asarray(
            rng.standard_normal((1, 1)), jnp.float32)
        X = jnp.concatenate([X, x_next])
        y = jnp.concatenate([y, y_next])
        best = float(X[jnp.argmax(y[:, 0]), 0])
        print(f"round {round_}: queried x={float(x_next[0, 0]):.3f}, "
              f"best-so-far x={best:.3f} (optimum {x_star:.3f})")

    assert abs(best - x_star) < 0.12, (best, x_star)
    print("bayesopt example OK")


if __name__ == "__main__":
    main()
