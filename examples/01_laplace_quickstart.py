"""Post-hoc Laplace on a toy regression MLP (counterpart of the reference's
examples/regression_example: train MAP, fit Laplace, tune prior precision
and observation noise by marginal likelihood, plot-ready predictive).

Run: python examples/01_laplace_quickstart.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader


def main():
    # sinusoid with a gap (the classic uncertainty-visualization setup)
    key = jax.random.PRNGKey(0)
    X = jnp.concatenate([jnp.linspace(-4, -1, 60), jnp.linspace(1, 4, 60)])
    X = X[:, None]
    y = jnp.sin(X) + 0.2 * jax.random.normal(key, X.shape)

    model = MLP([1, 50, 1], act="tanh")
    params = model.init(jax.random.PRNGKey(1))

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def obj(p):
            return jnp.mean((model.apply(p, X) - y) ** 2)

        loss, g = jax.value_and_grad(obj)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    for i in range(1000):
        params, state, loss = step(params, state)
    print(f"MAP training done, MSE={float(loss):.4f}")

    la = Laplace(model, params, "regression",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit(ArrayLoader(X, y, batch_size=60))
    print(f"marglik before tuning: {float(la.log_marginal_likelihood()):.2f}")
    la.optimize_prior_precision(method="marglik", n_steps=100)
    print(f"marglik after tuning:  {float(la.log_marginal_likelihood()):.2f}")
    print(f"tuned prior precision: {np.asarray(la.prior_precision)}")

    X_test = jnp.linspace(-6, 6, 200)[:, None]
    f_mu, f_var = la(X_test, pred_type="glm")
    std = np.sqrt(np.asarray(f_var)[:, 0, 0] + float(la.sigma_noise) ** 2)
    in_gap = (np.abs(np.asarray(X_test[:, 0])) < 1)
    print(f"mean predictive std in data region: {std[~in_gap].mean():.3f}")
    print(f"mean predictive std in the gap:     {std[in_gap].mean():.3f}"
          "  (should be larger)")


if __name__ == "__main__":
    main()
