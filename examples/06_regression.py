"""Bayesian regression with online marginal-likelihood training.

Analog of the reference's examples/regression_example.py: a sinusoid with
noise, an MLP trained jointly with {prior precision, observation noise}
via the online marglik loop, then GLM predictive mean +/- 2 std intervals.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.laplace.marglik import marglik_training
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader


def main():
    rng = np.random.default_rng(0)
    n = 150
    sigma_true = 0.3
    X = jnp.asarray(rng.uniform(-4.0, 4.0, (n, 1)), jnp.float32)
    y = jnp.sin(X) + sigma_true * jnp.asarray(
        rng.standard_normal((n, 1)), jnp.float32)

    model = MLP([1, 50, 1], act="tanh")
    params = model.init(jax.random.PRNGKey(0))

    la, params, margliks, _ = marglik_training(
        model, params, ArrayLoader(X, y, batch_size=150),
        likelihood="regression", hessian_structure="kron",
        n_epochs=300, marglik_frequency=20, n_hypersteps=30,
        optimizer_kwargs={"lr": 1e-2}, lr_hyp=1e-1)
    sigma_hat = float(la.sigma_noise)
    print(f"marglik improved {float(margliks[0]):.1f} -> "
          f"{float(margliks[-1]):.1f}; learned sigma {sigma_hat:.3f} "
          f"(true {sigma_true})")
    assert abs(sigma_hat - sigma_true) < 0.15

    x_grid = jnp.linspace(-6, 6, 200)[:, None]
    f_mu, f_var = la(x_grid)                   # GLM predictive
    f_sigma = jnp.sqrt(jnp.diagonal(f_var, axis1=-2, axis2=-1))
    pred_std = jnp.sqrt(f_sigma ** 2 + sigma_hat ** 2)
    in_dist = (jnp.abs(x_grid[:, 0]) < 4)
    print(f"predictive std: in-distribution {float(pred_std[in_dist].mean()):.3f}, "
          f"extrapolation {float(pred_std[~in_dist].mean()):.3f}")
    assert float(pred_std[~in_dist].mean()) > float(pred_std[in_dist].mean())
    print("regression example OK")


if __name__ == "__main__":
    main()
