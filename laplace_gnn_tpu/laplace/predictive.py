"""Predictive link approximations for GLM predictives.

Mirrors reference ``laplace/baselaplace.py`` `_glm_forward_call`
(:627-661): probit, Laplace bridge (plain and normalized), and MC sampling
of the linearized predictive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linalg import normal_samples


def probit_predictive(f_mu: jnp.ndarray, f_var: jnp.ndarray) -> jnp.ndarray:
    """kappa * softmax approximation (reference :634-636).
    f_mu: (B, C); f_var: (B, C, C)."""
    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi / 8 *
                           jnp.diagonal(f_var, axis1=-2, axis2=-1))
    return jax.nn.softmax(kappa * f_mu, axis=-1)


def bridge_predictive(f_mu: jnp.ndarray, f_var: jnp.ndarray,
                      norm: bool = False) -> jnp.ndarray:
    """Laplace bridge to a Dirichlet (reference :637-661)."""
    # zero-mean correction
    sum_var_rows = jnp.sum(f_var, axis=-1)                       # (B, C)
    total_var = jnp.sum(f_var, axis=(-1, -2))[:, None]           # (B, 1)
    f_mu = f_mu - sum_var_rows * jnp.sum(f_mu, axis=-1,
                                         keepdims=True) / total_var
    f_var = f_var - jnp.einsum("bi,bj->bij", jnp.sum(f_var, axis=-1),
                               jnp.sum(f_var, axis=-2)) / total_var[..., None]

    K = f_mu.shape[-1]
    f_var_diag = jnp.diagonal(f_var, axis1=-2, axis2=-1)

    if norm:  # variance correction (bridge_norm)
        f_var_diag_mean = jnp.mean(f_var_diag, axis=1)
        f_var_diag_mean = f_var_diag_mean / jnp.sqrt(K / 2.0)
        f_mu = f_mu / jnp.sqrt(f_var_diag_mean)[:, None]
        f_var_diag = f_var_diag / f_var_diag_mean[:, None]

    sum_exp = jnp.sum(jnp.exp(-f_mu), axis=1)[:, None]
    alpha = (1.0 - 2.0 / K + jnp.exp(f_mu) / K ** 2 * sum_exp) / f_var_diag
    out = alpha / jnp.sum(alpha, axis=1)[:, None]
    return jnp.nan_to_num(out, nan=1.0)


def mc_predictive(key, f_mu: jnp.ndarray, f_var: jnp.ndarray,
                  n_samples: int, likelihood: str = "classification",
                  diagonal_output: bool = False) -> jnp.ndarray:
    """Sample the linearized predictive and average softmax
    (reference :627-633, :663-710)."""
    if diagonal_output and f_var.ndim == 3:
        f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
    samples = normal_samples(key, f_mu, f_var, n_samples)
    if likelihood == "regression":
        return samples
    return jnp.mean(jax.nn.softmax(samples, axis=-1), axis=0)


def glm_classification_predictive(key, f_mu, f_var, link_approx: str,
                                  n_samples: int = 100,
                                  diagonal_output: bool = False):
    if link_approx == "mc":
        return mc_predictive(key, f_mu, f_var, n_samples,
                             diagonal_output=diagonal_output)
    if link_approx == "probit":
        return probit_predictive(f_mu, f_var)
    if link_approx == "bridge":
        return bridge_predictive(f_mu, f_var, norm=False)
    if link_approx == "bridge_norm":
        return bridge_predictive(f_mu, f_var, norm=True)
    raise ValueError(
        "Prediction path invalid. Check the likelihood, pred_type, "
        "link_approx combination!")
