"""Dense ground-truth curvature oracles for tests.

Counterpart of the reference's functorch oracles
(curvlinops/examples/functorch.py:37-317): everything is computed through an
*independent* autodiff path (jacrev/jacfwd on the flat parameter vector, loss
Hessians via jax.hessian on outputs) so agreement with the matrix-free
operators is a real cross-check, not a tautology.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import tree_unflattener, tree_vector
from .losses import get_loss_fn


def _flat_model_fn(model_fn, w):
    unflatten = tree_unflattener(w)
    theta = tree_vector(w)

    def f(flat, X):
        return model_fn(unflatten(flat), X)

    return f, theta


def functorch_jacobian(model_fn, w, X) -> jnp.ndarray:
    """Dense Jacobian (M, C, P) via jacrev on the flat vector."""
    f, theta = _flat_model_fn(model_fn, w)
    return jax.jacrev(lambda t: f(t, X))(theta)


def functorch_hessian(model_fn, likelihood, w, data) -> jnp.ndarray:
    """Dense Hessian of the total sum-loss."""
    loss_fn = get_loss_fn(likelihood)
    f, theta = _flat_model_fn(model_fn, w)

    def total(t):
        return sum(loss_fn(f(t, X), y) for X, y in data)

    return jax.hessian(total)(theta)


def functorch_ggn(model_fn, likelihood, w, data) -> jnp.ndarray:
    """Dense GGN: sum_n J_n^T H_n J_n with H_n = d^2 loss / d f^2."""
    loss_fn = get_loss_fn(likelihood)
    total = None
    for X, y in data:
        J = functorch_jacobian(model_fn, w, X)          # (M, C, P)
        fx = model_fn(w, X)
        H = jax.vmap(jax.hessian(
            lambda fi, yi: loss_fn(fi[None], yi[None])))(fx, y)  # (M, C, C)
        G = jnp.einsum("mcp,mck,mkq->pq", J, H, J)
        total = G if total is None else total + G
    return total


def functorch_ef(model_fn, likelihood, w, data) -> jnp.ndarray:
    """Dense empirical Fisher: sum_n g_n g_n^T (raw sum-loss grads)."""
    loss_fn = get_loss_fn(likelihood)
    f, theta = _flat_model_fn(model_fn, w)
    total = None
    for X, y in data:
        def per_sample(t):
            fx = f(t, X)
            return jax.vmap(lambda fi, yi: loss_fn(fi[None], yi[None]))(fx, y)

        G = jax.jacrev(per_sample)(theta)               # (M, P)
        E = G.T @ G
        total = E if total is None else total + E
    return total


def jacobians_naive(model_fn, w, X) -> jnp.ndarray:
    """Alias mirroring the reference's naive per-element oracle
    (tests/utils.py:85-106)."""
    return functorch_jacobian(model_fn, w, X)
