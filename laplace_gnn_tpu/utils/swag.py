"""Diagonal SWAG variance estimation (reference laplace/utils/swag.py:18-102):
run SGD from the current solution, collect first/second moments of parameter
snapshots, return the diagonal variance over the flat posterior vector."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..curvature.interface import GGNBackend
from ..curvature.losses import get_loss_fn
from ..utils.pytree import merge_split, tree_vector


def fit_diagonal_swag_var(model, params, train_loader, likelihood: str,
                          n_snapshots_total: int = 40,
                          snapshot_freq: int = 1,
                          lr: float = 0.01, momentum: float = 0.9,
                          weight_decay: float = 3e-4,
                          min_var: float = 1e-30) -> jnp.ndarray:
    backend = GGNBackend(model, params, likelihood)
    loss_fn = get_loss_fn(likelihood)
    w = backend.w

    opt = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum))
    state = opt.init(w)

    @jax.jit
    def step(w, state, X, y):
        def obj(w_):
            return loss_fn(backend.model_fn(w_, X), y)

        g = jax.grad(obj)(w)
        updates, state = opt.update(g, state, w)
        return optax.apply_updates(w, updates), state

    mean = jnp.zeros_like(tree_vector(w))
    sq_mean = jnp.zeros_like(mean)
    n_snapshots = 0

    epoch = 0
    while n_snapshots < n_snapshots_total:
        for X, y in train_loader:
            w, state = step(w, state, X, y)
        epoch += 1
        if epoch % snapshot_freq == 0:
            theta = tree_vector(w)
            mean = (mean * n_snapshots + theta) / (n_snapshots + 1)
            sq_mean = (sq_mean * n_snapshots + theta ** 2) / (n_snapshots + 1)
            n_snapshots += 1

    return jnp.clip(sq_mean - mean ** 2, min=min_var)
