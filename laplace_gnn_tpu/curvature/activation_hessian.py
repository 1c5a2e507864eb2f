"""Hessian w.r.t. an intermediate activation.

Counterpart of ``curvlinops/experimental/activation_hessian.py`` (:17
ActivationHessianLinearOperator, :192 store_activation): where the reference
installs a capture hook and re-runs autograd, here the tap mechanism's zero
perturbation ``eps`` *is* the activation handle — the Hessian of the loss
w.r.t. the pre-activation of any tap site is an ordinary nested jvp/grad.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.module import TapCollector
from ..utils.pytree import merge_split
from .base import LinearOperator
from .losses import get_loss_fn


def activation_shapes(model, params, X) -> dict:
    """Map of tap-site name -> pre-activation shape."""
    taps = TapCollector()
    model.apply(params, X, taps=taps)
    return {name: s.shape for name, a, s in taps.records}


class ActivationHessianOperator(LinearOperator):
    """Hessian of the (sum) loss w.r.t. the pre-activation of one tap site,
    as a matrix-free operator on the flattened activation."""

    def __init__(self, model, params, likelihood: str, site: str, X, y,
                 jit: bool = True):
        loss_fn = get_loss_fn(likelihood)
        shapes = activation_shapes(model, params, X)
        if site not in shapes:
            raise ValueError(
                f"Unknown activation site {site!r}; available: "
                f"{sorted(shapes)}")
        shape = shapes[site]
        size = 1
        for d in shape:
            size *= int(d)
        super().__init__((size, size), jnp.result_type(float))
        self._shape_act = shape

        def loss_of_eps(eps_flat):
            taps = TapCollector({site: eps_flat.reshape(shape)})
            out = model.apply(params, X, taps=taps)
            return loss_fn(out, y)

        def mv(v):
            zero = jnp.zeros((size,))
            return jax.jvp(jax.grad(loss_of_eps), (zero,), (v,))[1]

        self._mv = jax.jit(mv) if jit else mv

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        return self._mv(v)
