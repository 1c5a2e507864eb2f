"""Last-layer Laplace approximations.

Counterpart of reference ``laplace/lllaplace.py`` (LLLaplace:34,
FullLLLaplace:369, KronLLLaplace:381, DiagLLLaplace:477). Instead of deep-
copying the model into a FeatureExtractor with forward hooks (reference
:133-138), the backend simply restricts the posterior pytree mask to the last
layer's parameters; penultimate features come from the tap mechanism
(``model.features``), and the closed-form features (x) I Jacobian is used
whenever the model's last dense layer output *is* the model output
(exactness gate — see curvature/interface.py)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .flavors import DiagLaplace, FullLaplace, KronLaplace


class _LLMixin:
    """Adds last_layer=True backend construction and the reference's
    `prior_precision` semantics for the reduced parameter space."""

    def _backend_extra(self) -> dict:
        return {"last_layer": True}


class FullLLLaplace(_LLMixin, FullLaplace):
    _key = ("last_layer", "full")


class KronLLLaplace(_LLMixin, KronLaplace):
    _key = ("last_layer", "kron")


class DiagLLLaplace(_LLMixin, DiagLaplace):
    _key = ("last_layer", "diag")

    def functional_variance_fast(self, X):
        """Diagonal-output predictive variance from cached features without
        building Jacobians (reference laplace/lllaplace.py:487-504):
        var[c] = sum_d phi_d^2 sigma2_w[c, d] + sigma2_b[c]."""
        phi, f = self.model.features(self.backend.params, X)
        sigma2 = self.posterior_variance
        C = f.shape[-1]
        D = phi.shape[-1]
        has_bias = self.n_params == C * D + C
        if has_bias:
            s_b, s_w = sigma2[:C], sigma2[C:].reshape(C, D)
            var = phi ** 2 @ s_w.T + s_b[None, :]
        else:
            s_w = sigma2.reshape(C, D)
            var = phi ** 2 @ s_w.T
        return f, var
