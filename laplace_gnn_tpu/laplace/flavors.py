"""Full / Kron / Diag / LowRank parametric Laplace flavors.

TPU-native counterparts of reference ``laplace/baselaplace.py``
(FullLaplace:1377, KronLaplace:1507, LowRankLaplace:1679, DiagLaplace:1838).
"""

from __future__ import annotations

import copy
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curvature.interface import EFBackend, GGNBackend
from ..curvature.operators import GGNOperator
from ..ops.linalg import invsqrt_precision
from .base import ParametricLaplace
from .kron import Kron, KronDecomposed


class FullLaplace(ParametricLaplace):
    """Dense P x P posterior precision (reference :1377-1504)."""

    _key = ("all", "full")

    def __init__(self, model, params, likelihood, **kwargs):
        self._posterior_scale = None
        super().__init__(model, params, likelihood, **kwargs)

    def _init_H(self) -> None:
        self.H = jnp.zeros((self.n_params, self.n_params))

    def _curv_closure(self, X, y, N: int, batch_idx: int = 0):
        return self.backend.full(X, y, N=N)

    def fit(self, train_loader, override: bool = True) -> None:
        self._posterior_scale = None
        super().fit(train_loader, override=override)

    @property
    def posterior_precision(self) -> jnp.ndarray:
        self._check_H_init()
        return (self._H_factor * self.H
                + jnp.diag(self.prior_precision_diag))

    @property
    def posterior_scale(self) -> jnp.ndarray:
        if self._posterior_scale is None:
            self._posterior_scale = invsqrt_precision(self.posterior_precision)
        return self._posterior_scale

    @property
    def posterior_covariance(self) -> jnp.ndarray:
        scale = self.posterior_scale
        return scale @ scale.T

    @property
    def log_det_posterior_precision(self) -> jnp.ndarray:
        return jnp.linalg.slogdet(self.posterior_precision)[1]

    def square_norm(self, value):
        delta = value - self.mean
        return delta @ self.posterior_precision @ delta

    def functional_variance(self, Js):
        return jnp.einsum("ncp,pq,nkq->nck", Js, self.posterior_covariance, Js)

    def functional_covariance(self, Js):
        n, c, p = Js.shape
        Js = Js.reshape(n * c, p)
        return jnp.einsum("np,pq,mq->nm", Js, self.posterior_covariance, Js)

    def sample(self, n_samples: int = 100, key=None):
        key = key if key is not None else self.next_key()
        eps = jax.random.normal(key, (n_samples, self.n_params),
                                self.mean.dtype)
        return self.mean[None, :] + eps @ self.posterior_scale


class KronLaplace(ParametricLaplace):
    """Kronecker-factored posterior precision (reference :1507-1676).

    ``H`` holds the eigendecomposed factors after fit; raw accumulated
    factors stay in ``H_facs`` for online updates."""

    _key = ("all", "kron")

    def __init__(self, model, params, likelihood, damping: bool = False,
                 **kwargs):
        self.damping = damping
        self.H_facs: Optional[Kron] = None
        super().__init__(model, params, likelihood, **kwargs)

    def _init_H(self) -> None:
        # The first batch's factors define the block structure (base fit
        # starts accumulation from None) — this keeps mixed-structure KFAC
        # (exact-diag blocks for non-dense posterior params, e.g. GAT
        # attention vectors) intact, where a zero Kron.init_from_tree
        # would impose the wrong [B, A] structure.
        self.H = None

    def _check_H_init(self):
        if getattr(self, "H_facs", None) is None:
            raise AttributeError("Laplace not fitted. Run fit() first.")

    def _curv_closure(self, X, y, N: int, batch_idx: int = 0):
        # fold the batch index into the sketch/MC seed so estimator noise is
        # independent across batches and averages down over a multi-batch
        # fit (mirrors KFACOperator's seed=self.seed+i per batch)
        seed = getattr(self.backend, "seed", 0) + batch_idx
        return self.backend.kron(X, y, N=N, seed=seed)

    @staticmethod
    def _rescale_factors(kron: Kron, factor) -> Kron:
        """Scale only the A factor of two-factor groups (reference :1574-1578)."""
        return Kron([
            [g[0], g[1] * factor] if len(g) == 2 else [g[0]]
            for g in kron.kfacs])

    def fit(self, train_loader, override: bool = True) -> None:
        if override:
            self.H_facs = None

        if self.H_facs is not None:
            n_data_old = self.n_data
            from ..utils.data import dataset_size
            n_data_new = dataset_size(train_loader)
            self._init_H()
            self.H_facs = self._rescale_factors(
                self.H_facs, n_data_old / (n_data_old + n_data_new))

        super().fit(train_loader, override=override)

        if self.H_facs is None:
            self.H_facs = self.H
        else:
            self.H = self._rescale_factors(
                self.H, n_data_new / (n_data_new + n_data_old))
            self.H_facs = self.H_facs + self.H
        # decompose for inference; keep H_facs for further accumulation
        self.H = self.H_facs.decompose(damping=self.damping)

    @property
    def posterior_precision(self) -> KronDecomposed:
        self._check_H_init()
        return self.H * self._H_factor + self.prior_precision

    @property
    def log_det_posterior_precision(self) -> jnp.ndarray:
        if isinstance(self.H, Kron):  # fall back to diag prior
            return jnp.sum(jnp.log(self.prior_precision_diag))
        return self.posterior_precision.logdet()

    def square_norm(self, value):
        delta = value - self.mean
        if isinstance(self.H, Kron):
            return (delta * self.prior_precision_diag) @ delta
        return delta @ self.posterior_precision.bmm(delta, exponent=1)

    def functional_variance(self, Js):
        return self.posterior_precision.inv_square_form(Js)

    def functional_covariance(self, Js):
        n, c, p = Js.shape
        Js = Js.reshape(1, n * c, p)
        return self.posterior_precision.inv_square_form(Js)[0]

    def sample(self, n_samples: int = 100, key=None):
        key = key if key is not None else self.next_key()
        eps = jax.random.normal(key, (n_samples, self.n_params),
                                self.mean.dtype)
        samples = self.posterior_precision.bmm(eps, exponent=-0.5)
        return self.mean[None, :] + samples.reshape(n_samples, self.n_params)

    @ParametricLaplace.prior_precision.setter
    def prior_precision(self, prior_precision) -> None:
        ParametricLaplace.prior_precision.fset(self, prior_precision)
        if self._prior_precision.shape[0] not in (1, self.n_layers):
            raise ValueError("Prior precision for Kron either scalar or "
                             "per-layer.")

    def _pure_log_marglik(self, prior_precision, sigma_noise):
        # throwaway shallow copy: tracer-safe, no restore discipline
        # (see BaseLaplace._pure_log_marglik)
        la = copy.copy(self)
        la._prior_precision = jnp.atleast_1d(prior_precision)
        la._sigma_noise = jnp.asarray(sigma_noise)
        return la.log_likelihood - 0.5 * (la.log_det_ratio + la.scatter)

    def _H_for_state(self):
        assert isinstance(self.H_facs, Kron)
        return self.H_facs.kfacs

    def _load_H(self, H) -> None:
        self.H_facs = Kron(H)
        self.H = self.H_facs.decompose(damping=self.damping)


class DiagLaplace(ParametricLaplace):
    """Diagonal posterior precision (reference :1838-1919)."""

    _key = ("all", "diag")

    def _init_H(self) -> None:
        self.H = jnp.zeros(self.n_params)

    def _curv_closure(self, X, y, N: int, batch_idx: int = 0):
        return self.backend.diag(X, y, N=N)

    @property
    def posterior_precision(self) -> jnp.ndarray:
        self._check_H_init()
        return self._H_factor * self.H + self.prior_precision_diag

    @property
    def posterior_scale(self) -> jnp.ndarray:
        return 1.0 / jnp.sqrt(self.posterior_precision)

    @property
    def posterior_variance(self) -> jnp.ndarray:
        return 1.0 / self.posterior_precision

    @property
    def log_det_posterior_precision(self) -> jnp.ndarray:
        return jnp.sum(jnp.log(self.posterior_precision))

    def square_norm(self, value):
        delta = value - self.mean
        return delta @ (delta * self.posterior_precision)

    def functional_variance(self, Js):
        return jnp.einsum("ncp,p,nkp->nck", Js, self.posterior_variance, Js)

    def functional_covariance(self, Js):
        n, c, p = Js.shape
        Js = Js.reshape(n * c, p)
        return jnp.einsum("np,p,mp->nm", Js, self.posterior_variance, Js)

    def sample(self, n_samples: int = 100, key=None):
        key = key if key is not None else self.next_key()
        eps = jax.random.normal(key, (n_samples, self.n_params),
                                self.mean.dtype)
        return self.mean[None, :] + eps * self.posterior_scale[None, :]


class LowRankLaplace(ParametricLaplace):
    """Low-rank Hessian eigendecomposition + prior (reference :1679-1835).

    H ~ V diag(l) V^T from Lanczos iteration on the GGN/Hessian operator
    (replacing the reference's asdfghjkl backend); Woodbury identities give
    covariance actions at O(K^2 P) cost.
    """

    _key = ("all", "lowrank")

    def __init__(self, model, params, likelihood, rank: int = 10, **kwargs):
        self.rank = rank
        super().__init__(model, params, likelihood, **kwargs)

    def _init_H(self) -> None:
        self.H = None

    def fit(self, train_loader, override: bool = True) -> None:
        if not override:
            raise ValueError("LowRank LA does not support updating.")
        self.mean = self.backend.mean_vector()

        from ..curvature.spectrum import lanczos_eigh
        from ..utils.data import dataset_size

        data = list(train_loader)
        N = dataset_size(train_loader)
        op = GGNOperator(self.backend.model_fn, self.likelihood,
                         self.backend.w, data)
        evals, evecs = lanczos_eigh(op, k=min(self.rank, self.n_params),
                                    key=self.next_key())
        order = jnp.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        keep = evals > 1e-10
        self.H = (evecs[:, keep], evals[keep] * self.factor_correction())

        self.loss = sum(self.backend.loss(X, y) for X, y in data)
        first_X = data[0][0]
        self.n_outputs = self.backend.model_fn(self.backend.w, first_X).shape[-1]
        self.n_data = N

    def factor_correction(self):
        # GGNOperator works on the raw sum-loss; apply likelihood factor
        return self.backend.factor if self.likelihood == "regression" else 1.0

    @property
    def V(self) -> jnp.ndarray:
        return self.H[0]

    @property
    def Kinv(self) -> jnp.ndarray:
        """(diag(l)^-1 + V^T P0^-1 V)^-1 — the Woodbury core."""
        V, l = self.H
        inner = jnp.diag(1.0 / (l * self._H_factor)) \
            + V.T @ (V / self.prior_precision_diag[:, None])
        return jnp.linalg.inv(inner)

    @property
    def posterior_precision(self):
        self._check_H_init()
        V, l = self.H
        return V, l * self._H_factor, self.prior_precision_diag

    @property
    def posterior_covariance(self) -> jnp.ndarray:
        """P0^-1 - P0^-1 V Kinv V^T P0^-1 (Woodbury)."""
        V, l, p0 = self.posterior_precision
        A = V / p0[:, None]
        return jnp.diag(1.0 / p0) - A @ self.Kinv @ A.T

    @property
    def log_det_posterior_precision(self) -> jnp.ndarray:
        V, l, p0 = self.posterior_precision
        inner = jnp.eye(V.shape[1]) + (V * l[None, :]).T @ (V / p0[:, None])
        return jnp.linalg.slogdet(inner)[1] + jnp.sum(jnp.log(p0))

    def square_norm(self, value):
        delta = value - self.mean
        V, l, p0 = self.posterior_precision
        return delta @ (p0 * delta) + (delta @ V) @ ((delta @ V) * l)

    def functional_variance(self, Js):
        return jnp.einsum("ncp,pq,nkq->nck", Js, self.posterior_covariance, Js)

    def functional_covariance(self, Js):
        n, c, p = Js.shape
        Js = Js.reshape(n * c, p)
        return Js @ self.posterior_covariance @ Js.T

    def sample(self, n_samples: int = 100, key=None):
        key = key if key is not None else self.next_key()
        cov = self.posterior_covariance
        scale = jnp.linalg.cholesky(
            cov + 1e-10 * jnp.eye(cov.shape[0], dtype=cov.dtype))
        eps = jax.random.normal(key, (n_samples, self.n_params),
                                self.mean.dtype)
        return self.mean[None, :] + eps @ scale.T

    def _H_for_state(self):
        return {"V": self.H[0], "l": self.H[1]}

    def _load_H(self, H) -> None:
        self.H = (H["V"], H["l"])
