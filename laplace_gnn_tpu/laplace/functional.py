"""FunctionalLaplace: GGN-Laplace as a Gaussian process (GP inference).

TPU-native counterpart of reference ``laplace/baselaplace.py``
FunctionalLaplace (:1922-2950) and ``laplace/lllaplace.py``
FunctionalLLLaplace (:507). Subset-of-data (SoD) GP with kernel
K = gamma^2 J J^T; classification uses the diagonal approximation of the
per-point likelihood Hessian Lambda (reference's documented choice).

Simplifications enabled by JAX: the SoD Jacobians are computed once and held
as a single (M, C, P) array, so kernel assembly is three einsums rather than
a double batch loop.
"""

from __future__ import annotations

import math
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.data import dataset_size
from .base import BaseLaplace
from .enums import Likelihood, LinkApprox, PredType
from .predictive import glm_classification_predictive


class FunctionalLaplace(BaseLaplace):
    _key = ("all", "gp")

    def __init__(self, model, params, likelihood: str, n_subset: int,
                 independent_outputs: bool = False, seed: int = 0, **kwargs):
        self._check_prior_precision(kwargs.get("prior_precision", 1.0))
        super().__init__(model, params, likelihood, **kwargs)
        self.n_subset = n_subset
        self.independent_outputs = independent_outputs
        self.seed = seed

        self.K_MM = None
        self.Sigma_inv = None      # cholesky of K_MM + Lambda^-1
        self.L = None              # diagonal likelihood Hessian at SoD points
        self.mu = None             # scatter-term mean
        self._J_M = None           # SoD jacobians (M, C, P)
        self._prior_factor_sod = None
        self.mean = self.backend.mean_vector()
        self._fitted = False

    @staticmethod
    def _check_prior_precision(prior_precision):
        pp = jnp.atleast_1d(jnp.asarray(prior_precision))
        if pp.ndim > 1 or pp.shape[0] != 1:
            raise ValueError("Only isotropic priors supported in "
                             "FunctionalLaplace")

    # restrict prior to scalar
    @BaseLaplace.prior_precision.setter
    def prior_precision(self, prior_precision):
        BaseLaplace.prior_precision.fset(self, prior_precision)
        if self._prior_precision.shape[0] != 1:
            raise ValueError("Only isotropic priors supported in "
                             "FunctionalLaplace")

    @property
    def gp_kernel_prior_variance(self):
        """(reference :2416-2418)"""
        return self._prior_factor_sod / self.prior_precision[0]

    def _jacobians(self, X):
        return self.backend.jacobians(X)

    # -- fit ---------------------------------------------------------------
    def fit(self, train_loader) -> None:
        """(reference :2156-2262)"""
        N = dataset_size(train_loader)
        self.n_data = N
        if self.n_subset > N:
            raise ValueError("`n_subset` must be less than or equal to the "
                             "original number of data points.")

        Xs, ys = [], []
        for X, y in train_loader:
            Xs.append(np.asarray(X))
            ys.append(np.asarray(y))
        X_all = np.concatenate(Xs)
        y_all = np.concatenate(ys)
        rng = np.random.default_rng(self.seed)
        idx = rng.choice(N, self.n_subset, replace=False)  # SoDSampler analog
        X_M = jnp.asarray(X_all[idx])
        y_M = jnp.asarray(y_all[idx])
        self._X_M, self._y_M = X_M, y_M
        self._prior_factor_sod = self.n_subset / self.n_data

        Js, f = self._jacobians(X_M)                     # (M, C, P), (M, C)
        self._J_M = Js
        self.n_outputs = f.shape[-1]
        M, C = f.shape

        if (self.likelihood == Likelihood.REGRESSION.value
                and self.n_outputs > 1 and self.independent_outputs):
            warnings.warn(
                "Using FunctionalLaplace with the diagonal approximation of "
                "a GP kernel is not recommended in the case of multivariate "
                "regression. Predictive variance will likely be "
                "overestimated.")

        self.loss = self.backend.loss(X_M, y_M)

        # likelihood Hessians Lambda (diag approximation, reference :2292-2302)
        if self.likelihood == Likelihood.REGRESSION.value:
            L_diag = jnp.ones((M, C))
        else:
            p = jax.nn.softmax(f, axis=-1)
            L_diag = p * (1 - p)
        if self.independent_outputs:
            self.L = [L_diag[:, c] for c in range(C)]
            self.K_MM = [jnp.einsum("ap,bp->ab", Js[:, c, :], Js[:, c, :])
                         for c in range(C)]
        else:
            self.L = L_diag.reshape(-1)                          # (M*C,)
            P = Js.shape[-1]
            Jf = Js.reshape(M * C, P)
            self.K_MM = Jf @ Jf.T                                # (MC, MC)

        # scatter mean (reference :2785-2807)
        shift = jnp.einsum("bcp,p->bc", Js, self.prior_mean - self.mean)
        if self.likelihood == Likelihood.REGRESSION.value:
            self.mu = y_M - (f + shift)
        else:
            self.mu = -shift

        self._build_Sigma_inv()
        self._fitted = True

    def _build_Sigma_inv(self) -> None:
        """Cholesky of gamma^2 K_MM + Lambda^-1 (reference :2116-2143)."""
        gamma2 = self.gp_kernel_prior_variance
        if self.independent_outputs:
            self.Sigma_inv = [
                jnp.linalg.cholesky(
                    gamma2 * K + jnp.diag(jnp.nan_to_num(
                        1.0 / (self._H_factor * L), posinf=10.0)))
                for K, L in zip(self.K_MM, self.L)]
        else:
            self.Sigma_inv = jnp.linalg.cholesky(
                gamma2 * self.K_MM + jnp.diag(jnp.nan_to_num(
                    1.0 / (self._H_factor * self.L), posinf=10.0)))

    # -- predictive --------------------------------------------------------
    def _glm_predictive_distribution(self, X, joint: bool = False):
        Js, f_mu = self._jacobians(X)
        f_var = (self.functional_covariance(Js) if joint
                 else self.functional_variance(Js))
        if joint:
            f_mu = f_mu.ravel()
        return f_mu, f_var

    def functional_variance(self, Js_star) -> jnp.ndarray:
        """k_** - K_*M (K_MM + L^-1)^-1 K_M* (reference :2420-2455)."""
        gamma2 = self.gp_kernel_prior_variance
        J_M = self._J_M
        if self.independent_outputs:
            C = self.n_outputs
            vars_c = []
            for c in range(C):
                k_ss = gamma2 * jnp.sum(Js_star[:, c, :] ** 2, axis=-1)
                K_sM = gamma2 * jnp.einsum("bp,mp->bm", Js_star[:, c, :],
                                           J_M[:, c, :])
                v = jax.scipy.linalg.solve_triangular(
                    self.Sigma_inv[c], K_sM.T, lower=True).T
                vars_c.append(k_ss - jnp.sum(v * v, axis=-1))
            return jax.vmap(jnp.diag)(jnp.stack(vars_c, axis=-1))
        K_ss = gamma2 * jnp.einsum("bcp,bep->bce", Js_star, Js_star)
        M, C, P = J_M.shape
        # test-time output dim may differ from the fit-time C (reward
        # modeling fits on (B, 2) pairs, predicts (B, 1) rewards)
        Cs = Js_star.shape[1]
        K_sM = gamma2 * jnp.einsum("bcp,mep->bmec", Js_star,
                                   J_M).reshape(Js_star.shape[0], M * C, Cs)
        v = jax.vmap(lambda k: jax.scipy.linalg.solve_triangular(
            self.Sigma_inv, k, lower=True))(K_sM)
        return K_ss - jnp.einsum("bcm,bcn->bmn", v, v)

    def functional_covariance(self, Js_star) -> jnp.ndarray:
        """Joint covariance over all test points (reference :2457-2495)."""
        gamma2 = self.gp_kernel_prior_variance
        J_M = self._J_M
        B, C, P = Js_star.shape
        if self.independent_outputs:
            covs = []
            for c in range(C):
                k_ss = gamma2 * jnp.einsum("ap,bp->ab", Js_star[:, c, :],
                                           Js_star[:, c, :])
                K_sM = gamma2 * jnp.einsum("bp,mp->bm", Js_star[:, c, :],
                                           J_M[:, c, :])
                v = jax.scipy.linalg.solve_triangular(
                    self.Sigma_inv[c], K_sM.T, lower=True).T
                covs.append(k_ss - v @ v.T)
            # (B, B, C) -> (B, B, C, C) diag-embedded -> (BC, BC)
            f_var = jax.vmap(jax.vmap(jnp.diag))(jnp.stack(covs, axis=-1))
        else:
            K_ss = gamma2 * jnp.einsum("acp,bep->abce", Js_star, Js_star)
            M = J_M.shape[0]
            K_sM = gamma2 * jnp.einsum("bcp,mep->bmec",
                                       Js_star, J_M).reshape(B, M * C, C)
            v = jax.vmap(lambda k: jax.scipy.linalg.solve_triangular(
                self.Sigma_inv, k, lower=True))(K_sM)
            f_var = K_ss - jnp.einsum("acm,bcn->abmn", v, v)
        return jnp.transpose(f_var, (0, 2, 1, 3)).reshape(B * C, B * C)

    def __call__(self, x, pred_type: str = PredType.GP.value,
                 joint: bool = False,
                 link_approx: str = LinkApprox.PROBIT.value,
                 n_samples: int = 100, diagonal_output: bool = False,
                 key=None, fitting: bool = False, **model_kwargs):
        if pred_type != PredType.GP.value:
            raise ValueError("Only gp supported as prediction type.")
        if not self._fitted:
            raise RuntimeError("Functional Laplace has not been fitted to "
                               "any iterable of (feature, target) pairs.")
        key = key if key is not None else self.next_key()
        # reward modeling: classification while fitting, regression at
        # prediction (reference :2327)
        likelihood = self.likelihood
        if likelihood == Likelihood.REWARD_MODELING.value:
            likelihood = (Likelihood.CLASSIFICATION.value if fitting
                          else Likelihood.REGRESSION.value)
        f_mu, f_var = self._glm_predictive_distribution(
            x, joint=joint and likelihood == Likelihood.REGRESSION.value)
        if likelihood == Likelihood.REGRESSION.value:
            if diagonal_output and not joint:
                f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
            return f_mu, f_var
        return glm_classification_predictive(
            key, f_mu, f_var, link_approx, n_samples, diagonal_output)

    def predictive_samples(self, x, pred_type: str = PredType.GP.value,
                           n_samples: int = 100,
                           diagonal_output: bool = False, key=None):
        """(reference :2375-2414)"""
        if pred_type != PredType.GP.value:
            raise ValueError("Only gp supported as prediction type.")
        key = key if key is not None else self.next_key()
        f_mu, f_var = self._glm_predictive_distribution(x)
        if diagonal_output:
            f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
        from ..ops.linalg import normal_samples
        fs = normal_samples(key, f_mu, f_var, n_samples)
        if self.likelihood == Likelihood.CLASSIFICATION.value:
            fs = jax.nn.softmax(fs, axis=-1)
        return fs

    # -- marglik -----------------------------------------------------------
    @property
    def log_det_ratio(self) -> jnp.ndarray:
        """(reference :2547-2600)"""
        gamma2 = self.gp_kernel_prior_variance
        if self.likelihood == Likelihood.REGRESSION.value:
            if self.independent_outputs:
                return sum(
                    jnp.linalg.slogdet(
                        gamma2 * K + self.sigma_noise ** 2
                        * jnp.eye(K.shape[0]))[1]
                    for K in self.K_MM)
            K = self.K_MM
            return jnp.linalg.slogdet(
                gamma2 * K + self.sigma_noise ** 2 * jnp.eye(K.shape[0]))[1]
        if self.independent_outputs:
            out = 0.0
            for K, L in zip(self.K_MM, self.L):
                W = jnp.sqrt(self._H_factor * L)
                out = out + jnp.linalg.slogdet(
                    W[:, None] * gamma2 * K * W[None, :]
                    + jnp.eye(K.shape[0]))[1]
            return out
        W = jnp.sqrt(self._H_factor * self.L)
        return jnp.linalg.slogdet(
            W[:, None] * gamma2 * self.K_MM * W[None, :]
            + jnp.eye(self.K_MM.shape[0]))[1]

    @property
    def scatter(self) -> jnp.ndarray:
        """(reference :2602-2650)"""
        eps = 1e-5
        noise = (self.sigma_noise ** 2
                 if self.likelihood == Likelihood.REGRESSION.value else eps)
        gamma2 = self.gp_kernel_prior_variance
        if self.independent_outputs:
            out = 0.0
            for c, K in enumerate(self.K_MM):
                m = K.shape[0]
                chol = jnp.linalg.cholesky(gamma2 * K + noise * jnp.eye(m))
                t = jax.scipy.linalg.solve_triangular(chol, self.mu[:, c],
                                                      lower=True)
                out = out + jnp.dot(t, t)
            return out
        m = self.K_MM.shape[0]
        chol = jnp.linalg.cholesky(gamma2 * self.K_MM + noise * jnp.eye(m))
        t = jax.scipy.linalg.solve_triangular(chol, self.mu.reshape(-1),
                                              lower=True)
        return jnp.dot(t, t)

    def log_marginal_likelihood(self, prior_precision=None, sigma_noise=None):
        if prior_precision is not None:
            self.prior_precision = prior_precision
            self._build_Sigma_inv()
        if sigma_noise is not None:
            if self.likelihood != Likelihood.REGRESSION.value:
                raise ValueError("Can only change sigma_noise for "
                                 "regression.")
            self.sigma_noise = sigma_noise
            self._build_Sigma_inv()
        return self.log_likelihood - 0.5 * (self.log_det_ratio + self.scatter)

    def _pure_log_marglik(self, prior_precision, sigma_noise):
        old_pp, old_sn = self._prior_precision, self._sigma_noise
        try:
            self._prior_precision = jnp.atleast_1d(prior_precision)
            self._sigma_noise = jnp.asarray(sigma_noise)
            return self.log_likelihood - 0.5 * (self.log_det_ratio
                                                + self.scatter)
        finally:
            self._prior_precision, self._sigma_noise = old_pp, old_sn

    def optimize_prior_precision(self, pred_type: str = PredType.GP.value,
                                 **kwargs) -> None:
        if pred_type != PredType.GP.value:
            raise ValueError("Only gp pred_type is supported.")
        if kwargs.get("prior_structure", "scalar") != "scalar":
            raise ValueError("Only isotropic priors supported in "
                             "FunctionalLaplace")
        if kwargs.get("method", "marglik") == "marglik":
            warnings.warn(
                "Use of method='marglik' in case of FunctionalLaplace is "
                "discouraged, rather use method='gridsearch'.")
        super().optimize_prior_precision(pred_type=pred_type, **kwargs)
        self._build_Sigma_inv()

    @property
    def log_likelihood(self) -> jnp.ndarray:
        factor = -self._H_factor
        if self.likelihood == Likelihood.REGRESSION.value:
            c = (self.n_subset * self.n_outputs
                 * jnp.log(self.sigma_noise * math.sqrt(2 * math.pi)))
            return factor * self.loss - c
        return factor * self.loss


class FunctionalLLLaplace(FunctionalLaplace):
    """Last-layer GP Laplace (reference laplace/lllaplace.py:507)."""

    _key = ("last_layer", "gp")

    def _backend_extra(self) -> dict:
        return {"last_layer": True}

    def _jacobians(self, X):
        return self.backend._jacs(X)
