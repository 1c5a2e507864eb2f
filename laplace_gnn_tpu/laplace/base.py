"""BaseLaplace / ParametricLaplace.

TPU-native counterpart of reference ``laplace/baselaplace.py`` (BaseLaplace:51,
ParametricLaplace:713). The class is a thin stateful shell over pure jitted
functions; all heavy math lives in the curvature backends and the Kron
algebra, so `log_marginal_likelihood` is differentiable w.r.t. prior
precision, sigma noise — and, through the KFAC factors, the adjacency.

API parity notes:
  - constructor signature mirrors the reference (model, likelihood,
    sigma_noise, prior_precision, prior_mean, temperature, backend, ...),
    with the JAX-necessary addition of the explicit ``params`` pytree;
  - `fit(train_loader)` accumulates `loss` and `H` over batches
    (reference :778-854);
  - `log_marginal_likelihood` = loglik - 0.5*(log_det_ratio + scatter)
    (reference :938-973);
  - predictive `__call__(x, pred_type, link_approx, n_samples)`
    (reference :975-1072).
"""

from __future__ import annotations

import copy
import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curvature.interface import (BACKEND_REGISTRY, CurvatureBackend,
                                   GGNBackend)
from ..utils.data import dataset_size
from ..utils.pytree import DEFAULT_EXCLUDE, merge_split, tree_unflattener
from .enums import (HessianStructure, LinkApprox, Likelihood, PredType,
                    PriorStructure, SubsetOfWeights, TuningMethod)
from .predictive import glm_classification_predictive


class BaseLaplace:
    def __init__(self, model, params, likelihood: str,
                 sigma_noise: float = 1.0,
                 prior_precision: float = 1.0,
                 prior_mean: float = 0.0,
                 temperature: float = 1.0,
                 enable_backprop: bool = False,
                 dict_key_x: str = "input_ids",
                 dict_key_y: str = "labels",
                 backend: Optional[type] = None,
                 backend_kwargs: Optional[dict] = None,
                 exclude=DEFAULT_EXCLUDE):
        if likelihood not in [e.value for e in Likelihood]:
            raise ValueError(f"Invalid likelihood type {likelihood}")
        self.model = model
        # HF-style dict-input models (reference baselaplace.py:77-82): when
        # a loader yields a MutableMapping batch, the whole mapping is the
        # model input and the targets live under ``dict_key_y``
        self.dict_key_x = dict_key_x
        self.dict_key_y = dict_key_y
        # reward modeling keeps its identity: FIT uses the classification
        # likelihood, PREDICT uses regression (mean + variance of the
        # scalar reward) — reference baselaplace.py:57-63, :1060-1061
        self.likelihood = likelihood
        self.enable_backprop = enable_backprop

        fit_likelihood = (Likelihood.CLASSIFICATION.value
                          if likelihood == Likelihood.REWARD_MODELING.value
                          else likelihood)
        backend_cls = backend or self._default_backend()
        # curvature products are jvp-based and cannot trace through the
        # flash attention kernel's custom_vjp; the backend gets a clone
        # routed through the (mathematically identical) XLA attention,
        # while self.model keeps the fused kernel for predictions
        curv_model = model.jvp_safe() if hasattr(model, "jvp_safe") else model
        self.backend: CurvatureBackend = backend_cls(
            curv_model, params, fit_likelihood, exclude=exclude,
            **self._backend_extra(), **(backend_kwargs or {}))

        self.n_params = self.backend.n_params
        self.n_layers = len(jax.tree_util.tree_leaves(self.backend.w))
        self.prior_precision = prior_precision
        self.prior_mean = prior_mean
        self.sigma_noise = sigma_noise
        self.temperature = temperature

        self.loss: jnp.ndarray = jnp.asarray(0.0)
        self.n_data: int = 0
        self.n_outputs: Optional[int] = getattr(model, "n_outputs", None)
        self._rng = jax.random.PRNGKey(0)

    # -- hooks for subclasses ---------------------------------------------
    def _default_backend(self):
        return GGNBackend

    def _backend_extra(self) -> dict:
        return {}

    @property
    def params(self):
        return self.backend.params

    # -- priors ------------------------------------------------------------
    @property
    def prior_precision(self) -> jnp.ndarray:
        return self._prior_precision

    @prior_precision.setter
    def prior_precision(self, prior_precision) -> None:
        self._posterior_scale = None
        pp = jnp.atleast_1d(jnp.asarray(prior_precision, dtype=jnp.result_type(float)))
        if pp.ndim > 1:
            raise ValueError("Prior precision needs to be at most "
                             "one-dimensional tensor.")
        if pp.shape[0] not in (1, self.n_layers, self.n_params):
            raise ValueError("Prior precision needs to be a scalar, "
                             "per-layer, or diagonal.")
        self._prior_precision = pp

    @property
    def prior_mean(self) -> jnp.ndarray:
        return self._prior_mean

    @prior_mean.setter
    def prior_mean(self, prior_mean) -> None:
        pm = jnp.asarray(prior_mean, dtype=jnp.result_type(float))
        if pm.ndim > 1:
            raise ValueError("Invalid shape of prior mean.")
        self._prior_mean = pm

    @property
    def sigma_noise(self) -> jnp.ndarray:
        return self._sigma_noise

    @sigma_noise.setter
    def sigma_noise(self, sigma_noise) -> None:
        self._posterior_scale = None
        sn = jnp.asarray(sigma_noise, dtype=jnp.result_type(float))
        if sn.ndim == 1:
            if sn.shape[0] > 1:
                raise ValueError("Only homoscedastic output noise supported.")
            sn = sn[0]
        elif sn.ndim > 1:
            raise ValueError("Sigma noise needs to be scalar or "
                             "1-dimensional.")
        self._sigma_noise = sn

    @property
    def _H_factor(self) -> jnp.ndarray:
        """1 / sigma^2 / temperature (reference :566-568)."""
        return 1.0 / (self.sigma_noise ** 2) / self.temperature

    @property
    def prior_precision_diag(self) -> jnp.ndarray:
        """Scalar/layerwise/diag prior expanded to the full diagonal
        (reference :262-291)."""
        return self._expand_prior_precision(self.prior_precision)

    def _expand_prior_precision(self, pp: jnp.ndarray) -> jnp.ndarray:
        pp = jnp.atleast_1d(pp)
        if pp.shape[0] == 1:
            return pp[0] * jnp.ones(self.n_params)
        if pp.shape[0] == self.n_params:
            return pp
        if pp.shape[0] == self.n_layers:
            sizes = [int(np.prod(l.shape)) for l in
                     jax.tree_util.tree_leaves(self.backend.w)]
            return jnp.concatenate([
                p * jnp.ones(n) for p, n in zip(pp, sizes)])
        raise ValueError("Mismatch of prior and model. Diagonal, scalar, "
                         "or per-layer prior.")

    # -- likelihood bookkeeping -------------------------------------------
    @property
    def log_likelihood(self) -> jnp.ndarray:
        """(reference :211-232)"""
        factor = -self._H_factor
        if self.likelihood == Likelihood.REGRESSION.value:
            c = (self.n_data * self.n_outputs
                 * jnp.log(self.sigma_noise * math.sqrt(2 * math.pi)))
            return factor * self.loss - c
        return factor * self.loss

    def next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- interface ---------------------------------------------------------
    def fit(self, train_loader) -> None:
        raise NotImplementedError

    def log_marginal_likelihood(self, prior_precision=None, sigma_noise=None):
        raise NotImplementedError

    def predictive(self, x, pred_type, link_approx, n_samples):
        return self(x, pred_type=pred_type, link_approx=link_approx,
                    n_samples=n_samples)

    # -- prior-precision tuning (reference :342-539) ------------------------
    def optimize_prior_precision(self,
                                 pred_type: str = PredType.GLM.value,
                                 method: str = TuningMethod.MARGLIK.value,
                                 n_steps: int = 100,
                                 lr: float = 1e-1,
                                 init_prior_prec: float = 1.0,
                                 prior_structure: str = PriorStructure.SCALAR.value,
                                 val_loader=None,
                                 loss: Optional[Callable] = None,
                                 log_prior_prec_min: float = -4.0,
                                 log_prior_prec_max: float = 4.0,
                                 grid_size: int = 100,
                                 link_approx: str = LinkApprox.PROBIT.value,
                                 n_samples: int = 100,
                                 verbose: bool = False,
                                 progress_bar: bool = False) -> None:
        if method == TuningMethod.MARGLIK.value:
            init = jnp.atleast_1d(jnp.asarray(init_prior_prec,
                                              dtype=jnp.result_type(float)))
            if init.shape[0] == 1 and prior_structure != PriorStructure.SCALAR.value:
                n = {PriorStructure.LAYERWISE.value: self.n_layers,
                     PriorStructure.DIAG.value: self.n_params}[prior_structure]
                init = jnp.full((n,), init[0])

            import optax
            log_pp = jnp.log(init)
            opt = optax.adam(lr)
            state = opt.init(log_pp)

            neg_marglik = jax.jit(jax.value_and_grad(
                lambda lp: -self._pure_log_marglik(jnp.exp(lp),
                                                   self.sigma_noise)))
            for _ in range(n_steps):
                val, g = neg_marglik(log_pp)
                updates, state = opt.update(g, state)
                log_pp = optax.apply_updates(log_pp, updates)
            self.prior_precision = jnp.exp(log_pp)
        elif method == TuningMethod.GRIDSEARCH.value:
            if val_loader is None:
                raise ValueError("gridsearch requires a validation set "
                                 "DataLoader")
            interval = jnp.logspace(log_prior_prec_min, log_prior_prec_max,
                                    grid_size)
            self.prior_precision = self._gridsearch(
                loss, interval, val_loader, pred_type=pred_type,
                link_approx=link_approx, n_samples=n_samples)
        else:
            raise ValueError("For now only marglik and gridsearch is "
                             "implemented.")
        if verbose:
            print(f"Optimized prior precision is {self.prior_precision}.")

    def _pure_log_marglik(self, prior_precision, sigma_noise):
        raise NotImplementedError

    def _gridsearch(self, loss, interval, val_loader, pred_type, link_approx,
                    n_samples):
        from ..utils.metrics import nll_loss, mse_loss
        if loss is None:
            # _validate predicts with fitting=True (like the reference's
            # validate(), laplace/utils/utils.py:71), so reward modeling
            # scores as classification
            loss = (mse_loss
                    if self.likelihood == Likelihood.REGRESSION.value
                    else nll_loss)
        results, prior_precs = [], []
        for prior_prec in interval:
            self.prior_precision = prior_prec
            try:
                result = self._validate(val_loader, loss, pred_type,
                                        link_approx, n_samples)
                if not np.isfinite(result):
                    result = np.inf
            except Exception:
                result = np.inf
            results.append(result)
            prior_precs.append(prior_prec)
        return prior_precs[int(np.argmin(results))]

    def _unpack_batch(self, data):
        """(X, y) from a loader batch: a (X, y) tuple, or an HF-style
        MutableMapping whose whole mapping is the model input and whose
        targets live under ``dict_key_y`` (reference baselaplace.py:798-807,
        dict_key_x/dict_key_y :77-82)."""
        from collections.abc import MutableMapping
        if isinstance(data, MutableMapping):
            return data, data[self.dict_key_y]
        X, y = data
        return X, y

    def _validate(self, val_loader, loss, pred_type, link_approx, n_samples):
        """Offline predictive validation loop (laplace/utils/utils.py:40-101)."""
        outs, targets = [], []
        for data in val_loader:
            X, y = self._unpack_batch(data)
            pred = self(X, pred_type=pred_type, link_approx=link_approx,
                        n_samples=n_samples, fitting=True)
            if isinstance(pred, tuple):
                pred = pred[0]
            outs.append(np.asarray(pred))
            targets.append(np.asarray(y))
        return float(loss(np.concatenate(outs), np.concatenate(targets)))


class ParametricLaplace(BaseLaplace):
    """Gaussian posterior over a parameter subset (reference :713)."""

    def __init__(self, model, params, likelihood: str, **kwargs):
        super().__init__(model, params, likelihood, **kwargs)
        if not hasattr(self, "H"):
            self._init_H()
        self.mean: jnp.ndarray = self.backend.mean_vector()
        self._unflatten_w = tree_unflattener(self.backend.w)

    # -- Hessian bookkeeping ----------------------------------------------
    def _init_H(self) -> None:
        raise NotImplementedError

    def _check_H_init(self) -> None:
        if getattr(self, "H", None) is None:
            raise AttributeError("Laplace not fitted. Run fit() first.")

    def _curv_closure(self, X, y, N: int, batch_idx: int = 0):
        raise NotImplementedError

    def fit(self, train_loader, override: bool = True) -> None:
        """(reference :778-854)"""
        if override:
            self._init_H()
            self.loss = jnp.asarray(0.0)
            self.n_data = 0

        self.mean = self.backend.mean_vector()

        N = dataset_size(train_loader, dict_key_y=self.dict_key_y)
        first = True
        for i, data in enumerate(train_loader):
            X, y = self._unpack_batch(data)
            if first:
                out = self.backend.model_fn(self.backend.w, X)
                self.n_outputs = out.shape[-1]
                first = False
            loss_batch, H_batch = self._curv_closure(X, y, N=N, batch_idx=i)
            self.loss = self.loss + loss_batch
            self.H = H_batch if self.H is None else self.H + H_batch
        self.n_data += N

    # -- marglik terms ------------------------------------------------------
    @property
    def scatter(self) -> jnp.ndarray:
        """(theta_MAP - m0)^T P_0 (theta_MAP - m0) (reference :856-867)."""
        delta = self.mean - self.prior_mean
        return (delta * self.prior_precision_diag) @ delta

    @property
    def log_det_prior_precision(self) -> jnp.ndarray:
        return jnp.sum(jnp.log(self.prior_precision_diag))

    @property
    def log_det_posterior_precision(self) -> jnp.ndarray:
        raise NotImplementedError

    @property
    def log_det_ratio(self) -> jnp.ndarray:
        return self.log_det_posterior_precision - self.log_det_prior_precision

    def square_norm(self, value: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def log_prob(self, value: jnp.ndarray, normalized: bool = True):
        """(reference :920-936)"""
        if not normalized:
            return -self.square_norm(value) / 2
        return (-self.n_params / 2 * math.log(2 * math.pi)
                + self.log_det_posterior_precision / 2
                - self.square_norm(value) / 2)

    def log_marginal_likelihood(self, prior_precision=None, sigma_noise=None):
        """loglik - 0.5*(log_det_ratio + scatter) (reference :938-973)."""
        if prior_precision is not None:
            self.prior_precision = prior_precision
        if sigma_noise is not None:
            if self.likelihood != Likelihood.REGRESSION.value:
                raise ValueError("Can only change sigma_noise for regression.")
            self.sigma_noise = sigma_noise
        return self.log_likelihood - 0.5 * (self.log_det_ratio + self.scatter)

    def _pure_log_marglik(self, prior_precision, sigma_noise):
        """Functional marglik for jit/grad (same math as
        log_marginal_likelihood, without mutating self).

        Evaluated on a throwaway shallow copy so no tracer is ever written
        to the live object — safe under jit/grad with no restore
        discipline (the fitted state H/loss/mean is shared by reference
        and read-only here)."""
        la = copy.copy(self)
        la._prior_precision = jnp.atleast_1d(prior_precision)
        la._sigma_noise = jnp.asarray(sigma_noise)
        return la.log_likelihood - 0.5 * (la.log_det_ratio + la.scatter)

    # -- predictive ---------------------------------------------------------
    def functional_variance(self, Js: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def functional_covariance(self, Js: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _glm_predictive_distribution(self, X, joint: bool = False):
        Js, f_mu = self.backend._jacs(X)
        if joint:
            f_var = self.functional_covariance(Js)
        else:
            f_var = self.functional_variance(Js)
        return f_mu, f_var

    def _nn_predictive_samples(self, X, n_samples: int = 100, key=None,
                               likelihood: Optional[str] = None):
        key = key if key is not None else self.next_key()
        likelihood = likelihood if likelihood is not None else self.likelihood
        samples = self.sample(n_samples, key=key)
        outs = []
        for s in samples:
            w = self._unflatten_w(self._embed_sample(s))
            f = self.model.apply(merge_split(w, self.backend.frozen), X)
            outs.append(f)
        fs = jnp.stack(outs)
        if likelihood == Likelihood.CLASSIFICATION.value:
            fs = jax.nn.softmax(fs, axis=-1)
        return fs

    def _embed_sample(self, s: jnp.ndarray) -> jnp.ndarray:
        """Map a posterior sample (n_params,) into the full flat w vector
        (identity except for subnetwork Laplace)."""
        return s

    def __call__(self, x, pred_type: str = PredType.GLM.value,
                 joint: bool = False,
                 link_approx: str = LinkApprox.PROBIT.value,
                 n_samples: int = 100,
                 diagonal_output: bool = False,
                 key=None, fitting: bool = False, **model_kwargs):
        """(reference :975-1072)

        ``fitting`` only matters for reward modeling: the likelihood is
        classification during fitting and regression (reward mean +
        variance) at prediction time (reference :1028, :1060-1061)."""
        if pred_type not in (PredType.GLM.value, PredType.NN.value):
            raise ValueError("Only glm and nn supported as prediction types.")
        if link_approx not in [la.value for la in LinkApprox]:
            raise ValueError(f"Unsupported link approximation {link_approx}.")
        if pred_type == PredType.NN.value and link_approx != LinkApprox.MC.value:
            raise ValueError("Only mc link approximation is supported for nn "
                             "prediction type.")
        key = key if key is not None else self.next_key()

        likelihood = self.likelihood
        if likelihood == Likelihood.REWARD_MODELING.value:
            likelihood = (Likelihood.CLASSIFICATION.value if fitting
                          else Likelihood.REGRESSION.value)

        if pred_type == PredType.GLM.value:
            f_mu, f_var = self._glm_predictive_distribution(
                x, joint=joint and likelihood == Likelihood.REGRESSION.value)
            if likelihood == Likelihood.REGRESSION.value:
                if diagonal_output and not joint:
                    f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
                return f_mu, f_var
            return glm_classification_predictive(
                key, f_mu, f_var, link_approx, n_samples, diagonal_output)
        # nn predictive
        fs = self._nn_predictive_samples(x, n_samples, key=key,
                                         likelihood=likelihood)
        if likelihood == Likelihood.REGRESSION.value:
            return jnp.mean(fs, axis=0), jnp.var(fs, axis=0)
        return jnp.mean(fs, axis=0)

    def sample(self, n_samples: int = 100, key=None) -> jnp.ndarray:
        raise NotImplementedError

    def predictive_samples(self, x, pred_type: str = PredType.GLM.value,
                           n_samples: int = 100,
                           diagonal_output: bool = False, key=None):
        """Samples from the posterior predictive on ``x``
        (reference laplace/baselaplace.py:1074-1121): (n_samples, B, C);
        softmax-transformed for classification."""
        key = key if key is not None else self.next_key()
        if pred_type not in (PredType.GLM.value, PredType.NN.value):
            raise ValueError("Only glm and nn supported as prediction "
                             "types.")
        if pred_type == PredType.GLM.value:
            f_mu, f_var = self._glm_predictive_distribution(x)
            if diagonal_output:
                f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
            from ..ops.linalg import normal_samples
            fs = normal_samples(key, f_mu, f_var, n_samples)
            if self.likelihood == Likelihood.CLASSIFICATION.value:
                fs = jax.nn.softmax(fs, axis=-1)
            return fs
        return self._nn_predictive_samples(x, n_samples, key=key)

    # -- serialization ------------------------------------------------------
    def state_dict(self) -> dict:
        self._check_H_init()
        return {
            "mean": np.asarray(self.mean),
            "H": jax.tree_util.tree_map(np.asarray, self._H_for_state()),
            "loss": float(self.loss),
            "prior_mean": np.asarray(self.prior_mean),
            "prior_precision": np.asarray(self.prior_precision),
            "sigma_noise": np.asarray(self.sigma_noise),
            "n_data": self.n_data,
            "n_outputs": self.n_outputs,
            "likelihood": self.likelihood,
            "temperature": self.temperature,
            "cls_name": type(self).__name__,
        }

    def _H_for_state(self):
        return self.H

    def load_state_dict(self, state_dict: dict) -> None:
        if state_dict["cls_name"] != type(self).__name__:
            raise ValueError("Loading a wrong Laplace type. Make sure to use "
                             f"{state_dict['cls_name']}.")
        if state_dict["likelihood"] != self.likelihood:
            raise ValueError("Loading Laplace with a wrong likelihood.")
        self.mean = jnp.asarray(state_dict["mean"])
        self._load_H(jax.tree_util.tree_map(jnp.asarray, state_dict["H"]))
        self.loss = jnp.asarray(state_dict["loss"])
        self.prior_mean = state_dict["prior_mean"]
        self.prior_precision = state_dict["prior_precision"]
        self.sigma_noise = state_dict["sigma_noise"]
        self.n_data = state_dict["n_data"]
        self.n_outputs = state_dict["n_outputs"]
        self.temperature = state_dict["temperature"]

    def _load_H(self, H) -> None:
        self.H = H
