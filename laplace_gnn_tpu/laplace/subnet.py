"""Subnetwork Laplace: posterior over an index subset of the flat parameter
vector, plus the subnet selection strategies.

Counterparts of reference ``laplace/subnetlaplace.py`` (SubnetLaplace:15,
FullSubnetLaplace:175, DiagSubnetLaplace:201; GGN/EF-only restriction
:102-106) and ``laplace/utils/subnetmask.py`` (score-based and name-based
masks :208-436)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curvature.interface import EFBackend, GGNBackend
from ..utils.pytree import named_leaves
from .base import ParametricLaplace
from .flavors import DiagLaplace, FullLaplace


# ---------------------------------------------------------------------------
# Subnet masks (laplace/utils/subnetmask.py)
# ---------------------------------------------------------------------------

class SubnetMask:
    """Selects indices of the flat posterior vector (reference :28-155)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._indices = None

    @property
    def indices(self) -> jnp.ndarray:
        if self._indices is None:
            raise AttributeError("Subnetwork mask not selected. Run select().")
        return self._indices

    def select(self, train_loader=None) -> jnp.ndarray:
        if self._indices is not None:
            raise ValueError("Subnetwork mask already selected.")
        mask = self.get_subnet_mask(train_loader)
        mask = jnp.asarray(mask).astype(bool).ravel()
        self._indices = jnp.nonzero(mask)[0]
        return self._indices

    def get_subnet_mask(self, train_loader):
        raise NotImplementedError

    def _posterior_vector_template(self):
        backend = GGNBackend(self.model, self.params, "classification")
        from ..utils.pytree import tree_vector
        return tree_vector(backend.w), backend


class ScoreBasedSubnetMask(SubnetMask):
    """Keep the top ``n_params_subnet`` by score (reference :158-205)."""

    def __init__(self, model, params, n_params_subnet: int):
        super().__init__(model, params)
        if n_params_subnet is None:
            raise ValueError("Need to pass number of subnetwork parameters.")
        self.n_params_subnet = n_params_subnet
        self._param_scores = None

    def compute_param_scores(self, train_loader):
        raise NotImplementedError

    def get_subnet_mask(self, train_loader):
        theta, _ = self._posterior_vector_template()
        if self.n_params_subnet > theta.shape[0]:
            raise ValueError(
                f"Subnetwork ({self.n_params_subnet}) cannot be larger than "
                f"model ({theta.shape[0]}).")
        scores = jnp.ravel(self.compute_param_scores(train_loader))
        if scores.shape != theta.shape:
            raise ValueError("Parameter scores need to be of same shape as "
                             "parameter vector.")
        idx = jnp.argsort(scores)[-self.n_params_subnet:]
        mask = jnp.zeros_like(theta, dtype=bool).at[idx].set(True)
        return mask


class RandomSubnetMask(ScoreBasedSubnetMask):
    """(reference :208-212)"""

    def __init__(self, model, params, n_params_subnet, seed: int = 0):
        super().__init__(model, params, n_params_subnet)
        self.seed = seed

    def compute_param_scores(self, train_loader):
        theta, _ = self._posterior_vector_template()
        return jax.random.uniform(jax.random.PRNGKey(self.seed), theta.shape)


class LargestMagnitudeSubnetMask(ScoreBasedSubnetMask):
    """(reference :215-219)"""

    def compute_param_scores(self, train_loader):
        theta, _ = self._posterior_vector_template()
        return jnp.abs(theta)


class LargestVarianceDiagLaplaceSubnetMask(ScoreBasedSubnetMask):
    """Score = posterior variance from a diagonal Laplace fit
    (reference :222-249)."""

    def __init__(self, model, params, n_params_subnet,
                 diag_laplace_model: Optional[DiagLaplace] = None,
                 likelihood: str = "classification"):
        super().__init__(model, params, n_params_subnet)
        self.diag_laplace_model = diag_laplace_model
        self.likelihood = likelihood

    def compute_param_scores(self, train_loader):
        if train_loader is None:
            raise ValueError("Need to pass train loader for subnet "
                             "selection.")
        la = self.diag_laplace_model or DiagLaplace(
            self.model, self.params, self.likelihood)
        la.fit(train_loader)
        return la.posterior_variance


class LargestVarianceSWAGSubnetMask(ScoreBasedSubnetMask):
    """Score = SWAG diagonal variance (reference :252-307)."""

    def __init__(self, model, params, n_params_subnet,
                 likelihood: str = "classification", swag_n_snapshots=40,
                 swag_snapshot_freq=1, swag_lr=0.01):
        super().__init__(model, params, n_params_subnet)
        self.likelihood = likelihood
        self.swag_n_snapshots = swag_n_snapshots
        self.swag_snapshot_freq = swag_snapshot_freq
        self.swag_lr = swag_lr

    def compute_param_scores(self, train_loader):
        if train_loader is None:
            raise ValueError("Need to pass train loader for subnet "
                             "selection.")
        from ..utils.swag import fit_diagonal_swag_var
        return fit_diagonal_swag_var(
            self.model, self.params, train_loader, self.likelihood,
            n_snapshots_total=self.swag_n_snapshots,
            snapshot_freq=self.swag_snapshot_freq, lr=self.swag_lr)


class ParamNameSubnetMask(SubnetMask):
    """Select whole parameters by dotted path name (reference :310-350)."""

    def __init__(self, model, params, parameter_names: list[str]):
        super().__init__(model, params)
        self._names = list(parameter_names)

    def get_subnet_mask(self, train_loader):
        theta, backend = self._posterior_vector_template()
        names = [n for n, _ in named_leaves(backend.w)]
        missing = set(self._names) - set(names)
        if missing:
            raise ValueError(f"Parameters {sorted(missing)} do not exist in "
                             "model.")
        parts, cur = [], 0
        for n, leaf in named_leaves(backend.w):
            k = int(np.prod(leaf.shape))
            parts.append(jnp.full((k,), n in self._names, dtype=bool))
            cur += k
        return jnp.concatenate(parts)


class ModuleNameSubnetMask(ParamNameSubnetMask):
    """Select whole layers by name prefix (reference :353-404)."""

    def get_subnet_mask(self, train_loader):
        theta, backend = self._posterior_vector_template()
        prefixes = tuple(self._names)
        matched = set()
        parts = []
        for n, leaf in named_leaves(backend.w):
            k = int(np.prod(leaf.shape))
            hit = any(n == p or n.startswith(p + ".") for p in prefixes)
            if hit:
                matched.update(p for p in prefixes
                               if n == p or n.startswith(p + "."))
            parts.append(jnp.full((k,), hit, dtype=bool))
        missing = set(prefixes) - matched
        if missing:
            raise ValueError(f"Modules {sorted(missing)} do not exist in "
                             "model.")
        return jnp.concatenate(parts)


class LastLayerSubnetMask(SubnetMask):
    """All parameters of the last layer (reference :407-436)."""

    def get_subnet_mask(self, train_loader):
        theta, backend = self._posterior_vector_template()
        ll_path = self.model.last_layer_path(self.params)
        prefix = ".".join(str(p) for p in ll_path)
        parts = []
        for n, leaf in named_leaves(backend.w):
            k = int(np.prod(leaf.shape))
            hit = n == prefix or n.startswith(prefix + ".")
            parts.append(jnp.full((k,), hit, dtype=bool))
        return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# Subnet Laplace flavors (laplace/subnetlaplace.py)
# ---------------------------------------------------------------------------

class SubnetLaplace(ParametricLaplace):
    """Posterior over ``subnetwork_indices`` of the flat posterior vector;
    remaining parameters stay at their MAP values (reference :15-172)."""

    def __init__(self, model, params, likelihood, subnetwork_indices,
                 backend=None, **kwargs):
        backend = backend or GGNBackend
        if backend not in (GGNBackend, EFBackend):
            raise ValueError("SubnetLaplace can only be used with GGN and "
                             "EF backends.")
        self._subnet_indices_input = subnetwork_indices
        kwargs.setdefault("backend_kwargs", {})
        super().__init__(model, params, likelihood, backend=backend, **kwargs)
        self.n_params_subnet = self.n_params

    def _backend_extra(self) -> dict:
        idx = self._validate_indices(self._subnet_indices_input)
        return {"subnetwork_indices": idx}

    def _validate_indices(self, idx):
        """(reference :114-138)"""
        idx = jnp.asarray(idx)
        if idx.ndim != 1 or idx.shape[0] == 0:
            raise ValueError("Subnetwork indices must be non-empty "
                             "1-dimensional.")
        if not jnp.issubdtype(idx.dtype, jnp.integer):
            raise ValueError("Subnetwork indices must be integer.")
        if len(np.unique(np.asarray(idx))) != idx.shape[0]:
            raise ValueError("Subnetwork indices must not contain "
                             "duplicates.")
        return idx

    @property
    def subnetwork_indices(self):
        return self.backend.subnetwork_indices

    @property
    def prior_precision_diag(self) -> jnp.ndarray:
        """Prior over the subnet only (reference :140-167)."""
        pp = self.prior_precision
        if pp.shape[0] == 1:
            return pp[0] * jnp.ones(self.n_params_subnet)
        if pp.shape[0] == self.n_params_subnet:
            return pp
        raise ValueError("Mismatch of prior and model. Diagonal or scalar "
                         "prior.")

    def assemble_full_samples(self, subnet_samples) -> jnp.ndarray:
        """Insert subnet samples into the MAP vector (reference :169-172)."""
        from ..utils.pytree import tree_vector
        theta_full = tree_vector(self.backend.w)
        return jax.vmap(
            lambda s: theta_full.at[self.subnetwork_indices].set(s)
        )(subnet_samples)


class FullSubnetLaplace(SubnetLaplace, FullLaplace):
    """(reference :175-198)"""

    _key = ("subnetwork", "full")

    def sample(self, n_samples: int = 100, key=None):
        key = key if key is not None else self.next_key()
        eps = jax.random.normal(key, (n_samples, self.n_params_subnet))
        subnet_samples = self.mean[None, :] + eps @ self.posterior_scale
        return self.assemble_full_samples(subnet_samples)


class DiagSubnetLaplace(SubnetLaplace, DiagLaplace):
    """(reference :201-233)"""

    _key = ("subnetwork", "diag")

    def _check_jacobians(self, Js):
        if Js.shape[-1] != self.n_params_subnet:
            raise ValueError("Invalid Jacobians shape.")

    def sample(self, n_samples: int = 100, key=None):
        key = key if key is not None else self.next_key()
        eps = jax.random.normal(key, (n_samples, self.n_params_subnet))
        subnet_samples = self.mean[None, :] + eps * self.posterior_scale[None]
        return self.assemble_full_samples(subnet_samples)
