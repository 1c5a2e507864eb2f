"""Parameter-subset behavior (reference tests/test_subset_params.py analog:
there requires_grad=False excludes params; here path-based ``exclude``
patterns do) and dict-input model support (reference dict-input fixtures,
tests/utils.py:109-127)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu import DiagLaplace, FullLaplace
from laplace_gnn_tpu.curvature import GGNBackend
from laplace_gnn_tpu.nn import MLP, TapCollector
from laplace_gnn_tpu.utils.data import ArrayLoader

M, D, H, C = 8, 3, 4, 2


def setup():
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    model = MLP([D, H, C], act="tanh")
    params = model.init(keys[0])
    X = jax.random.normal(keys[1], (M, D))
    y = jax.random.randint(keys[2], (M,), 0, C)
    return model, params, X, y


def test_exclude_patterns_shrink_posterior():
    model, params, X, y = setup()
    full = GGNBackend(model, params, "classification", exclude=())
    no_bias = GGNBackend(model, params, "classification",
                         exclude=("bias",))
    assert no_bias.n_params == full.n_params - H - C
    first_frozen = GGNBackend(model, params, "classification",
                              exclude=("layers.0",))
    assert first_frozen.n_params == C * H + C


def test_excluded_params_get_no_curvature():
    model, params, X, y = setup()
    la = DiagLaplace(model, params, "classification", exclude=("layers.0",))
    la.fit(ArrayLoader(X, y))
    assert la.n_params == C * H + C
    assert np.isfinite(float(la.log_marginal_likelihood()))
    # predictive only linearizes the non-excluded subset
    p = la(X, link_approx="probit")
    assert p.shape == (M, C)


def test_exclusion_matches_reference_default():
    """'adj' and 'norms' substrings are excluded by default
    (laplace/baselaplace.py:119)."""
    from laplace_gnn_tpu.models import STEGCN
    key = jax.random.PRNGKey(0)
    Xf = jax.random.normal(key, (6, D))
    adj = jnp.zeros((6, 6))
    model = STEGCN(D, H, C, 2, Xf, adj, norm="layer")
    params = model.init(jax.random.PRNGKey(1))
    backend = GGNBackend(model, params, "classification")
    from laplace_gnn_tpu.utils import named_leaves
    names = [n for n, l in named_leaves(backend.w) if l is not None]
    assert all("adj" not in n and "norms" not in n for n in names)


class DictMLP:
    """HF-style dict-input model: apply(params, {'input_ids': x}) — the
    curvature/Laplace stack passes X through opaquely, so dict inputs work
    end-to-end (reference needed dict_key_x/dict_key_y plumbing)."""

    def __init__(self, dims):
        self.inner = MLP(dims, act="tanh")
        self.n_outputs = dims[-1]
        self.last_layer_closed_form = True

    def init(self, key, dtype=None):
        return self.inner.init(key, dtype)

    def apply(self, params, X, taps=None, rng=None, train=False):
        return self.inner.apply(params, X["input_ids"], taps=taps)

    def features(self, params, X):
        return self.inner.features(params, X["input_ids"])

    def tap_sites(self, params):
        return self.inner.tap_sites(params)

    def last_layer_path(self, params):
        return self.inner.last_layer_path(params)


class DictLoader:
    def __init__(self, X, y):
        self.X, self.y = X, y
        self.dataset_size = int(y.shape[0])

    def __iter__(self):
        yield {"input_ids": self.X}, self.y


def test_dict_input_model_laplace():
    model, _, X, y = setup()
    dmodel = DictMLP([D, H, C])
    params = dmodel.init(jax.random.PRNGKey(0))
    loader = DictLoader(X, y)
    for flavor in (FullLaplace, DiagLaplace):
        la = flavor(dmodel, params, "classification")
        la.fit(loader)
        assert np.isfinite(float(la.log_marginal_likelihood()))
        p = la({"input_ids": X}, link_approx="probit")
        np.testing.assert_allclose(np.asarray(p.sum(-1)), np.ones(M),
                                   atol=1e-6)
    # kron too (taps work through the wrapper)
    from laplace_gnn_tpu import KronLaplace
    la = KronLaplace(dmodel, params, "classification")
    la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))
