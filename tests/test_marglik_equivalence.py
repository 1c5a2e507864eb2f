"""Pin the fused marglik fast path against the Laplace class path.

``make_neg_marglik_fn`` (training/marglik_gnn.py) reimplements
KronDecomposed.logdet with semantic B-factor dedup, a cached static A0
eigendecomposition, and a likelihood-factor-dependent dedup key
(marglik_gnn.py::_kron_logdet) — exactly the kind of subtle fast path that
drifts. This module asserts, in f64 at ~1e-10, that its value equals
``-Laplace(...).fit(...).log_marginal_likelihood()`` across
{kron, diag, full} x {classification, regression} x {GCN, mixed-structure
GAT}, with and without the static-factor cache, and under non-unit
sigma_noise for regression.

Reference semantics being pinned: laplace/baselaplace.py:938-973 (marglik)
+ laplace/utils/matrix.py:371-394 (KronDecomposed.logdet).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.laplace import Laplace
from laplace_gnn_tpu.models import GAT, STEGCN
from laplace_gnn_tpu.training import make_neg_marglik_fn
from laplace_gnn_tpu.utils.data import ArrayLoader

N_NODES, D, HID, C = 20, 6, 8, 3
PRIOR_PREC = 0.7


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((N_NODES, D)))
    a = (rng.random((N_NODES, N_NODES)) < 0.25).astype(np.float64)
    adj = jnp.asarray(np.minimum(a + a.T, 1.0) * (1 - np.eye(N_NODES)))
    return X, adj


def _build(model_kind):
    X, adj = _graph()
    if model_kind == "gcn":
        model = STEGCN(D, HID, C, 2, X, adj, dropout_p=0.0)
    else:  # mixed-structure GAT: Kron for Linear sites + exact-diag blocks
        model = GAT(D, HID, C, 2, X, adj, heads=2, concat=False,
                    dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    return model, params


def _data(likelihood, n_train=14, seed=3):
    rng = np.random.default_rng(seed)
    idx = jnp.arange(n_train)
    if likelihood == "classification":
        y = jnp.asarray(rng.integers(0, C, n_train))
    else:
        y = jnp.asarray(rng.standard_normal((n_train, C)))
    return idx, y


def _class_path_neg_marglik(model, params, likelihood, structure, idx, y,
                            sigma_noise=1.0):
    la = Laplace(model, params, likelihood, subset_of_weights="all",
                 hessian_structure=structure, prior_precision=PRIOR_PREC,
                 sigma_noise=sigma_noise)
    la.fit(ArrayLoader(idx, y))
    return -float(la.log_marginal_likelihood())


@pytest.mark.parametrize("model_kind", ["gcn", "gat"])
@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.parametrize("structure", ["kron", "diag", "full"])
def test_fused_equals_class_path(model_kind, likelihood, structure):
    model, params = _build(model_kind)
    idx, y = _data(likelihood)
    fused = make_neg_marglik_fn(model, likelihood, structure, "all",
                                N=int(idx.shape[0]),
                                prior_precision=PRIOR_PREC)
    val = float(fused(params, idx, y))
    ref = _class_path_neg_marglik(model, params, likelihood, structure,
                                  idx, y)
    assert np.isfinite(val)
    np.testing.assert_allclose(val, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
def test_static_factor_cache_matches_uncached_and_class(likelihood):
    """The cached-A0 kron path (the production hyperstep) agrees with both
    the uncached fused path and the class path — guards the
    sqrt(likelihood_factor) bake-in (marglik_gnn.py::make_neg_marglik_fn)."""
    model, params = _build("gcn")
    assert model.first_tap_static
    idx, y = _data(likelihood)
    kw = dict(N=int(idx.shape[0]), prior_precision=PRIOR_PREC)
    cached = make_neg_marglik_fn(model, likelihood, "kron", "all",
                                 cache_static_factors=True, **kw)
    uncached = make_neg_marglik_fn(model, likelihood, "kron", "all",
                                   cache_static_factors=False, **kw)
    v_c, v_u = float(cached(params, idx, y)), float(uncached(params, idx, y))
    np.testing.assert_allclose(v_c, v_u, rtol=1e-10, atol=1e-10)
    ref = _class_path_neg_marglik(model, params, likelihood, "kron", idx, y)
    np.testing.assert_allclose(v_c, ref, rtol=1e-10, atol=1e-10)


def test_sigma_noise_matches_class_path():
    """Non-unit sigma_noise: H_factor scaling AND the Gaussian normalization
    constant both agree with BaseLaplace (reference baselaplace.py:211-232,
    :566-568)."""
    model, params = _build("gcn")
    idx, y = _data("regression")
    for structure in ("kron", "diag", "full"):
        fused = make_neg_marglik_fn(model, "regression", structure, "all",
                                    N=int(idx.shape[0]),
                                    prior_precision=PRIOR_PREC,
                                    sigma_noise=0.8)
        val = float(fused(params, idx, y))
        ref = _class_path_neg_marglik(model, params, "regression", structure,
                                      idx, y, sigma_noise=0.8)
        np.testing.assert_allclose(val, ref, rtol=1e-10, atol=1e-10)
