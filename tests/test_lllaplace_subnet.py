"""Last-layer and subnetwork Laplace (mirrors reference tests/test_lllaplace.py
and tests/test_subnetlaplace.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu import (DiagLLLaplace, DiagSubnetLaplace, FullLaplace,
                             FullLLLaplace, FullSubnetLaplace, KronLLLaplace,
                             Laplace)
from laplace_gnn_tpu.laplace.subnet import (LargestMagnitudeSubnetMask,
                                            LargestVarianceDiagLaplaceSubnetMask,
                                            LastLayerSubnetMask,
                                            ModuleNameSubnetMask,
                                            ParamNameSubnetMask,
                                            RandomSubnetMask)
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader

M, D, H, C = 10, 3, 4, 2


def setup(likelihood="classification", seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    model = MLP([D, H, C], act="tanh")
    params = model.init(keys[0])
    X = jax.random.normal(keys[1], (M, D))
    if likelihood == "classification":
        y = jax.random.randint(keys[2], (M,), 0, C)
    else:
        y = jax.random.normal(keys[2], (M, C))
    return model, params, X, y, ArrayLoader(X, y)


# --- last layer -------------------------------------------------------------

@pytest.mark.parametrize("flavor", [FullLLLaplace, KronLLLaplace,
                                    DiagLLLaplace])
@pytest.mark.slow
def test_lllaplace_basic(flavor):
    model, params, X, y, loader = setup()
    la = flavor(model, params, "classification")
    assert la.n_params == H * C + C          # last layer only
    la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))
    p = la(X, link_approx="probit")
    assert p.shape == (M, C)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), np.ones(M), atol=1e-6)


def test_lllaplace_equals_all_weights_on_linear_model():
    """For a 1-layer model, last-layer and all-weights Laplace coincide."""
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    model = MLP([D, C])  # single Linear
    params = model.init(keys[0])
    X = jax.random.normal(keys[1], (M, D))
    y = jax.random.randint(keys[2], (M,), 0, C)
    loader = ArrayLoader(X, y)
    la_ll = FullLLLaplace(model, params, "classification")
    la_all = FullLaplace(model, params, "classification")
    la_ll.fit(loader)
    la_all.fit(loader)
    np.testing.assert_allclose(np.asarray(la_ll.H), np.asarray(la_all.H),
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(la_ll(X, link_approx="probit")),
        np.asarray(la_all(X, link_approx="probit")), atol=1e-8)


def test_diag_ll_functional_variance_fast():
    model, params, X, y, loader = setup()
    la = DiagLLLaplace(model, params, "classification")
    la.fit(loader)
    f, var_fast = la.functional_variance_fast(X)
    Js, f2 = la.backend._jacs(X)
    var_full = la.functional_variance(Js)
    np.testing.assert_allclose(np.asarray(var_fast),
                               np.diagonal(np.asarray(var_full), axis1=-2,
                                           axis2=-1), atol=1e-9)


@pytest.mark.slow
def test_ll_gnn_uses_exact_jacobians():
    """GNN last layer feeds an aggregation; LL Laplace must use exact
    autodiff Jacobians, not the (invalid) features-x-I closed form."""
    from laplace_gnn_tpu.models import GCN
    key = jax.random.PRNGKey(0)
    Xf = jax.random.normal(key, (8, D))
    a = (jax.random.uniform(jax.random.PRNGKey(1), (8, 8)) < 0.4) * 1.0
    adj = jnp.minimum(a + a.T, 1.0)
    model = GCN(D, H, C, 2, Xf, adj)
    params = model.init(jax.random.PRNGKey(2))
    la = FullLLLaplace(model, params, "classification")
    idx = jnp.arange(8)
    y = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, C)
    la.fit(ArrayLoader(idx, y))
    Js, f = la.backend._jacs(idx)
    # exactness: finite-difference check on one weight entry
    from laplace_gnn_tpu.curvature.oracles import functorch_jacobian
    J_oracle = functorch_jacobian(la.backend.model_fn, la.backend.w, idx)
    np.testing.assert_allclose(np.asarray(Js), np.asarray(J_oracle),
                               atol=1e-10)


# --- subnetwork -------------------------------------------------------------

@pytest.mark.slow
def test_subnet_laplace_full():
    model, params, X, y, loader = setup()
    P = H * D + H + C * H + C
    idx = jnp.array([0, 5, 11, P - 1])
    la = Laplace(model, params, "classification",
                 subset_of_weights="subnetwork", hessian_structure="full",
                 subnetwork_indices=idx)
    assert isinstance(la, FullSubnetLaplace)
    la.fit(loader)
    assert la.n_params == 4
    assert np.isfinite(float(la.log_marginal_likelihood()))
    # samples assemble into full vectors with MAP elsewhere
    s = la.sample(7, key=jax.random.PRNGKey(0))
    assert s.shape == (7, P)
    from laplace_gnn_tpu.utils.pytree import tree_vector
    theta = np.asarray(tree_vector(la.backend.w))
    rest = np.setdiff1d(np.arange(P), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(s)[:, rest],
                               np.tile(theta[rest], (7, 1)), atol=1e-12)
    # nn predictive works
    p = la(X, pred_type="nn", link_approx="mc", n_samples=10)
    assert p.shape == (M, C)


def test_subnet_laplace_diag_and_validation():
    model, params, X, y, loader = setup()
    idx = jnp.array([1, 2, 3])
    la = DiagSubnetLaplace(model, params, "classification",
                           subnetwork_indices=idx)
    la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))
    # validation errors
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, params, "classification",
                          subnetwork_indices=jnp.array([0.5, 1.2]))
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, params, "classification",
                          subnetwork_indices=jnp.array([1, 1, 2]))
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, params, "classification",
                          subnetwork_indices=jnp.zeros((2, 2), dtype=int))
    from laplace_gnn_tpu.curvature import HessianBackend
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, params, "classification",
                          subnetwork_indices=idx, backend=HessianBackend)


def test_subnet_equals_full_when_all_indices():
    model, params, X, y, loader = setup()
    P = H * D + H + C * H + C
    la_sub = FullSubnetLaplace(model, params, "classification",
                               subnetwork_indices=jnp.arange(P))
    la_full = FullLaplace(model, params, "classification")
    la_sub.fit(loader)
    la_full.fit(loader)
    np.testing.assert_allclose(np.asarray(la_sub.H), np.asarray(la_full.H),
                               atol=1e-9)
    np.testing.assert_allclose(float(la_sub.log_marginal_likelihood()),
                               float(la_full.log_marginal_likelihood()),
                               atol=1e-8)


# --- masks ------------------------------------------------------------------

@pytest.mark.slow
def test_score_based_masks():
    model, params, X, y, loader = setup()
    P = H * D + H + C * H + C
    for mask_cls in [RandomSubnetMask, LargestMagnitudeSubnetMask]:
        mask = mask_cls(model, params, n_params_subnet=6)
        idx = mask.select(loader)
        assert idx.shape == (6,)
        with pytest.raises(ValueError):
            mask.select(loader)  # already selected
    mask = LargestVarianceDiagLaplaceSubnetMask(
        model, params, n_params_subnet=5, likelihood="classification")
    idx = mask.select(loader)
    assert idx.shape == (5,)
    with pytest.raises(ValueError):
        RandomSubnetMask(model, params, n_params_subnet=P + 1).select(loader)


@pytest.mark.slow
def test_name_based_masks():
    model, params, X, y, loader = setup()
    mask = ParamNameSubnetMask(model, params,
                               parameter_names=["layers.0.bias"])
    idx = mask.select(loader)
    assert idx.shape == (H,)
    with pytest.raises(ValueError):
        ParamNameSubnetMask(model, params,
                            parameter_names=["nope"]).select(loader)

    mask = ModuleNameSubnetMask(model, params, parameter_names=["layers.1"])
    idx = mask.select(loader)
    assert idx.shape == (C * H + C,)

    mask = LastLayerSubnetMask(model, params)
    idx = mask.select(loader)
    assert idx.shape == (C * H + C,)
    # last-layer subnet == last-layer laplace H
    la_sub = FullSubnetLaplace(model, params, "classification",
                               subnetwork_indices=idx)
    la_ll = FullLLLaplace(model, params, "classification")
    la_sub.fit(loader)
    la_ll.fit(loader)
    np.testing.assert_allclose(np.asarray(la_sub.H), np.asarray(la_ll.H),
                               atol=1e-9)
