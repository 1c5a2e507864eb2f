"""GP (FunctionalLaplace) equivalence with parametric FullLaplace
(mirrors reference tests/test_functional_laplace.py:33-129)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu import (FullLaplace, FullLLLaplace, FunctionalLaplace,
                             FunctionalLLLaplace)
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader

SIGMA = 0.1


def regression_setup(seed=0, M=40, d=1, c=1):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    X = jax.random.uniform(keys[0], (M, d), minval=-3, maxval=3)
    w = jax.random.normal(keys[1], (d, c))
    y = jnp.sin(X @ w) + SIGMA * jax.random.normal(keys[2], (M, c))
    model = MLP([d, 8, c], act="tanh")
    params = model.init(jax.random.PRNGKey(seed + 5))
    return model, params, X, y, ArrayLoader(X, y)


@pytest.mark.parametrize("laplace_pair", [
    (FullLaplace, FunctionalLaplace),
    (FullLLLaplace, FunctionalLLLaplace),
])
@pytest.mark.parametrize("independent_outputs", [True, False])
@pytest.mark.slow
def test_gp_equivalence_regression(laplace_pair, independent_outputs):
    model, params, X, y, loader = regression_setup()
    parametric_cls, functional_cls = laplace_pair
    full_la = parametric_cls(model, params, "regression",
                             sigma_noise=SIGMA, prior_precision=2.0)
    gp_la = functional_cls(model, params, "regression", n_subset=len(X),
                           sigma_noise=SIGMA, prior_precision=2.0,
                           independent_outputs=independent_outputs)
    full_la.fit(loader)
    gp_la.fit(loader)

    X_test = jnp.linspace(-5, 5, 25).reshape(-1, 1)
    f_mu_full, f_var_full = full_la(X_test)
    f_mu_gp, f_var_gp = gp_la(X_test)
    np.testing.assert_allclose(np.asarray(f_mu_full), np.asarray(f_mu_gp),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(f_var_full), np.asarray(f_var_gp),
                               atol=1e-7)


@pytest.mark.parametrize("laplace_pair", [
    (FullLaplace, FunctionalLaplace),
    (FullLLLaplace, FunctionalLLLaplace),
])
@pytest.mark.slow
def test_gp_equivalence_regression_multivariate(laplace_pair, c=3):
    model, params, X, y, loader = regression_setup(d=c, c=c)
    parametric_cls, functional_cls = laplace_pair
    full_la = parametric_cls(model, params, "regression",
                             sigma_noise=SIGMA, prior_precision=2.0)
    gp_la = functional_cls(model, params, "regression", n_subset=len(X),
                           sigma_noise=SIGMA, prior_precision=2.0)
    full_la.fit(loader)
    gp_la.fit(loader)
    X_test = jax.random.normal(jax.random.PRNGKey(9), (15, c))
    f_mu_full, f_var_full = full_la(X_test)
    f_mu_gp, f_var_gp = gp_la(X_test)
    np.testing.assert_allclose(np.asarray(f_mu_full), np.asarray(f_mu_gp),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(f_var_full), np.asarray(f_var_gp),
                               atol=1e-7)


@pytest.mark.parametrize("independent_outputs", [True, False])
@pytest.mark.slow
def test_gp_equivalence_classification(independent_outputs, c=2):
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    M, d = 40, 4
    X = jax.random.normal(keys[0], (M, d))
    y = jax.random.randint(keys[1], (M,), 0, c)
    model = MLP([d, 8, c], act="tanh")
    params = model.init(keys[2])
    loader = ArrayLoader(X, y)

    full_la = FullLaplace(model, params, "classification",
                          prior_precision=1.0)
    gp_la = FunctionalLaplace(model, params, "classification", n_subset=M,
                              prior_precision=1.0,
                              independent_outputs=independent_outputs)
    full_la.fit(loader)
    gp_la.fit(loader)
    X_test = jax.random.normal(jax.random.PRNGKey(11), (20, d))
    p_full = full_la(X_test)
    p_gp = gp_la(X_test)
    assert p_full.shape == p_gp.shape
    np.testing.assert_array_equal(np.argmax(np.asarray(p_full), -1),
                                  np.argmax(np.asarray(p_gp), -1))


@pytest.mark.slow
def test_gp_marglik_and_joint():
    model, params, X, y, loader = regression_setup()
    gp_la = FunctionalLaplace(model, params, "regression", n_subset=len(X),
                              sigma_noise=SIGMA, prior_precision=2.0)
    gp_la.fit(loader)
    ml = gp_la.log_marginal_likelihood()
    assert np.isfinite(float(ml))
    # differentiable in (prior_prec, sigma)
    g = jax.grad(lambda pp: gp_la._pure_log_marglik(pp, gp_la.sigma_noise))(
        jnp.asarray(2.0))
    assert np.isfinite(float(g))
    # joint predictive covariance
    X_test = jnp.linspace(-2, 2, 7).reshape(-1, 1)
    f_mu, f_cov = gp_la(X_test, joint=True)
    assert f_cov.shape == (7, 7)
    # joint diagonal equals marginal variances
    _, f_var = gp_la(X_test)
    np.testing.assert_allclose(np.diag(np.asarray(f_cov)),
                               np.asarray(f_var).ravel(), atol=1e-8)


@pytest.mark.slow
def test_gp_subset_of_data():
    model, params, X, y, loader = regression_setup(M=50)
    gp_la = FunctionalLaplace(model, params, "regression", n_subset=20,
                              sigma_noise=SIGMA)
    gp_la.fit(loader)
    assert gp_la.K_MM.shape == (20, 20)
    with pytest.raises(ValueError):
        FunctionalLaplace(model, params, "regression", n_subset=60).fit(loader)
    with pytest.raises(ValueError):
        FunctionalLaplace(model, params, "regression", n_subset=10,
                          prior_precision=jnp.ones(3))
    # unfitted call errors
    la = FunctionalLaplace(model, params, "regression", n_subset=10)
    with pytest.raises(RuntimeError):
        la(X[:3])
