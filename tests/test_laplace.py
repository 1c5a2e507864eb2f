"""Laplace flavors: dispatcher, fit, marglik, predictives, sampling,
serialization (mirrors reference tests/test_laplace.py + test_baselaplace.py
strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu import (DiagLaplace, DiagLLLaplace, FullLaplace,
                             FullLLLaplace, FunctionalLaplace, KronLaplace,
                             KronLLLaplace, Laplace, LowRankLaplace)
from laplace_gnn_tpu.curvature import EFBackend, GGNBackend, HessianBackend
from laplace_gnn_tpu.curvature.oracles import functorch_ggn
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader

M, D, H, C = 12, 3, 5, 2


def setup(likelihood, seed=0, batch_size=None):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    model = MLP([D, H, C], act="tanh")
    params = model.init(keys[0])
    X = jax.random.normal(keys[1], (M, D))
    if likelihood == "classification":
        y = jax.random.randint(keys[2], (M,), 0, C)
    else:
        y = jax.random.normal(keys[2], (M, C))
    loader = ArrayLoader(X, y, batch_size=batch_size or M)
    return model, params, X, y, loader


def test_dispatcher_all_keys():
    model, params, X, y, loader = setup("classification")
    cases = {
        ("all", "full"): FullLaplace,
        ("all", "kron"): KronLaplace,
        ("all", "diag"): DiagLaplace,
        ("all", "lowrank"): LowRankLaplace,
        ("last_layer", "full"): FullLLLaplace,
        ("last_layer", "kron"): KronLLLaplace,
        ("last_layer", "diag"): DiagLLLaplace,
    }
    for (sow, hs), cls in cases.items():
        la = Laplace(model, params, "classification",
                     subset_of_weights=sow, hessian_structure=hs)
        assert isinstance(la, cls), (sow, hs)
    la = Laplace(model, params, "classification", subset_of_weights="all",
                 hessian_structure="gp", n_subset=M)
    assert isinstance(la, FunctionalLaplace)
    with pytest.raises(ValueError):
        Laplace(model, params, "classification",
                subset_of_weights="subnetwork", hessian_structure="kron")


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.slow
def test_full_laplace_fit_marglik(likelihood):
    model, params, X, y, loader = setup(likelihood)
    la = FullLaplace(model, params, likelihood)
    la.fit(loader)
    assert la.n_data == M
    assert la.n_outputs == C
    # H equals backend-full on the whole data
    _, H_ref = la.backend.full(X, y)
    np.testing.assert_allclose(np.asarray(la.H), np.asarray(H_ref),
                               atol=1e-10)
    ml = la.log_marginal_likelihood()
    assert np.isfinite(float(ml))
    # differentiable w.r.t. prior precision
    g = jax.grad(lambda pp: la._pure_log_marglik(pp, la.sigma_noise))(
        jnp.asarray(1.0))
    assert np.isfinite(float(g))
    # decomposition identity: marglik = loglik - 0.5*(logdetratio + scatter)
    np.testing.assert_allclose(
        float(ml),
        float(la.log_likelihood - 0.5 * (la.log_det_ratio + la.scatter)))


@pytest.mark.slow
def test_full_batched_fit_equals_single_batch():
    model, params, X, y, _ = setup("classification")
    la1 = FullLaplace(model, params, "classification")
    la1.fit(ArrayLoader(X, y, batch_size=M))
    la2 = FullLaplace(model, params, "classification")
    la2.fit(ArrayLoader(X, y, batch_size=4))
    np.testing.assert_allclose(np.asarray(la1.H), np.asarray(la2.H),
                               atol=1e-9)
    np.testing.assert_allclose(float(la1.loss), float(la2.loss), atol=1e-9)


@pytest.mark.slow
def test_kron_laplace_logdet_close_to_full_structure():
    model, params, X, y, loader = setup("classification")
    la = KronLaplace(model, params, "classification")
    la.fit(loader)
    ml = la.log_marginal_likelihood()
    assert np.isfinite(float(ml))
    # posterior precision dense reconstruction vs manual
    P = la.posterior_precision
    dense = np.asarray(P.to_matrix(exponent=1))
    assert dense.shape == (la.n_params, la.n_params)
    # logdet consistent with dense
    np.testing.assert_allclose(float(P.logdet()),
                               np.linalg.slogdet(dense)[1], atol=1e-6)
    # marglik differentiable in layerwise prior
    pp = jnp.ones(la.n_layers)
    g = jax.grad(lambda p: la._pure_log_marglik(p, la.sigma_noise))(pp)
    assert np.isfinite(np.asarray(g)).all()


def test_kron_online_fit_accumulates():
    model, params, X, y, _ = setup("classification")
    la = KronLaplace(model, params, "classification")
    la.fit(ArrayLoader(X, y))
    kfacs_once = [np.asarray(F) for g in la.H_facs.kfacs for F in g]
    la.fit(ArrayLoader(X, y), override=False)
    assert la.n_data == 2 * M
    kfacs_twice = [np.asarray(F) for g in la.H_facs.kfacs for F in g]
    # same data twice: A-factors (normalized per N) stay equal, B doubles
    np.testing.assert_allclose(kfacs_twice[0], 2 * kfacs_once[0], atol=1e-8)


def test_diag_laplace_equals_full_diagonal():
    model, params, X, y, loader = setup("classification")
    full = FullLaplace(model, params, "classification")
    full.fit(loader)
    diag = DiagLaplace(model, params, "classification")
    diag.fit(loader)
    np.testing.assert_allclose(np.asarray(diag.H),
                               np.diag(np.asarray(full.H)), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(diag.posterior_variance),
        1 / np.diag(np.asarray(full.posterior_precision)), atol=1e-10)


def test_ggn_diag_row_chunked_matches_unchunked():
    """The memory-bounded GGN diagonal (Jacobian row chunks accumulated on
    the fly, incl. ragged padding masks) is exact."""
    model, params, X, y, loader = setup("classification")
    be = GGNBackend(model, params, "classification")
    loss0, h0 = be.diag(X, y, row_chunk=10 ** 9)
    for chunk in (1, 3, 4):
        loss1, h1 = be.diag(X, y, row_chunk=chunk)
        np.testing.assert_allclose(float(loss1), float(loss0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   atol=1e-10)


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
@pytest.mark.slow
def test_glm_predictive_classification(flavor):
    model, params, X, y, loader = setup("classification")
    la = flavor(model, params, "classification")
    la.fit(loader)
    for link in ["probit", "mc", "bridge", "bridge_norm"]:
        p = la(X, pred_type="glm", link_approx=link, n_samples=200)
        assert p.shape == (M, C)
        np.testing.assert_allclose(np.asarray(p.sum(-1)), np.ones(M),
                                   atol=1e-6)
        assert (np.asarray(p) >= 0).all()


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
def test_glm_predictive_regression(flavor):
    model, params, X, y, loader = setup("regression")
    la = flavor(model, params, "regression")
    la.fit(loader)
    f_mu, f_var = la(X, pred_type="glm")
    assert f_mu.shape == (M, C)
    assert f_var.shape == (M, C, C)
    assert (np.diagonal(np.asarray(f_var), axis1=-2, axis2=-1) >= 0).all()
    # joint predictive
    f_mu2, f_cov = la(X, pred_type="glm", joint=True)
    assert f_cov.shape == (M * C, M * C)
    # marginal variances agree with joint diagonal blocks
    jd = np.asarray(f_cov).reshape(M, C, M, C)
    for i in range(M):
        np.testing.assert_allclose(np.asarray(f_var[i]), jd[i, :, i, :],
                                   atol=1e-8)


@pytest.mark.slow
def test_nn_predictive():
    model, params, X, y, loader = setup("classification")
    la = DiagLaplace(model, params, "classification")
    la.fit(loader)
    p = la(X, pred_type="nn", link_approx="mc", n_samples=50)
    assert p.shape == (M, C)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), np.ones(M), atol=1e-6)
    with pytest.raises(ValueError):
        la(X, pred_type="nn", link_approx="probit")


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
@pytest.mark.slow
def test_sample_statistics(flavor):
    model, params, X, y, loader = setup("classification")
    la = flavor(model, params, "classification")
    la.fit(loader)
    la.prior_precision = 100.0  # tight posterior
    s = la.sample(5000, key=jax.random.PRNGKey(0))
    assert s.shape == (5000, la.n_params)
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(la.mean),
                               atol=0.05)


def test_prior_precision_validation():
    model, params, X, y, loader = setup("classification")
    la = FullLaplace(model, params, "classification")
    with pytest.raises(ValueError):
        la.prior_precision = jnp.ones((2, 2))
    with pytest.raises(ValueError):
        la.prior_precision = jnp.ones(7)  # not 1, n_layers, or n_params
    la.prior_precision = jnp.ones(la.n_layers)
    kron = KronLaplace(model, params, "classification")
    with pytest.raises(ValueError):
        kron.prior_precision = jnp.ones(kron.n_params)


def test_optimize_prior_precision_marglik():
    model, params, X, y, loader = setup("classification")
    la = DiagLaplace(model, params, "classification")
    la.fit(loader)
    ml_before = float(la.log_marginal_likelihood())
    la.optimize_prior_precision(method="marglik", n_steps=50, lr=0.1)
    ml_after = float(la.log_marginal_likelihood())
    assert ml_after >= ml_before - 1e-6


def test_optimize_prior_precision_gridsearch():
    model, params, X, y, loader = setup("classification")
    la = DiagLaplace(model, params, "classification")
    la.fit(loader)
    la.optimize_prior_precision(method="gridsearch", val_loader=loader,
                                grid_size=10)
    assert float(la.prior_precision[0]) > 0


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
def test_serialization_roundtrip(flavor):
    model, params, X, y, loader = setup("classification")
    la = flavor(model, params, "classification")
    la.fit(loader)
    sd = la.state_dict()
    la2 = flavor(model, params, "classification")
    la2.load_state_dict(sd)
    np.testing.assert_allclose(float(la2.log_marginal_likelihood()),
                               float(la.log_marginal_likelihood()),
                               atol=1e-10)
    p1 = la(X, link_approx="probit")
    p2 = la2(X, link_approx="probit")
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-8)
    # wrong-class error
    other = DiagLaplace if flavor is not DiagLaplace else FullLaplace
    la3 = other(model, params, "classification")
    with pytest.raises(ValueError):
        la3.load_state_dict(sd)


@pytest.mark.slow
def test_lowrank_laplace():
    model, params, X, y, loader = setup("classification")
    la = LowRankLaplace(model, params, "classification", rank=8)
    la.fit(loader)
    ml = la.log_marginal_likelihood()
    assert np.isfinite(float(ml))
    p = la(X, link_approx="probit")
    assert p.shape == (M, C)
    # full-rank LowRank == FullLaplace (GGN) quantities
    la_full = LowRankLaplace(model, params, "classification",
                             rank=la.n_params)
    la_full.fit(loader)
    full = FullLaplace(model, params, "classification")
    full.fit(loader)
    np.testing.assert_allclose(float(la_full.log_det_posterior_precision),
                               float(full.log_det_posterior_precision),
                               rtol=1e-4)


@pytest.mark.slow
def test_backend_choices():
    model, params, X, y, loader = setup("classification")
    for backend in [GGNBackend, EFBackend, HessianBackend]:
        la = FullLaplace(model, params, "classification", backend=backend)
        la.fit(loader)
        assert np.isfinite(float(la.log_marginal_likelihood()))
    la = FullLaplace(model, params, "classification", backend=GGNBackend,
                     backend_kwargs={"stochastic": True, "mc_samples": 4})
    la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))


def test_kron_laplace_sketch_backend():
    """type-2-sketch reaches the Laplace classes through backend_kwargs and
    seed-averaged fits converge to the exact type-2 marglik."""
    model, params, X, y, loader = setup("classification")
    la0 = KronLaplace(model, params, "classification")
    la0.fit(loader)
    lm0 = float(la0.log_marginal_likelihood())

    lms = []
    for seed in range(40):
        la = KronLaplace(
            model, params, "classification",
            backend_kwargs={"fisher_type": "type-2-sketch",
                            "sketch_size": 4, "seed": seed})
        la.fit(loader)
        lms.append(float(la.log_marginal_likelihood()))
    assert np.all(np.isfinite(lms))
    # log marglik is nonlinear in B so the mean is only approximately
    # unbiased — but 40 seeds at k=4 must land well inside a few percent
    assert abs(np.mean(lms) - lm0) < 0.05 * abs(lm0)


@pytest.mark.slow
def test_reward_modeling_fit_classification_predict_regression():
    # Bradley-Terry reward model (reference examples/reward_modeling_
    # example.py): fit sees (B, 2, d) -> (B, 2) logits under CE; predict
    # sees (B, d) -> (B, 1) and returns regression mean + variance.
    from laplace_gnn_tpu import Laplace
    from laplace_gnn_tpu.nn import MLP

    class RewardMLP(MLP):
        def apply(self, params, x, **kw):
            if x.ndim == 3:
                b, two, d = x.shape
                out = super().apply(params, x.reshape(-1, d), **kw)
                return out.reshape(b, two)
            return super().apply(params, x, **kw)

    rng = np.random.default_rng(0)
    model = RewardMLP([3, 16, 1], act="relu")
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.standard_normal((10, 2, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 10))

    la = Laplace(model, params, "reward_modeling",
                 subset_of_weights="all", hessian_structure="kron")
    assert la.likelihood == "reward_modeling"
    la.fit([(X, y)])
    assert np.isfinite(float(la.log_marginal_likelihood()))

    # prediction: regression semantics on single inputs
    x_test = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    f_mu, f_var = la(x_test)
    assert f_mu.shape == (5, 1)
    assert np.asarray(f_var).shape in ((5, 1), (5, 1, 1))
    assert np.all(np.isfinite(np.asarray(f_mu)))
    assert np.all(np.asarray(f_var).ravel() > 0)

    # fitting=True flips back to classification semantics on pairs
    probs = la(X, fitting=True)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_reward_modeling_gridsearch_and_nn_consistency():
    from laplace_gnn_tpu import Laplace
    from laplace_gnn_tpu.nn import MLP

    class RewardMLP(MLP):
        def apply(self, params, x, **kw):
            if x.ndim == 3:
                b, two, d = x.shape
                out = super().apply(params, x.reshape(-1, d), **kw)
                return out.reshape(b, two)
            return super().apply(params, x, **kw)

    rng = np.random.default_rng(1)
    model = RewardMLP([3, 8, 1], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.standard_normal((12, 2, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 12))
    la = Laplace(model, params, "reward_modeling",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit([(X, y)])

    # gridsearch validation predicts with fitting=True (classification
    # semantics) and must actually discriminate between grid points
    la.optimize_prior_precision(method="gridsearch",
                                val_loader=[(X, y)], grid_size=8)
    chosen = float(np.atleast_1d(np.asarray(la.prior_precision))[0])
    assert np.isfinite(chosen)
    # the chosen value is data-driven, not silently the grid minimum
    la2 = Laplace(model, params, "reward_modeling",
                  subset_of_weights="all", hessian_structure="kron")
    la2.fit([(X, y)])
    from laplace_gnn_tpu.utils import nll_loss
    v = la2._validate([(X, y)], nll_loss, "glm", "probit", 50)
    assert np.isfinite(v)

    # nn predictive with fitting=True returns probabilities
    probs = la(X, pred_type="nn", link_approx="mc", fitting=True,
               n_samples=20)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(probs) >= 0)


@pytest.mark.slow
def test_functional_laplace_reward_modeling_predicts_regression():
    from laplace_gnn_tpu.laplace import FunctionalLaplace
    from laplace_gnn_tpu.nn import MLP

    class RewardMLP(MLP):
        def apply(self, params, x, **kw):
            if x.ndim == 3:
                b, two, d = x.shape
                out = super().apply(params, x.reshape(-1, d), **kw)
                return out.reshape(b, two)
            return super().apply(params, x, **kw)

    rng = np.random.default_rng(2)
    model = RewardMLP([3, 8, 1], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.standard_normal((10, 2, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 10))
    la = FunctionalLaplace(model, params, "reward_modeling", n_subset=10)
    la.fit([(X, y)])
    x_test = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    mu, var = la(x_test)                      # regression semantics
    assert mu.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(mu)))
    probs = la(X, fitting=True)               # classification while fitting
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)


@pytest.mark.slow
def test_validate_defaults_to_gp_for_functional():
    from laplace_gnn_tpu.laplace import FunctionalLaplace
    from laplace_gnn_tpu.nn import MLP
    from laplace_gnn_tpu.utils import nll_loss, validate
    model = MLP([3, 8, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (10,), 0, 2)
    la = FunctionalLaplace(model, params, "classification", n_subset=10)
    la.fit([(X, y)])
    assert np.isfinite(validate(la, [(X, y)], nll_loss))


def test_jacobians_chunk_size_zero_rejected():
    from laplace_gnn_tpu.curvature.interface import GGNBackend
    from laplace_gnn_tpu.nn import MLP
    model = MLP([3, 4, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    be = GGNBackend(model, params, "classification")
    with pytest.raises(ValueError, match="chunk_size"):
        be.jacobians(X, chunk_size=0)


def test_link_approximations_match_reference_formulas():
    # oracle: independent numpy reimplementation of the reference's exact
    # equations (laplace/baselaplace.py:634-661)
    from laplace_gnn_tpu.laplace.predictive import (bridge_predictive,
                                                    probit_predictive)
    rng = np.random.default_rng(0)
    B, C = 6, 4
    f_mu = rng.standard_normal((B, C))
    A = rng.standard_normal((B, C, C))
    f_var = np.einsum("bik,bjk->bij", A, A) + 0.1 * np.eye(C)

    # probit: kappa * softmax
    kappa = 1 / np.sqrt(1.0 + np.pi / 8
                        * np.diagonal(f_var, axis1=1, axis2=2))
    z = kappa * f_mu
    ez = np.exp(z - z.max(-1, keepdims=True))
    expected = ez / ez.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(probit_predictive(jnp.asarray(f_mu),
                                     jnp.asarray(f_var))),
        expected, rtol=1e-6)

    # bridge (plain and normalized): zero-mean correction, Dirichlet alpha
    for norm in (False, True):
        mu = f_mu.copy()
        var = f_var.copy()
        mu = mu - (var.sum(-1) * mu.sum(-1).reshape(-1, 1)
                   / var.sum((1, 2)).reshape(-1, 1))
        var = var - (np.einsum("bi,bj->bij", var.sum(-1), var.sum(-2))
                     / var.sum((1, 2)).reshape(-1, 1, 1))
        vdiag = np.diagonal(var, axis1=1, axis2=2).copy()
        if norm:
            vmean = vdiag.mean(1) / np.sqrt(C / 2)
            mu = mu / np.sqrt(vmean)[:, None]
            vdiag = vdiag / vmean[:, None]
        sum_exp = np.exp(-mu).sum(1)[:, None]
        alpha = (1 - 2 / C + np.exp(mu) / C ** 2 * sum_exp) / vdiag
        expected = alpha / alpha.sum(1)[:, None]
        got = np.asarray(bridge_predictive(jnp.asarray(f_mu),
                                           jnp.asarray(f_var), norm=norm))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)
