"""Matrix-free operators vs dense functorch-style oracles
(mirrors reference tests/test_curv_backends_*.py oracle strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.curvature import (EFBackend, EFOperator, FisherMCOperator,
                                       GGNBackend, GGNOperator,
                                       HessianBackend, HessianOperator,
                                       JacobianOperator)
from laplace_gnn_tpu.curvature.oracles import (functorch_ef, functorch_ggn,
                                               functorch_hessian,
                                               functorch_jacobian)
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils import tree_vector

M, D, H, C = 6, 3, 4, 2


def make_setup(likelihood, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    model = MLP([D, H, C], act="tanh")
    params = model.init(k1)
    X = jax.random.normal(k2, (M, D))
    if likelihood == "classification":
        y = jax.random.randint(k3, (M,), 0, C)
    else:
        y = jax.random.normal(k3, (M, C))
    data = [(X[:3], y[:3]), (X[3:], y[3:])]

    def model_fn(w, X):
        return model.apply(w, X)

    return model, params, model_fn, data


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.slow
def test_hessian_operator_vs_oracle(likelihood):
    model, params, model_fn, data = make_setup(likelihood)
    op = HessianOperator(model_fn, likelihood, params, data)
    dense = op.to_dense()
    oracle = functorch_hessian(model_fn, likelihood, params, data)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(oracle),
                               atol=1e-10)
    op.check_deterministic()


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.slow
def test_ggn_operator_vs_oracle(likelihood):
    model, params, model_fn, data = make_setup(likelihood)
    op = GGNOperator(model_fn, likelihood, params, data)
    oracle = functorch_ggn(model_fn, likelihood, params, data)
    np.testing.assert_allclose(np.asarray(op.to_dense()), np.asarray(oracle),
                               atol=1e-10)


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.slow
def test_ef_operator_vs_oracle(likelihood):
    model, params, model_fn, data = make_setup(likelihood)
    op = EFOperator(model_fn, likelihood, params, data)
    oracle = functorch_ef(model_fn, likelihood, params, data)
    np.testing.assert_allclose(np.asarray(op.to_dense()), np.asarray(oracle),
                               atol=1e-10)


def test_fisher_mc_converges_to_ggn():
    model, params, model_fn, data = make_setup("classification")
    op = FisherMCOperator(model_fn, "classification", params, data,
                          mc_samples=2000)
    ggn = functorch_ggn(model_fn, "classification", params, data)
    np.testing.assert_allclose(np.asarray(op.to_dense()), np.asarray(ggn),
                               atol=0.15, rtol=0.5)


def test_jacobian_operator():
    model, params, model_fn, data = make_setup("regression")
    J_dense = jnp.concatenate([
        functorch_jacobian(model_fn, params, X).reshape(-1, op_cols(params))
        for X, _ in data])
    op = JacobianOperator(model_fn, params, data)
    assert op.shape == J_dense.shape
    v = jax.random.normal(jax.random.PRNGKey(1), (op.shape[1],))
    np.testing.assert_allclose(np.asarray(op.matvec(v)),
                               np.asarray(J_dense @ v), atol=1e-10)
    u = jax.random.normal(jax.random.PRNGKey(2), (op.shape[0],))
    np.testing.assert_allclose(np.asarray(op.rmatvec(u)),
                               np.asarray(J_dense.T @ u), atol=1e-10)


def op_cols(params):
    return tree_vector(params).shape[0]


# --- backend interface ------------------------------------------------------

@pytest.mark.parametrize("likelihood", ["classification", "regression"])
def test_backend_jacobians_vs_oracle(likelihood):
    model, params, model_fn, data = make_setup(likelihood)
    backend = GGNBackend(model, params, likelihood)
    X = data[0][0]
    Js, f = backend.jacobians(X)
    oracle = functorch_jacobian(model_fn, params, X)
    np.testing.assert_allclose(np.asarray(Js), np.asarray(oracle), atol=1e-10)
    np.testing.assert_allclose(np.asarray(f), np.asarray(model_fn(params, X)))


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
def test_backend_full_ggn(likelihood):
    model, params, model_fn, data = make_setup(likelihood)
    backend = GGNBackend(model, params, likelihood)
    X = jnp.concatenate([d[0] for d in data])
    y = jnp.concatenate([d[1] for d in data])
    loss, Hb = backend.full(X, y)
    oracle = functorch_ggn(model_fn, likelihood, params, data)
    scale = 0.5 if likelihood == "regression" else 1.0
    # reference GGNInterface drops the 2x of sum-MSE (H = J^T J); oracle has it
    np.testing.assert_allclose(np.asarray(Hb), scale * np.asarray(oracle),
                               atol=1e-10)
    _, hd = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(hd), np.diag(np.asarray(Hb)),
                               atol=1e-10)


@pytest.mark.slow
def test_backend_full_ef_and_hessian():
    model, params, model_fn, data = make_setup("classification")
    X = jnp.concatenate([d[0] for d in data])
    y = jnp.concatenate([d[1] for d in data])

    ef = EFBackend(model, params, "classification")
    loss, Hef = ef.full(X, y)
    np.testing.assert_allclose(
        np.asarray(Hef),
        np.asarray(functorch_ef(model_fn, "classification", params, data)),
        atol=1e-10)
    _, d = ef.diag(X, y)
    np.testing.assert_allclose(np.asarray(d), np.diag(np.asarray(Hef)),
                               atol=1e-10)

    hb = HessianBackend(model, params, "classification")
    loss, Hh = hb.full(X, y)
    np.testing.assert_allclose(
        np.asarray(Hh),
        np.asarray(functorch_hessian(model_fn, "classification", params, data)),
        atol=1e-10)


def test_backend_gradients_per_sample():
    model, params, model_fn, data = make_setup("classification")
    backend = EFBackend(model, params, "classification")
    X, y = data[0]
    Gs, loss = backend.gradients(X, y)
    # oracle: per-sample loss gradient via independent jacrev
    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum
    from laplace_gnn_tpu.utils import tree_unflattener

    theta = tree_vector(params)
    unflatten = tree_unflattener(params)

    def psl(t):
        f = model_fn(unflatten(t), X)
        return jax.vmap(lambda fi, yi: cross_entropy_sum(fi[None], yi[None]))(f, y)

    G_oracle = jax.jacrev(psl)(theta)
    np.testing.assert_allclose(np.asarray(Gs), np.asarray(G_oracle),
                               atol=1e-10)


def test_last_layer_jacobians_closed_form():
    model, params, model_fn, data = make_setup("classification")
    backend = GGNBackend(model, params, "classification", last_layer=True)
    X = data[0][0]
    Js_closed, f = backend.last_layer_jacobians(X)
    Js_auto, f2 = backend.jacobians(X)       # w already restricted to last layer
    np.testing.assert_allclose(np.asarray(Js_closed), np.asarray(Js_auto),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2))


def test_subnetwork_slicing():
    model, params, model_fn, data = make_setup("classification")
    full_backend = GGNBackend(model, params, "classification")
    P = full_backend.n_params
    idx = jnp.array([0, 3, 7, P - 1])
    sub = GGNBackend(model, params, "classification", subnetwork_indices=idx)
    X, y = data[0]
    _, Hs = sub.full(X, y)
    _, Hf = full_backend.full(X, y)
    np.testing.assert_allclose(np.asarray(Hs),
                               np.asarray(Hf)[np.ix_(np.asarray(idx),
                                                     np.asarray(idx))],
                               atol=1e-10)


@pytest.mark.slow
def test_gnn_backend_excludes_adj():
    from laplace_gnn_tpu.models import STEGCN
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (8, 3))
    adj = jnp.minimum(
        (jax.random.uniform(jax.random.PRNGKey(1), (8, 8)) < 0.4) * 1.0
        + ((jax.random.uniform(jax.random.PRNGKey(1), (8, 8)) < 0.4) * 1.0).T,
        1.0)
    model = STEGCN(3, 4, 2, 2, X, adj)
    params = model.init(jax.random.PRNGKey(2))
    backend = GGNBackend(model, params, "classification")
    # posterior covers only conv weights+biases: 3*4+4 + 4*2+2 = 26
    assert backend.n_params == 26
    idx = jnp.arange(8)
    y = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 2)
    loss, Hb = backend.full(idx, y)
    assert Hb.shape == (26, 26)
    assert np.isfinite(np.asarray(Hb)).all()


@pytest.mark.slow
def test_jacobians_chunked_matches_vmapped():
    from laplace_gnn_tpu.curvature.interface import GGNBackend
    from laplace_gnn_tpu.nn import MLP
    model = MLP([3, 8, 4], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    be = GGNBackend(model, params, "classification")
    Js_full, f = be.jacobians(X)
    Js_chunk, f2 = be.jacobians(X, chunk_size=3)   # 7 = 2*3 + 1 (pad path)
    np.testing.assert_allclose(np.asarray(Js_full), np.asarray(Js_chunk),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2))
    # constructor default applies
    be2 = GGNBackend(model, params, "classification", jac_chunk_size=2)
    Js_d, _ = be2.jacobians(X)
    np.testing.assert_allclose(np.asarray(Js_full), np.asarray(Js_d),
                               rtol=1e-12)


@pytest.mark.slow
def test_public_validate():
    from laplace_gnn_tpu import DiagLaplace
    from laplace_gnn_tpu.nn import MLP
    from laplace_gnn_tpu.utils import nll_loss, validate
    from laplace_gnn_tpu.utils.data import ArrayLoader
    model = MLP([3, 8, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (12, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (12,), 0, 2)
    la = DiagLaplace(model, params, "classification")
    la.fit(ArrayLoader(X, y))
    v = validate(la, ArrayLoader(X, y), nll_loss)
    assert np.isfinite(v)
