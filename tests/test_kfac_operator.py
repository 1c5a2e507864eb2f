"""KFACOperator: the KFACLinearOperator analog (curvlinops/kfac.py:82) —
matvec/matmat through factors, matrix functionals, batch accumulation,
serialization round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.curvature import KFACOperator
from laplace_gnn_tpu.nn import MLP

D, H, C = 3, 4, 2


def setup(M=8, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    model = MLP([D, H, C], act="tanh")
    params = model.init(keys[0])
    X = jax.random.normal(keys[1], (M, D))
    y = jax.random.randint(keys[2], (M,), 0, C)
    return model, params, X, y


@pytest.mark.slow
def test_matvec_matches_dense():
    model, params, X, y = setup()
    op = KFACOperator(model, params, [(X, y)], "classification")
    dense = np.asarray(op.to_dense())
    v = np.random.default_rng(0).standard_normal(op.shape[1])
    np.testing.assert_allclose(np.asarray(op @ v), dense @ v, atol=1e-8)
    V = np.random.default_rng(1).standard_normal((op.shape[1], 3))
    np.testing.assert_allclose(np.asarray(op @ V), dense @ V, atol=1e-8)


@pytest.mark.slow
def test_matrix_functionals():
    # regression: the loss Hessian is full-rank, so det/logdet are
    # well-defined on the raw factors (for classification the softmax
    # Hessian is rank C-1 and the reference, too, only takes logdet after
    # adding the prior precision)
    model, params, X, _ = setup()
    y = jax.random.normal(jax.random.PRNGKey(9), (X.shape[0], C))
    op = KFACOperator(model, params, [(X, y)], "regression")
    dense = np.asarray(op.to_dense())
    np.testing.assert_allclose(float(op.trace), np.trace(dense), rtol=1e-8)
    np.testing.assert_allclose(float(op.frobenius_norm),
                               np.linalg.norm(dense), rtol=1e-8)
    sign, ld = np.linalg.slogdet(dense)
    assert sign > 0
    np.testing.assert_allclose(float(op.logdet), ld, rtol=1e-6)
    np.testing.assert_allclose(float(op.det), np.exp(ld), rtol=1e-6)


@pytest.mark.slow
def test_batch_accumulation():
    """Factors accumulated over two batches equal one concatenated batch."""
    model, params, X, y = setup(M=8)
    one = KFACOperator(model, params, [(X, y)], "classification")
    two = KFACOperator(model, params, [(X[:5], y[:5]), (X[5:], y[5:])],
                       "classification", N=8)
    np.testing.assert_allclose(np.asarray(one.to_dense()),
                               np.asarray(two.to_dense()), atol=1e-8)


def test_state_dict_roundtrip():
    model, params, X, y = setup()
    op = KFACOperator(model, params, [(X, y)], "classification")
    state = op.state_dict()
    # restore without any data
    op2 = KFACOperator.from_state_dict(state, model, params)
    np.testing.assert_allclose(np.asarray(op.to_dense()),
                               np.asarray(op2.to_dense()), atol=0)
    assert op2.shape == op.shape
    # load_state_dict validates metadata
    op3 = KFACOperator(model, params, [(X, y)], "classification",
                       fisher_type="empirical")
    with pytest.raises(ValueError, match="fisher_type"):
        op3.load_state_dict(state)


def test_no_data_raises():
    model, params, X, y = setup()
    op = KFACOperator(model, params, None, "classification", N=8)
    with pytest.raises(ValueError, match="no data"):
        _ = op.kron


def test_check_deterministic():
    model, params, X, y = setup()
    KFACOperator(model, params, [(X, y)], "classification",
                 check_deterministic=True)


def test_last_layer_shape():
    model, params, X, y = setup()
    op = KFACOperator(model, params, [(X, y)], "classification",
                      last_layer=True)
    assert op.shape == (H * C + C, H * C + C)
    dense = np.asarray(op.to_dense())
    assert dense.shape == op.shape
