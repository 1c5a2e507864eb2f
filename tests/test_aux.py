"""Auxiliary subsystems: estimators, inverses, spectra, activation Hessian,
checkpointing, profiling timing helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.curvature import (ActivationHessianOperator,
                                       CGInverseOperator, GGNOperator,
                                       KFACInverseOperator,
                                       NeumannInverseOperator,
                                       compute_kfac_factors, hutchinson_diag,
                                       hutchinson_squared_fro,
                                       hutchinson_trace, hutchpp_trace,
                                       lanczos_eigh, lanczos_spectrum)
from laplace_gnn_tpu.curvature.base import LinearOperator
from laplace_gnn_tpu.nn import MLP, TapCollector
from laplace_gnn_tpu.utils import (TrainCheckpointer, load_pytree,
                                   save_pytree)


class DenseOp(LinearOperator):
    def __init__(self, M):
        super().__init__(M.shape, M.dtype)
        self.M = M

    def matvec(self, v):
        return self.M @ v


@pytest.fixture
def psd_op():
    A = jax.random.normal(jax.random.PRNGKey(0), (30, 30))
    M = A @ A.T + 5 * jnp.eye(30)
    return DenseOp(M), M


def test_hutchinson_trace_and_diag(psd_op):
    op, M = psd_op
    tr = hutchinson_trace(op, n_samples=3000, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(tr), float(jnp.trace(M)), rtol=0.05)
    tr2 = hutchpp_trace(op, n_samples=60, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(tr2), float(jnp.trace(M)), rtol=0.05)
    d = hutchinson_diag(op, n_samples=5000, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(d), np.diag(np.asarray(M)),
                               rtol=0.35, atol=1.0)
    fro = hutchinson_squared_fro(op, n_samples=3000,
                                 key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(fro), float(jnp.sum(M * M)), rtol=0.1)


def test_cg_and_neumann_inverse(psd_op):
    op, M = psd_op
    v = jax.random.normal(jax.random.PRNGKey(5), (30,))
    x = CGInverseOperator(op, tol=1e-10).matvec(v)
    np.testing.assert_allclose(np.asarray(M @ x), np.asarray(v), atol=1e-6)
    # Neumann needs scale < 2/lambda_max
    lmax = float(jnp.linalg.eigvalsh(M).max())
    x2 = NeumannInverseOperator(op, num_terms=3000,
                                scale=1.0 / lmax).matvec(v)
    np.testing.assert_allclose(np.asarray(M @ x2), np.asarray(v), atol=1e-4)


def test_kfac_inverse():
    model = MLP([3, 4, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (6,), 0, 2)
    kron = compute_kfac_factors(model, params, X, y, "classification", N=6)
    damping = 0.1
    for method in ("plain", "heuristic", "exact"):
        inv = KFACInverseOperator(kron, damping=damping,
                                  damping_method=method)
        dense = np.asarray(kron.to_matrix())
        P = dense.shape[0]
        v = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (P,)))
        out = np.asarray(inv.matvec(jnp.asarray(v)))
        if method == "exact":
            # exact: blockwise (B (x) A + damping I)^-1
            expected = np.zeros(P)
            cur = 0
            for g in kron.kfacs:
                if len(g) == 1:
                    blk = np.asarray(g[0])
                else:
                    blk = np.kron(np.asarray(g[0]), np.asarray(g[1]))
                n = blk.shape[0]
                expected[cur:cur + n] = np.linalg.solve(
                    blk + damping * np.eye(n), v[cur:cur + n])
                cur += n
            np.testing.assert_allclose(out, expected, atol=1e-6)
        else:
            assert np.isfinite(out).all()


def test_lanczos_eigh_and_spectrum(psd_op):
    op, M = psd_op
    evals, evecs = lanczos_eigh(op, k=30, key=jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.sort(np.asarray(evals)),
                               np.sort(np.asarray(jnp.linalg.eigvalsh(M))),
                               rtol=1e-6)
    grid, density = lanczos_spectrum(op, k=20, n_probes=3, n_bins=50)
    assert len(grid) == 50
    assert np.all(density >= 0)
    # density integrates to ~1
    np.testing.assert_allclose(np.trapezoid(density, grid), 1.0, atol=0.15)


def test_activation_hessian_vs_oracle():
    model = MLP([3, 4, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (5,), 0, 2)
    op = ActivationHessianOperator(model, params, "classification",
                                   "layers.0", X, y)
    assert op.shape == (20, 20)
    dense = np.asarray(op.to_dense())
    # oracle: jax.hessian of loss w.r.t. injected eps
    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum

    def loss_of_eps(eps):
        taps = TapCollector({"layers.0": eps.reshape(5, 4)})
        return cross_entropy_sum(model.apply(params, X, taps=taps), y)

    oracle = np.asarray(jax.hessian(loss_of_eps)(jnp.zeros(20)))
    np.testing.assert_allclose(dense, oracle, atol=1e-10)
    with pytest.raises(ValueError, match="Unknown activation site"):
        ActivationHessianOperator(model, params, "classification", "nope",
                                  X, y)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": [jnp.ones((2, 2)), "meta"],
            "n": 7}
    path = str(tmp_path / "ck.pkl")
    save_pytree(path, tree)
    back = load_pytree(path)
    np.testing.assert_allclose(np.asarray(back["a"]), np.arange(5.0))
    assert back["b"][1] == "meta" and back["n"] == 7


def test_laplace_checkpoint(tmp_path):
    from laplace_gnn_tpu import DiagLaplace
    from laplace_gnn_tpu.utils import load_laplace, save_laplace
    from laplace_gnn_tpu.utils.data import ArrayLoader
    model = MLP([3, 4, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (6,), 0, 2)
    la = DiagLaplace(model, params, "classification")
    la.fit(ArrayLoader(X, y))
    path = str(tmp_path / "la.pkl")
    save_laplace(path, la)
    la2 = DiagLaplace(model, params, "classification")
    load_laplace(path, la2)
    np.testing.assert_allclose(float(la2.log_marginal_likelihood()),
                               float(la.log_marginal_likelihood()))


def test_train_checkpointer(tmp_path):
    ck = TrainCheckpointer(str(tmp_path), keep=2)
    assert ck.latest() is None
    for step in (1, 2, 3):
        ck.save(step, {"params": jnp.full((2,), float(step))})
    latest = ck.latest()
    assert latest["step"] == 3
    np.testing.assert_allclose(np.asarray(latest["state"]["params"]),
                               [3.0, 3.0])
    assert len(ck._steps()) == 2  # oldest collected


def test_device_time_helper():
    from laplace_gnn_tpu import profiling
    a = jnp.ones((64, 64))
    t = profiling.device_time(lambda a: a @ a, a, iters=5)
    assert t >= 0.0
    stats = profiling.memory_stats()
    assert isinstance(stats, dict)
