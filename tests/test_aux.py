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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_fast_lanczos_extremes_and_scan_parity(psd_op):
    # No-reorthogonalization Lanczos (like the reference's fast_lanczos)
    # loses orthogonality at full rank — ghost eigenvalues are expected —
    # but the spectral extremes converge fast and the quadrature moments
    # stay valid (checked via the density tests below).
    from laplace_gnn_tpu.curvature import fast_lanczos
    op, M = psd_op
    true = np.asarray(jnp.linalg.eigvalsh(M))
    evals, evecs = fast_lanczos(op, ncv=30, key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(evals[-1]), true[-1], rtol=1e-4)
    np.testing.assert_allclose(float(evals[0]), true[0], rtol=0.05)
    # scan and unrolled variants agree on the converged extremes (interior
    # ghost eigenvalues diverge between compilations — rounding is
    # amplified once orthogonality is lost, same as the reference's
    # fast_lanczos across BLAS builds)
    e2, _ = fast_lanczos(op, ncv=30, key=jax.random.PRNGKey(7),
                         use_scan=False)
    np.testing.assert_allclose(float(e2[-1]), float(evals[-1]), rtol=1e-6)
    np.testing.assert_allclose(float(e2[0]), float(evals[0]), rtol=1e-3)


def test_approximate_boundaries(psd_op):
    from laplace_gnn_tpu.curvature import (approximate_boundaries,
                                           approximate_boundaries_abs)
    op, M = psd_op
    true = np.asarray(jnp.linalg.eigvalsh(M))
    lo, hi = approximate_boundaries(op, ncv=30)
    np.testing.assert_allclose([lo, hi], [true[0], true[-1]], rtol=1e-3)
    # pinned ends are not recomputed
    lo2, hi2 = approximate_boundaries(op, boundaries=(0.0, None), ncv=30)
    assert lo2 == 0.0 and abs(hi2 - true[-1]) / true[-1] < 1e-3
    alo, ahi = approximate_boundaries_abs(op, ncv=30)
    np.testing.assert_allclose([alo, ahi],
                               [np.abs(true).min(), np.abs(true).max()],
                               rtol=1e-3)


def test_lanczos_approximate_spectrum_density(psd_op):
    from laplace_gnn_tpu.curvature import lanczos_approximate_spectrum
    op, M = psd_op
    grid, density = lanczos_approximate_spectrum(op, ncv=30, num_points=512,
                                                 num_repeats=3)
    assert np.all(density >= -1e-9)
    np.testing.assert_allclose(np.trapezoid(density, grid), 1.0, atol=0.1)
    # first moment matches trace/d (Gaussian quadrature preserves moments)
    mean_est = np.trapezoid(grid * density, grid)
    np.testing.assert_allclose(mean_est,
                               float(jnp.trace(M)) / M.shape[0], rtol=0.1)


def test_lanczos_approximate_log_spectrum_density(psd_op):
    from laplace_gnn_tpu.curvature import lanczos_approximate_log_spectrum
    op, M = psd_op
    grid, density = lanczos_approximate_log_spectrum(op, ncv=30,
                                                     num_points=512,
                                                     num_repeats=2)
    assert np.all(grid > 0)
    # density of log-eigenvalues: integral over log-grid is ~1
    np.testing.assert_allclose(np.trapezoid(density * grid, np.log(grid)),
                               1.0, atol=0.15)


def test_cached_spectrum_matches_uncached(psd_op):
    from laplace_gnn_tpu.curvature import (LanczosApproximateSpectrumCached,
                                           lanczos_approximate_spectrum)
    op, M = psd_op
    key = jax.random.PRNGKey(11)
    cached = LanczosApproximateSpectrumCached(op, ncv=25, key=key)
    g1, d1 = cached.approximate_spectrum(num_repeats=2, num_points=256)
    g2, d2 = lanczos_approximate_spectrum(op, ncv=25, num_points=256,
                                          num_repeats=2, key=key)
    np.testing.assert_allclose(g1, g2, rtol=1e-6)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-8)
    # cache is reused: more repeats only extends, first iters identical
    assert len(cached._iters) == 2
    cached.approximate_spectrum(num_repeats=3, num_points=256)
    assert len(cached._iters) == 3


def test_cached_log_spectrum(psd_op):
    from laplace_gnn_tpu.curvature import LanczosApproximateLogSpectrumCached
    op, M = psd_op
    cached = LanczosApproximateLogSpectrumCached(op, ncv=25,
                                                 key=jax.random.PRNGKey(12))
    grid, density = cached.approximate_log_spectrum(num_repeats=2,
                                                    num_points=256)
    assert np.all(grid > 0) and np.all(np.isfinite(density))


@pytest.mark.slow
def test_incremental_estimators(psd_op):
    from laplace_gnn_tpu.curvature import (
        HutchinsonDiagonalEstimator, HutchinsonSquaredFrobeniusNormEstimator,
        HutchinsonTraceEstimator, HutchPPTraceEstimator)
    op, M = psd_op
    tr_true = float(jnp.trace(M))

    est = HutchinsonTraceEstimator(op, key=jax.random.PRNGKey(0))
    samples = [float(est.sample()) for _ in range(800)]
    np.testing.assert_allclose(np.mean(samples), tr_true, rtol=0.05)

    hpp = HutchPPTraceEstimator(op, basis_dim=10, key=jax.random.PRNGKey(1))
    samples = [float(hpp.sample()) for _ in range(100)]
    np.testing.assert_allclose(np.mean(samples), tr_true, rtol=0.05)
    # subspace cached once
    Q_id = id(hpp._Q)
    hpp.sample()
    assert id(hpp._Q) == Q_id

    dest = HutchinsonDiagonalEstimator(op, key=jax.random.PRNGKey(2))
    d = np.mean([np.asarray(dest.sample()) for _ in range(3000)], axis=0)
    np.testing.assert_allclose(d, np.asarray(jnp.diag(M)), rtol=0.3,
                               atol=0.5)

    fest = HutchinsonSquaredFrobeniusNormEstimator(
        op, key=jax.random.PRNGKey(3))
    f = np.mean([float(fest.sample()) for _ in range(800)])
    np.testing.assert_allclose(f, float(jnp.sum(M * M)), rtol=0.05)

    # non-square rejected
    class Rect(type(op).__bases__[0] if False else object):
        shape = (3, 4)
    with pytest.raises(ValueError):
        HutchinsonTraceEstimator(Rect())


def test_inverse_hyperparameter_setters_and_info(psd_op):
    from laplace_gnn_tpu.curvature import (CGInverseOperator,
                                           LSMRInverseOperator,
                                           NeumannInverseOperator)
    op, M = psd_op
    v = jax.random.normal(jax.random.PRNGKey(7), (30,))

    cg = CGInverseOperator(op, tol=1e-1)
    cg.set_cg_hyperparameters(tol=1e-10, maxiter=200)
    np.testing.assert_allclose(np.asarray(M @ cg.matvec(v)), np.asarray(v),
                               atol=1e-6)

    ls = LSMRInverseOperator(op, atol=1e-10, maxiter=500)
    x, info = ls.matvec_with_info(v)
    assert info["iterations"] > 0 and info["residual_norm"] < 1e-4
    ls.set_lsmr_hyperparameters(maxiter=1)
    _, info1 = ls.matvec_with_info(v)
    assert info1["iterations"] == 1

    lmax = float(jnp.linalg.eigvalsh(M).max())
    ne = NeumannInverseOperator(op, num_terms=1, scale=1.0 / lmax)
    ne.set_neumann_hyperparameters(num_terms=3000)
    np.testing.assert_allclose(np.asarray(M @ ne.matvec(v)), np.asarray(v),
                               atol=1e-4)


def test_kfac_inverse_state_dict_roundtrip():
    from laplace_gnn_tpu.curvature import (KFACInverseOperator,
                                           compute_kfac_factors)
    model = MLP([3, 4, 2], act="tanh")
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (6,), 0, 2)
    kron = compute_kfac_factors(model, params, X, y, "classification", N=6)
    inv = KFACInverseOperator(kron, damping=0.1, damping_method="exact")
    P = int(sum(np.prod(np.asarray(f).shape[:1]) if len(g) == 1
                else np.asarray(g[0]).shape[0] * np.asarray(g[1]).shape[0]
                for g in kron.kfacs for f in g[:1]))
    v = jax.random.normal(jax.random.PRNGKey(3), (P,))
    back = KFACInverseOperator.from_state_dict(inv.state_dict())
    np.testing.assert_allclose(np.asarray(inv.matvec(v)),
                               np.asarray(back.matvec(v)), rtol=1e-12)
    other = KFACInverseOperator(kron, damping=9.0)
    other.load_state_dict(inv.state_dict())
    np.testing.assert_allclose(np.asarray(inv.matvec(v)),
                               np.asarray(other.matvec(v)), rtol=1e-12)


def test_submatrix_set_submatrix(psd_op):
    from laplace_gnn_tpu.curvature.operators import SubmatrixOperator
    op, M = psd_op
    sub = SubmatrixOperator(op, jnp.arange(5), jnp.arange(5))
    v = jax.random.normal(jax.random.PRNGKey(8), (5,))
    np.testing.assert_allclose(np.asarray(sub.matvec(v)),
                               np.asarray(M[:5, :5] @ v), rtol=1e-10)
    sub.set_submatrix(jnp.arange(10, 20), jnp.arange(5, 10))
    assert sub.shape == (10, 5)
    np.testing.assert_allclose(np.asarray(sub.matvec(v)),
                               np.asarray(M[10:20, 5:10] @ v), rtol=1e-10)


def test_lsmr_info_reports_damped_residual(psd_op):
    from laplace_gnn_tpu.curvature import LSMRInverseOperator
    op, M = psd_op
    v = jax.random.normal(jax.random.PRNGKey(9), (30,))
    damp = 2.0
    ls = LSMRInverseOperator(op, damp=damp, atol=1e-12, maxiter=500)
    x, info = ls.matvec_with_info(v)
    r = np.asarray(M @ x - v)
    expected = np.sqrt(r @ r + damp ** 2 * float(x @ x))
    np.testing.assert_allclose(info["residual_norm"], expected, rtol=1e-6)


def test_boundary_tol_sets_lanczos_depth(psd_op):
    from laplace_gnn_tpu.curvature.spectrum import _boundary_ncv
    assert _boundary_ncv(1e-2, 1000, None) == 20
    assert _boundary_ncv(1e-4, 1000, None) == 200
    assert _boundary_ncv(0.0, 1000, None) == 128
    assert _boundary_ncv(1e-4, 50, None) == 50      # capped at dim
    assert _boundary_ncv(1e-4, 1000, 32) == 32      # explicit ncv wins
