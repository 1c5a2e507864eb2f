"""LSMR inverse operator (reference LSMRInverseLinearOperator,
curvlinops/inverse.py:91) against dense solve/lstsq oracles."""

import jax.numpy as jnp
import numpy as np

from laplace_gnn_tpu.curvature import LSMRInverseOperator
from laplace_gnn_tpu.curvature.base import LinearOperator


class DenseOp(LinearOperator):
    def __init__(self, A):
        super().__init__(A.shape, A.dtype)
        self.A = jnp.asarray(A)

    def matvec(self, v):
        return self.A @ v

    def rmatvec(self, v):
        return self.A.T @ v


def test_lsmr_spd_solve():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((12, 12))
    A = M @ M.T + 0.5 * np.eye(12)
    b = rng.standard_normal(12)
    inv = LSMRInverseOperator(DenseOp(A), atol=1e-12, maxiter=400)
    np.testing.assert_allclose(np.asarray(inv @ b), np.linalg.solve(A, b),
                               atol=1e-6)


def test_lsmr_rectangular_least_squares():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((20, 8))
    b = rng.standard_normal(20)
    inv = LSMRInverseOperator(DenseOp(A), atol=1e-12, maxiter=400)
    expect = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(inv @ b), expect, atol=1e-6)


def test_lsmr_damped():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((15, 10))
    b = rng.standard_normal(15)
    damp = 0.7
    inv = LSMRInverseOperator(DenseOp(A), damp=damp, atol=1e-12, maxiter=600)
    expect = np.linalg.solve(A.T @ A + damp ** 2 * np.eye(10), A.T @ b)
    np.testing.assert_allclose(np.asarray(inv @ b), expect, atol=1e-6)


def test_lsmr_singular_min_norm():
    """On a rank-deficient system LSMR returns the minimum-norm LS solution
    (the regime where plain CG fails)."""
    rng = np.random.default_rng(3)
    U = rng.standard_normal((10, 3))
    V = rng.standard_normal((3, 6))
    A = U @ V  # rank 3
    b = rng.standard_normal(10)
    inv = LSMRInverseOperator(DenseOp(A), atol=1e-12, maxiter=600)
    expect = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(inv @ b), expect, atol=1e-6)
