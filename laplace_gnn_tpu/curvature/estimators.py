"""Stochastic trace / diagonal / norm estimators.

Counterparts of the reference's Hutchinson trace
(curvlinops/trace/hutchinson.py:9), Hutch++ (curvlinops/trace/
meyer2020hutch.py:12), Hutchinson diagonal (curvlinops/diagonal/
hutchinson.py:9), and squared-Frobenius-norm estimator
(curvlinops/norm/hutchinson.py:9), with rademacher/normal probes
(curvlinops/sampling.py:7-49). Probes are batched through ``matmat`` so one
estimator call is one batched operator application.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_probes(key, shape, distribution: str = "rademacher",
                  dtype=jnp.float32):
    if distribution == "rademacher":
        return jax.random.rademacher(key, shape, dtype=dtype)
    if distribution == "normal":
        return jax.random.normal(key, shape, dtype=dtype)
    raise ValueError(f"Unknown probe distribution {distribution!r}")


def hutchinson_trace(op, n_samples: int = 64, key=None,
                     distribution: str = "rademacher") -> jnp.ndarray:
    """tr(A) ~ mean_s v_s^T A v_s."""
    key = key if key is not None else jax.random.PRNGKey(0)
    V = random_probes(key, (op.shape[1], n_samples), distribution, op.dtype)
    AV = op.matmat(V)
    return jnp.mean(jnp.sum(V * AV, axis=0))


def hutchpp_trace(op, n_samples: int = 64, key=None) -> jnp.ndarray:
    """Hutch++: low-rank deflation + Hutchinson on the residual
    (Meyer et al. 2020; curvlinops/trace/meyer2020hutch.py:12)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k = max(n_samples // 3, 1)
    k1, k2 = jax.random.split(key)
    S = random_probes(k1, (op.shape[1], k), "rademacher", op.dtype)
    Q, _ = jnp.linalg.qr(op.matmat(S))
    # exact trace on the captured subspace
    t_low = jnp.trace(Q.T @ op.matmat(Q))
    # Hutchinson on the deflated remainder
    G = random_probes(k2, (op.shape[1], k), "rademacher", op.dtype)
    G = G - Q @ (Q.T @ G)
    t_rest = jnp.trace(G.T @ op.matmat(G)) / k
    return t_low + t_rest


def hutchinson_diag(op, n_samples: int = 128, key=None,
                    distribution: str = "rademacher") -> jnp.ndarray:
    """diag(A) ~ mean_s v_s * (A v_s)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    V = random_probes(key, (op.shape[1], n_samples), distribution, op.dtype)
    AV = op.matmat(V)
    return jnp.mean(V * AV, axis=1)


def hutchinson_squared_fro(op, n_samples: int = 64, key=None) -> jnp.ndarray:
    """||A||_F^2 ~ mean_s ||A v_s||^2 (curvlinops/norm/hutchinson.py:9)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    V = random_probes(key, (op.shape[1], n_samples), "rademacher", op.dtype)
    AV = op.matmat(V)
    return jnp.mean(jnp.sum(AV * AV, axis=0))


class _SampleEstimator:
    """Incremental estimator base: each ``sample()`` draws one fresh probe
    (key advanced by a counter), so users can average running samples —
    the reference's class-based estimator API (curvlinops/trace/
    hutchinson.py:9, meyer2020hutch.py:12, diagonal/hutchinson.py:9,
    norm/hutchinson.py:9)."""

    def __init__(self, op, key=None):
        if len(op.shape) != 2 or op.shape[0] != op.shape[1]:
            raise ValueError(f"A must be square. Got shape {op.shape}.")
        self._op = op
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._counter = 0

    def _next_key(self):
        k = jax.random.fold_in(self._key, self._counter)
        self._counter += 1
        return k


class HutchinsonTraceEstimator(_SampleEstimator):
    """One-probe trace samples: a = v^T A v (Hutchinson 1989)."""

    def sample(self, distribution: str = "rademacher") -> jnp.ndarray:
        v = random_probes(self._next_key(), (self._op.shape[1],),
                          distribution, self._op.dtype)
        return jnp.dot(v, self._op.matvec(v))


class HutchPPTraceEstimator(_SampleEstimator):
    """Hutch++ incremental sampling: exact trace on a cached low-rank
    subspace + Hutchinson samples on the deflated residual
    (Meyer et al. 2020; curvlinops/trace/meyer2020hutch.py:12)."""

    def __init__(self, op, basis_dim: int | None = None,
                 basis_distribution: str = "rademacher", key=None):
        super().__init__(op, key=key)
        dim = op.shape[1]
        self._basis_dim = (basis_dim if basis_dim is not None
                           else min(max(dim // 100, 1), 10))
        if self._basis_dim > dim:
            raise ValueError(
                f"Basis dimension must be at most {dim}. "
                f"Got {self._basis_dim}.")
        self._basis_distribution = basis_distribution
        self._Q = None
        self._tr_QT_A_Q = None

    def maybe_compute_and_cache_subspace(self) -> None:
        """Build Q = qr(A S) and tr(Q^T A Q) once, lazily."""
        if self._Q is not None:
            return
        S = random_probes(self._next_key(),
                          (self._op.shape[1], self._basis_dim),
                          self._basis_distribution, self._op.dtype)
        Q, _ = jnp.linalg.qr(self._op.matmat(S))
        self._Q = Q
        self._tr_QT_A_Q = jnp.trace(Q.T @ self._op.matmat(Q))

    def sample(self, distribution: str = "rademacher") -> jnp.ndarray:
        self.maybe_compute_and_cache_subspace()
        v = random_probes(self._next_key(), (self._op.shape[1],),
                          distribution, self._op.dtype)
        v = v - self._Q @ (self._Q.T @ v)
        return self._tr_QT_A_Q + jnp.dot(v, self._op.matvec(v))


class HutchinsonDiagonalEstimator(_SampleEstimator):
    """One-probe diagonal samples: d = v * (A v)
    (curvlinops/diagonal/hutchinson.py:9)."""

    def sample(self, distribution: str = "rademacher") -> jnp.ndarray:
        v = random_probes(self._next_key(), (self._op.shape[1],),
                          distribution, self._op.dtype)
        return v * self._op.matvec(v)


class HutchinsonSquaredFrobeniusNormEstimator(_SampleEstimator):
    """One-probe ||A||_F^2 samples: ||A v||^2
    (curvlinops/norm/hutchinson.py:9)."""

    def sample(self, distribution: str = "rademacher") -> jnp.ndarray:
        v = random_probes(self._next_key(), (self._op.shape[1],),
                          distribution, self._op.dtype)
        Av = self._op.matvec(v)
        return jnp.dot(Av, Av)
