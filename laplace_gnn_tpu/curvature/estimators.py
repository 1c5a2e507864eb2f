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
