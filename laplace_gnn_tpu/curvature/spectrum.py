"""Lanczos spectral tools for matrix-free operators.

Counterpart of the reference's Lanczos spectrum estimation
(curvlinops/papyan2020traces/spectrum.py:19-374) and the asdfghjkl
``eig_lowrank`` used by LowRankLaplace (laplace/baselaplace.py:1737).
Implemented with full reorthogonalization (the operators here are small
enough that numerical ghost eigenvalues matter more than the extra matvecs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def lanczos_tridiag(op, k: int, key=None, v0: Optional[jnp.ndarray] = None):
    """k-step Lanczos with full reorthogonalization.

    Returns (alphas (k,), betas (k-1,), Q (P, k))."""
    P = op.shape[1]
    if v0 is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        v0 = jax.random.normal(key, (P,))
    q = v0 / jnp.linalg.norm(v0)
    Q = [q]
    alphas, betas = [], []
    for j in range(k):
        w = op.matvec(Q[j])
        alpha = jnp.dot(Q[j], w)
        alphas.append(alpha)
        w = w - alpha * Q[j]
        if j > 0:
            w = w - betas[-1] * Q[j - 1]
        # full reorthogonalization
        Qm = jnp.stack(Q, axis=1)
        w = w - Qm @ (Qm.T @ w)
        beta = jnp.linalg.norm(w)
        if j < k - 1:
            betas.append(beta)
            Q.append(jnp.where(beta > 1e-12, w / jnp.maximum(beta, 1e-30),
                               jnp.zeros_like(w)))
    return jnp.stack(alphas), (jnp.stack(betas) if betas else jnp.zeros((0,))), \
        jnp.stack(Q, axis=1)


def lanczos_eigh(op, k: int, key=None):
    """Top-k approximate eigenpairs (evals (k,), evecs (P, k))."""
    alphas, betas, Q = lanczos_tridiag(op, k, key=key)
    T = jnp.diag(alphas)
    if betas.shape[0] > 0:
        T = T + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    evals, S = jnp.linalg.eigh(T)
    evecs = Q @ S
    return evals, evecs


def lanczos_spectrum(op, k: int = 64, n_probes: int = 4, key=None,
                     n_bins: int = 100, margin: float = 0.05):
    """Smoothed spectral density estimate over [min, max] eigenvalue range
    (Papyan 2020 style, curvlinops/papyan2020traces/spectrum.py:19).

    Returns (grid, density) averaged over ``n_probes`` random starts."""
    key = key if key is not None else jax.random.PRNGKey(0)
    all_nodes, all_weights = [], []
    for i in range(n_probes):
        sub = jax.random.fold_in(key, i)
        alphas, betas, _ = lanczos_tridiag(op, k, key=sub)
        T = jnp.diag(alphas)
        if betas.shape[0] > 0:
            T = T + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        evals, S = jnp.linalg.eigh(T)
        weights = S[0, :] ** 2        # Gaussian-quadrature weights
        all_nodes.append(np.asarray(evals))
        all_weights.append(np.asarray(weights))
    nodes = np.concatenate(all_nodes)
    weights = np.concatenate(all_weights) / n_probes
    lo, hi = nodes.min(), nodes.max()
    span = max(hi - lo, 1e-12)
    lo, hi = lo - margin * span, hi + margin * span
    grid = np.linspace(lo, hi, n_bins)
    sigma = (hi - lo) / n_bins * 2
    density = np.zeros(n_bins)
    for n, w in zip(nodes, weights):
        density += w * np.exp(-0.5 * ((grid - n) / sigma) ** 2) \
            / (sigma * np.sqrt(2 * np.pi))
    return grid, density
