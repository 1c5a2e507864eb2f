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
        v0 = jax.random.normal(key, (P,), dtype=op.dtype)
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


def fast_lanczos(op, ncv: int, key=None, use_scan: bool = True):
    """Lanczos without reorthogonalization (Papyan 2020 algorithm 2;
    reference curvlinops/papyan2020traces/spectrum.py:374-424).

    The three-term recurrence carries only (v, v_prev), so it runs as a
    ``lax.scan`` — one compiled TPU program for all ``ncv`` matvecs instead
    of a Python loop of dispatches.

    Returns (evals, evecs) of the tridiagonal T; ``evecs[:, i]`` is the
    normalized eigenvector of ``evals[i]``."""
    P = op.shape[1]
    key = key if key is not None else jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (P,), dtype=op.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def step(carry, _):
        v, v_prev, beta_prev = carry
        w = op.matvec(v) - beta_prev * v_prev
        alpha = jnp.dot(w, v)
        w = w - alpha * v
        beta = jnp.linalg.norm(w)
        v_next = jnp.where(beta > 1e-30, w / jnp.maximum(beta, 1e-30),
                           jnp.zeros_like(w))
        return (v_next, v, beta), (alpha, beta)

    if use_scan:
        _, (alphas, betas) = jax.lax.scan(
            step, (v0, jnp.zeros_like(v0), jnp.asarray(0.0, v0.dtype)),
            None, length=ncv)
    else:
        carry = (v0, jnp.zeros_like(v0), jnp.asarray(0.0, v0.dtype))
        al, be = [], []
        for _ in range(ncv):
            carry, (a, b) = step(carry, None)
            al.append(a)
            be.append(b)
        alphas, betas = jnp.stack(al), jnp.stack(be)
    T = jnp.diag(alphas)
    if ncv > 1:
        T = T + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    return jnp.linalg.eigh(T)


def _boundary_ncv(tol: float, dim: int, ncv) -> int:
    """Lanczos depth from the requested relative accuracy: extreme Ritz
    values converge geometrically, so ~2/sqrt(tol) iterations suffice for
    well-separated extremes (tol=1e-2 -> 20). An explicit ``ncv`` wins."""
    if ncv is not None:
        return min(ncv, dim)
    if tol <= 0:
        return min(128, dim)
    import math
    return min(dim, max(8, int(math.ceil(2.0 / math.sqrt(tol)))))


def approximate_boundaries(op, tol: float = 1e-2, boundaries=None, key=None,
                           ncv: Optional[int] = None):
    """Estimate (lambda_min, lambda_max) of a symmetric operator
    (reference spectrum.py:425-458; scipy eigsh replaced by TPU-native
    Lanczos-with-reorthogonalization extremes; ``tol`` sets the Lanczos
    depth unless ``ncv`` is given).

    ``boundaries`` may pin one or both ends: (lo, None), (None, hi),
    (lo, hi), or None."""
    lo, hi = (None, None) if boundaries is None else boundaries
    if lo is None or hi is None:
        k = _boundary_ncv(tol, op.shape[1], ncv)
        evals, _ = lanczos_eigh(op, k, key=key)
        lo = float(evals[0]) if lo is None else lo
        hi = float(evals[-1]) if hi is None else hi
    return lo, hi


def approximate_boundaries_abs(op, tol: float = 1e-2, boundaries=None,
                               key=None, ncv: Optional[int] = None):
    """Estimate (lambda_min, lambda_max) of |A| (reference :460-489).

    Caveat vs the reference's eigsh(which='SM'): min|lambda| is taken over
    the Ritz values of A, which converge to the spectrum's *extremes* — for
    an indefinite operator with interior small-magnitude eigenvalues this
    overestimates the lower boundary (it only tightens the log-spectrum
    grid's lower edge). Pin ``boundaries=(lo, None)`` when the true
    min|lambda| is known."""
    lo, hi = (None, None) if boundaries is None else boundaries
    if lo is None or hi is None:
        k = _boundary_ncv(tol, op.shape[1], ncv)
        evals, _ = lanczos_eigh(op, k, key=key)
        aevals = jnp.abs(evals)
        lo = float(aevals.min()) if lo is None else lo
        hi = float(aevals.max()) if hi is None else hi
    return abs(lo), abs(hi)


def _gaussian_pdf(x, mu, sigma):
    return np.exp(-0.5 * ((x - mu) / sigma) ** 2) / (sigma
                                                     * np.sqrt(2 * np.pi))


def lanczos_approximate_spectrum_from_iter(lanczos_iter, boundaries,
                                           num_points: int, kappa: float,
                                           margin: float):
    """Gaussian-bump density from one Lanczos quadrature on the
    [-1, 1]-normalized spectrum (reference spectrum.py:75-108)."""
    evals, evecs = (np.asarray(a) for a in lanczos_iter)
    lo, hi = boundaries
    pad = margin * (hi - lo)
    lo, hi = lo - pad, hi + pad
    c, d = (hi + lo) / 2, (hi - lo) / 2
    grid_norm = np.linspace(-1, 1, num_points, endpoint=True)
    nodes = (evals - c) / d
    weights = evecs[0, :] ** 2 / d
    ncv = evals.shape[0]
    sigma = 2 / (ncv - 1) / np.sqrt(8 * np.log(kappa))
    density = (weights[:, None]
               * _gaussian_pdf(grid_norm[None, :], nodes[:, None],
                               sigma)).sum(0)
    return np.linspace(lo, hi, num_points, endpoint=True), density


def lanczos_approximate_spectrum(op, ncv: int, num_points: int = 1024,
                                 num_repeats: int = 1, kappa: float = 3.0,
                                 boundaries=None, margin: float = 0.05,
                                 boundaries_tol: float = 1e-2, key=None):
    """Approximate spectral density p(lambda) of a symmetric operator
    (Papyan 2020 LanczosApproxSpec; reference spectrum.py:19-73)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    boundaries = approximate_boundaries(op, tol=boundaries_tol,
                                        boundaries=boundaries,
                                        key=jax.random.fold_in(key, 2**31 - 1))
    density = np.zeros(num_points)
    for n in range(num_repeats):
        it = fast_lanczos(op, ncv, key=jax.random.fold_in(key, n))
        grid, d = lanczos_approximate_spectrum_from_iter(
            it, boundaries, num_points, kappa, margin)
        density = (1 - 1 / (n + 1)) * density + d / (n + 1)
    return grid, density


def lanczos_approximate_log_spectrum_from_iter(lanczos_iter, boundaries,
                                               num_points: int, kappa: float,
                                               margin: float,
                                               epsilon: float):
    """Density of log(|A| + eps I) from one Lanczos quadrature
    (reference spectrum.py:265-303)."""
    evals, evecs = (np.asarray(a) for a in lanczos_iter)
    log_lo, log_hi = (np.log(b + epsilon) for b in boundaries)
    pad = margin * (log_hi - log_lo)
    log_lo, log_hi = log_lo - pad, log_hi + pad
    c, d = (log_hi + log_lo) / 2, (log_hi - log_lo) / 2
    grid_norm = np.linspace(-1, 1, num_points, endpoint=True)
    grid_out = np.exp(grid_norm * d + c)
    nodes = (np.log(np.abs(evals) + epsilon) - c) / d
    weights = evecs[0, :] ** 2
    ncv = evals.shape[0]
    sigma = 2 / (ncv - 1) / np.sqrt(8 * np.log(kappa))
    density = (weights[:, None]
               * _gaussian_pdf(grid_norm[None, :], nodes[:, None],
                               sigma)).sum(0) / (d * grid_out)
    return grid_out, density


def lanczos_approximate_log_spectrum(op, ncv: int, num_points: int = 1024,
                                     num_repeats: int = 1,
                                     kappa: float = 1.04, boundaries=None,
                                     margin: float = 0.05,
                                     boundaries_tol: float = 1e-2,
                                     epsilon: float = 1e-5, key=None):
    """Approximate spectral density of log(|A| + eps I)
    (reference spectrum.py:201-263)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    boundaries = approximate_boundaries_abs(op, tol=boundaries_tol,
                                            boundaries=boundaries,
                                            key=jax.random.fold_in(key, 2**31 - 1))
    density = np.zeros(num_points)
    for n in range(num_repeats):
        it = fast_lanczos(op, ncv, key=jax.random.fold_in(key, n))
        grid, d = lanczos_approximate_log_spectrum_from_iter(
            it, boundaries, num_points, kappa, margin, epsilon)
        density = (1 - 1 / (n + 1)) * density + d / (n + 1)
    return grid, density


class _LanczosSpectrumCached:
    """Caches Lanczos quadratures so densities can be re-smoothed with
    different hyperparameters without re-running matvecs
    (reference spectrum.py:110-133)."""

    def __init__(self, op, ncv: int, key=None):
        self._op = op
        self._ncv = ncv
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._iters = []

    def _get_lanczos_iters(self, num_iters: int):
        while len(self._iters) < num_iters:
            self._iters.append(fast_lanczos(
                self._op, self._ncv,
                key=jax.random.fold_in(self._key, len(self._iters))))
        return self._iters[:num_iters]


class LanczosApproximateSpectrumCached(_LanczosSpectrumCached):
    """(reference spectrum.py:135-198)"""

    def __init__(self, op, ncv: int, boundaries=None,
                 boundaries_tol: float = 1e-2, key=None):
        super().__init__(op, ncv, key=key)
        self._boundaries = approximate_boundaries(
            op, tol=boundaries_tol, boundaries=boundaries,
            key=jax.random.fold_in(self._key, 2**31 - 1))

    def approximate_spectrum(self, num_repeats: int = 1,
                             num_points: int = 1024, kappa: float = 3.0,
                             margin: float = 0.05):
        spectra = [lanczos_approximate_spectrum_from_iter(
            it, self._boundaries, num_points, kappa, margin)
            for it in self._get_lanczos_iters(num_repeats)]
        grid = spectra[0][0]
        return grid, sum(s[1] for s in spectra) / num_repeats


class LanczosApproximateLogSpectrumCached(_LanczosSpectrumCached):
    """(reference spectrum.py:305-372)"""

    def __init__(self, op, ncv: int, boundaries=None,
                 boundaries_tol: float = 1e-2, key=None):
        super().__init__(op, ncv, key=key)
        self._boundaries = approximate_boundaries_abs(
            op, tol=boundaries_tol, boundaries=boundaries,
            key=jax.random.fold_in(self._key, 2**31 - 1))

    def approximate_log_spectrum(self, num_repeats: int = 1,
                                 num_points: int = 1024, kappa: float = 3.0,
                                 margin: float = 0.05,
                                 epsilon: float = 1e-5):
        # NOTE: kappa defaults to 3.0 here but 1.04 in the one-shot
        # lanczos_approximate_log_spectrum — this mirrors the reference
        # exactly (curvlinops spectrum.py:201 vs :338), where the cached
        # class also defaults to 3.0.
        spectra = [lanczos_approximate_log_spectrum_from_iter(
            it, self._boundaries, num_points, kappa, margin, epsilon)
            for it in self._get_lanczos_iters(num_repeats)]
        grid = spectra[0][0]
        return grid, sum(s[1] for s in spectra) / num_repeats


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
