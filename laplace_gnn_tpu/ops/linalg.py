"""Dense linear-algebra helpers for the Laplace stack.

TPU-native counterparts of reference helpers in
``laplace/utils/utils.py`` (symeig:193-226, invsqrt_precision:118,
kron:148, block_diag:229, normal_samples:329). JAX ``eigh`` never raises at
trace time, so instead of try/except jitter retries we clamp eigenvalues at
zero and sanitize NaNs — the same post-conditions the reference enforces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def symeig(M: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition with the reference's safety post-conditions:
    eigenvalues clamped to >= 0 and NaNs zeroed (laplace/utils/utils.py:193-226).

    Returns (eigenvalues, eigenvectors), ascending eigenvalues.
    """
    M = 0.5 * (M + M.T)
    L, W = jnp.linalg.eigh(M)
    L = jnp.nan_to_num(jnp.clip(L, min=0.0))
    W = jnp.nan_to_num(W)
    return L, W


def safe_symeig(M: jnp.ndarray, jitter: float = 0.0):
    """symeig with optional explicit diagonal jitter (added then subtracted)."""
    if jitter:
        n = M.shape[0]
        L, W = symeig(M + jitter * jnp.eye(n, dtype=M.dtype))
        return jnp.clip(L - jitter, min=0.0), W
    return symeig(M)


def _same_size_groups(mats) -> dict:
    """Indices of ``mats`` grouped by matrix dimension."""
    groups: dict = {}
    for i, m in enumerate(mats):
        groups.setdefault(int(m.shape[0]), []).append(i)
    return groups


def batched_eigvalsh(mats) -> list:
    """Eigenvalues of several small symmetric matrices, stacking same-size
    matrices into one batched ``eigvalsh`` call.

    Measured on TPU v5e: each data-dependent eigendecomposition embedded in
    a larger program costs a fixed ~0.1-0.2 ms pipeline stall on top of its
    FLOPs (XLA's eigh is a sequential sweep loop that drains the DMA
    pipeline), so k calls cost ~k stalls while one (k, d, d) batched call
    costs ~one. Padding differently sized matrices into a common batch or
    one block-diagonal composite was measured SLOWER than separate calls
    (the extra sweep work dominates), hence the exact-same-size-only policy.

    Returns a list of ascending eigenvalue vectors, one per input matrix.
    """
    mats = list(mats)
    out: list = [None] * len(mats)
    for d, idxs in _same_size_groups(mats).items():
        if len(idxs) == 1:
            out[idxs[0]] = jnp.linalg.eigvalsh(mats[idxs[0]])
        else:
            lams = jnp.linalg.eigvalsh(jnp.stack([mats[i] for i in idxs]))
            for t, i in enumerate(idxs):
                out[i] = lams[t]
    return out


def batched_symeig(mats) -> list:
    """Like :func:`batched_eigvalsh` but returns ``(eigenvalues,
    eigenvectors)`` pairs with the reference's clamp/NaN post-conditions
    (:func:`symeig`). Same-size stacking policy as batched_eigvalsh."""
    mats = [0.5 * (m + m.T) for m in mats]
    out: list = [None] * len(mats)
    for d, idxs in _same_size_groups(mats).items():
        if len(idxs) == 1:
            out[idxs[0]] = symeig(mats[idxs[0]])
        else:
            L, W = jnp.linalg.eigh(jnp.stack([mats[i] for i in idxs]))
            for t, i in enumerate(idxs):
                out[i] = (jnp.nan_to_num(jnp.clip(L[t], min=0.0)),
                          jnp.nan_to_num(W[t]))
    return out


def invsqrt_precision(M: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular scale ``S`` with ``S S^T = M^{-1}`` for a precision matrix.

    Matches torch.distributions' ``_precision_to_scale_tril`` used by the
    reference (laplace/utils/utils.py:118): Cholesky of the reversed matrix,
    then triangular solve of identity.
    """
    Lf = jnp.linalg.cholesky(jnp.flip(M, (-2, -1)))
    L_inv = jnp.transpose(jnp.flip(Lf, (-2, -1)), (-1, -2))
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return jax.scipy.linalg.solve_triangular(L_inv, eye, lower=True)


def kron(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Kronecker product (laplace/utils/utils.py:148)."""
    return jnp.kron(A, B)


def block_diag(blocks: list[jnp.ndarray]) -> jnp.ndarray:
    """Dense block-diagonal composition (laplace/utils/utils.py:229)."""
    return jax.scipy.linalg.block_diag(*blocks)


def diagonal_add_scalar(X: jnp.ndarray, value) -> jnp.ndarray:
    n = X.shape[0]
    return X + value * jnp.eye(n, dtype=X.dtype)


def normal_samples(key, mean: jnp.ndarray, var: jnp.ndarray,
                   n_samples: int) -> jnp.ndarray:
    """Samples from batched Normals with diagonal or full covariance ``var``.

    mean: (B, K); var: (B, K) diagonal or (B, K, K) full.
    Returns (n_samples, B, K). Mirrors laplace/utils/utils.py:329-368.
    """
    B, K = mean.shape
    eps = jax.random.normal(key, (K, n_samples), dtype=mean.dtype)
    if mean.shape == var.shape:  # diagonal
        scaled = jnp.sqrt(var)[..., None] * eps[None]
    elif var.shape == (B, K, K):  # full covariance
        scale = jnp.linalg.cholesky(var)
        scaled = scale @ eps[None]
    else:
        raise ValueError("Invalid input shapes.")
    return jnp.transpose(mean[..., None] + scaled, (2, 0, 1))


def cho_solve_psd(M: jnp.ndarray, B: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Solve ``M X = B`` for symmetric PSD ``M`` via Cholesky with jitter."""
    n = M.shape[0]
    Mj = M + jitter * jnp.eye(n, dtype=M.dtype) if jitter else M
    c = jax.scipy.linalg.cho_factor(Mj, lower=True)
    return jax.scipy.linalg.cho_solve(c, B)
