"""Adjacency-matrix ops: normalization, straight-through estimators, sampling.

TPU-native counterparts of reference ``gnn/models/utils.py``:
  - ``normalize_adj``       (reference :106-112): D^-1/2 A D^-1/2. Expressed as
    row/column scaling (no diag-matrix matmuls) so XLA fuses it into the
    adjacent aggregation matmul.
  - ``BinarizeSTE``         (reference :42-86): custom_vjp instead of a torch
    autograd.Function; forward hard-thresholds, backward passes the cotangent
    through (optionally masked and/or sign-taken).
  - ``Clipping``            (reference :89-103).
  - ``power_adj``           (reference :6-10), ``symmetrize_adj`` (:13-16),
    ``train_adj_mask`` (:19-22), ``sample_neigh_adj`` (:115-131).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def normalize_adj(adj: jnp.ndarray) -> jnp.ndarray:
    """Symmetric degree normalization D^-1/2 A D^-1/2.

    Matches reference gnn/models/utils.py:106-112 exactly, including that the
    degree is the *row* sum used on both sides: ``(A @ D^-1/2).T @ D^-1/2`` =
    D^-1/2 A^T D^-1/2. (Note the reference transposes A; for symmetric A this
    is the textbook normalization.)
    """
    rowsum = jnp.sum(adj, axis=1)
    d_inv_sqrt = jnp.where(rowsum > 0, jax.lax.rsqrt(jnp.maximum(rowsum, 1e-38)), 0.0)
    # (adj @ diag(d)).T @ diag(d) == d[:,None] * adj.T * d[None,:]
    return d_inv_sqrt[:, None] * adj.T * d_inv_sqrt[None, :]


def symmetrize_adj(adj: jnp.ndarray) -> jnp.ndarray:
    """A + A^T clipped at 1 (reference gnn/models/utils.py:13-16)."""
    s = adj + adj.T
    return jnp.minimum(s, 1.0)


def power_adj(adj: jnp.ndarray, power: int) -> jnp.ndarray:
    """A^power via repeated matmul (reference gnn/models/utils.py:6-10)."""
    out = adj
    for _ in range(power - 1):
        out = out @ adj
    return out


def train_adj_mask(n_nodes: int, train_nodes: jnp.ndarray) -> jnp.ndarray:
    """Ones mask zeroed on the train×train block (gnn/models/utils.py:19-22)."""
    mask = jnp.ones((n_nodes, n_nodes))
    return mask.at[jnp.ix_(train_nodes, train_nodes)].set(0.0)


def fill_diagonal(adj: jnp.ndarray, value: float) -> jnp.ndarray:
    n = adj.shape[0]
    eye = jnp.eye(n, dtype=adj.dtype)
    return adj * (1.0 - eye) + value * eye


def fill_diagonal_any(adj, value: float):
    """fill_diagonal that keeps host (numpy) inputs on the host — model
    constructors use this so eager device work (and any later validation
    fetch) is avoided when building models from numpy data."""
    import jax
    import numpy as np
    if isinstance(adj, jax.Array):
        return fill_diagonal(adj, value)
    out = np.array(adj, copy=True)
    np.fill_diagonal(out, value)
    return out


# ---------------------------------------------------------------------------
# Straight-through estimators
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def binarize_ste(x: jnp.ndarray, threshold: float, mask=None,
                 sign_grad: bool = False) -> jnp.ndarray:
    """Hard threshold with straight-through gradient.

    Forward: ``(x > threshold).astype(float)``. Backward: cotangent passed
    through unchanged, optionally multiplied by ``mask`` and/or replaced by its
    sign — reference gnn/models/utils.py:42-86 (BinarizeSTE).
    """
    del mask, sign_grad
    return (x > threshold).astype(x.dtype)


def _binarize_fwd(x, threshold, mask, sign_grad):
    return binarize_ste(x, threshold, mask, sign_grad), mask


def _binarize_bwd(threshold, sign_grad, mask, g):
    del threshold
    if mask is not None:
        g = g * mask
    if sign_grad:
        g = jnp.sign(g)
    return (g, None)


binarize_ste.defvjp(_binarize_fwd, _binarize_bwd)


@jax.custom_vjp
def clip_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1]; backward clamps the cotangent to [0, 1] as well
    (reference gnn/models/utils.py:89-103, Clipping)."""
    return jnp.clip(x, 0.0, 1.0)


def _clip_fwd(x):
    return clip_ste(x), None


def _clip_bwd(_, g):
    return (jnp.clip(g, 0.0, 1.0),)


clip_ste.defvjp(_clip_fwd, _clip_bwd)


# ---------------------------------------------------------------------------
# Neighbor sampling (GraphSAGE)
# ---------------------------------------------------------------------------

def sample_neigh_adj(key, adj: jnp.ndarray, k: int | None) -> jnp.ndarray:
    """Per-row sample of at most ``k`` neighbors (gnn/models/utils.py:115-131).

    TPU-native formulation: instead of per-row nonzero/randperm (dynamic
    shapes), draw iid uniforms, mask to existing edges, and keep the top-k per
    row — equivalent in distribution to sampling k neighbors without
    replacement, with static shapes throughout.
    """
    if k is None:
        return adj
    n = adj.shape[0]
    scores = jax.random.uniform(key, (n, n))
    scores = jnp.where(adj > 0, scores, -jnp.inf)
    kth = jax.lax.top_k(scores, k)[0][:, -1:]  # k-th largest per row
    keep = (scores >= kth) & (adj > 0)
    return keep.astype(adj.dtype)


def preprocess_adj(adj: jnp.ndarray) -> jnp.ndarray:
    """Self-loops + symmetric degree normalization in one call
    (reference gnn/utils.py:379-384)."""
    return normalize_adj(adj + jnp.eye(adj.shape[0], dtype=adj.dtype))
