"""Matrix-free linear operators over flattened parameter vectors.

TPU-native counterpart of the vendored curvlinops ``_LinearOperator``
(curvlinops/_base.py:19): operators are closures over ``jax.jvp``/``jax.vjp``
on a functional model, accumulated over an iterable of batches. numpy<->param
marshalling (reference :286-332) becomes flatten/unflatten of pytrees; the
determinism self-check (reference :178-226) is `check_deterministic()`.

All matvecs are jit-compiled on first use and operate on flat (P,) vectors;
`matmat` vmaps over columns so K probe vectors cost one batched pass.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import (tree_add, tree_dot, tree_scale, tree_size,
                            tree_unflattener, tree_vector, tree_zeros_like)


class LinearOperator:
    """Symmetric (unless stated) linear operator on flat parameter space."""

    def __init__(self, shape: tuple[int, int], dtype=jnp.float32):
        self.shape = shape
        self.dtype = dtype

    # -- to implement -----------------------------------------------------
    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def rmatvec(self, v: jnp.ndarray) -> jnp.ndarray:
        return self.matvec(v)  # symmetric default

    # -- generic ----------------------------------------------------------
    def matmat(self, V: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(V)

    def __matmul__(self, other):
        other = jnp.asarray(other)
        if other.ndim == 1:
            return self.matvec(other)
        return self.matmat(other)

    def to_dense(self) -> jnp.ndarray:
        eye = jnp.eye(self.shape[1], dtype=self.dtype)
        return self.matmat(eye)

    def trace_exact(self) -> jnp.ndarray:
        return jnp.trace(self.to_dense())

    def check_deterministic(self, key=None, rtol: float = 5e-5,
                            atol: float = 1e-6) -> None:
        """Two matvecs on the same probe must agree
        (curvlinops/_base.py:178-226)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        v = jax.random.normal(key, (self.shape[1],), self.dtype)
        a, b = self.matvec(v), self.matvec(v)
        if not np.allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol):
            raise RuntimeError("Linear operator is not deterministic.")


class PyTreeOperator(LinearOperator):
    """Operator defined by a pytree->pytree matvec over a parameter template."""

    def __init__(self, tree_matvec: Callable[[Any], Any], w_template: Any,
                 jit: bool = True):
        p = tree_size(w_template)
        leaves = jax.tree_util.tree_leaves(w_template)
        dtype = leaves[0].dtype if leaves else jnp.float32
        super().__init__((p, p), dtype)
        self._unflatten = tree_unflattener(w_template)
        self._tree_matvec = tree_matvec
        self.w_template = w_template

        def _mv(v):
            return tree_vector(self._tree_matvec(self._unflatten(v)))

        self._mv = jax.jit(_mv) if jit else _mv

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        return self._mv(v)


def accumulate_over_batches(per_batch: Callable[[Any, Any], Any],
                            data: Iterable[tuple[Any, Any]]):
    """Sum a pytree-valued function over (X, y) batches
    (curvlinops/_base.py:248-265 semantics, sum normalization)."""
    total = None
    for X, y in data:
        term = per_batch(X, y)
        total = term if total is None else tree_add(total, term)
    return total
