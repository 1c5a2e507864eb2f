"""Curvature matrix-vector products as jvp/vjp closures.

TPU-native counterparts of the vendored curvlinops operators:
  - HessianOperator       (curvlinops/hessian.py:16)  — double-backward HVP
  - GGNOperator           (curvlinops/ggn.py:14)      — J^T H_loss J v
  - EFOperator            (curvlinops/gradient_moments.py:17)
  - FisherMCOperator      (curvlinops/fisher.py:19)
  - JacobianOperator / TransposedJacobianOperator (curvlinops/jacobian.py:17,185)

Everything is a pure function of ``(w, data)``; no hooks, no state. The EF and
MC-Fisher matvecs use the R-op/L-op composition
``F v = (d l/dw)^T ((d l/dw) v)`` on the vector of per-sample losses — one
jvp + one vjp, no per-sample gradient materialization.

``model_fn(w, X) -> (M, C)`` must close over frozen (non-posterior) params.
All losses are sum-reduction (see losses.py).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import tree_add, tree_size, tree_unflattener, tree_vector
from .base import LinearOperator, PyTreeOperator, accumulate_over_batches
from .losses import (get_loss_fn, loss_hessian_mvp, sample_labels)


# ---------------------------------------------------------------------------
# Per-batch tree matvecs
# ---------------------------------------------------------------------------

def hvp_tree(loss_of_w: Callable[[Any], jnp.ndarray], w, v_tree):
    """Hessian-vector product via forward-over-reverse."""
    return jax.jvp(jax.grad(loss_of_w), (w,), (v_tree,))[1]


def ggn_vp_tree(model_fn, likelihood: str, w, X, v_tree):
    """GGN-vector product: J^T H_loss(f) J v (curvlinops/ggn.py:44-75)."""
    f, jv = jax.jvp(lambda w_: model_fn(w_, X), (w,), (v_tree,))
    hjv = loss_hessian_mvp(likelihood, f, jv)
    _, pullback = jax.vjp(lambda w_: model_fn(w_, X), w)
    return pullback(hjv)[0]


def ef_vp_tree(model_fn, loss_fn, w, X, y, v_tree):
    """Empirical-Fisher vector product sum_n g_n g_n^T v via the per-sample
    loss vector l(w): F v = (dl/dw)^T ((dl/dw) v)."""

    def per_sample_losses(w_):
        f = model_fn(w_, X)
        return jax.vmap(lambda fi, yi: loss_fn(fi[None], yi[None]))(f, y)

    _, t = jax.jvp(per_sample_losses, (w,), (v_tree,))
    _, pullback = jax.vjp(per_sample_losses, w)
    return pullback(t)[0]


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------

class HessianOperator(PyTreeOperator):
    """Exact Hessian of the total (sum over batches) loss."""

    def __init__(self, model_fn, likelihood: str, w, data, jit: bool = True):
        loss_fn = get_loss_fn(likelihood)
        data = list(data)

        def tree_matvec(v_tree):
            def per_batch(X, y):
                return hvp_tree(lambda w_: loss_fn(model_fn(w_, X), y),
                                w, v_tree)
            return accumulate_over_batches(per_batch, data)

        super().__init__(tree_matvec, w, jit=jit)


class GGNOperator(PyTreeOperator):
    def __init__(self, model_fn, likelihood: str, w, data, jit: bool = True):
        data = list(data)

        def tree_matvec(v_tree):
            def per_batch(X, y):
                return ggn_vp_tree(model_fn, likelihood, w, X, v_tree)
            return accumulate_over_batches(per_batch, data)

        super().__init__(tree_matvec, w, jit=jit)


class EFOperator(PyTreeOperator):
    def __init__(self, model_fn, likelihood: str, w, data, jit: bool = True):
        loss_fn = get_loss_fn(likelihood)
        data = list(data)

        def tree_matvec(v_tree):
            def per_batch(X, y):
                return ef_vp_tree(model_fn, loss_fn, w, X, y, v_tree)
            return accumulate_over_batches(per_batch, data)

        super().__init__(tree_matvec, w, jit=jit)


class FisherMCOperator(PyTreeOperator):
    """Monte-Carlo Fisher: EF with labels sampled from the model's predictive,
    seeded deterministically (curvlinops/fisher.py:108-180)."""

    def __init__(self, model_fn, likelihood: str, w, data,
                 mc_samples: int = 1, seed: int = 2147483647, jit: bool = True):
        loss_fn = get_loss_fn(likelihood)
        data = list(data)
        key0 = jax.random.PRNGKey(seed)

        def tree_matvec(v_tree):
            total = None
            for b, (X, y) in enumerate(data):
                f = model_fn(w, X)
                kb = jax.random.fold_in(key0, b)
                keys = jax.vmap(lambda m: jax.random.fold_in(kb, m))(
                    jnp.arange(mc_samples))

                def one_sample(k):
                    y_s = sample_labels(k, likelihood, f)
                    return ef_vp_tree(model_fn, loss_fn, w, X, y_s, v_tree)

                terms = jax.vmap(one_sample)(keys)
                term = jax.tree_util.tree_map(lambda t: t.mean(axis=0), terms)
                total = term if total is None else tree_add(total, term)
            return total

        super().__init__(tree_matvec, w, jit=jit)


class JacobianOperator(LinearOperator):
    """(sum_b M_b * C) x P Jacobian of the concatenated model outputs
    (curvlinops/jacobian.py:17)."""

    def __init__(self, model_fn, w, data, jit: bool = True):
        self.data = list(data)
        self._w = w
        self._model_fn = model_fn
        outs = [model_fn(w, X) for X, _ in self.data]
        self._out_shapes = [o.shape for o in outs]
        rows = sum(int(jnp.size(o)) for o in outs)
        p = tree_size(w)
        super().__init__((rows, p), outs[0].dtype)
        self._unflatten = tree_unflattener(w)

        def _mv(v):
            v_tree = self._unflatten(v)
            outs = []
            for X, _ in self.data:
                _, jv = jax.jvp(lambda w_: model_fn(w_, X), (w,), (v_tree,))
                outs.append(jv.ravel())
            return jnp.concatenate(outs)

        def _rmv(u):
            total = None
            off = 0
            for (X, _), shp in zip(self.data, self._out_shapes):
                n = 1
                for d in shp:
                    n *= int(d)
                cot = u[off: off + n].reshape(shp)
                off += n
                _, pullback = jax.vjp(lambda w_: model_fn(w_, X), w)
                term = pullback(cot)[0]
                total = term if total is None else tree_add(total, term)
            return tree_vector(total)

        self._mv = jax.jit(_mv) if jit else _mv
        self._rmv = jax.jit(_rmv) if jit else _rmv

    def matvec(self, v):
        return self._mv(v)

    def rmatvec(self, u):
        return self._rmv(u)


class TransposedJacobianOperator(LinearOperator):
    """P x (N*C) transpose view (curvlinops/jacobian.py:185)."""

    def __init__(self, model_fn, w, data, jit: bool = True):
        self.J = JacobianOperator(model_fn, w, data, jit=jit)
        super().__init__((self.J.shape[1], self.J.shape[0]), self.J.dtype)

    def matvec(self, v):
        return self.J.rmatvec(v)

    def rmatvec(self, u):
        return self.J.matvec(u)


class ScaledOperator(LinearOperator):
    def __init__(self, op: LinearOperator, scale: float):
        super().__init__(op.shape, op.dtype)
        self.op, self.scale = op, scale

    def matvec(self, v):
        return self.scale * self.op.matvec(v)


class SumOperator(LinearOperator):
    def __init__(self, *ops: LinearOperator):
        super().__init__(ops[0].shape, ops[0].dtype)
        self.ops = ops

    def matvec(self, v):
        out = self.ops[0].matvec(v)
        for op in self.ops[1:]:
            out = out + op.matvec(v)
        return out


class DiagShiftOperator(LinearOperator):
    """op + diag(shift) — e.g. curvature + prior precision."""

    def __init__(self, op: LinearOperator, shift):
        super().__init__(op.shape, op.dtype)
        self.op = op
        self.shift = jnp.asarray(shift)

    def matvec(self, v):
        return self.op.matvec(v) + self.shift * v


class SubmatrixOperator(LinearOperator):
    """Row/column-index view of a base operator
    (curvlinops/submatrix.py:11)."""

    def __init__(self, op: LinearOperator, row_idx, col_idx):
        self.op = op
        self.row_idx = jnp.asarray(row_idx)
        self.col_idx = jnp.asarray(col_idx)
        super().__init__((len(row_idx), len(col_idx)), op.dtype)

    def set_submatrix(self, row_idx, col_idx) -> None:
        """Re-target the view (reference SubmatrixLinearOperator
        .set_submatrix, curvlinops/submatrix.py)."""
        self.row_idx = jnp.asarray(row_idx)
        self.col_idx = jnp.asarray(col_idx)
        self.shape = (len(row_idx), len(col_idx))

    def matvec(self, v):
        full = jnp.zeros((self.op.shape[1],), self.dtype)
        full = full.at[self.col_idx].set(v)
        return self.op.matvec(full)[self.row_idx]


class OuterProductOperator(LinearOperator):
    """sum_k c_k x_k x_k^T (curvlinops/outer.py:9)."""

    def __init__(self, X: jnp.ndarray, c: Optional[jnp.ndarray] = None):
        # X: (K, P) rows are factors
        self.X = X
        self.c = jnp.ones(X.shape[0], X.dtype) if c is None else jnp.asarray(c)
        super().__init__((X.shape[1], X.shape[1]), X.dtype)

    def matvec(self, v):
        return self.X.T @ (self.c * (self.X @ v))


class Projector(OuterProductOperator):
    """Orthogonal projector onto the span of orthonormal rows of X
    (curvlinops/outer.py:58)."""
