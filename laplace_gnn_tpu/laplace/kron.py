"""Kronecker-factored curvature algebra: ``Kron`` and ``KronDecomposed``.

TPU-native counterpart of reference ``laplace/utils/matrix.py`` (Kron:16,
KronDecomposed:277). Both classes are registered JAX pytrees, so they pass
through ``jit``/``grad`` transparently — which is what makes the marginal
likelihood differentiable w.r.t. the adjacency without any of the reference
fork's retain-graph hacks.

Block order convention: one block group per *posterior parameter leaf* in JAX
tree order (for a Linear layer dict that is bias before weight). A bias leaf
has a single factor [B]; a weight leaf (out, in) has two factors
[G (out,out), A (in,in)] with row-major (out, in) vec ordering — the same
orientation as the reference's [B, A] per weight
(laplace/curvature/curvlinops.py:55-75, laplace/utils/matrix.py:53-71).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import batched_symeig


def _is_scalarish(x) -> bool:
    return jnp.ndim(x) == 0 or (jnp.ndim(x) == 1 and jnp.shape(x)[0] == 1)


@jax.tree_util.register_pytree_node_class
class Kron:
    """List of Kronecker factor groups; each group is [F] or [G, A]."""

    def __init__(self, kfacs: list[list[jnp.ndarray]]):
        self.kfacs = kfacs

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        leaves = [f for group in self.kfacs for f in group]
        structure = tuple(len(g) for g in self.kfacs)
        return leaves, structure

    @classmethod
    def tree_unflatten(cls, structure, leaves):
        kfacs, i = [], 0
        for n in structure:
            kfacs.append(list(leaves[i: i + n]))
            i += n
        return cls(kfacs)

    # -- construction ------------------------------------------------------
    @classmethod
    def init_from_tree(cls, w_tree, dtype=None) -> "Kron":
        """Zero factors shaped from a posterior parameter pytree
        (reference Kron.init_from_model, laplace/utils/matrix.py:33-72)."""
        kfacs = []
        for leaf in jax.tree_util.tree_leaves(w_tree):
            dt = dtype or leaf.dtype
            if leaf.ndim == 1:
                p = leaf.shape[0]
                kfacs.append([jnp.zeros((p, p), dt)])
            elif leaf.ndim >= 2:
                # (out, in) for Linear; (out, in, kh, kw) for Conv2d where
                # the A factor covers the flattened in*kh*kw patch dimension
                o, i = leaf.shape[0], int(np.prod(leaf.shape[1:]))
                kfacs.append([jnp.zeros((o, o), dt), jnp.zeros((i, i), dt)])
            else:
                raise ValueError("Invalid parameter shape for Kron.")
        return cls(kfacs)

    # -- algebra -----------------------------------------------------------
    def __add__(self, other: "Kron") -> "Kron":
        if not isinstance(other, Kron):
            raise ValueError("Can only add Kron to Kron.")
        return Kron([[a + b for a, b in zip(ga, gb)]
                     for ga, gb in zip(self.kfacs, other.kfacs)])

    def __mul__(self, scalar) -> "Kron":
        """Distribute scalar across factors as scalar**(1/len(group))
        (reference :96-113)."""
        if not _is_scalarish(scalar):
            raise ValueError("Input not valid scalar.")
        scalar = jnp.asarray(scalar)
        return Kron([[scalar ** (1.0 / len(g)) * f for f in g]
                     for g in self.kfacs])

    __radd__ = __add__
    __rmul__ = __mul__

    def __len__(self) -> int:
        return len(self.kfacs)

    def detach(self) -> "Kron":
        """Stop-gradient copy (reference KronDecomposed.detach analog —
        in JAX 'detach' is jax.lax.stop_gradient over the pytree)."""
        return jax.lax.stop_gradient(self)

    def decompose(self, damping: bool = False) -> "KronDecomposed":
        """Eigendecompose every factor (reference :118-145).

        Same-size factors share one batched eigh (ops/linalg.py::
        batched_symeig) — each separate data-dependent eigh costs a fixed
        TPU pipeline stall, so k same-size calls collapse to ~one."""
        dense = [(gi, fi, F) for gi, group in enumerate(self.kfacs)
                 for fi, F in enumerate(group) if F.ndim > 1]
        dense_eigs = batched_symeig([F for _, _, F in dense])
        by_pos = {(gi, fi): lw for (gi, fi, _), lw in zip(dense, dense_eigs)}
        eigvecs, eigvals = [], []
        for gi, group in enumerate(self.kfacs):
            Qs, ls = [], []
            for fi, F in enumerate(group):
                if F.ndim > 1:
                    l, Q = by_pos[(gi, fi)]
                else:
                    l, Q = F, jnp.eye(F.shape[0], dtype=F.dtype)
                Qs.append(Q)
                ls.append(l)
            eigvecs.append(Qs)
            eigvals.append(ls)
        return KronDecomposed(eigvecs, eigvals, damping=damping)

    # -- linear maps (reference :147-215) ----------------------------------
    def _bmm(self, W: jnp.ndarray) -> jnp.ndarray:
        B, K, P = W.shape
        W = W.reshape(B * K, P)
        cur = 0
        out = []
        for group in self.kfacs:
            if len(group) == 1:
                Q = group[0]
                p = Q.shape[0]
                Wp = W[:, cur: cur + p].T
                out.append((Q @ Wp).T if Q.ndim > 1 else (Q[:, None] * Wp).T)
                cur += p
            else:
                Q, H = group
                po, pi = Q.shape[0], H.shape[0]
                p = po * pi
                Wp = W[:, cur: cur + p].reshape(B * K, po, pi)
                QW = Q @ Wp if Q.ndim > 1 else Q[:, None] * Wp
                QWH = QW @ H.T if H.ndim > 1 else QW * H[None, :]
                out.append(QWH.reshape(B * K, p))
                cur += p
        return jnp.concatenate(out, axis=1).reshape(B, K, P)

    def bmm(self, W: jnp.ndarray, exponent: float = 1) -> jnp.ndarray:
        if exponent != 1:
            raise ValueError("Only supported after decomposition.")
        if W.ndim == 1:
            return self._bmm(W[None, None, :]).squeeze()
        if W.ndim == 2:
            return self._bmm(W[:, None, :]).squeeze(1)
        if W.ndim == 3:
            return self._bmm(W)
        raise ValueError("Invalid shape for W")

    def logdet(self) -> jnp.ndarray:
        """Sum of block logdets (reference :217-241)."""
        out = 0.0
        for group in self.kfacs:
            if len(group) == 1:
                F = group[0]
                out = out + (jnp.linalg.slogdet(F)[1] if F.ndim > 1
                             else jnp.sum(jnp.log(F)))
            else:
                Q, H = group
                po, pi = Q.shape[0], H.shape[0]
                ld_q = jnp.linalg.slogdet(Q)[1] if Q.ndim > 1 else jnp.sum(jnp.log(Q))
                ld_h = jnp.linalg.slogdet(H)[1] if H.ndim > 1 else jnp.sum(jnp.log(H))
                out = out + pi * ld_q + po * ld_h
        return out

    def diag(self) -> jnp.ndarray:
        """Diagonal of the block-Kronecker matrix (reference :243-261)."""
        diags = []
        for group in self.kfacs:
            F0 = jnp.diag(group[0]) if group[0].ndim > 1 else group[0]
            if len(group) == 1:
                diags.append(F0)
            else:
                F1 = jnp.diag(group[1]) if group[1].ndim > 1 else group[1]
                diags.append(jnp.outer(F0, F1).ravel())
        return jnp.concatenate(diags)

    def to_matrix(self) -> jnp.ndarray:
        """Dense block-diagonal materialization — tests only (reference :253)."""
        blocks = []
        for group in self.kfacs:
            F0 = group[0] if group[0].ndim > 1 else jnp.diag(group[0])
            if len(group) == 1:
                blocks.append(F0)
            else:
                F1 = group[1] if group[1].ndim > 1 else jnp.diag(group[1])
                blocks.append(jnp.kron(F0, F1))
        return jax.scipy.linalg.block_diag(*blocks)


@jax.tree_util.register_pytree_node_class
class KronDecomposed:
    """Eigendecomposed Kron with additive per-block ``deltas`` (prior
    precision) and optional Martens-style damping (reference :277-470)."""

    def __init__(self, eigenvectors, eigenvalues,
                 deltas: Optional[jnp.ndarray] = None, damping: bool = False):
        self.eigenvectors = eigenvectors
        self.eigenvalues = eigenvalues
        if deltas is None:
            dt = eigenvalues[0][0].dtype
            deltas = jnp.zeros(len(eigenvalues), dtype=dt)
        self.deltas = deltas
        self.damping = damping

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        leaves = ([q for g in self.eigenvectors for q in g]
                  + [l for g in self.eigenvalues for l in g]
                  + [self.deltas])
        structure = (tuple(len(g) for g in self.eigenvectors), self.damping)
        return leaves, structure

    @classmethod
    def tree_unflatten(cls, structure, leaves):
        lens, damping = structure
        n = sum(lens)
        qs, ls, deltas = leaves[:n], leaves[n: 2 * n], leaves[2 * n]
        eigenvectors, eigenvalues, i = [], [], 0
        for k in lens:
            eigenvectors.append(list(qs[i: i + k]))
            eigenvalues.append(list(ls[i: i + k]))
            i += k
        return cls(eigenvectors, eigenvalues, deltas, damping)

    def _check_deltas(self, deltas) -> None:
        deltas = jnp.asarray(deltas)
        if deltas.ndim == 0 or (deltas.ndim == 1
                                and deltas.shape[0] in (1, len(self))):
            return
        raise ValueError("Invalid shape of delta added to KronDecomposed.")

    def __add__(self, deltas) -> "KronDecomposed":
        self._check_deltas(deltas)
        return KronDecomposed(self.eigenvectors, self.eigenvalues,
                              self.deltas + jnp.asarray(deltas), self.damping)

    def __mul__(self, scalar) -> "KronDecomposed":
        if not _is_scalarish(scalar):
            raise ValueError("Invalid argument, can only multiply Kron with "
                             "scalar.")
        scalar = jnp.asarray(scalar)
        eigenvalues = [[scalar ** (1.0 / len(ls)) * l for l in ls]
                       for ls in self.eigenvalues]
        return KronDecomposed(self.eigenvectors, eigenvalues, self.deltas,
                              self.damping)

    __radd__ = __add__
    __rmul__ = __mul__

    def __len__(self) -> int:
        return len(self.eigenvalues)

    def detach(self) -> "KronDecomposed":
        """(reference laplace/utils/matrix.py KronDecomposed.detach)"""
        return jax.lax.stop_gradient(self)

    def _block_eigs(self, ls, delta):
        """Effective eigenvalue grid of one block including the prior."""
        if len(ls) == 1:
            return ls[0] + delta
        l1, l2 = ls
        if self.damping:
            return jnp.outer(l1 + jnp.sqrt(delta), l2 + jnp.sqrt(delta))
        return jnp.outer(l1, l2) + delta

    def logdet(self) -> jnp.ndarray:
        """(reference :371-394)"""
        out = 0.0
        for ls, delta in zip(self.eigenvalues, self.deltas):
            out = out + jnp.sum(jnp.log(self._block_eigs(ls, delta)))
        return out

    def _bmm(self, W: jnp.ndarray, exponent: float = -1) -> jnp.ndarray:
        """(self)^exponent @ W for W (B, K, P) (reference :396-446)."""
        B, K, P = W.shape
        W = W.reshape(B * K, P)
        cur = 0
        out = []
        for ls, Qs, delta in zip(self.eigenvalues, self.eigenvectors,
                                 self.deltas):
            leff = self._block_eigs(ls, delta)
            if len(ls) == 1:
                Q = Qs[0]
                p = ls[0].shape[0]
                ldelta_exp = (leff ** exponent)[:, None]
                Wp = W[:, cur: cur + p].T
                out.append((Q @ (ldelta_exp * (Q.T @ Wp))).T)
                cur += p
            else:
                Q1, Q2 = Qs
                po, pi = ls[0].shape[0], ls[1].shape[0]
                p = po * pi
                ldelta_exp = (leff ** exponent)[None]
                Wp = W[:, cur: cur + p].reshape(B * K, po, pi)
                Wp = (Q1.T @ Wp @ Q2) * ldelta_exp
                Wp = Q1 @ Wp @ Q2.T
                out.append(Wp.reshape(B * K, p))
                cur += p
        return jnp.concatenate(out, axis=1).reshape(B, K, P)

    def bmm(self, W: jnp.ndarray, exponent: float = -1) -> jnp.ndarray:
        if W.ndim == 1:
            return self._bmm(W[None, None, :], exponent).squeeze()
        if W.ndim == 2:
            return self._bmm(W[:, None, :], exponent).squeeze(1)
        if W.ndim == 3:
            return self._bmm(W, exponent)
        raise ValueError("Invalid shape for W")

    def inv_square_form(self, W: jnp.ndarray) -> jnp.ndarray:
        """W P^{-1} W^T batched (reference :448-452)."""
        SW = self._bmm(W, exponent=-1)
        return jnp.einsum("bkp,blp->bkl", W, SW)

    def diag(self) -> jnp.ndarray:
        """Diagonal of the represented matrix (incl. deltas)."""
        diags = []
        for ls, Qs, delta in zip(self.eigenvalues, self.eigenvectors,
                                 self.deltas):
            leff = self._block_eigs(ls, delta)
            if len(ls) == 1:
                Q = Qs[0]
                diags.append(jnp.einsum("ij,j,ij->i", Q, leff, Q))
            else:
                Q1, Q2 = Qs
                d = jnp.einsum("ab,cd,bd,ab,cd->ac", Q1, Q2, leff, Q1, Q2)
                diags.append(d.ravel())
        return jnp.concatenate(diags)

    def to_matrix(self, exponent: float = 1) -> jnp.ndarray:
        """Dense materialization (tests only)."""
        blocks = []
        for ls, Qs, delta in zip(self.eigenvalues, self.eigenvectors,
                                 self.deltas):
            leff = self._block_eigs(ls, delta)
            if len(ls) == 1:
                Q = Qs[0]
                blocks.append(Q @ jnp.diag(leff ** exponent) @ Q.T)
            else:
                Q = jnp.kron(Qs[0], Qs[1])
                blocks.append(Q @ jnp.diag((leff ** exponent).ravel()) @ Q.T)
        return jax.scipy.linalg.block_diag(*blocks)
