"""Inverse linear operators: CG, Neumann, KFAC-inverse.

Counterparts of ``curvlinops/inverse.py`` (CGInverseLinearOperator:35,
NeumannInverseLinearOperator:166, KFACInverseLinearOperator:295 with
plain / heuristic (Martens-Grosse pi) / exact damping). LSMR is subsumed by
CG on the normal equations for the symmetric PSD operators used here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..laplace.kron import Kron
from .base import LinearOperator


class CGInverseOperator(LinearOperator):
    """A^-1 v via conjugate gradients (curvlinops/inverse.py:35)."""

    def __init__(self, op: LinearOperator, tol: float = 1e-5,
                 maxiter: Optional[int] = None, damping: float = 0.0):
        super().__init__(op.shape, op.dtype)
        self.op = op
        self.tol = tol
        self.maxiter = maxiter or op.shape[0]
        self.damping = damping

    def matvec(self, v):
        mv = (self.op.matvec if self.damping == 0
              else lambda x: self.op.matvec(x) + self.damping * x)
        x, _ = jax.scipy.sparse.linalg.cg(mv, v, tol=self.tol,
                                          maxiter=self.maxiter)
        return x


class NeumannInverseOperator(LinearOperator):
    """Truncated Neumann series A^-1 ~ scale * sum_k (I - scale*A)^k
    (curvlinops/inverse.py:166)."""

    def __init__(self, op: LinearOperator, num_terms: int = 100,
                 scale: float = 1.0, check_nan: bool = True):
        super().__init__(op.shape, op.dtype)
        self.op = op
        self.num_terms = num_terms
        self.scale = scale
        self.check_nan = check_nan

    def matvec(self, v):
        result, term = v, v
        for _ in range(self.num_terms):
            term = term - self.scale * self.op.matvec(term)
            result = result + term
        out = self.scale * result
        if self.check_nan and bool(jnp.any(~jnp.isfinite(out))):
            raise ValueError(
                "Output of Neumann series contains NaNs or Infs. Is the "
                "scale suitable (spectral radius of I - scale*A < 1)?")
        return out


def kfac_inverse_factors(kron: Kron, damping: float = 0.0,
                         damping_method: str = "plain",
                         exponent: float = -1.0) -> Kron:
    """Invert KFAC factors per block with optional damping.

    damping_method:
      - 'plain':      (G + sqrt(d) I)^-1 (x) (A + sqrt(d) I)^-1
      - 'heuristic':  Martens & Grosse pi-corrected split
                      pi = sqrt(tr(G)/dim(G) / (tr(A)/dim(A)))
                      (curvlinops/inverse.py:298-394)
      - 'exact':      eigendecompose and invert (l_G l_A + d)^-1 exactly.

    Returns a structure usable via Kron.bmm for preconditioning.
    """
    if damping_method not in ("plain", "heuristic", "exact"):
        raise ValueError(f"Unknown damping method {damping_method!r}")

    inv_groups = []
    for group in kron.kfacs:
        if len(group) == 1:
            F = group[0]
            Fd = F + damping * jnp.eye(F.shape[0], dtype=F.dtype)
            inv_groups.append([_mat_pow(Fd, exponent)])
            continue
        G, A = group
        if damping_method == "exact":
            lG, QG = jnp.linalg.eigh(G)
            lA, QA = jnp.linalg.eigh(A)
            leff = (jnp.outer(lG, lA) + damping) ** exponent
            # represent exactly via eigenbasis: store as dense two-factor is
            # impossible (not Kronecker); fall back to KronDecomposed math
            inv_groups.append([QG, lG, QA, lA, leff])
            continue
        if damping_method == "heuristic" and damping > 0:
            trG = jnp.trace(G) / G.shape[0]
            trA = jnp.trace(A) / A.shape[0]
            pi = jnp.sqrt(jnp.maximum(trG, 1e-30) / jnp.maximum(trA, 1e-30))
            dG, dA = jnp.sqrt(damping) * pi, jnp.sqrt(damping) / pi
        else:
            dG = dA = jnp.sqrt(damping) if damping > 0 else 0.0
        Gd = G + dG * jnp.eye(G.shape[0], dtype=G.dtype)
        Ad = A + dA * jnp.eye(A.shape[0], dtype=A.dtype)
        inv_groups.append([_mat_pow(Gd, exponent), _mat_pow(Ad, exponent)])
    return inv_groups


def _mat_pow(M: jnp.ndarray, exponent: float) -> jnp.ndarray:
    if exponent == -1.0:
        return jnp.linalg.inv(M)
    l, Q = jnp.linalg.eigh(M)
    return (Q * jnp.maximum(l, 1e-30) ** exponent) @ Q.T


class KFACInverseOperator:
    """Apply the (damped) KFAC inverse to vectors shaped like the flat
    posterior vector (curvlinops/inverse.py:295)."""

    def __init__(self, kron: Kron, damping: float = 0.0,
                 damping_method: str = "plain"):
        self.kron = kron
        self.damping_method = damping_method
        self.damping = damping
        self._cache = kfac_inverse_factors(kron, damping, damping_method)

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        out, cur = [], 0
        for group in self._cache:
            if len(group) == 1:
                F = group[0]
                p = F.shape[0]
                out.append(F @ v[cur: cur + p])
                cur += p
            elif len(group) == 2:
                Gi, Ai = group
                po, pi = Gi.shape[0], Ai.shape[0]
                Wp = v[cur: cur + po * pi].reshape(po, pi)
                out.append((Gi @ Wp @ Ai.T).ravel())
                cur += po * pi
            else:  # exact eigen path
                QG, lG, QA, lA, leff = group
                po, pi = QG.shape[0], QA.shape[0]
                Wp = v[cur: cur + po * pi].reshape(po, pi)
                Wp = QG @ ((QG.T @ Wp @ QA) * leff) @ QA.T
                out.append(Wp.ravel())
                cur += po * pi
        return jnp.concatenate(out)
