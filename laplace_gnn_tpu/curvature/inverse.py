"""Inverse linear operators: CG, LSMR, Neumann, KFAC-inverse.

Counterparts of ``curvlinops/inverse.py`` (CGInverseLinearOperator:35,
LSMRInverseLinearOperator:91, NeumannInverseLinearOperator:166,
KFACInverseLinearOperator:295 with plain / heuristic (Martens-Grosse pi) /
exact damping). LSMR is the Fong & Saunders (2011) Golub-Kahan recurrence
implemented as a ``lax.while_loop`` so it stays jittable on TPU.
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

    def set_cg_hyperparameters(self, tol: Optional[float] = None,
                               maxiter: Optional[int] = None,
                               damping: Optional[float] = None) -> None:
        """(reference CGInverseLinearOperator.set_cg_hyperparameters)"""
        if tol is not None:
            self.tol = tol
        if maxiter is not None:
            self.maxiter = maxiter
        if damping is not None:
            self.damping = damping

    def matvec(self, v):
        mv = (self.op.matvec if self.damping == 0
              else lambda x: self.op.matvec(x) + self.damping * x)
        x, _ = jax.scipy.sparse.linalg.cg(mv, v, tol=self.tol,
                                          maxiter=self.maxiter)
        return x


def _sym_ortho(a, b):
    r = jnp.hypot(a, b)
    safe = jnp.where(r > 0, r, 1.0)
    return jnp.where(r > 0, a / safe, 1.0), jnp.where(r > 0, b / safe, 0.0), r


def lsmr(matvec, rmatvec, b, damp: float = 0.0, atol: float = 1e-6,
         maxiter: int = 100):
    """Solve min_x ||A x - b||^2 + damp^2 ||x||^2 via LSMR
    (Fong & Saunders 2011, the algorithm behind scipy's ``lsmr`` used by the
    reference's LSMRInverseLinearOperator). Jittable: fixed-state
    ``lax.while_loop`` with the ||A^T r|| = |zetabar| stopping rule."""
    u = b
    beta0 = jnp.linalg.norm(u)
    u = u / jnp.where(beta0 > 0, beta0, 1.0)
    v = rmatvec(u)
    alpha0 = jnp.linalg.norm(v)
    v = v / jnp.where(alpha0 > 0, alpha0, 1.0)
    x = jnp.zeros_like(v)
    state = dict(k=jnp.asarray(0), u=u, v=v, alpha=alpha0,
                 alphabar=alpha0, zetabar=alpha0 * beta0,
                 rho=jnp.asarray(1.0, b.dtype), rhobar=jnp.asarray(1.0, b.dtype),
                 cbar=jnp.asarray(1.0, b.dtype), sbar=jnp.asarray(0.0, b.dtype),
                 h=v, hbar=jnp.zeros_like(v), x=x)
    tol = atol * alpha0 * beta0

    def cond(s):
        return (s["k"] < maxiter) & (jnp.abs(s["zetabar"]) > tol)

    def body(s):
        u = matvec(s["v"]) - s["alpha"] * s["u"]
        beta = jnp.linalg.norm(u)
        u = u / jnp.where(beta > 0, beta, 1.0)
        v = rmatvec(u) - beta * s["v"]
        alpha = jnp.linalg.norm(v)
        v = v / jnp.where(alpha > 0, alpha, 1.0)

        _, _, alphahat = _sym_ortho(s["alphabar"], damp)
        rho_old, rhobar_old = s["rho"], s["rhobar"]
        c, sn, rho = _sym_ortho(alphahat, beta)
        thetanew = sn * alpha
        alphabar = c * alpha
        thetabar = s["sbar"] * rho
        cbar, sbar, rhobar = _sym_ortho(s["cbar"] * rho, thetanew)
        zeta = cbar * s["zetabar"]
        zetabar = -sbar * s["zetabar"]
        hbar = s["h"] - (thetabar * rho / (rho_old * rhobar_old)) * s["hbar"]
        x = s["x"] + (zeta / (rho * rhobar)) * hbar
        h = v - (thetanew / rho) * s["h"]
        return dict(k=s["k"] + 1, u=u, v=v, alpha=alpha, alphabar=alphabar,
                    zetabar=zetabar, rho=rho, rhobar=rhobar, cbar=cbar,
                    sbar=sbar, h=h, hbar=hbar, x=x)

    out = jax.lax.while_loop(cond, body, state)
    return out["x"], out["k"]


class LSMRInverseOperator(LinearOperator):
    """A^+ v via LSMR (curvlinops/inverse.py:91); works for rectangular or
    singular operators where CG does not apply, and supports Tikhonov
    ``damp`` regularization: solves min ||A x - v||^2 + damp^2 ||x||^2."""

    def __init__(self, op: LinearOperator, damp: float = 0.0,
                 atol: float = 1e-8, maxiter: Optional[int] = None):
        super().__init__((op.shape[1], op.shape[0]), op.dtype)
        self.op = op
        self.damp = damp
        self.atol = atol
        self.maxiter = maxiter or 4 * max(op.shape)

    def set_lsmr_hyperparameters(self, damp: Optional[float] = None,
                                 atol: Optional[float] = None,
                                 maxiter: Optional[int] = None) -> None:
        """(reference LSMRInverseLinearOperator.set_lsmr_hyperparameters)"""
        if damp is not None:
            self.damp = damp
        if atol is not None:
            self.atol = atol
        if maxiter is not None:
            self.maxiter = maxiter

    def matvec(self, v):
        x, _ = lsmr(self.op.matvec, self.op.rmatvec, v, damp=self.damp,
                    atol=self.atol, maxiter=self.maxiter)
        return x

    def matvec_with_info(self, v):
        """Solution plus solver diagnostics (reference
        LSMRInverseLinearOperator.matvec_with_info): returns
        (x, {"iterations": k, "residual_norm": normr}) where normr is the
        *damped* residual sqrt(||Ax - v||^2 + damp^2 ||x||^2) — what LSMR
        minimizes (matching scipy's lsmr normr), so convergence checks do
        not misread the regularization floor as non-convergence.

        Diagnostics are jnp scalars (not Python int/float), so this
        composes with jit exactly like :meth:`matvec`; call ``int()``/
        ``float()`` on them outside traced code if host values are
        needed."""
        x, k = lsmr(self.op.matvec, self.op.rmatvec, v, damp=self.damp,
                    atol=self.atol, maxiter=self.maxiter)
        r = self.op.matvec(x) - v
        normr = jnp.sqrt(jnp.sum(r * r) + self.damp ** 2 * jnp.sum(x * x))
        return x, {"iterations": k, "residual_norm": normr}


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

    def set_neumann_hyperparameters(self, num_terms: Optional[int] = None,
                                    scale: Optional[float] = None,
                                    check_nan: Optional[bool] = None) -> None:
        """(reference NeumannInverseLinearOperator
        .set_neumann_hyperparameters)"""
        if num_terms is not None:
            self.num_terms = num_terms
        if scale is not None:
            self.scale = scale
        if check_nan is not None:
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

    def state_dict(self) -> dict:
        """Serializable state (reference KFACInverseLinearOperator
        .state_dict, curvlinops/inverse.py): the source Kron factors plus
        damping configuration; the inverse cache is rebuilt on load."""
        import numpy as np
        return {
            "kfacs": [[np.asarray(f) for f in group]
                      for group in self.kron.kfacs],
            "damping": self.damping,
            "damping_method": self.damping_method,
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "KFACInverseOperator":
        kron = Kron([[jnp.asarray(f) for f in group]
                     for group in state["kfacs"]])
        return cls(kron, damping=state["damping"],
                   damping_method=state["damping_method"])

    def load_state_dict(self, state: dict) -> None:
        new = self.from_state_dict(state)
        self.kron = new.kron
        self.damping = new.damping
        self.damping_method = new.damping_method
        self._cache = new._cache
