"""Fused STE-binarize + self-loop + symmetric-normalize + aggregate kernel.

The flagship forward (reference gnn/models/models.py:102-115 + layers.py:45)
composes, per layer:

    B   = fill_diag(binarize(A_sym, tau), 1)
    Ntl = d (.) B^T (.) d,   d = rsqrt(rowsum(B))
    out = Ntl @ s

Materializing B and Ntl costs three extra O(N^2) HBM round trips per forward.
This Pallas kernel reads raw adjacency tiles once, binarizes and forces the
diagonal in-register (VPU), and feeds the MXU directly:

    core(A, t)[i, c] = sum_j bin_diag(A)[j, i] * t[j, c]

The cheap O(N) / O(N d) pre/post scalings (degree rsqrt, d (.) s, d (.) out)
stay in XLA where they fuse for free. A full custom VJP implements the exact
composite gradient — including the degree-normalization term the chain rule
requires — with straight-through semantics into the raw adjacency
(reference gnn/models/utils.py:42-86), so the fused op is a drop-in for
training, not just inference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pallas core: C = bin_diag(A)^T @ t
# ---------------------------------------------------------------------------

def _core_kernel(a_ref, t_ref, out_ref, acc_ref, *, n_k: int, bm: int,
                 bk: int, threshold: float, binarize: bool, n: int):
    i, k = pl.program_id(0), pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]                              # (bk, bm): rows j, cols i
    row_ids = k * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, bm), 0)
    col_ids = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bk, bm), 1)
    in_bounds = (row_ids < n) & (col_ids < n)
    if binarize:
        b = (a > threshold).astype(jnp.float32)
        # forced self-loops on the true diagonal; ragged-edge garbage zeroed
        b = jnp.where(row_ids == col_ids, 1.0, b)
        b = jnp.where(in_bounds, b, 0.0)
    else:
        b = jnp.where(in_bounds, a.astype(jnp.float32), 0.0)
    # contract over j (lhs dim 0): acc[i, c] += sum_j b[j, i] t[j, c]
    # bf16 operands + f32 accumulation: the binarized lhs is exactly
    # representable; matches XLA's default matmul precision on TPU
    acc_ref[:] += jax.lax.dot_general(
        b.astype(jnp.bfloat16), t_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("threshold", "binarize", "bm", "bk"))
def _core(adj: jnp.ndarray, t: jnp.ndarray, threshold: float = 0.5,
          binarize: bool = True, bm: int = 512, bk: int = 512) -> jnp.ndarray:
    """bin_diag(adj)^T @ t via Pallas; adj (N, N), t (N, d)."""
    n, d = adj.shape[0], t.shape[1]
    bm = min(bm, _round_to(n, 8))
    bk = min(bk, _round_to(n, 8))
    dp = _round_to(d, 128)
    # ragged edges are masked in-kernel — no O(N^2) jnp.pad copy of adj
    t_p = jnp.pad(t, ((0, 0), (0, dp - d))) if dp != d else t
    n_i, n_k = pl.cdiv(n, bm), pl.cdiv(n, bk)

    out = pl.pallas_call(
        functools.partial(_core_kernel, n_k=n_k, bm=bm, bk=bk,
                          threshold=threshold, binarize=binarize, n=n),
        grid=(n_i, n_k),
        in_specs=[
            pl.BlockSpec((bk, bm), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, dp), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, dp), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dp), t.dtype),
        scratch_shapes=[pltpu.VMEM((bm, dp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * dp,
            bytes_accessed=(n * n + n * dp + n * dp) * 4,
            transcendentals=0),
    )(adj, t_p)
    return out[:, :d]


def _core_xla(adj, t, threshold=0.5, binarize=True):
    """Reference/fallback path (CPU tests, interpret mode)."""
    if binarize:
        n = adj.shape[0]
        b = (adj > threshold).astype(t.dtype)
        eye = jnp.eye(n, dtype=t.dtype)
        b = b * (1 - eye) + eye
    else:
        b = adj
    return b.T @ t


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# Fused op with exact composite VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def ste_norm_aggregate(adj: jnp.ndarray, s: jnp.ndarray,
                       threshold: float = 0.5, symmetric: bool = False,
                       sign_grad: bool = False,
                       grad_mask: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """normalize(fill_diag(binarize(sym(adj), threshold), 1)) @ s, fused.

    Exactly equals the composition used by STEGCN.forward
    (models.py:98-105 -> layers.py:45) including the reference's
    normalize-with-transpose convention, with straight-through gradients
    into ``adj``.
    """
    out, _ = _fwd_impl(adj, s, threshold, symmetric)
    return out


def _fwd_impl(adj, s, threshold, symmetric):
    a_sym = (adj + adj.T) / 2 if symmetric else adj
    b_for_rows = (a_sym > threshold).astype(s.dtype)
    n = adj.shape[0]
    eye_mask = jnp.eye(n, dtype=s.dtype)
    r = jnp.sum(b_for_rows * (1 - eye_mask), axis=1) + 1.0  # forced diag
    d = jnp.where(r > 0, jax.lax.rsqrt(jnp.maximum(r, 1e-38)), 0.0)
    t = d[:, None] * s
    core = _core if _use_pallas() else _core_xla
    v = core(a_sym, t, threshold=threshold, binarize=True)
    out = d[:, None] * v
    return out, (a_sym, s, d, v)


def _ste_fwd(adj, s, threshold, symmetric, sign_grad, grad_mask):
    out, res = _fwd_impl(adj, s, threshold, symmetric)
    return out, res


def _ste_bwd(threshold, symmetric, sign_grad, grad_mask, res, g):
    a_sym, s, d, v = res
    core = _core if _use_pallas() else _core_xla

    g_v = d[:, None] * g                               # (N, d)
    # dL/dt = B g_v ; B = bin_diag(a_sym); B @ x == core(a_sym^T ... ) —
    # B is bin_diag which equals its own structure transposed w.r.t. a_sym^T
    Bg = core(a_sym.T, g_v, threshold=threshold, binarize=True)
    ds = d[:, None] * Bg                               # dL/ds

    t = d[:, None] * s
    # direct term: G_B[j, i] = t[j, :] . g_v[i, :]
    G_B = t @ g_v.T
    # degree term: dL/dd then into every entry of row j of B
    gd = jnp.sum(g * v, axis=1) + jnp.sum(Bg * s, axis=1)
    r = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-38) ** 2, 0.0)
    gr = jnp.where(d > 0, -0.5 * gd * d / jnp.maximum(r, 1e-38), 0.0)
    G_B = G_B + gr[:, None]
    # forced diagonal carries no gradient
    n = a_sym.shape[0]
    G_B = G_B * (1 - jnp.eye(n, dtype=G_B.dtype))
    # straight-through into adj (reference BinarizeSTE backward)
    if grad_mask is not None:
        G_B = G_B * grad_mask
    if sign_grad:
        G_B = jnp.sign(G_B)
    if symmetric:
        G_B = (G_B + G_B.T) / 2
    return G_B, ds


ste_norm_aggregate.defvjp(_ste_fwd, _ste_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def norm_aggregate(adj: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """normalize(adj) @ s fused (GCN path: adjacency already has self-loops,
    no binarization; reference models.py:30-31 + layers.py:45)."""
    out, _ = _norm_fwd_impl(adj, s)
    return out


def _norm_fwd_impl(adj, s):
    r = jnp.sum(adj, axis=1)
    d = jnp.where(r > 0, jax.lax.rsqrt(jnp.maximum(r, 1e-38)), 0.0)
    t = d[:, None] * s
    core = _core if _use_pallas() else _core_xla
    v = core(adj, t, binarize=False)
    out = d[:, None] * v
    return out, (adj, s, d, v, r)


def _norm_fwd(adj, s):
    out, res = _norm_fwd_impl(adj, s)
    return out, res


def _norm_bwd(res, g):
    adj, s, d, v, r = res
    core = _core if _use_pallas() else _core_xla
    g_v = d[:, None] * g
    Bg = core(adj.T, g_v, binarize=False)              # adj @ g_v
    ds = d[:, None] * Bg
    t = d[:, None] * s
    G_A = t @ g_v.T                                    # exact (not STE)
    gd = jnp.sum(g * v, axis=1) + jnp.sum(Bg * s, axis=1)
    gr = jnp.where(r > 0, -0.5 * gd * d / jnp.maximum(r, 1e-38), 0.0)
    G_A = G_A + gr[:, None]
    return G_A, ds


norm_aggregate.defvjp(_norm_fwd, _norm_bwd)


# ---------------------------------------------------------------------------
# int8-packed static adjacency (fixed-graph GCN fast path)
# ---------------------------------------------------------------------------

class StaticNormAdjOp:
    """Frozen-graph aggregation with the binary adjacency packed as int8.

    For non-structure-learning models (GCN/GAT: ``update_adj=False``) the
    adjacency never changes, so it can be stored at 1 byte/entry — a 4x HBM
    reduction on the dominant read of the aggregation. XLA cannot do this
    (a cast materializes a full copy per call); the Pallas core reads int8
    tiles and upcasts in-register. Normalization is pre-folded into the
    degree vector exactly as ``normalize_adj`` (D^-1/2 A^T D^-1/2).
    """

    def __init__(self, adj):
        adj = jnp.asarray(adj)
        r = jnp.sum(adj, axis=1)
        self.d = jnp.where(r > 0, jax.lax.rsqrt(jnp.maximum(r, 1e-38)),
                           0.0).astype(jnp.float32)
        self.adj_i8 = adj.astype(jnp.int8)
        self.n = adj.shape[0]

    def spmm(self, s: jnp.ndarray) -> jnp.ndarray:
        t = self.d[:, None] * s
        if _use_pallas():
            v = _core(self.adj_i8, t, binarize=False)
        else:
            v = self.adj_i8.astype(t.dtype).T @ t
        return self.d[:, None] * v
