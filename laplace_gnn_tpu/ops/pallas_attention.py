"""Fused flash-style masked GAT attention (dense adjacency, one pass).

The XLA row-blocked masked softmax (models/layers.py::
_masked_attention_chunked) is exact but TWO-pass per row block: XLA
materializes a (block, N, H) f32 intermediate between the max pass and the
exp/contract pass — ~8.6 GB of HBM round trips per layer at N=16384, which
is where the measured 31.6 ms forward goes (BENCH_NOTES r5 attribution:
int8 masks and bf16 contraction operands move it by 0%, so the bound is the
materialized softmax chain, not mask bytes or MXU throughput).

This kernel runs the ONLINE-softmax recurrence (flash attention) over
source-column blocks: running max m, running denominator l, and an
unnormalized accumulator are carried in VMEM scratch across the j grid
dimension, so nothing score-shaped ever touches HBM. Per (i, j) step:

    s       = leaky_relu(a_src[j-block] + a_dst[i-block])   masked by adj>0
    m_new   = max(m, max_j s)
    p       = exp(s - m_new)                (masked entries: exp(-inf) = 0)
    c       = exp(m - m_new)
    l       = c * l + sum_j p
    acc     = c * acc + p @ h[j-block]      (per-head MXU dot)

Masked scores are -inf (so their p is exactly 0); the running max is
floored at -1e30 so corrections stay finite; rows with no neighbors end
with l = 0 and emit zero rows — identical semantics to the XLA path.

The public entry (:func:`flash_masked_attention`) is a ``jax.custom_vjp``.
On TPU the backward is a second fused Pallas kernel (:func:`_flash_bwd_pallas`)
in the standard flash-attention-backward form: the forward saves the per-row
softmax statistics (running max ``m`` and denominator ``l``, O(N*H) bytes);
the backward recomputes the normalized attention weights tile-by-tile from
``exp(act - m) / l``, forms ``dp = g @ h^T`` and ``dh += p^T @ g`` on the MXU
per tile, and applies the softmax correction ``ds = p * (dp - D)`` with
``D = rowsum(g * out)`` — so the reverse pass, like the forward, never
materializes anything (N, N)-by-H shaped and never re-runs a two-pass XLA
softmax. Gradients are exact (incl. the structural zero into the adjacency —
attention reads the adjacency only through ``adj > 0``, matching reference
gnn/models/layers.py:101-124 where GAT never updates its adjacency). On CPU
both directions fall back to the XLA chunked path. It is a drop-in for
``GATConv(attention_impl=...)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30


def _round_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(occ_ref, adj_ref, asrc_ref, adst_ref, h_ref, out_ref,
                  m_out_ref, l_out_ref,
                  m_ref, l_ref, acc_ref, *, n_j: int, bm: int, bn: int,
                  negative_slope: float, n: int, attn_dtype):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # occupancy gate: a tile with no edges contributes exactly nothing to
    # the recurrence (s = -inf everywhere -> p = 0, m/l/acc unchanged), so
    # all its VPU/MXU work is skipped. On locality-ordered (RCM/banded)
    # graphs most tiles are empty and the N^2 softmax floor drops toward
    # occupancy x cost; the adjacency tile DMA still happens (block specs
    # prefetch unconditionally), which is the ~6% HBM floor.
    @pl.when(occ_ref[i, j] > 0)
    def _():
        H = asrc_ref.shape[0]
        a = adj_ref[:]                                   # (bm, bn)
        if not jnp.issubdtype(a.dtype, jnp.floating):
            # Mosaic lacks sub-word integer vector compares on this target;
            # the f32 upcast happens in-register on the (bm, bn) tile
            a = a.astype(jnp.float32)
        col_ids = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        valid = (a > 0) & (col_ids < n)                  # (bm, bn)

        a_src = asrc_ref[:].astype(jnp.float32)          # (H, bn)
        a_dst = adst_ref[:].astype(jnp.float32)          # (H, bm)
        s = a_src[:, None, :] + a_dst[:, :, None]        # (H, bm, bn)
        s = jnp.where(s >= 0, s, negative_slope * s)     # leaky_relu
        s = jnp.where(valid[None, :, :], s, -jnp.inf)

        m_old = m_ref[:]                                 # (H, bm)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=2))
        m_new = jnp.maximum(m_new, _NEG_BIG)             # floor: finite
        p = jnp.exp(s - m_new[:, :, None])               # masked -> 0
        c = jnp.exp(m_old - m_new)                       # (H, bm)
        m_ref[:] = m_new
        l_ref[:] = c * l_ref[:] + jnp.sum(p, axis=2)
        # per-head contraction over the source block: (H, bm, bn) @
        # (H, bn, F). attn_dtype=bf16 runs the MXU at 4x the f32 rate
        # (f32 accumulation); at N=16384/H=8 the f32 contraction IS the
        # kernel's bottleneck (~1.1 TFLOP/forward ~= 22 ms at v5e f32)
        cd = attn_dtype or h_ref.dtype
        pv = jax.lax.dot_general(
            p.astype(cd), h_ref[:].astype(cd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (H, bm, F)
        acc_ref[:] = c[:, :, None] * acc_ref[:] + pv

    @pl.when(j == n_j - 1)
    def _():
        l = l_ref[:]
        out = acc_ref[:] / jnp.where(l == 0, 1.0, l)[:, :, None]
        out_ref[:] = out.astype(out_ref.dtype)
        # softmax statistics for the fused backward kernel (O(N*H) bytes)
        m_out_ref[:] = m_ref[:]
        l_out_ref[:] = l_ref[:]


def _tile_occupancy(adj, bm, bn, pad_i, pad_j):
    """(n_i, n_j) int32 tile-occupancy table: 1 where a (bm, bn) adjacency
    tile contains any edge. Two strided reduce_window stages (columns then
    rows) — one HBM pass over the adjacency, no padded copy, and per-window
    VMEM stays tiny (a single (bm, bn) window at 256x512 needs ~386 MB of
    scoped VMEM and fails to compile)."""
    e = (adj != 0).astype(jnp.int32)
    cols = jax.lax.reduce_window(
        e, jnp.int32(0), jax.lax.max,
        window_dimensions=(1, bn), window_strides=(1, bn),
        padding=((0, 0), (0, pad_j)))                    # (R, n_j)
    return jax.lax.reduce_window(
        cols, jnp.int32(0), jax.lax.max,
        window_dimensions=(bm, 1), window_strides=(bm, 1),
        padding=((0, pad_i), (0, 0)))                    # (n_i, n_j)


@functools.partial(jax.jit,
                   static_argnames=("negative_slope", "bm", "bn",
                                    "interpret", "attn_dtype", "tile_skip"))
def _flash_fwd_pallas_aux(alpha_src, alpha_dst, adj, h,
                          negative_slope: float = 0.2,
                          bm: int = 256, bn: int = 512,
                          interpret: bool = False, attn_dtype=None,
                          tile_skip: bool = True):
    """(N, H)/(R, H) scores material + (R, N) adjacency + (N, H, F)
    values -> ((R, H, F) attention output, (H, Rp) row max m, (H, Rp)
    denominator l), never materializing anything (R, N)-by-H shaped in
    HBM. ``adj``/``alpha_dst`` may cover only R <= N target rows (a row
    shard — the same contract as the XLA chunked path, so this drops into
    parallel/sharded.py::make_row_sharded_gat_attention). The (m, l)
    softmax statistics feed :func:`_flash_bwd_pallas`; padded rows carry
    m = -1e30, l = 0."""
    n, H, F = h.shape
    R = adj.shape[0]
    bm = min(bm, _round_to(R, 8))
    bn = min(bn, _round_to(n, 128))
    Fp = _round_to(F, 128)
    n_i, n_j = pl.cdiv(R, bm), pl.cdiv(n, bn)

    # head-major layouts: lane dimension = the blocked node axis. The
    # small operands are explicitly ZERO-padded to whole blocks: Pallas
    # out-of-bounds block reads are undefined, and a single NaN row in h
    # poisons the dot even under a zero attention weight (0 * NaN = NaN);
    # masked scores handle the adjacency's ragged edge, but values must
    # be finite. (The O(N^2) adjacency is NOT padded — its garbage only
    # feeds `a > 0` comparisons and sliced-off output rows.)
    pad_j = n_j * bn - n
    pad_i = n_i * bm - R
    asrc_t = jnp.pad(alpha_src.T, ((0, 0), (0, pad_j)))   # (H, Njp)
    adst_t = jnp.pad(alpha_dst.T, ((0, 0), (0, pad_i)))   # (H, Nip)
    h_t = jnp.moveaxis(h, 1, 0)                           # (H, N, F)
    h_t = jnp.pad(h_t, ((0, 0), (0, pad_j), (0, Fp - F)))
    # tile_skip: one extra HBM pass over the adjacency buys skipping all
    # VPU/MXU work of empty tiles (measured table in BENCH_NOTES r5)
    occ = (_tile_occupancy(adj, bm, bn, pad_i, pad_j) if tile_skip
           else jnp.ones((n_i, n_j), jnp.int32))

    out, m, l = pl.pallas_call(
        functools.partial(_flash_kernel, n_j=n_j, bm=bm, bn=bn,
                          negative_slope=negative_slope, n=n,
                          attn_dtype=(jnp.dtype(attn_dtype)
                                      if attn_dtype else None)),
        grid=(n_i, n_j),
        in_specs=[
            # whole table resident in SMEM (8 KB at N=16384), indexed
            # [i, j] per step — a (1, 1) block fails the TPU lowering's
            # divisible-by-(8, 128) rule, a full-shape block is exempt
            pl.BlockSpec((n_i, n_j), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bn, Fp), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((H, bm, Fp), lambda i, j: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((H, bm), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((H, bm), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((H, n_i * bm, Fp), h.dtype),
                   jax.ShapeDtypeStruct((H, n_i * bm), jnp.float32),
                   jax.ShapeDtypeStruct((H, n_i * bm), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((H, bm), jnp.float32),
                        pltpu.VMEM((H, bm), jnp.float32),
                        pltpu.VMEM((H, bm, Fp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * H * Fp + 8 * n * n * H,
            bytes_accessed=n * n * adj.dtype.itemsize
            + n * H * Fp * h.dtype.itemsize,
            transcendentals=n * n * H),
        interpret=interpret,
    )(occ, adj, asrc_t, adst_t, h_t)
    return jnp.moveaxis(out[:, :R, :F], 0, 1), m, l   # (R, H, F), 2x (H, Rp)


def _flash_fwd_pallas(alpha_src, alpha_dst, adj, h,
                      negative_slope: float = 0.2,
                      bm: int = 256, bn: int = 512,
                      interpret: bool = False, attn_dtype=None,
                      tile_skip: bool = True):
    return _flash_fwd_pallas_aux(alpha_src, alpha_dst, adj, h,
                                 negative_slope=negative_slope, bm=bm, bn=bn,
                                 interpret=interpret,
                                 attn_dtype=attn_dtype,
                                 tile_skip=tile_skip)[0]


def _flash_bwd_kernel(occ_ref, adj_ref, asrc_ref, adst_ref, h_ref, g_ref,
                      m_ref, linv_ref, d_ref,
                      dh_ref, dasrc_ref, dadst_ref,
                      dh_acc, dasrc_acc, *, n_i: int, bm: int, bn: int,
                      negative_slope: float, n: int, r: int, attn_dtype):
    """One (source-block j, target-block i) tile of the flash backward.

    Grid is (n_j, n_i) with the TARGET axis inner, so ``dh`` and
    ``da_src`` — both source-indexed — accumulate in VMEM scratch across
    the i sweep and are written once per j block. ``da_dst`` (target-
    indexed, accumulated over j = the OUTER axis) is written as per-(j, i)
    partials and reduced outside the kernel (n_j * H * N floats ~ 17 MB at
    N=16384 — trivial next to the O(N^2) adjacency read)."""
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dh_acc[:] = jnp.zeros_like(dh_acc)
        dasrc_acc[:] = jnp.zeros_like(dasrc_acc)

    # occupancy gate (same contract as the forward: an empty tile has
    # p = 0 so every contribution vanishes); the dadst partial is an
    # unconditional per-(j, i) output block, so the empty branch must
    # write its zeros explicitly
    occ = occ_ref[i, j]

    @pl.when(occ > 0)
    def _():
        a = adj_ref[:]                                   # (bm, bn)
        if not jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(jnp.float32)
        col_ids = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        row_ids = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        # row_ids < r guards the adjacency's OOB-garbage padded target
        # rows: in the forward those rows only ever reached sliced-off
        # outputs, but here an unmasked garbage row would pollute the
        # dh/da_src sums
        valid = (a > 0) & (col_ids < n) & (row_ids < r)  # (bm, bn)

        a_src = asrc_ref[:].astype(jnp.float32)          # (H, bn)
        a_dst = adst_ref[:].astype(jnp.float32)          # (H, bm)
        z = a_src[:, None, :] + a_dst[:, :, None]        # (H, bm, bn)
        act = jnp.where(z >= 0, z, negative_slope * z)
        dact = jnp.where(z >= 0, 1.0, negative_slope)
        m = m_ref[:]                                     # (H, bm)
        linv = linv_ref[:]                               # (H, bm); 0 @ l=0
        # exponent forced to -inf on invalid entries BEFORE exp: padded
        # rows carry m = -1e30, so a finite act there would overflow exp
        # and the resulting inf * linv(=0) would be NaN, not 0
        e = jnp.exp(jnp.where(valid[None, :, :],
                              act - m[:, :, None], -jnp.inf))
        p = e * linv[:, :, None]                         # normalized

        cd = attn_dtype or h_ref.dtype
        g = g_ref[:]                                     # (H, bm, F)
        h = h_ref[:]                                     # (H, bn, F)
        # dp[h,m,n] = g[h,m,:] . h[h,n,:]  (MXU, F-contraction)
        dp = jax.lax.dot_general(
            g.astype(cd), h.astype(cd),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (H, bm, bn)
        ds = p * (dp - d_ref[:][:, :, None])             # softmax corr.
        dz = ds * dact
        dadst_ref[0] = jnp.sum(dz, axis=2)               # (H, bm) partial
        dasrc_acc[:] += jnp.sum(dz, axis=1)              # (H, bn)
        # dh[h,n,:] += sum_m p[h,m,n] * g[h,m,:]  (MXU, bm-contraction)
        dh_acc[:] += jax.lax.dot_general(
            p.astype(cd), g.astype(cd),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (H, bn, F)

    @pl.when(occ == 0)
    def _():
        dadst_ref[0] = jnp.zeros_like(dadst_ref[0])

    @pl.when(i == n_i - 1)
    def _():
        dh_ref[:] = dh_acc[:].astype(dh_ref.dtype)
        dasrc_ref[:] = dasrc_acc[:].astype(dasrc_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("negative_slope", "bm", "bn",
                                    "interpret", "attn_dtype", "tile_skip"))
def _flash_bwd_pallas(alpha_src, alpha_dst, adj, h, g, out, m, l,
                      negative_slope: float = 0.2,
                      bm: int = 256, bn: int = 256,
                      interpret: bool = False, attn_dtype=None,
                      tile_skip: bool = True):
    # default tiles measured at N=16384/H=8/F=64: 22.8 ms (256x256) vs
    # 23.8 (128x256), 43.2 (256x128); 128x512/384x256 exceed VMEM
    """Fused reverse pass: (cotangent g (R, H, F), forward output ``out``,
    saved softmax stats (m, l) from :func:`_flash_fwd_pallas_aux`) ->
    (d_alpha_src (N, H), d_alpha_dst (R, H), d_h (N, H, F)). Same
    tiling/layout contract as the forward; two MXU dots per tile; nothing
    (R, N)-by-H in HBM."""
    n, H, F = h.shape
    R = adj.shape[0]
    bm = min(bm, _round_to(R, 8))
    bn = min(bn, _round_to(n, 128))
    Fp = _round_to(F, 128)
    n_i, n_j = pl.cdiv(R, bm), pl.cdiv(n, bn)
    pad_j = n_j * bn - n
    pad_i = n_i * bm - R

    asrc_t = jnp.pad(alpha_src.T, ((0, 0), (0, pad_j)))   # (H, Njp)
    adst_t = jnp.pad(alpha_dst.T, ((0, 0), (0, pad_i)))   # (H, Nip)
    h_t = jnp.moveaxis(h, 1, 0)                           # (H, N, F)
    h_t = jnp.pad(h_t, ((0, 0), (0, pad_j), (0, Fp - F)))
    g_t = jnp.moveaxis(g, 1, 0).astype(jnp.float32)       # (H, R, F)
    g_t = jnp.pad(g_t, ((0, 0), (0, pad_i), (0, Fp - F)))
    # per-(row, head) softmax-correction scalar D = rowsum(g * out) and
    # the inverse denominator (0 for neighborless rows -> all-zero grads,
    # matching the XLA path's where(denom==0) semantics)
    d_t = jnp.pad(jnp.sum(g.astype(jnp.float32)
                          * out.astype(jnp.float32), axis=-1).T,
                  ((0, 0), (0, pad_i)))                   # (H, Nip)
    # re-pad the forward's (H, Rp) statistics to THIS call's block grid
    # (robust to fwd/bwd using different bm)
    m = jnp.pad(m[:, :R], ((0, 0), (0, pad_i)), constant_values=_NEG_BIG)
    l = jnp.pad(l[:, :R], ((0, 0), (0, pad_i)))
    linv = jnp.where(l > 0, 1.0 / jnp.where(l > 0, l, 1.0), 0.0)
    occ = (_tile_occupancy(adj, bm, bn, pad_i, pad_j) if tile_skip
           else jnp.ones((n_i, n_j), jnp.int32))
    n_i2, n_j2 = n_i, n_j

    dh_t, dasrc_t, dadst_parts = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, n_i=n_i, bm=bm, bn=bn,
                          negative_slope=negative_slope, n=n, r=R,
                          attn_dtype=(jnp.dtype(attn_dtype)
                                      if attn_dtype else None)),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((n_i2, n_j2), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bn, Fp), lambda j, i: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bm, Fp), lambda j, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((H, bn, Fp), lambda j, i: (0, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((H, bn), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, H, bm), lambda j, i: (j, 0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((H, n_j * bn, Fp), jnp.float32),
                   jax.ShapeDtypeStruct((H, n_j * bn), jnp.float32),
                   jax.ShapeDtypeStruct((n_j, H, n_i * bm), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((H, bn, Fp), jnp.float32),
                        pltpu.VMEM((H, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * R * H * Fp + 12 * n * R * H,
            bytes_accessed=n * R * adj.dtype.itemsize
            + 2 * n * H * Fp * h.dtype.itemsize,
            transcendentals=n * R * H),
        interpret=interpret,
    )(occ, adj, asrc_t, adst_t, h_t, g_t, m, linv, d_t)

    g_asrc = dasrc_t[:, :n].T.astype(alpha_src.dtype)          # (N, H)
    g_adst = jnp.sum(dadst_parts, axis=0)[:, :R].T \
        .astype(alpha_dst.dtype)                               # (R, H)
    g_h = jnp.moveaxis(dh_t[:, :n, :F], 0, 1).astype(h.dtype)  # (N, H, F)
    return g_asrc, g_adst, g_h


def _xla_reference(alpha_src, alpha_dst, adj, h, negative_slope):
    from ..models.layers import _masked_attention_chunked
    block = 512 if adj.shape[0] > 1024 else max(adj.shape[0] // 2, 1)
    if block >= adj.shape[0]:
        from ..models.layers import _masked_attention_dense
        return _masked_attention_dense(alpha_src, alpha_dst, adj, h,
                                       negative_slope)
    return _masked_attention_chunked(alpha_src, alpha_dst, adj, h,
                                     negative_slope, block)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_masked_attention(alpha_src, alpha_dst, adj, h,
                           negative_slope: float = 0.2,
                           attn_dtype=None):
    """Fused masked GAT attention; signature matches GATConv's
    ``attention_impl`` hook. Forward = Pallas flash kernel on TPU (XLA
    fallback elsewhere); backward = fused Pallas flash-backward kernel
    (:func:`_flash_bwd_pallas`) reusing the forward's saved (m, l)
    softmax statistics — exact gradients, no XLA recompute, nothing
    (N, N, H)-shaped in either direction."""
    if jax.default_backend() in ("cpu",):
        return _xla_reference(alpha_src, alpha_dst, adj, h, negative_slope)
    return _flash_fwd_pallas(alpha_src, alpha_dst, adj, h,
                             negative_slope=negative_slope,
                             attn_dtype=attn_dtype)


def _fma_fwd(alpha_src, alpha_dst, adj, h, negative_slope, attn_dtype):
    if jax.default_backend() in ("cpu",):
        out = _xla_reference(alpha_src, alpha_dst, adj, h, negative_slope)
        return out, (alpha_src, alpha_dst, adj, h, None, None, None)
    out, m, l = _flash_fwd_pallas_aux(alpha_src, alpha_dst, adj, h,
                                      negative_slope=negative_slope,
                                      attn_dtype=attn_dtype)
    return out, (alpha_src, alpha_dst, adj, h, out, m, l)


def _fma_bwd(negative_slope, attn_dtype, res, g):
    alpha_src, alpha_dst, adj, h, out, m, l = res
    if m is None:
        # CPU fallback: exact gradients through the XLA chunked path
        _, vjp = jax.vjp(
            lambda a_s, a_d, hh: _xla_reference(a_s, a_d, adj, hh,
                                                negative_slope),
            alpha_src, alpha_dst, h)
        g_as, g_ad, g_h = vjp(g)
    else:
        g_as, g_ad, g_h = _flash_bwd_pallas(
            alpha_src, alpha_dst, adj, h, g, out, m, l,
            negative_slope=negative_slope, attn_dtype=attn_dtype)
    # adjacency enters only through the boolean mask: structural zero
    return g_as, g_ad, jnp.zeros_like(adj), g_h


flash_masked_attention.defvjp(_fma_fwd, _fma_bwd)
