"""Sparse graph containers for large-graph aggregation.

The reference is dense-only (N x N adjacency as nn.Parameter); at
ogbn-arxiv scale (169k nodes) a dense adjacency is 114 GB and infeasible.
This container keeps the graph as COO edges with per-edge weights and
serves ``aggregate`` (ops/spmm.py) through TPU-friendly formulations:

  - 'segment': out = segment_sum(w_e * x[src_e], dst_e) — XLA scatter-add,
    the standard TPU sparse path (static shapes, no dynamic control flow);
  - 'ell': padded neighbor lists (N, max_deg) — gather + masked einsum,
    better when degree variance is low.

Normalization (GCN's D^-1/2 A D^-1/2) is precomputed into the edge weights,
which is exactly what the dense path's normalize_adj does numerically.
STE structure learning requires the dense adjacency (as in the reference);
sparse graphs serve the fixed-graph model families (GCN/SAGE-style).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import native


@dataclass(frozen=True)
class SparseGraph:
    """COO edges (+ optional ELL form). Registered as a pytree so it can be
    closed over / passed through jit."""
    src: jnp.ndarray            # (E,)
    dst: jnp.ndarray            # (E,)
    weights: jnp.ndarray        # (E,)
    n_nodes: int
    ell_cols: Optional[jnp.ndarray] = None     # (N, K) or None
    ell_vals: Optional[jnp.ndarray] = None     # (N, K)
    format: str = "segment"
    dst_sorted: bool = False
    rem_src: Optional[jnp.ndarray] = None      # overflow edges beyond K
    rem_dst: Optional[jnp.ndarray] = None      # (dst-sorted)
    rem_w: Optional[jnp.ndarray] = None
    # multi-level ELL: recursively packed compacted neighbor lists for
    # high-degree rows whose edges overflow the previous level's K.
    # Power-law graphs (ogbn-arxiv max degree ~13k) otherwise push a large
    # fraction of edges through the slow per-edge segment-sum (~51 M
    # edges/s vs ~107 M for the padded gather path, BENCH_NOTES); each
    # extra level keeps its edges on the gather path (per-level padding
    # bounded by the same budget) and lands in the output via one sorted
    # unique-row scatter-add. Tuple of (rows (Nl,), cols (Nl, Kl),
    # vals (Nl, Kl)) triples.
    ell_levels: tuple = ()
    agg_dtype: Optional[str] = None            # e.g. 'bfloat16': halve the
    # random-gather HBM traffic of the aggregation (the throughput limiter at
    # scale, BENCH_NOTES); result is cast back to the input dtype
    symmetric: bool = False                    # weighted adjacency == its
    # transpose (sym-normalized undirected graphs); lets the custom VJP
    # reuse this graph for the backward pass

    @property
    def n_edges(self) -> int:
        return int(self.src.shape[0])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        """out[i] = sum_{e: dst_e = i} w_e x[src_e].

        With ``dst_sorted`` edges the scatter-add lowers to a segmented
        reduction (``indices_are_sorted=True``) — measured ~1.7x faster than
        the unsorted scatter at ogbn-arxiv scale on v5e (BENCH_NOTES).
        """
        if self.agg_dtype is not None and x.dtype != jnp.dtype(self.agg_dtype):
            import dataclasses
            in_dtype = x.dtype
            g = dataclasses.replace(self, agg_dtype=None)
            return g.spmm(x.astype(self.agg_dtype)).astype(in_dtype)
        if self.format == "ell" and self.ell_cols is not None:
            gathered = x[self.ell_cols]                 # (N, K, d)
            out = jnp.einsum("nk,nkd->nd", self.ell_vals.astype(x.dtype),
                             gathered)
            for rows_l, cols_l, vals_l in self.ell_levels:
                # level-l: compacted lists for rows overflowing the previous
                # level; lands via one sorted unique-row scatter-add (no
                # per-edge segments)
                gl = x[cols_l]                          # (Nl, Kl, d)
                part = jnp.einsum("nk,nkd->nd", vals_l.astype(x.dtype), gl)
                out = out.at[rows_l].add(
                    part, unique_indices=True, indices_are_sorted=True)
            if self.rem_src is not None and self.rem_src.shape[0] > 0:
                # ultra-high-degree tail beyond level 2 (hybrid ELL)
                msgs = (self.rem_w[:, None].astype(x.dtype)
                        * x[self.rem_src])
                out = out + jax.ops.segment_sum(
                    msgs, self.rem_dst, num_segments=self.n_nodes,
                    indices_are_sorted=True)
            return out
        msgs = self.weights[:, None].astype(x.dtype) * x[self.src]
        return jax.ops.segment_sum(msgs, self.dst,
                                   num_segments=self.n_nodes,
                                   indices_are_sorted=self.dst_sorted)

    def transpose(self) -> "SparseGraph":
        """Graph of A^T (src/dst swapped), re-sorted by new dst; preserves
        the ELL format (rebuilt for the transposed pattern)."""
        import dataclasses
        src = np.asarray(self.dst)
        dst = np.asarray(self.src)
        w = np.asarray(self.weights)
        if native.available():
            src, dst, w64, _ = native.sort_by_dst(src, dst, w, self.n_nodes)
            w = w64.astype(w.dtype)
        else:
            order = np.argsort(dst, kind="stable")
            src, dst, w = src[order], dst[order], w[order]
        g = SparseGraph(src=jnp.asarray(src),
                        dst=jnp.asarray(dst),
                        weights=jnp.asarray(w),
                        n_nodes=self.n_nodes, format="segment",
                        dst_sorted=True, agg_dtype=self.agg_dtype,
                        symmetric=self.symmetric)
        if self.format == "ell" and self.ell_cols is not None:
            K = int(self.ell_cols.shape[1])
            g = add_ell_format(g, max_k=K)
            g = dataclasses.replace(g, agg_dtype=self.agg_dtype)
        return g

    def to_dense(self) -> jnp.ndarray:
        adj = jnp.zeros((self.n_nodes, self.n_nodes),
                        dtype=self.weights.dtype)
        return adj.at[self.dst, self.src].add(self.weights)

    @property
    def shape(self):
        return (self.n_nodes, self.n_nodes)

    def __matmul__(self, x):
        return self.spmm(x)


def _sparse_flatten(g: SparseGraph):
    leaves = (g.src, g.dst, g.weights, g.ell_cols, g.ell_vals,
              g.rem_src, g.rem_dst, g.rem_w, g.ell_levels)
    aux = (g.n_nodes, g.format, g.dst_sorted, g.agg_dtype, g.symmetric)
    return leaves, aux


def _sparse_unflatten(aux, leaves):
    (src, dst, weights, ell_cols, ell_vals, rem_src, rem_dst, rem_w,
     ell_levels) = leaves
    n_nodes, fmt, dst_sorted, agg_dtype, symmetric = aux
    return SparseGraph(src=src, dst=dst, weights=weights, n_nodes=n_nodes,
                       ell_cols=ell_cols, ell_vals=ell_vals, format=fmt,
                       dst_sorted=dst_sorted, rem_src=rem_src,
                       rem_dst=rem_dst, rem_w=rem_w, agg_dtype=agg_dtype,
                       symmetric=symmetric, ell_levels=ell_levels)


jax.tree_util.register_pytree_node(SparseGraph, _sparse_flatten,
                                   _sparse_unflatten)


def sparse_from_edge_index(edge_index, n_nodes: int,
                           weights: Optional[np.ndarray] = None,
                           normalize: str = "sym",
                           add_self_loops: bool = True,
                           fmt: str = "segment",
                           dtype=None) -> SparseGraph:
    """Build a SparseGraph from a (2, E) edge index.

    normalize: 'sym' (D^-1/2 A D^-1/2, matching ops.adjacency.normalize_adj
    on the transposed-adjacency convention), 'row' (mean aggregation like
    GraphSAGEConv.mean_agg), or None.
    """
    dtype = dtype or jnp.result_type(float)
    edge_index = np.asarray(edge_index)
    src, dst = edge_index[0].copy(), edge_index[1].copy()
    w = (np.ones(len(src)) if weights is None
         else np.asarray(weights)).astype(np.float64)

    if add_self_loops:
        loops = np.arange(n_nodes)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])
        w = np.concatenate([w, np.ones(n_nodes)])

    # Dense-path parity: aggregate uses adj[i, j] = weight of edge j -> i,
    # and normalize_adj scales with *row* sums of the dense adj then
    # transposes (gnn/models/utils.py:106-112). For the (symmetric) graphs
    # the reference uses, this is deg(dst)^-1/2 * w * deg(src)^-1/2.
    # The O(E) passes (degree, stable dst-sort, symmetry lexsorts) run in
    # the native C++ engine when available (exact-parity tested); the numpy
    # path below is the fallback.
    use_native = native.available()
    if use_native:
        deg = native.degree(dst, w, n_nodes)
    else:
        deg = np.zeros(n_nodes)
        np.add.at(deg, dst, w)
    if normalize == "sym":
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
        w = dinv[dst] * w * dinv[src]
    elif normalize == "row":
        dinv = np.where(deg > 0, 1.0 / deg, 0.0)
        w = dinv[dst] * w
    elif normalize is not None:
        raise ValueError(f"Unknown normalization {normalize!r}")

    # dst-major edge order: turns the scatter-add into a segmented
    # reduction on TPU (see SparseGraph.spmm)
    if use_native:
        src, dst, w, _ = native.sort_by_dst(src, dst, w, n_nodes)
        # symmetry: sorted (dst, src, w) triples == (src, dst, w)
        symmetric = native.check_symmetric(src, dst, w, n_nodes)
    else:
        order = np.argsort(dst, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
        o1 = np.lexsort((src, dst))
        o2 = np.lexsort((dst, src))
        symmetric = bool(
            np.array_equal(src[o1], dst[o2])
            and np.array_equal(dst[o1], src[o2])
            and np.allclose(w[o1], w[o2]))

    g = SparseGraph(src=jnp.asarray(src, dtype=jnp.int32),
                    dst=jnp.asarray(dst, dtype=jnp.int32),
                    weights=jnp.asarray(w, dtype=dtype),
                    n_nodes=n_nodes, format=fmt, dst_sorted=True,
                    symmetric=symmetric)
    if fmt == "ell":
        g = add_ell_format(g)
    return g


def make_spmm(g: SparseGraph, gT: Optional[SparseGraph] = None):
    """SpMM with a custom VJP: the backward pass is an SpMM with A^T run
    through the same sorted/ELL fast path, instead of the unsorted scatter
    XLA autodiff would emit for the transposed gather. For symmetric
    (sym-normalized undirected) graphs A^T = A and the forward graph is
    reused. Edge weights are treated as constants (fixed-graph models);
    structure learning uses the dense STE path as in the reference.

    Implemented as a first-class linear JAX primitive so every transform
    stays available with fast paths in both directions:
      - jvp: the map itself (forward mode, used by the GGN operators),
      - transpose: the A^T graph's fast path (reverse mode),
      - vmap: batch axis folded into the feature dimension (one SpMM over a
        wider feature matrix instead of a loop of gathers)."""
    if gT is None:
        gT = g if g.symmetric else g.transpose()
    token = len(_SPMM_REGISTRY)
    _SPMM_REGISTRY[token] = (g, gT)

    def spmm(x):
        if x.ndim == 1:
            return _spmm_p.bind(x[:, None], token=token,
                                transposed=False)[:, 0]
        return _spmm_p.bind(x, token=token, transposed=False)

    return spmm


# -- the spmm primitive ------------------------------------------------------
_SPMM_REGISTRY: dict = {}


def _spmm_apply(x, *, token: int, transposed: bool):
    g, gT = _SPMM_REGISTRY[token]
    return (gT if transposed else g).spmm(x)


def _make_spmm_primitive():
    from functools import partial

    import jax.extend.core as jex_core
    from jax.interpreters import ad, batching, mlir

    del partial
    p = jex_core.Primitive("laplace_gnn_spmm")
    p.def_impl(_spmm_apply)

    from jax.core import ShapedArray

    def abstract_eval(x, *, token, transposed):
        return ShapedArray(x.shape, x.dtype)

    p.def_abstract_eval(abstract_eval)
    mlir.register_lowering(p, mlir.lower_fun(_spmm_apply,
                                             multiple_results=False))
    ad.deflinear2(p, lambda ct, x, *, token, transposed:
                  [p.bind(ct, token=token, transposed=not transposed)])

    def batch_rule(args, dims, *, token, transposed):
        (x,), (d,) = args, dims
        x = jnp.moveaxis(x, d, -1)               # (N, D, ..., B)
        shp = x.shape
        out = p.bind(x.reshape(shp[0], -1), token=token,
                     transposed=transposed)
        return out.reshape(shp), x.ndim - 1

    batching.primitive_batchers[p] = batch_rule
    return p


_spmm_p = _make_spmm_primitive()


class FastAggGraph:
    """Duck-typed stand-in for SparseGraph inside models: ``.spmm`` is the
    custom-VJP fast path. Models treat the graph as a static closure, so
    this does not need to be a pytree."""

    def __init__(self, g: SparseGraph, gT: Optional[SparseGraph] = None):
        self.graph = g
        self.n_nodes = g.n_nodes
        self.shape = g.shape
        self.spmm = make_spmm(g, gT)

    @property
    def n_edges(self) -> int:
        return self.graph.n_edges

    def __matmul__(self, x):
        return self.spmm(x)


@dataclass(frozen=True)
class EllEdgeSlots:
    """Static edge -> ELL-slot mapping for RUNTIME per-edge coefficients.

    The ELL layout of a :class:`SparseGraph` (level-0 table, compacted
    overflow levels, COO remainder) is determined purely by the edge
    *structure*; the packed values are a static scatter of the per-edge
    weights. This dataclass records, for each tier, which edges (indices
    into the graph's dst-sorted edge order) land in which (row, pos) slot —
    so traced per-edge quantities (GAT attention coefficients) can be
    scattered into the same layout and aggregated on the gather/einsum fast
    path instead of the ~2x-slower per-edge segment scatter (BENCH_NOTES).
    ``levels`` holds (edge_idx, row, pos) triples per compacted level;
    ``rem_edge_idx`` indexes the remainder edges in their packed order.
    All arrays are NUMPY (static trace-constants — see ell_edge_slots)."""
    ell0_edge_idx: np.ndarray       # (n0,) edge indices landing in level 0
    ell0_row: np.ndarray            # (n0,) == dst of those edges
    ell0_pos: np.ndarray            # (n0,) slot within the row
    levels: tuple                   # ((edge_idx, row, pos), ...) per level
    rem_edge_idx: np.ndarray        # (n_rem,)


def ell_edge_slots(g: SparseGraph) -> EllEdgeSlots:
    """Recompute the deterministic edge->slot assignment of
    :func:`add_ell_format` (level-0 first-K-per-row, then per-level
    max-coverage packing of the dst-sorted tail) as static index arrays.
    Verified against the packed weights in tests/test_sparse.py."""
    if g.format != "ell" or g.ell_cols is None:
        raise ValueError("graph has no ELL format (use add_ell_format)")
    if not g.dst_sorted:
        raise ValueError("ELL slot mapping requires dst-sorted edges")
    dst = np.asarray(g.dst)
    n = g.n_nodes
    counts = np.bincount(dst, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    e_idx = np.arange(len(dst))
    pos = e_idx - offsets[dst]
    K0 = int(g.ell_cols.shape[1])
    sel = pos < K0
    ell0 = (e_idx[sel], dst[sel].astype(np.int32),
            pos[sel].astype(np.int32))
    rs_idx, rd = e_idx[~sel], dst[~sel]
    levels = []
    for rows_l, cols_l, _vals_l in g.ell_levels:
        Kl = int(cols_l.shape[1])
        rows_u, start = np.unique(rd, return_index=True)
        counts_l = np.diff(np.append(start, len(rd)))
        if not np.array_equal(rows_u.astype(np.int32),
                              np.asarray(rows_l)):
            raise AssertionError("ELL level rows mismatch — packing drifted")
        posl = np.arange(len(rd)) - np.repeat(start, counts_l)
        sell = posl < Kl
        row_of_edge = np.repeat(np.arange(len(rows_u)), counts_l)
        # slots stay NUMPY: this routine may run lazily inside a jit trace
        # (first model application), and jnp.asarray there would return
        # tracers — caching those on the graph wrapper leaks them out of
        # the trace. Numpy index arrays are safe trace-constants.
        levels.append((rs_idx[sell].astype(np.int32),
                       row_of_edge[sell].astype(np.int32),
                       posl[sell].astype(np.int32)))
        rs_idx, rd = rs_idx[~sell], rd[~sell]
    return EllEdgeSlots(ell0_edge_idx=ell0[0].astype(np.int32),
                        ell0_row=ell0[1],
                        ell0_pos=ell0[2],
                        levels=tuple(levels),
                        rem_edge_idx=rs_idx.astype(np.int32))


def ell_aggregate_edge_coeff(g: SparseGraph, slots: EllEdgeSlots,
                             coeff: jnp.ndarray,
                             h: jnp.ndarray) -> jnp.ndarray:
    """out[i, head] = sum_{e: dst_e = i} coeff[e, head] * h[src_e, head]
    via the multi-level ELL gather path with RUNTIME coefficients.

    ``coeff``: (E, H) in the graph's dst-sorted edge order; ``h``: (N, H, F).
    This is the GAT message aggregation (sparse_gnn.py edge softmax) as a
    per-head SpMM: the (E, H, F) message traffic — the throughput limiter —
    rides the padded gather/einsum formulation (measured 1.7-2.3x over the
    per-edge segment scatter at arxiv scale, BENCH_NOTES), with
    ``g.agg_dtype`` (bf16) halving the gathered bytes. Pads carry
    coefficient 0 so they are exact no-ops."""
    n, H, F = h.shape
    in_dtype = h.dtype
    agg = jnp.dtype(g.agg_dtype) if g.agg_dtype is not None else in_dtype
    h2 = h.reshape(n, H * F).astype(agg)
    cf = coeff.astype(agg)
    K0 = g.ell_cols.shape[1]
    vals0 = jnp.zeros((n, K0, H), agg)
    vals0 = vals0.at[slots.ell0_row, slots.ell0_pos].set(
        cf[slots.ell0_edge_idx], unique_indices=True,
        indices_are_sorted=True)
    gathered = h2[g.ell_cols].reshape(n, K0, H, F)
    out = jnp.einsum("nkh,nkhf->nhf", vals0, gathered)
    for (rows_l, cols_l, _v), (eidx, row_l, pos_l) in zip(g.ell_levels,
                                                          slots.levels):
        nl, Kl = cols_l.shape
        vals_l = jnp.zeros((nl, Kl, H), agg)
        vals_l = vals_l.at[row_l, pos_l].set(cf[eidx], unique_indices=True,
                                             indices_are_sorted=True)
        gl = h2[cols_l].reshape(nl, Kl, H, F)
        part = jnp.einsum("nkh,nkhf->nhf", vals_l, gl)
        out = out.at[rows_l].add(part, unique_indices=True,
                                 indices_are_sorted=True)
    if slots.rem_edge_idx.shape[0] > 0:
        msgs = cf[slots.rem_edge_idx][:, :, None] * h2.reshape(
            n, H, F)[g.rem_src]
        out = out + jax.ops.segment_sum(msgs, g.rem_dst,
                                        num_segments=n,
                                        indices_are_sorted=True)
    return out.astype(in_dtype)


def ell_gat_layout(g: SparseGraph):
    """Static pad masks for the all-ELL GAT attention formulation
    (:func:`ell_gat_attention`): a bool validity mask per ELL tier, built
    host-side from the same deterministic packing as
    :func:`ell_edge_slots`. Returned as numpy (trace-safe constants)."""
    slots = ell_edge_slots(g)
    n, K0 = g.ell_cols.shape
    mask0 = np.zeros((n, K0), bool)
    mask0[np.asarray(slots.ell0_row), np.asarray(slots.ell0_pos)] = True
    level_masks = []
    for (rows_l, cols_l, _v), (_e, row_l, pos_l) in zip(g.ell_levels,
                                                        slots.levels):
        ml = np.zeros(cols_l.shape, bool)
        ml[np.asarray(row_l), np.asarray(pos_l)] = True
        level_masks.append(ml)
    return {"mask0": mask0, "level_masks": tuple(level_masks)}


def ell_gat_attention(g: SparseGraph, layout: dict, h: jnp.ndarray,
                      a_src: jnp.ndarray, a_dst: jnp.ndarray,
                      negative_slope: float) -> jnp.ndarray:
    """GAT edge-softmax + aggregation entirely in ELL layout.

    out[i] = sum_{e: dst_e=i} softmax_e(leaky_relu(a_src[src_e]+a_dst[i]))
             * h[src_e]

    The per-edge formulation (sparse_gnn.py segment path) is
    DESCRIPTOR-LIMITED three times over at scale: (E, H) gathers + two
    segment reductions for the softmax (~44 ms at arxiv scale), a per-edge
    coefficient scatter into the ELL tables (~75 ms), and the message
    gather (~20 ms) — measured bisect in BENCH_NOTES r5. This formulation
    replaces all per-edge traffic for ELL-resident edges with ONE fused
    row gather: ``a_src`` is concatenated onto the feature rows, so the
    (N, K, H*F + H) gather simultaneously fetches messages and score
    material; the masked softmax then runs as dense (N, K, H) VPU work
    over the padded axis (exact — pads carry -inf scores). Overflow
    levels contribute via their own compact gathers; only the sub-0.5%
    remainder tail still uses per-edge segment ops. ``g.agg_dtype``
    (bf16) applies to the payload gather; the exp/denominator math runs
    in f32.
    """
    n, H, F = h.shape
    in_dtype = h.dtype
    pd = jnp.dtype(g.agg_dtype) if g.agg_dtype is not None else in_dtype
    HF = H * F
    payload = jnp.concatenate([h.reshape(n, HF).astype(pd),
                               a_src.astype(pd)], axis=1)   # (N, HF+H)
    a_dst32 = a_dst.astype(jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)

    def tier(cols, mask, rows=None):
        """(gathered_msgs (R,K,H,F) in pd, scores (R,K,H) f32 masked)."""
        Gp = payload[cols]                                  # (R, K, HF+H)
        gh = Gp[..., :HF]
        ga = Gp[..., HF:].astype(jnp.float32)               # (R, K, H)
        ad = a_dst32 if rows is None else a_dst32[rows]
        sc = jax.nn.leaky_relu(ga + ad[:, None, :], negative_slope)
        sc = jnp.where(jnp.asarray(mask)[:, :, None], sc, neg_inf)
        return gh, sc

    gh0, sc0 = tier(g.ell_cols, layout["mask0"])
    m = jnp.max(sc0, axis=1)                                # (N, H)
    tiers = []
    for (rows_l, cols_l, _v), mask_l in zip(g.ell_levels,
                                            layout["level_masks"]):
        gh_l, sc_l = tier(cols_l, mask_l, rows=rows_l)
        tiers.append((rows_l, gh_l, sc_l))
        m = m.at[rows_l].max(jnp.max(sc_l, axis=1),
                             indices_are_sorted=True, unique_indices=True)
    has_rem = g.rem_src is not None and int(g.rem_src.shape[0]) > 0
    if has_rem:
        a_src32 = a_src.astype(jnp.float32)
        sc_r = jax.nn.leaky_relu(a_src32[g.rem_src] + a_dst32[g.rem_dst],
                                 negative_slope)            # (Er, H)
        m_r = jax.ops.segment_max(sc_r, g.rem_dst, num_segments=n,
                                  indices_are_sorted=True)
        m = jnp.maximum(m, m_r)
    m = jnp.where(jnp.isfinite(m), m, 0.0)                  # isolated rows

    ex0 = jnp.exp(sc0 - m[:, None, :])                      # pads: exp(-inf)=0
    denom = jnp.sum(ex0, axis=1)                            # (N, H)
    for rows_l, _gh, sc_l in tiers:
        ex_l = jnp.exp(sc_l - m[rows_l][:, None, :])
        denom = denom.at[rows_l].add(jnp.sum(ex_l, axis=1),
                                     indices_are_sorted=True,
                                     unique_indices=True)
    if has_rem:
        ex_r = jnp.exp(sc_r - m[g.rem_dst])
        denom = denom + jax.ops.segment_sum(ex_r, g.rem_dst,
                                            num_segments=n,
                                            indices_are_sorted=True)
    denom = jnp.maximum(denom, 1e-16)

    def contract(gh, ex, dn):
        alpha = (ex / dn[:, None, :]).astype(pd)            # (R, K, H)
        R, K = alpha.shape[:2]
        return jnp.sum(alpha[..., None]
                       * gh.reshape(R, K, H, F), axis=1)    # (R, H, F)

    out = contract(gh0, ex0, denom)
    for rows_l, gh_l, sc_l in tiers:
        ex_l = jnp.exp(sc_l - m[rows_l][:, None, :])
        out = out.at[rows_l].add(contract(gh_l, ex_l, denom[rows_l]),
                                 indices_are_sorted=True,
                                 unique_indices=True)
    if has_rem:
        coeff_r = (ex_r / denom[g.rem_dst]).astype(pd)
        msgs = coeff_r[:, :, None] * h.astype(pd)[g.rem_src]
        out = out + jax.ops.segment_sum(msgs, g.rem_dst, num_segments=n,
                                        indices_are_sorted=True
                                        ).astype(out.dtype)
    return out.astype(in_dtype)


def _choose_budgeted_k(counts: np.ndarray, pad_budget: float,
                       total: int) -> int:
    """Neighbor-list width minimizing the modeled aggregation cost

        cost(k) = n * k  +  pad_budget * (total - in_ell(k))

    i.e. padded gather reads plus overflow edges weighted by their relative
    cost on the next tier (the deeper ELL level or the per-edge segment
    path, both ~1.5x a level-1 padded read; measured on v5e, BENCH_NOTES).
    This replaces round 1's coverage-targeting rule, which exploded K on
    power-law graphs (ogbn-arxiv-like tails pushed K to the
    ~99th-percentile degree — a 458 MB neighbor table for a 2.8 M-edge
    graph) — overflow is the job of the deeper levels, not wider padding.
    Vectorized via the degree histogram's tail-cumsum, O(N + max_deg)."""
    ks, in_ell, n = _ell_coverage(counts)
    if ks is None:
        return 1
    # overflow edges cost ~2x a padded level-1 read on their way through
    # the deeper levels / segment tail (gather + scatter-add + launches;
    # measured on v5e GGN mat-vecs, BENCH_NOTES)
    cost = n * ks + 2.0 * pad_budget * (total - in_ell)
    k = int(ks[np.argmin(cost)])
    # snap up to a multiple of 8: the gathered (N, K, d) block's middle
    # dim feeds TPU sublanes, and measured medians show aligned K never
    # loses (K=8 / K=16 / auto all within 2% on a deg-7 graph) while odd K
    # risks misaligned-copy cliffs — so the extra padding is free insurance
    if k > 4:
        k = min(int(-(-k // 8) * 8), int(ks[-1]))
    return k


def _ell_coverage(counts):
    """(ks, in_ell(ks), n_rows) for k = 1..max_deg, vectorized via the
    degree histogram's tail-cumsum."""
    max_deg = int(counts.max()) if len(counts) else 0
    if max_deg == 0:
        return None, None, 0
    hist = np.bincount(counts.astype(np.int64), minlength=max_deg + 1)
    tail_rows = np.cumsum(hist[::-1])[::-1]        # rows with degree >= d
    in_ell = np.cumsum(tail_rows[1:])              # edges covered at k=1..
    ks = np.arange(1, max_deg + 1, dtype=np.int64)
    return ks, in_ell, len(counts)


def _max_coverage_k(counts, pad_budget: float) -> int:
    """Largest width with padding within budget — used for the deeper
    overflow levels, where maximizing coverage per level matters more than
    minimizing padded reads (every level costs fixed gather/scatter
    launches, and the final tail runs on the ~2x-slower segment path)."""
    ks, in_ell, n = _ell_coverage(counts)
    if ks is None:
        return 1
    ok = n * ks <= pad_budget * in_ell
    if not ok.any():
        return 1
    return int(ks[ok].max())


def _pack_one_level(rs, rd, rw, pad_budget: float):
    """Pack dst-sorted overflow edges into a compacted (Nl, Kl) ELL over
    their (high-degree) destination rows; edges beyond Kl stay as a
    dst-sorted COO tail for the next level."""
    rows_l, start = np.unique(rd, return_index=True)
    counts_l = np.diff(np.append(start, len(rd)))
    K = _max_coverage_k(counts_l, pad_budget)
    nl = len(rows_l)
    pos = np.arange(len(rd)) - np.repeat(start, counts_l)
    sel = pos < K
    row_of_edge = np.repeat(np.arange(nl), counts_l)
    cols_l = np.zeros((nl, K), np.int32)
    vals_l = np.zeros((nl, K), rw.dtype)
    cols_l[row_of_edge[sel], pos[sel]] = rs[sel]
    vals_l[row_of_edge[sel], pos[sel]] = rw[sel]
    tail = ~sel
    return ((rows_l.astype(np.int32), cols_l, vals_l),
            rs[tail], rd[tail], rw[tail])


def _pack_levels(rs, rd, rw, pad_budget: float, total_edges: int,
                 max_levels: int = 4):
    """Recursively pack overflow edges into up to ``max_levels`` compacted
    ELL levels; whatever still overflows stays as the COO tail. A level is
    only worth its extra gather+scatter launches when it carries real
    volume, so packing stops once the overflow drops below ~0.5% of the
    graph (the segment path handles a small tail fine)."""
    floor = max(min(4096, max(total_edges // 4, 1)), total_edges // 200)
    levels = []
    while len(rs) >= floor and len(levels) < max_levels:
        level, rs, rd, rw = _pack_one_level(rs, rd, rw, pad_budget)
        levels.append(level)
    return levels, rs, rd, rw


def add_ell_format(g: SparseGraph, max_k: Optional[int] = None,
                   pad_budget: float = 1.5) -> SparseGraph:
    """Attach padded neighbor lists (hybrid ELLPACK).

    ``max_k`` bounds the neighbor-list width; each node's first ``max_k``
    edges go into the padded (N, K) gather-einsum path, overflow edges of
    high-degree nodes go into a dst-sorted COO remainder handled by a
    segmented scatter-add. Without ``max_k``, K is chosen as the smallest
    width whose padding overhead stays within ``pad_budget`` (measured on
    v5e: full-width ELL on a mean-degree-8 graph pads 3x and loses to the
    bounded variant, BENCH_NOTES).
    """
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    w = np.asarray(g.weights)
    n = g.n_nodes
    if native.available():
        if g.dst_sorted:  # already dst-major: offsets via one bincount pass
            counts = np.bincount(dst, minlength=n)
            offsets = np.concatenate([[0], np.cumsum(counts)])
            w64 = np.ascontiguousarray(w, np.float64)
        else:
            src, dst, w64, offsets = native.sort_by_dst(src, dst, w, n)
            counts = np.diff(offsets)
        max_deg = int(counts.max()) if len(counts) else 0
        if max_k is None:
            max_k = _choose_budgeted_k(counts, pad_budget, len(src))
        K = min(max_k, max_deg)
        cols, vals64, rs, rd, rw64 = native.ell_pack(src, w64, offsets, K)
        vals = vals64.astype(w.dtype)
        rw = rw64.astype(w.dtype)
    else:
        order = np.argsort(dst, kind="stable")
        src, dst, w = src[order], dst[order], w[order]
        counts = np.bincount(dst, minlength=n)
        max_deg = int(counts.max()) if len(counts) else 0
        if max_k is None:
            max_k = _choose_budgeted_k(counts, pad_budget, len(src))
        K = min(max_k, max_deg)
        cols = np.zeros((n, K), dtype=np.int32)
        vals = np.zeros((n, K), dtype=np.asarray(g.weights).dtype)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        # vectorized fill: position of each edge within its dst's run
        pos = np.arange(len(dst)) - offsets[dst]
        sel = pos < K
        cols[dst[sel], pos[sel]] = src[sel]
        vals[dst[sel], pos[sel]] = w[sel]
        tail = ~sel
        rs, rd, rw = src[tail], dst[tail].astype(np.int64), w[tail]
    rs = np.asarray(rs)
    rd = np.asarray(rd)
    rw = np.asarray(rw)
    levels, rs, rd, rw = _pack_levels(rs, rd, rw, pad_budget,
                                      total_edges=len(src))
    return SparseGraph(src=g.src, dst=g.dst, weights=g.weights,
                       n_nodes=n, ell_cols=jnp.asarray(cols),
                       ell_vals=jnp.asarray(vals), format="ell",
                       dst_sorted=g.dst_sorted, agg_dtype=g.agg_dtype,
                       symmetric=g.symmetric,
                       rem_src=jnp.asarray(rs, dtype=jnp.int32),
                       rem_dst=jnp.asarray(rd, dtype=jnp.int32),
                       rem_w=jnp.asarray(rw),
                       ell_levels=tuple(
                           (jnp.asarray(r), jnp.asarray(c), jnp.asarray(v))
                           for r, c, v in levels))
