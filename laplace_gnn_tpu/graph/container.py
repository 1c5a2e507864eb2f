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


@dataclass(frozen=True)
class SparseGraph:
    """COO edges (+ optional ELL form). Registered as a pytree so it can be
    closed over / passed through jit."""
    src: jnp.ndarray            # (E,)
    dst: jnp.ndarray            # (E,)
    weights: jnp.ndarray        # (E,)
    n_nodes: int
    ell_cols: Optional[jnp.ndarray] = None     # (N, max_deg) or None
    ell_vals: Optional[jnp.ndarray] = None     # (N, max_deg)
    format: str = "segment"

    @property
    def n_edges(self) -> int:
        return int(self.src.shape[0])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        """out[i] = sum_{e: dst_e = i} w_e x[src_e]."""
        if self.format == "ell" and self.ell_cols is not None:
            gathered = x[self.ell_cols]                 # (N, max_deg, d)
            return jnp.einsum("nk,nkd->nd", self.ell_vals, gathered)
        msgs = self.weights[:, None] * x[self.src]
        return jax.ops.segment_sum(msgs, self.dst,
                                   num_segments=self.n_nodes)

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
    leaves = (g.src, g.dst, g.weights, g.ell_cols, g.ell_vals)
    aux = (g.n_nodes, g.format)
    return leaves, aux


def _sparse_unflatten(aux, leaves):
    src, dst, weights, ell_cols, ell_vals = leaves
    n_nodes, fmt = aux
    return SparseGraph(src=src, dst=dst, weights=weights, n_nodes=n_nodes,
                       ell_cols=ell_cols, ell_vals=ell_vals, format=fmt)


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

    g = SparseGraph(src=jnp.asarray(src, dtype=jnp.int32),
                    dst=jnp.asarray(dst, dtype=jnp.int32),
                    weights=jnp.asarray(w, dtype=dtype),
                    n_nodes=n_nodes, format=fmt)
    if fmt == "ell":
        g = add_ell_format(g)
    return g


def add_ell_format(g: SparseGraph) -> SparseGraph:
    """Attach padded neighbor lists (ELLPACK)."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    w = np.asarray(g.weights)
    n = g.n_nodes
    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    counts = np.bincount(dst, minlength=n)
    max_deg = int(counts.max()) if len(counts) else 0
    cols = np.zeros((n, max_deg), dtype=np.int32)
    vals = np.zeros((n, max_deg), dtype=np.asarray(g.weights).dtype)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    for i in range(n):
        k = counts[i]
        cols[i, :k] = src[offsets[i]: offsets[i] + k]
        vals[i, :k] = w[offsets[i]: offsets[i] + k]
    return SparseGraph(src=g.src, dst=g.dst, weights=g.weights,
                       n_nodes=n, ell_cols=jnp.asarray(cols),
                       ell_vals=jnp.asarray(vals), format="ell")
