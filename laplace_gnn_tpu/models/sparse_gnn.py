"""Sparse-graph GCN for large fixed graphs.

No reference counterpart exists (the reference is dense-only and caps out at
a few thousand nodes); this is the scale path of the TPU build
(BASELINE.json config 5: ogbn-arxiv-scale). The adjacency lives in a
:class:`~laplace_gnn_tpu.graph.container.SparseGraph` (normalization folded
into edge weights) instead of an N x N parameter; everything else — taps,
KFAC, Laplace flavors, marglik — works unchanged because the curvature stack
only sees the dense layers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ..graph.container import FastAggGraph, SparseGraph
from ..nn.module import (Linear, TapCollector, activation_resolver, dropout,
                         make_norm, resolve_dtype)
from .layers import GCNConv


class SparseSAGEConv:
    """GraphSAGE conv over a SparseGraph: mean neighbor aggregation
    (row-normalized edge weights) + concat + Linear — the scale variant of
    ``GraphSAGEConv`` (reference gnn/models/layers.py:5-29). Build the graph
    with ``normalize='row'`` so ``spmm`` is the mean aggregation."""

    def __init__(self, in_channels: int, out_channels: int, bias: bool = True,
                 name: str = "conv"):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.lin = Linear(2 * in_channels, out_channels, bias=bias, name=name)
        self.name = name

    def init(self, key, dtype=None) -> dict:
        return {"lin": self.lin.init(key, dtype)}

    def apply(self, params: dict, graph, x, taps=None):
        x_neigh = graph.spmm(x)
        h = jnp.concatenate([x, x_neigh], axis=-1)
        return self.lin.apply(params["lin"], h, taps=taps)

    def tap_sites(self) -> list:
        return [{"name": self.name, "param_path": ("lin",),
                 "has_bias": self.lin.use_bias}]


class SparseGATConv:
    """GAT attention over the edges of a SparseGraph (edge-softmax via
    segment max/sum on dst-sorted edges) — the scale variant of ``GATConv``.
    Same parameterization as the dense layer (xavier-uniform att vectors);
    attention weights are computed per edge, so no N x N score matrix is
    ever materialized. Pass a graph with self-loops and no normalization
    (attention provides its own)."""

    def __init__(self, in_channels: int, out_channels: int, heads: int,
                 negative_slope: float = 0.2, concat: bool = True,
                 bias: bool = True, name: str = "conv"):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.heads = heads
        self.negative_slope = negative_slope
        self.concat = concat
        self.use_bias = bias
        self.lin = Linear(in_channels, heads * out_channels, bias=False,
                          name=name)
        self.name = name

    def init(self, key, dtype=None) -> dict:
        dtype = resolve_dtype(dtype)
        lkey, skey, dkey = jax.random.split(key, 3)
        params = {"lin": self.lin.init(lkey, dtype)}
        bound = jnp.sqrt(6.0 / (1 + self.heads * self.out_channels))
        params["att_src"] = jax.random.uniform(
            skey, (1, self.heads, self.out_channels), dtype, -bound, bound)
        params["att_dst"] = jax.random.uniform(
            dkey, (1, self.heads, self.out_channels), dtype, -bound, bound)
        if self.use_bias:
            total = self.out_channels * (self.heads if self.concat else 1)
            params["bias"] = jnp.zeros((total,), dtype)
        return params

    def apply(self, params: dict, graph, x, taps=None):
        n = x.shape[0]
        h = self.lin.apply(params["lin"], x, taps=taps)
        h = h.reshape(n, self.heads, self.out_channels)          # (N, H, F)
        if hasattr(graph, "gat_aggregate"):      # HaloAggGraph: sharded
            out = graph.gat_aggregate(h, params["att_src"],
                                      params["att_dst"],
                                      self.negative_slope)
        else:
            g = getattr(graph, "graph", graph)   # unwrap FastAggGraph
            a_src = jnp.sum(h * params["att_src"], axis=-1)      # (N, H)
            a_dst = jnp.sum(h * params["att_dst"], axis=-1)
            if getattr(g, "format", None) == "ell" and \
                    g.ell_cols is not None:
                # all-ELL softmax + aggregation: one fused payload gather,
                # no per-edge segment/scatter ops for ELL-resident edges
                # (measured 4-5x over the per-edge path at arxiv scale,
                # BENCH_NOTES r5)
                from ..graph.container import (ell_gat_attention,
                                               ell_gat_layout)
                layout = getattr(graph, "_gat_layout", None)
                if layout is None:
                    layout = ell_gat_layout(g)
                    if graph is not g:           # cache on the wrapper
                        graph._gat_layout = layout
                out = ell_gat_attention(g, layout, h, a_src, a_dst,
                                        self.negative_slope)
            else:
                src, dst = g.src, g.dst
                # the (E, H) softmax bookkeeping stays in full precision —
                # it is small next to the (E, H, F) message traffic below
                scores = jax.nn.leaky_relu(a_src[src] + a_dst[dst],
                                           self.negative_slope)  # (E, H)
                smax = jax.ops.segment_max(scores, dst, num_segments=n,
                                           indices_are_sorted=g.dst_sorted)
                ex = jnp.exp(scores - smax[dst])
                denom = jax.ops.segment_sum(
                    ex, dst, num_segments=n,
                    indices_are_sorted=g.dst_sorted)
                coeff = ex / jnp.maximum(denom[dst], 1e-16)      # (E, H)
                out = self._aggregate_messages(graph, g, coeff, h)
        if self.concat:
            out = out.reshape(n, self.heads * self.out_channels)
        else:
            out = out.mean(axis=1)
        if self.use_bias:
            out = out + params["bias"]
        return out

    @staticmethod
    def _aggregate_messages(graph, g, coeff, h):
        """The (E, H, F) message aggregation — the HBM-traffic limiter of
        sparse GAT at scale. Rides the multi-level ELL gather path with
        runtime coefficients when the graph carries one (measured win over
        the per-edge segment scatter, BENCH_NOTES), honoring ``agg_dtype``
        (bf16 message gathers) on either path."""
        from ..graph.container import ell_aggregate_edge_coeff, ell_edge_slots
        n = h.shape[0]
        if getattr(g, "format", None) == "ell" and g.ell_cols is not None:
            slots = getattr(graph, "_gat_slots", None)
            if slots is None:
                slots = ell_edge_slots(g)
                if graph is not g:               # cache on the wrapper
                    graph._gat_slots = slots
            return ell_aggregate_edge_coeff(g, slots, coeff, h)
        in_dtype = h.dtype
        agg = jnp.dtype(g.agg_dtype) if g.agg_dtype is not None else in_dtype
        msgs = coeff.astype(agg)[:, :, None] * h.astype(agg)[g.src]
        out = jax.ops.segment_sum(msgs, g.dst, num_segments=n,
                                  indices_are_sorted=g.dst_sorted)
        return out.astype(in_dtype)

    def tap_sites(self) -> list:
        # The Linear transform is the only dense site; the attention
        # vectors / output bias are NOT its parameters (kfac_incomplete),
        # matching the dense GATConv — under mixed-structure KFAC they get
        # exact-diagonal blocks (the reference's Linear+Conv2d-only KFAC
        # crashes here, curvlinops/kfac.py:130).
        return [{"name": self.name, "param_path": ("lin",),
                 "has_bias": False, "kfac_incomplete": True}]


class SparseGCN:
    """GCN over a SparseGraph; same hyperparameters as GCN, params dict is
    {"convs": [...], ("res": [...], "norms": [...])} — no 'adj' entry."""

    def __init__(self, in_channels: int, hidden_channels: int,
                 out_channels: int, num_layers: int, X,
                 graph: SparseGraph, dropout_p: float = 0.5,
                 act: Union[str, Callable, None] = "relu",
                 act_kwargs: Optional[Dict[str, Any]] = None,
                 norm: Optional[str] = None, res: bool = False):
        self.X = jnp.asarray(X)
        # custom-VJP fast path: backward/transposed aggregation goes through
        # the same sorted/ELL machinery as the forward (see make_spmm)
        if isinstance(graph, SparseGraph):
            graph = FastAggGraph(graph)
        self.graph = graph
        self.in_channels = in_channels
        self.hidden_channels = hidden_channels
        self.out_channels = out_channels
        self.num_layers = num_layers
        self.dropout_p = dropout_p
        self.act = activation_resolver(act, **(act_kwargs or {}))
        self.norm = norm
        self.n_outputs = out_channels

        self.norms = [make_norm(norm, hidden_channels, name=f"norms.{i}")
                      for i in range(num_layers - 1)]
        self.convs = []
        self.res = []
        in_ch = in_channels
        if num_layers > 1:
            self.convs.append(GCNConv(in_ch, hidden_channels, name="convs.0"))
            if res:
                self.res.append(Linear(in_ch, hidden_channels, name="res.0"))
            in_ch = hidden_channels
        for i in range(num_layers - 2):
            self.convs.append(GCNConv(in_ch, hidden_channels,
                                      name=f"convs.{i + 1}"))
            if res:
                self.res.append(Linear(in_ch, hidden_channels,
                                       name=f"res.{i + 1}"))
        self.convs.append(GCNConv(in_ch, out_channels,
                                  name=f"convs.{len(self.convs)}"))
        self.first_tap_static = True
        self.last_layer_closed_form = False

    def init(self, key, dtype=None) -> dict:
        dtype = resolve_dtype(dtype)
        n = len(self.convs) + len(self.res) + len(self.norms)
        keys = iter(jax.random.split(key, max(n, 1)))
        params: dict = {"convs": [c.init(next(keys), dtype)
                                  for c in self.convs]}
        if self.res:
            params["res"] = [r.init(next(keys), dtype) for r in self.res]
        if self.norm in ("layer", "batch") and self.norms:
            params["norms"] = [nm.init(next(keys), dtype)
                               for nm in self.norms]
        return params

    def apply(self, params: dict, x_indices=None,
              taps: Optional[TapCollector] = None, rng=None,
              train: bool = False) -> jnp.ndarray:
        x = self.X
        norms_params = params.get("norms")
        for i in range(self.num_layers - 1):
            h = self.convs[i].apply(params["convs"][i], self.graph, x,
                                    taps=taps)
            if i < len(self.res):
                h = self.res[i].apply(params["res"][i], x) + h
            x = h
            if norms_params is not None:
                x = self.norms[i].apply(norms_params[i], x)
            x = self.act(x)
            if train and rng is not None and self.dropout_p > 0:
                rng, sub = jax.random.split(rng)
                x = dropout(sub, x, self.dropout_p, train)
        x = self.convs[-1].apply(params["convs"][-1], self.graph, x,
                                 taps=taps)
        if x_indices is None:
            return x
        return x[x_indices]

    __call__ = apply

    def features(self, params: dict, X=None) -> tuple:
        taps = TapCollector()
        f = self.apply(params, X, taps=taps)
        last = self.convs[-1].name
        a = [a for (n, a, s) in taps.records if n == last][-1]
        return a, f

    def tap_sites(self, params) -> list:
        sites = []
        for i, conv in enumerate(self.convs):
            for s in conv.tap_sites():
                sites.append({**s, "param_path": ("convs", i)
                              + s["param_path"]})
        for i, r in enumerate(self.res):
            sites.append({"name": r.name, "param_path": ("res", i),
                          "has_bias": r.use_bias})
        return sites

    def last_layer_path(self, params) -> tuple:
        return ("convs", len(self.convs) - 1, "lin")


class SparseSAGE(SparseGCN):
    """GraphSAGE over a SparseGraph: mean neighbor aggregation + concat +
    Linear per layer. Build the graph with ``normalize='row'``. Unlike the
    dense ``GraphSAGE`` there is no per-forward neighbor sampling (the
    static-shape scale path aggregates all neighbors; use the dense model
    for the reference's sampled variant)."""

    def __init__(self, in_channels, hidden_channels, out_channels,
                 num_layers, X, graph, **kwargs):
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, graph, **kwargs)
        # rebuild convs as SAGE convs (same names/paths)
        self.convs = [
            SparseSAGEConv(c.in_channels, c.out_channels, name=c.name)
            for c in self.convs
        ]
        # first tap sees concat[X, agg X wrt row-normalized weights] — still
        # parameter-independent, but not X^T X, so disable the cached-A0 path
        self.first_tap_static = False


class SparseGAT(SparseGCN):
    """GAT over a SparseGraph with per-edge softmax attention. Pass a graph
    with self-loops and ``normalize=None`` (attention normalizes itself).
    ``hidden_channels`` must divide by ``heads`` (as in the dense GAT)."""

    def __init__(self, in_channels, hidden_channels, out_channels,
                 num_layers, X, graph, heads: int = 1, concat: bool = True,
                 **kwargs):
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, graph, **kwargs)
        convs = []
        for c in self.convs:
            # heads apply to every layer, as in the dense GAT
            if concat and c.out_channels % heads != 0:
                raise ValueError(
                    f"Ensure that the number of output channels of "
                    f"'SparseGATConv' (got '{c.out_channels}') is divisible "
                    f"by the number of heads (got '{heads}')")
            out_ch = c.out_channels // (heads if concat else 1)
            convs.append(SparseGATConv(c.in_channels, out_ch, heads=heads,
                                       concat=concat, name=c.name))
        self.convs = convs
        self.first_tap_static = False
