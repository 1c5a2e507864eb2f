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
