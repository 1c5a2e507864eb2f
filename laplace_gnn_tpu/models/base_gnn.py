"""Functional BaseGNN (TPU-native counterpart of reference
``gnn/models/base_gnn.py``).

The model is a static object holding the full node-feature matrix ``X`` and
all architecture hyperparameters; the learnable state is a params dict:

    params = {
        "adj":   (N, N) adjacency — a *hyperparameter* of the posterior,
                 excluded from the Laplace approximation by name
                 (reference laplace/baselaplace.py:119),
        "convs": [conv params per layer],
        "res":   [residual Linear params]      (if res=True),
        "norms": [norm params per hidden layer] (excluded from posterior),
        ...model-specific extras (lora, attention) added by subclasses.
    }

``apply(params, x_indices)`` runs all layers on the full graph and slices the
requested output rows at the end (reference gnn/models/base_gnn.py:136-161) —
full-graph compute is exactly the XLA-friendly shape: one traced program of
dense matmuls, no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import (Linear, TapCollector, activation_resolver, dropout,
                         make_norm, resolve_dtype)


class BaseGNN:
    def __init__(self,
                 in_channels: int,
                 hidden_channels: int,
                 out_channels: int,
                 num_layers: int,
                 X,
                 init_adj,
                 dropout_p: float = 0.5,
                 act: Union[str, Callable, None] = "relu",
                 act_kwargs: Optional[Dict[str, Any]] = None,
                 update_adj: bool = False,
                 norm: Optional[str] = None,
                 res: bool = False,
                 symmetric: bool = False,
                 **kwargs):
        self.X = jnp.asarray(X)

        self.update_adj = update_adj
        self.symmetric = symmetric
        # Validate binariness host-side BEFORE any device round trip: a
        # device->host fetch here would permanently degrade dispatch latency
        # on tunneled TPU backends (see bench.py). Only host inputs are
        # checked eagerly; device arrays are trusted.
        if not isinstance(init_adj, jax.Array):
            vals = np.asarray(init_adj)
            if not np.all((vals == 0) | (vals == 1)):
                raise ValueError("init_adj must be binary.")
        init_adj = jnp.asarray(init_adj, dtype=self.X.dtype)
        if symmetric:  # treat as undirected (reference :66-70)
            init_adj = jnp.minimum(init_adj + init_adj.T, 1.0)
        self.init_adj = init_adj

        self.in_channels = in_channels
        self.hidden_channels = hidden_channels
        self.out_channels = out_channels
        self.num_layers = num_layers
        self.dropout_p = dropout_p
        self.act = activation_resolver(act, **(act_kwargs or {}))
        self.norm = norm
        self.use_res = res
        self.n_outputs = out_channels

        self.norms = [make_norm(norm, hidden_channels, name=f"norms.{i}")
                      for i in range(num_layers - 1)]

        self.convs = []
        self.res = []
        in_ch = in_channels
        if num_layers > 1:
            self.convs.append(self.init_conv(in_ch, hidden_channels,
                                             name="convs.0", **kwargs))
            if res:
                self.res.append(Linear(in_ch, hidden_channels, name="res.0"))
            in_ch = hidden_channels
        for i in range(num_layers - 2):
            self.convs.append(self.init_conv(in_ch, hidden_channels,
                                             name=f"convs.{i + 1}", **kwargs))
            if res:
                self.res.append(Linear(in_ch, hidden_channels, name=f"res.{i + 1}"))
        if out_channels is not None:
            self.convs.append(self.init_conv(in_ch, out_channels,
                                             name=f"convs.{len(self.convs)}",
                                             **kwargs))

        # The first dense layer of a GCNConv stack consumes raw X, so its
        # KFAC input covariance X^T X / N is constant — marglik hypersteps
        # can cache its eigendecomposition (training/marglik_gnn.py).
        from .layers import GCNConv as _GCNConv
        self.first_tap_static = isinstance(self.convs[0], _GCNConv)

    # --- to be provided by subclasses -------------------------------------
    def init_conv(self, in_channels: int, out_channels: int, name: str, **kwargs):
        raise NotImplementedError

    def forward_adj(self, params: dict, rng=None):
        """Effective adjacency used in the forward pass."""
        raise NotImplementedError

    # --- params -----------------------------------------------------------
    def init(self, key, dtype=None) -> dict:
        dtype = resolve_dtype(dtype)
        n = 2 * len(self.convs) + len(self.res) + len(self.norms)
        keys = iter(jax.random.split(key, max(n, 1)))
        params: dict = {"adj": self.init_adj.astype(dtype)}
        params["convs"] = [c.init(next(keys), dtype) for c in self.convs]
        if self.res:
            params["res"] = [r.init(next(keys), dtype) for r in self.res]
        if self.norm in ("layer", "batch") and self.norms:
            params["norms"] = [nm.init(next(keys), dtype) for nm in self.norms]
        return params

    def full_adj(self, params: dict) -> jnp.ndarray:
        """Raw learned adjacency (reference gnn/models/base_gnn.py:133)."""
        return params["adj"]

    def jvp_safe(self) -> "BaseGNN":
        """Clone whose attention convs route through the XLA chunked
        attention instead of the flash Pallas kernel.

        ``flash_masked_attention`` is a ``jax.custom_vjp`` — forward-mode
        ``jax.jvp``, the substrate of every curvature product
        (curvature/operators.py, curvature/kfac.py), cannot trace through
        it. Curvature/marglik builders call this before closing over the
        model; training/inference keep the fused kernel. The two paths
        compute identical math, so mixing them inside one hyperstep is
        exact (not an approximation swap).

        ONLY the ``"flash"`` impl is stripped: a CALLABLE attention_impl
        (e.g. ``make_row_sharded_gat_attention``'s shard_map closure) is
        plain XLA and jvp-capable — removing it would silently drop the
        sharding from the curvature path (the hyperstep would trace the
        unsharded chunked attention: full N^2 temps back on every
        device). Returns ``self`` when nothing needs stripping."""
        import copy
        convs = getattr(self, "convs", [])
        if not any(getattr(c, "attention_impl", None) == "flash"
                   for c in convs):
            return self
        m = copy.copy(self)
        # a shallow copy would share the jitted-program cache; its keys do
        # not encode attention_impl, so give the clone a fresh one
        m.__dict__.pop("_jit_program_cache", None)
        m.convs = []
        for c in convs:
            if getattr(c, "attention_impl", None) == "flash":
                c = copy.copy(c)
                c.attention_impl = None
            m.convs.append(c)
        return m

    def reset_adj(self, params: dict) -> dict:
        out = dict(params)
        out["adj"] = self.init_adj.astype(params["adj"].dtype)
        return out

    # --- forward ----------------------------------------------------------
    def apply(self, params: dict, x_indices=None,
              taps: Optional[TapCollector] = None,
              rng=None, train: bool = False) -> jnp.ndarray:
        adj_rng = drop_rng = None
        if rng is not None:
            adj_rng, drop_rng = jax.random.split(rng)
        adj = self.forward_adj(params, rng=adj_rng)
        x = self.X.astype(params["adj"].dtype)
        norms_params = params.get("norms")
        for i in range(self.num_layers - 1):
            h = self.convs[i].apply(params["convs"][i], adj, x, taps=taps)
            if i < len(self.res):
                h = self.res[i].apply(params["res"][i], x) + h
            x = h
            if norms_params is not None:
                x = self.norms[i].apply(norms_params[i], x)
            x = self.act(x)
            if train and drop_rng is not None and self.dropout_p > 0:
                drop_rng, sub = jax.random.split(drop_rng)
                x = dropout(sub, x, self.dropout_p, train)
        x = self.convs[-1].apply(params["convs"][-1], adj, x, taps=taps)
        if x_indices is None:
            return x
        return x[x_indices]

    __call__ = apply

    # The last Linear's output is aggregated (adj @ s) before becoming the
    # model output, so the closed-form features x I last-layer Jacobian is
    # NOT exact for GNNs; last-layer Laplace falls back to autodiff Jacobians
    # (exact), unlike the reference whose FeatureExtractor would silently
    # linearize the wrong map.
    last_layer_closed_form = False

    def features(self, params: dict, X=None) -> tuple:
        """(input activations of the last dense layer, model output)."""
        taps = TapCollector()
        f = self.apply(params, X, taps=taps)
        last = self.convs[-1].name
        a = [a for (n, a, s) in taps.records if n == last][-1]
        return a, f

    # --- introspection for Laplace / KFAC ---------------------------------
    def tap_sites(self, params: dict) -> list[dict]:
        sites = []
        for i, conv in enumerate(self.convs):
            for s in conv.tap_sites():
                sites.append({**s, "param_path": ("convs", i) + s["param_path"]})
        for i, r in enumerate(self.res):
            sites.append({"name": r.name, "param_path": ("res", i),
                          "has_bias": r.use_bias})
        return sites

    def last_layer_path(self, params: dict) -> tuple:
        return ("convs", len(self.convs) - 1, "lin")
