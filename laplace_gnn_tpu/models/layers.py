"""Dense message-passing layers (TPU-native counterparts of
reference ``gnn/models/layers.py``).

Each conv is a static object with ``init(key) -> params`` and
``apply(params, adj, x, taps=None) -> out``. The parameterized Linear inside
each conv routes through the KFAC tap mechanism (see nn/module.py), matching
where the reference's KFAC hooks sit (on ``nn.Linear`` submodules).

The aggregation ``adj @ (x W^T)`` is a dense N×N matmul: on TPU this is the
MXU hot path, optionally served by the Pallas blocked-matmul kernel in
ops/spmm.py for large N.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.module import Linear, TapCollector, resolve_dtype
from ..ops.spmm import aggregate


class GCNConv:
    """out = adj @ lin(x)  (reference gnn/models/layers.py:32-46)."""

    def __init__(self, in_channels: int, out_channels: int, bias: bool = True,
                 name: str = "conv"):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.lin = Linear(in_channels, out_channels, bias=bias, name=name)
        self.name = name

    def init(self, key, dtype=None) -> dict:
        return {"lin": self.lin.init(key, dtype)}

    def apply(self, params: dict, adj: jnp.ndarray, x: jnp.ndarray,
              taps: Optional[TapCollector] = None) -> jnp.ndarray:
        s = self.lin.apply(params["lin"], x, taps=taps)
        return aggregate(adj, s)

    def tap_sites(self) -> list[dict]:
        return [{"name": self.name, "param_path": ("lin",),
                 "has_bias": self.lin.use_bias}]


class GraphSAGEConv:
    """Row-normalized mean aggregation + concat + linear
    (reference gnn/models/layers.py:5-29)."""

    def __init__(self, in_channels: int, out_channels: int, bias: bool = True,
                 name: str = "conv"):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.lin = Linear(2 * in_channels, out_channels, bias=bias, name=name)
        self.name = name

    def init(self, key, dtype=None) -> dict:
        return {"lin": self.lin.init(key, dtype)}

    @staticmethod
    def mean_agg(adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        row_sum = jnp.sum(adj, axis=1, keepdims=True)
        row_sum = jnp.where(row_sum == 0, 1.0, row_sum)
        return aggregate(adj / row_sum, x)

    def apply(self, params: dict, adj: jnp.ndarray, x: jnp.ndarray,
              taps: Optional[TapCollector] = None) -> jnp.ndarray:
        x_neigh = self.mean_agg(adj, x)
        h = jnp.concatenate([x, x_neigh], axis=-1)
        return self.lin.apply(params["lin"], h, taps=taps)

    def tap_sites(self) -> list[dict]:
        return [{"name": self.name, "param_path": ("lin",),
                 "has_bias": self.lin.use_bias}]


class GATConv:
    """Dense multi-head attention with masked softmax over the adjacency
    (reference gnn/models/layers.py:49-124).

    Note on parity: the reference's output contraction
    (``einsum('bij,bjk->bkj', alpha, x_dst)``, gnn/models/layers.py:119)
    contracts the attention weights against the *target* node's own features —
    since alpha is normalized over dim 1, that einsum reduces to the identity
    map on x_dst (no neighbor aggregation happens). This appears to be a bug
    in the reference; here the standard GAT aggregation
    ``out[i] = sum_j alpha[i,j] x[j]`` is implemented instead.
    """

    def __init__(self, in_channels: int, out_channels: int, heads: int,
                 negative_slope: float = 0.2, concat: bool = True,
                 bias: bool = True, name: str = "conv"):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.heads = heads
        self.negative_slope = negative_slope
        self.concat = concat
        self.use_bias = bias
        self.lin = Linear(in_channels, heads * out_channels, bias=False, name=name)
        self.name = name

    def init(self, key, dtype=None) -> dict:
        dtype = resolve_dtype(dtype)
        lkey, skey, dkey = jax.random.split(key, 3)
        params = {"lin": self.lin.init(lkey, dtype)}
        # xavier_uniform on attention vectors (reference :97-99)
        bound_att = jnp.sqrt(6.0 / (1 + self.heads * self.out_channels))
        params["att_src"] = jax.random.uniform(
            skey, (1, self.heads, self.out_channels), dtype, -bound_att, bound_att)
        params["att_dst"] = jax.random.uniform(
            dkey, (1, self.heads, self.out_channels), dtype, -bound_att, bound_att)
        if self.use_bias:
            total = self.out_channels * (self.heads if self.concat else 1)
            params["bias"] = jnp.zeros((total,), dtype)
        return params

    def apply(self, params: dict, adj: jnp.ndarray, x: jnp.ndarray,
              taps: Optional[TapCollector] = None) -> jnp.ndarray:
        n = x.shape[0]
        h = self.lin.apply(params["lin"], x, taps=taps)
        h = h.reshape(n, self.heads, self.out_channels)           # (N, H, F)

        alpha_src = jnp.sum(h * params["att_src"], axis=-1)       # (N, H)
        alpha_dst = jnp.sum(h * params["att_dst"], axis=-1)       # (N, H)

        # score[i, j, h] = adj[i, j] * (alpha_src[j, h] + alpha_dst[i, h])
        # (reference :110-113, with i=target row, j=source col)
        scores = alpha_src[None, :, :] + alpha_dst[:, None, :]     # (N, N, H)
        scores = jax.nn.leaky_relu(scores, self.negative_slope)
        mask = (adj > 0)[..., None]
        # masked softmax over neighbors j (dim 1), numerically stabilized
        scores = jnp.where(mask, scores, -jnp.inf)
        smax = jnp.max(scores, axis=1, keepdims=True)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        ex = jnp.where(mask, jnp.exp(scores - smax), 0.0)
        denom = jnp.sum(ex, axis=1, keepdims=True)
        alpha = ex / jnp.where(denom == 0, 1.0, denom)             # (N, N, H)

        out = jnp.einsum("ijh,jhf->ihf", alpha, h)                 # (N, H, F)
        if self.concat:
            out = out.reshape(n, self.heads * self.out_channels)
        else:
            out = jnp.mean(out, axis=1)

        if self.use_bias:
            out = out + params["bias"]
        return out

    def tap_sites(self) -> list[dict]:
        # The attention vectors / bias are not Linear weights: like the
        # reference's KFACLinearOperator (which only maps Linear/Conv2d
        # parameters), KFAC is not defined for them.
        return [{"name": self.name, "param_path": ("lin",), "has_bias": False,
                 "kfac_incomplete": True}]
