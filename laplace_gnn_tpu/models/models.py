"""GNN model zoo (TPU-native counterpart of reference ``gnn/models/models.py``).

Every model follows BaseGNN's functional protocol. The straight-through /
LoRA adjacency transforms are ordinary traced JAX functions built from the
custom-vjp STEs in ops/adjacency.py, so the whole forward — including the
adjacency construction — is differentiable and jit-compatible.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ..nn.module import Linear, resolve_dtype
from ..ops.adjacency import (binarize_ste, fill_diagonal, fill_diagonal_any,
                             normalize_adj, sample_neigh_adj, train_adj_mask)
from ..ops.pallas_spmm import (StaticNormAdjOp, norm_aggregate,
                               ste_norm_aggregate)


class FusedAdjOp:
    """Adjacency stand-in whose ``spmm`` runs the fused Pallas
    transform+aggregate kernel (ops/pallas_spmm.py); consumed by
    ops.spmm.aggregate."""

    def __init__(self, fn):
        self._fn = fn

    def spmm(self, x):
        return self._fn(x)
from .base_gnn import BaseGNN
from .layers import GATConv, GCNConv, GraphSAGEConv


class GCN(BaseGNN):
    """Normalized-adjacency GCN (reference gnn/models/models.py:14-34)."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, dropout_p=0.5,
                 act: Union[str, Callable, None] = "relu",
                 act_kwargs: Optional[Dict[str, Any]] = None,
                 symmetric: bool = False, fused: bool = False, **kwargs):
        init_adj = fill_diagonal_any(init_adj, 1.0)  # self-loops
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=False, symmetric=symmetric, **kwargs)
        # fused=False: composed XLA ops; True: fused Pallas kernel on the
        # live params["adj"]; "int8": adjacency packed once at construction
        # (4x less HBM traffic; valid because GCN never updates it — edits
        # to params["adj"] are ignored in this mode); "auto": int8 when the
        # graph is large enough that HBM traffic dominates Pallas launch
        # overhead (measured crossover ~8k nodes, BENCH_NOTES), else the
        # composed XLA path which wins on small graphs.
        if fused == "auto":
            fused = "int8" if self.init_adj.shape[0] >= 8192 else False
        self.fused = fused
        self._static_op = (StaticNormAdjOp(self.init_adj)
                           if fused == "int8" else None)

    def forward_adj(self, params, rng=None):
        if self.fused == "int8":
            return self._static_op
        if self.fused:
            return FusedAdjOp(lambda s: norm_aggregate(params["adj"], s))
        return normalize_adj(params["adj"])

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        return GCNConv(in_channels, out_channels, name=name, **kwargs)


class GraphSAGE(BaseGNN):
    """Mean-aggregation SAGE with optional neighbor sampling
    (reference gnn/models/models.py:37-63)."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, num_sampled_nodes_per_hop: Optional[int] = None,
                 dropout_p=0.5, act="relu", act_kwargs=None,
                 symmetric: bool = False, **kwargs):
        init_adj = fill_diagonal_any(init_adj, 0.0)  # no self-loops
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=False, symmetric=symmetric, **kwargs)
        self.num_sampled_nodes_per_hop = num_sampled_nodes_per_hop

    def forward_adj(self, params, rng=None):
        adj = params["adj"]
        if self.num_sampled_nodes_per_hop is None or rng is None:
            return adj
        return adj * sample_neigh_adj(rng, adj, self.num_sampled_nodes_per_hop)

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        return GraphSAGEConv(in_channels, out_channels, name=name, **kwargs)


class STEGCN(BaseGNN):
    """GCN whose adjacency is a learnable parameter passed through a
    straight-through binarization (reference gnn/models/models.py:65-118)."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, dropout_p=0.5, act="relu", act_kwargs=None,
                 threshold: float = 0.5, train_masked_update: bool = False,
                 train_nodes=None, symmetric: bool = False,
                 sign_grad: bool = False, fused: bool = False, **kwargs):
        init_adj = fill_diagonal_any(init_adj, 1.0)
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=True, symmetric=symmetric, **kwargs)
        self.fused = fused
        self.threshold = threshold
        self.sign_grad = sign_grad
        self.train_masked_update = train_masked_update
        if train_masked_update:
            if train_nodes is None:
                raise ValueError("'train_nodes' must be provided to use "
                                 "train_masked_update.")
            mask = train_adj_mask(self.init_adj.shape[0],
                                  jnp.asarray(train_nodes))
            # soft mask (reference :95)
            self.grad_adj_mask = jnp.where(mask == 0, 0.1, mask)
        else:
            self.grad_adj_mask = None

    def full_adj(self, params):
        return (params["adj"] > self.threshold).astype(params["adj"].dtype)

    def forward_adj(self, params, rng=None):
        if self.fused:
            return FusedAdjOp(lambda s: ste_norm_aggregate(
                params["adj"], s, self.threshold, self.symmetric,
                self.sign_grad, self.grad_adj_mask))
        adj = params["adj"]
        if self.symmetric:
            adj = (adj + adj.T) / 2
        adj = binarize_ste(adj, self.threshold, self.grad_adj_mask,
                           self.sign_grad)
        adj = fill_diagonal(adj, 1.0)
        return normalize_adj(adj)

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        return GCNConv(in_channels, out_channels, name=name, **kwargs)


class STEGraphSAGE(BaseGNN):
    """SAGE over an STE-binarized learnable adjacency
    (reference gnn/models/models.py:121-183). Note the reference returns the
    binarized adjacency *without* normalization or self-loops here."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, num_sampled_nodes_per_hop: Optional[int] = None,
                 dropout_p=0.5, act="relu", act_kwargs=None,
                 threshold: float = 0.5, train_masked_update: bool = False,
                 train_nodes=None, symmetric: bool = False,
                 sign_grad: bool = False, **kwargs):
        init_adj = fill_diagonal_any(init_adj, 0.0)
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=True, symmetric=symmetric, **kwargs)
        self.threshold = threshold
        self.sign_grad = sign_grad
        self.num_sampled_nodes_per_hop = num_sampled_nodes_per_hop
        self.train_masked_update = train_masked_update
        if train_masked_update:
            if train_nodes is None:
                raise ValueError("'train_nodes' must be provided to use "
                                 "train_masked_update.")
            self.grad_adj_mask = train_adj_mask(self.init_adj.shape[0],
                                                jnp.asarray(train_nodes))
        else:
            self.grad_adj_mask = None

    def full_adj(self, params):
        return (params["adj"] > self.threshold).astype(params["adj"].dtype)

    def forward_adj(self, params, rng=None):
        adj = params["adj"]
        if self.symmetric:
            adj = (adj + adj.T) / 2
        return binarize_ste(adj, self.threshold, self.grad_adj_mask,
                            self.sign_grad)

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        return GraphSAGEConv(in_channels, out_channels, name=name, **kwargs)


class LoRASTEGCN(BaseGNN):
    """STE-GCN where the adjacency update is parameterized low-rank:
    adj_eff = STE(adj + B @ A * alpha/r) (reference gnn/models/models.py:186-235).
    The LoRA factors are named ``adj_lora_*`` so they are excluded from the
    Laplace posterior by the same name filter as ``adj`` itself."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, r: int, lora_alpha: float, dropout_p=0.5,
                 act="relu", act_kwargs=None, threshold: float = 0.5,
                 symmetric: bool = False, **kwargs):
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=True, symmetric=symmetric, **kwargs)
        self.threshold = threshold
        self.r = r
        self.lora_alpha = lora_alpha
        self.scaling = lora_alpha / r

    def init(self, key, dtype=None) -> dict:
        dtype = resolve_dtype(dtype)
        pkey, akey, bkey = jax.random.split(key, 3)
        params = super().init(pkey, dtype)
        n = self.init_adj.shape[0]
        # kaiming_uniform(a=sqrt(5)) on (r, N): bound = 1/sqrt(N) (reference :225)
        bound = 1.0 / math.sqrt(n)
        params["adj_lora_A"] = jax.random.uniform(akey, (self.r, n), dtype,
                                                  -bound, bound)
        params["adj_lora_B"] = jax.random.normal(bkey, (n, self.r), dtype)
        return params

    def full_adj(self, params):
        return (params["adj"] > self.threshold).astype(params["adj"].dtype)

    def forward_adj(self, params, rng=None):
        adj = params["adj"] + (params["adj_lora_B"] @ params["adj_lora_A"]) \
            * self.scaling
        if self.symmetric:
            adj = (adj + adj.T) / 2
        adj = binarize_ste(adj, self.threshold)
        adj = fill_diagonal(adj, 1.0)
        return normalize_adj(adj)

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        return GCNConv(in_channels, out_channels, name=name, **kwargs)


class GAT(BaseGNN):
    """Dense multi-head graph attention (reference gnn/models/models.py:238-275).

    Scale knobs beyond the reference: ``row_block`` / ``attn_dtype`` flow to
    :class:`~..models.layers.GATConv` (flash-style chunking, bf16
    contraction), and ``mask_dtype`` ('int8') serves the attention a STATIC
    packed mask instead of the f32 adjacency — exact (attention only tests
    ``adj > 0`` and GAT never updates its adjacency: NO_ADJ_UPDATE in the
    reference, gnn/marglik_training.py:31-39) and 4x less mask HBM traffic,
    the dominant dense-path read at N >= 16k."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, dropout_p=0.5, act="relu", act_kwargs=None,
                 symmetric: bool = False, mask_dtype=None, **kwargs):
        init_adj = fill_diagonal_any(init_adj, 1.0)
        self.mask_dtype = mask_dtype
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=False, symmetric=symmetric, **kwargs)

    def forward_adj(self, params, rng=None):
        if self.mask_dtype is not None:
            # derive the packed mask from the (loop-invariant) adjacency
            # INSIDE the trace: XLA hoists the cast out of training loops,
            # so steady-state mask reads are 1 byte/entry. (Baking a
            # precomputed N x N int8 constant into the program instead
            # overflows the remote-compile request at N >= 16k.)
            return (params["adj"] > 0).astype(self.mask_dtype)
        return params["adj"]

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        heads = kwargs.pop("heads", 1)
        concat = kwargs.pop("concat", True)
        if concat and out_channels % heads != 0:
            raise ValueError(
                f"Ensure that the number of output channels of 'GATConv' "
                f"(got '{out_channels}') is divisible by the number of heads "
                f"(got '{heads}')")
        if concat:
            out_channels = out_channels // heads
        return GATConv(in_channels, out_channels, heads=heads, concat=concat,
                       name=name, **kwargs)


class AttSTEGCN(BaseGNN):
    """Adjacency constructed by scaled dot-product attention over node
    features, then STE-binarized (reference gnn/models/models.py:278-355,
    experimental). The attention projection is named ``adj_W`` so it shares
    the reference's accidental-but-load-bearing property of being excluded
    from the Laplace posterior by the 'adj' name filter."""

    def __init__(self, in_channels, hidden_channels, out_channels, num_layers,
                 X, init_adj, dropout_p=0.5, act="relu", act_kwargs=None,
                 threshold: float = 0.5, train_masked_update: bool = False,
                 train_nodes=None, symmetric: bool = False, d_k: int = 8,
                 **kwargs):
        super().__init__(in_channels, hidden_channels, out_channels,
                         num_layers, X, init_adj, dropout_p, act, act_kwargs,
                         update_adj=False, symmetric=symmetric, **kwargs)
        self.threshold = threshold
        self.d_k = d_k
        self.scale = math.sqrt(d_k)
        self.adj_W = Linear(in_channels, d_k, bias=False, name="adj_W")
        #: optional jax.sharding.Sharding applied to the constructed N x N
        #: attention adjacency (with_sharding_constraint) — the scale hook:
        #: row-shard the score matrix over a 'graph' mesh axis and XLA
        #: partitions the (X W)(X W)^T construction, the STE, and the
        #: normalization with it (see scripts/shard_scale_bench.py)
        self.adj_constraint = None
        self.train_masked_update = train_masked_update
        if train_masked_update:
            if train_nodes is None:
                raise ValueError("'train_nodes' must be provided to use "
                                 "train_masked_update.")
            self.grad_adj_mask = train_adj_mask(self.init_adj.shape[0],
                                                jnp.asarray(train_nodes))
        else:
            self.grad_adj_mask = None

    def init(self, key, dtype=None) -> dict:
        dtype = resolve_dtype(dtype)
        pkey, wkey = jax.random.split(key)
        params = super().init(pkey, dtype)
        params["adj_W"] = self.adj_W.init(wkey, dtype)
        return params

    def construct_adj(self, params):
        src = dst = self.adj_W.apply(params["adj_W"], self.X)
        score = (src @ dst.T) / self.scale
        score = jnp.clip(score, 0.0, 1.0)  # hardtanh(0, 1) (reference :345)
        if self.adj_constraint is not None:
            score = jax.lax.with_sharding_constraint(score,
                                                     self.adj_constraint)
        return score

    def forward_adj(self, params, rng=None):
        adj = self.construct_adj(params)
        if self.symmetric:
            adj = (adj + adj.T) / 2
        adj = binarize_ste(adj, self.threshold, self.grad_adj_mask)
        adj = fill_diagonal(adj, 1.0)
        return normalize_adj(adj)

    def init_conv(self, in_channels, out_channels, name, **kwargs):
        return GCNConv(in_channels, out_channels, name=name, **kwargs)


MODEL_REGISTRY = {
    "gcn": GCN,
    "stegcn": STEGCN,
    "lorastegcn": LoRASTEGCN,
    "gat": GAT,
    "graphsage": GraphSAGE,
    "stegraphsage": STEGraphSAGE,
    "attstegcn": AttSTEGCN,
}
