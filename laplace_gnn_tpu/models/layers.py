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


def _masked_attention_dense(alpha_src, alpha_dst, adj, h, negative_slope,
                            attn_dtype=None):
    """out[i] = sum_j softmax_j(leaky_relu(a_src[j] + a_dst[i]) | adj[i,j]>0)
    * h[j], materializing the full (N, N, H) score tensor (reference
    gnn/models/layers.py:110-124 semantics; i=target row, j=source col).

    ``adj`` may be any dtype — only ``adj > 0`` enters (an int8 mask read
    moves 4x fewer HBM bytes than f32; see GAT(mask_dtype=...)).
    ``attn_dtype`` (e.g. bfloat16) casts ONLY the final alpha @ h
    contraction's operands — the MXU-bound N^2*H*F matmul — keeping the
    softmax chain in full precision; the result is cast back."""
    scores = alpha_src[None, :, :] + alpha_dst[:, None, :]         # (N, N, H)
    scores = jax.nn.leaky_relu(scores, negative_slope)
    mask = (adj > 0)[..., None]
    # masked softmax over neighbors j (dim 1), numerically stabilized
    scores = jnp.where(mask, scores, -jnp.inf)
    smax = jnp.max(scores, axis=1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.where(mask, jnp.exp(scores - smax), 0.0)
    denom = jnp.sum(ex, axis=1, keepdims=True)
    alpha = ex / jnp.where(denom == 0, 1.0, denom)                 # (N, N, H)
    if attn_dtype is not None:
        out = jnp.einsum("ijh,jhf->ihf", alpha.astype(attn_dtype),
                         h.astype(attn_dtype),
                         preferred_element_type=h.dtype)
        return out.astype(h.dtype)
    return jnp.einsum("ijh,jhf->ihf", alpha, h)                    # (N, H, F)


def _masked_attention_chunked(alpha_src, alpha_dst, adj, h, negative_slope,
                              block: int, attn_dtype=None):
    """Flash-style row-blocked masked attention: identical math to
    :func:`_masked_attention_dense` but never materializes the (N, N, H)
    score tensor — each target-row block of ``block`` rows computes its own
    (block, N, H) scores, softmax (exact, since the softmax axis j is fully
    resident per block), and output contraction. Peak attention memory drops
    from N^2*H to block*N*H floats (32x at N=8192, block=512, H=8: 2.1 GB ->
    67 MB), which is what makes dense-adjacency GAT structure learning
    feasible at N >= 8k. ``jax.checkpoint`` bounds the reverse pass the same
    way (scores are recomputed per block instead of stored), and forward-mode
    jvp (the GGN mat-vec path) passes straight through.

    ``adj``/``alpha_dst`` may cover only R <= N target rows (a row shard —
    parallel/sharded.py::make_row_sharded_gat_attention feeds per-device
    blocks); sources always span the full ``alpha_src``/``h``."""
    n, H = alpha_src.shape
    R = adj.shape[0]
    n_pad = -(-R // block) * block
    pad = n_pad - R
    # a zero pad still copies the O(N^2) adjacency (4.3 GB at N=32768);
    # skip it when the block divides R
    adj_p = jnp.pad(adj, ((0, pad), (0, 0))) if pad else adj
    a_dst_p = jnp.pad(alpha_dst, ((0, pad), (0, 0))) if pad else alpha_dst

    @jax.checkpoint
    def one_block(i0):
        adj_blk = jax.lax.dynamic_slice(adj_p, (i0, 0), (block, n))
        a_dst_blk = jax.lax.dynamic_slice(a_dst_p, (i0, 0), (block, H))
        # padded rows have an all-False mask -> denom 0 -> zero output rows
        return _masked_attention_dense(alpha_src, a_dst_blk, adj_blk, h,
                                       negative_slope,
                                       attn_dtype=attn_dtype)

    i0s = jnp.arange(0, n_pad, block)
    out = jax.lax.map(one_block, i0s)          # (n_pad/block, block, H, F)
    return out.reshape(n_pad, H, h.shape[-1])[:R]


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

    Scale: the reference materializes the (N, N, heads) score tensor, which
    is 2.1 GB at N=8192/H=8 and caps dense GAT well below the sizes the STE
    models reach. ``row_block`` (or the automatic switch above
    ``AUTO_CHUNK_N`` nodes) uses the flash-style row-blocked softmax
    (:func:`_masked_attention_chunked`) with identical numerics and
    O(block * N * H) peak attention memory.
    """

    #: auto-chunk threshold: above this many nodes the (N, N, H) score
    #: tensor (2.1 GB at N=8192, H=8) no longer fits comfortably in HBM
    #: alongside the model, so apply() switches to the flash-style
    #: row-blocked path unless ``row_block`` pins a choice.
    AUTO_CHUNK_N = 4096

    def __init__(self, in_channels: int, out_channels: int, heads: int,
                 negative_slope: float = 0.2, concat: bool = True,
                 bias: bool = True, name: str = "conv",
                 row_block: Optional[int] = None,
                 attn_dtype: Optional[str] = None,
                 attention_impl: Optional[callable] = None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.heads = heads
        self.negative_slope = negative_slope
        self.concat = concat
        self.use_bias = bias
        self.lin = Linear(in_channels, heads * out_channels, bias=False, name=name)
        self.name = name
        self.row_block = row_block
        #: cast only the alpha @ h contraction operands (the MXU-bound
        #: N^2*H*F matmul) to this dtype; softmax stays full-precision
        self.attn_dtype = attn_dtype
        #: optional override for the masked-softmax aggregation with the
        #: signature (alpha_src, alpha_dst, adj, h, negative_slope) -> out —
        #: e.g. parallel/sharded.py::make_row_sharded_gat_attention for
        #: row-sharded dense structure learning over a device mesh
        self.attention_impl = attention_impl

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

        block = self.row_block
        if block is None and n > self.AUTO_CHUNK_N:
            block = 512
        if self.attention_impl is not None:
            impl = self.attention_impl
            if impl == "flash":
                # fused online-softmax Pallas kernel (ops/pallas_attention):
                # nothing score-shaped ever touches HBM; attn_dtype feeds
                # the kernel's MXU contraction dtype
                from ..ops.pallas_attention import flash_masked_attention
                out = flash_masked_attention(alpha_src, alpha_dst, adj, h,
                                             self.negative_slope,
                                             self.attn_dtype)
            else:
                out = impl(alpha_src, alpha_dst, adj, h,
                           self.negative_slope)
        elif block and block < n:
            out = _masked_attention_chunked(
                alpha_src, alpha_dst, adj, h, self.negative_slope, block,
                attn_dtype=self.attn_dtype)
        else:
            out = _masked_attention_dense(
                alpha_src, alpha_dst, adj, h, self.negative_slope,
                attn_dtype=self.attn_dtype)
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
