"""Partitioned aggregation and sharded training steps.

TPU-native scale-out of the flagship workload (no reference counterpart —
the reference is single-device; SURVEY.md §2.5). Two paths:

1. **Automatic (pjit)**: annotate the adjacency with a row sharding over the
   'graph' mesh axis and jit the ordinary training step — XLA partitions the
   N x N @ N x d aggregation and inserts the all-gathers over ICI.

2. **Manual (shard_map)**: ``sharded_aggregate`` expresses the row-block
   partition explicitly — each device holds an (N/n_g, N) block of the
   (normalized) adjacency and its (N/n_g, d) block of features, all-gathers
   the feature blocks over the graph axis, and computes its local output
   block. This is the scaffold the Pallas latency-hiding kernel plugs into
   (overlap all-gather chunks with local matmul).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_aggregate(mesh: Mesh, adj_block: jnp.ndarray,
                      x_block: jnp.ndarray) -> jnp.ndarray:
    """Row-partitioned ``adj @ x`` under shard_map.

    adj_block: (N, N) sharded P('graph', None); x_block: (N, d) sharded
    P('graph', None). Returns (N, d) sharded P('graph', None).
    """

    def local(adj_blk, x_blk):
        x_full = jax.lax.all_gather(x_blk, "graph", axis=0, tiled=True)
        return jnp.dot(adj_blk, x_full, preferred_element_type=x_blk.dtype)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph", None), P("graph", None)),
        out_specs=P("graph", None))(adj_block, x_block)


def make_sharded_train_step(model, mesh: Mesh, loss_fn, lr: float = 0.01):
    """Jitted sharded SGD step over a GNN params pytree whose adjacency is
    row-sharded (automatic partitioning path)."""
    from .mesh import shard_gnn_params

    def step(params, idx, y):
        def obj(p):
            f = model.apply(p, idx)
            return loss_fn(f, y)

        loss, g = jax.value_and_grad(obj)(params)
        params = jax.tree_util.tree_map(lambda x, gx: x - lr * gx, params, g)
        return params, loss

    def shard_params(params):
        shardings = shard_gnn_params(mesh, params)
        return jax.device_put(params, shardings), shardings

    return jax.jit(step), shard_params


# ---------------------------------------------------------------------------
# Edge-partitioned sparse aggregation (the BASELINE.json north star:
# edge-partition the graph, exchange boundary features over ICI, aggregate
# locally; curvature mat-vecs reuse the same path through autodiff)
# ---------------------------------------------------------------------------

def partition_sparse_graph(graph, n_parts: int):
    """Split a SparseGraph's edges by owner of their destination node
    (contiguous node blocks of N/n_parts), padding each device's edge list to a
    common length with zero-weight edges. Returns device-stacked arrays
    (n_parts, E_max) for src, local dst, weights, plus the node block size.
    """
    import numpy as np

    n = graph.n_nodes
    if n % n_parts != 0:
        raise ValueError(f"n_nodes={n} must divide by n_parts={n_parts} "
                         "(pad the graph first)")
    block = n // n_parts
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.weights)
    owner = dst // block
    e_max = int(max((owner == p).sum() for p in range(n_parts)))
    srcs = np.zeros((n_parts, e_max), dtype=np.int32)
    dsts = np.zeros((n_parts, e_max), dtype=np.int32)
    ws = np.zeros((n_parts, e_max), dtype=w.dtype)
    for p in range(n_parts):
        m = owner == p
        k = int(m.sum())
        srcs[p, :k] = src[m]
        dsts[p, :k] = dst[m] - p * block       # local row index
        ws[p, :k] = w[m]
    return jnp.asarray(srcs), jnp.asarray(dsts), jnp.asarray(ws), block


def make_sharded_sparse_aggregate(mesh: Mesh, graph, d_features: int):
    """Returns (aggregate_fn, put) where aggregate_fn(x_sharded) computes
    the edge-partitioned SpMM under shard_map: each device all-gathers the
    boundary node features over the 'graph' ICI axis and segment-sums its
    owned edges into its node block."""
    n_parts = mesh.shape["graph"]
    srcs, dsts, ws, block = partition_sparse_graph(graph, n_parts)

    def local(src_b, dst_b, w_b, x_blk):
        # (1, E), (1, E), (1, E), (block, d)
        x_full = jax.lax.all_gather(x_blk, "graph", axis=0, tiled=True)
        msgs = w_b[0][:, None] * x_full[src_b[0]]
        return jax.ops.segment_sum(msgs, dst_b[0], num_segments=block)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph", None), P("graph", None), P("graph", None),
                  P("graph", None)),
        out_specs=P("graph", None))

    spec = NamedSharding(mesh, P("graph", None))
    srcs = jax.device_put(srcs, spec)
    dsts = jax.device_put(dsts, spec)
    ws = jax.device_put(ws, spec)

    def aggregate_fn(x):
        return sharded(srcs, dsts, ws, x)

    def put(x):
        return jax.device_put(x, spec)

    return aggregate_fn, put
