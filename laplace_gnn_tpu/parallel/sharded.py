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
