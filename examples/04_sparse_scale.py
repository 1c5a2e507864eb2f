"""Sparse-graph GCN at a scale where dense adjacency is impractical, plus
edge-partitioned multi-device aggregation.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/04_sparse_scale.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu.graph import sparse_from_edge_index
from laplace_gnn_tpu.models import SparseGCN


def main():
    data = G.sbm_dataset(n_nodes=20000, n_classes=8, d_features=64,
                         p_in=0.001, p_out=5e-5)
    g = sparse_from_edge_index(data.edge_index, data.num_nodes,
                               normalize="sym")
    print(f"SBM: {data.num_nodes} nodes, {g.n_edges} edges "
          f"(dense adjacency would be "
          f"{data.num_nodes ** 2 * 4 / 1e9:.1f} GB)")

    model = SparseGCN(64, 128, 8, 2, jnp.asarray(data.x), g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    tr = jnp.arange(2000)
    y = jnp.asarray(data.y)

    @jax.jit
    def step(p):
        def obj(p):
            logp = jax.nn.log_softmax(model.apply(p, tr))
            return -jnp.mean(logp[jnp.arange(2000), y[tr]])

        loss, g_ = jax.value_and_grad(obj)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g_), loss

    for i in range(30):
        params, loss = step(params)
    print(f"30 steps, final loss {float(loss):.3f}")

    if len(jax.devices()) >= 2 and data.num_nodes % len(jax.devices()) == 0:
        from laplace_gnn_tpu.parallel import (make_mesh,
                                              make_sharded_sparse_aggregate)
        mesh = make_mesh(model_parallel=1)
        agg, put = make_sharded_sparse_aggregate(mesh, g, 64)
        out = agg(put(jnp.asarray(data.x)))
        print(f"edge-partitioned aggregation over {mesh.shape} mesh: "
              f"{out.shape}, sharded as {out.sharding.spec}")


if __name__ == "__main__":
    main()
