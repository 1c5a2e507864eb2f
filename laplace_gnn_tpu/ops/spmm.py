"""Neighborhood aggregation: the SpMM hot path.

The reference computes ``adj @ lin(x)`` with a dense torch matmul
(gnn/models/layers.py:45-46). On TPU the dense path maps directly onto the
MXU via XLA; for large sparse graphs the Pallas CSR kernel in
ops/pallas_spmm.py gathers only live edges. ``aggregate`` is the single entry
point the model zoo uses, so swapping kernels never touches model code.
"""

from __future__ import annotations

import jax.numpy as jnp


def aggregate(adj, x: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum_j adj[i, j] * x[j].

    ``adj`` may be a dense (N, N) array (reference semantics) or a sparse
    graph container providing ``.spmm(x)`` (see graph/container.py).
    """
    if hasattr(adj, "spmm"):
        return adj.spmm(x)
    return jnp.dot(adj, x, preferred_element_type=x.dtype)
