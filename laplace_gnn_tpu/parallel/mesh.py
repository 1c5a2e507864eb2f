"""Device mesh helpers.

The scaling layer has no reference counterpart (the reference is single-
process torch, SURVEY.md §2.5); it is designed TPU-first: a 2-D logical mesh
('graph', 'model') where the graph axis partitions nodes/edges (rides ICI)
and the model axis optionally tensor-parallelizes feature dimensions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("graph", "model"),
              model_parallel: int = 1) -> Mesh:
    """Mesh over the first ``n_devices`` devices shaped
    (n_devices // model_parallel, model_parallel)."""
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))


def graph_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (nodes) split over the graph axis."""
    return NamedSharding(mesh, P("graph", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_gnn_params(mesh: Mesh, params, model_axis: bool = True):
    """NamedSharding pytree for a BaseGNN params dict:
      - adj (N, N): rows over 'graph'
      - conv/res weights (out, in): out over 'model' (TP) when enabled
      - 1-D params: replicated.
    """
    def spec_for(path: str, leaf):
        if leaf.ndim == 2 and leaf.shape[0] == leaf.shape[1] \
                and "adj" in path and "lora" not in path:
            return NamedSharding(mesh, P("graph", None))
        if model_axis and leaf.ndim == 2 and "weight" in path \
                and leaf.shape[0] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    from ..utils.pytree import path_mask  # noqa: F401 (doc cross-ref)
    import jax.tree_util as jtu

    def visit(path, leaf):
        return spec_for(_path_str(path), leaf)

    def _path_str(path):
        parts = []
        for p in path:
            if isinstance(p, jtu.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jtu.SequenceKey):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return ".".join(parts)

    return jtu.tree_map_with_path(visit, params)
