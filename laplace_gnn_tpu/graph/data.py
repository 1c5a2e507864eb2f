"""Graph data container and adjacency conversions.

Counterpart of the torch_geometric ``Data`` usage in the reference
(gnn/utils.py:203-336): a plain dataclass holding node features, labels,
edge index, and per-split train/val/test indices, with dense-adjacency
conversions (edge_index_to_adj/adj_to_edge_index, gnn/utils.py:325-336) and
k-NN graph construction (gnn/utils.py:355-369).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclass
class GraphData:
    x: np.ndarray                      # (N, D) node features
    y: np.ndarray                      # (N,) labels
    edge_index: np.ndarray             # (2, E)
    train_indices: Optional[np.ndarray] = None   # (n_train, n_splits)
    val_indices: Optional[np.ndarray] = None
    test_indices: Optional[np.ndarray] = None
    name: str = ""

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_features(self) -> int:
        return int(self.x.shape[1])

    @property
    def num_classes(self) -> int:
        return int(self.y.max()) + 1

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    def adjacency(self, dtype=np.float32) -> np.ndarray:
        return edge_index_to_adj(self.edge_index, self.num_nodes).astype(dtype)

    def split(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return (self.train_indices[:, i], self.val_indices[:, i],
                self.test_indices[:, i])


def edge_index_to_adj(edge_index, num_nodes: Optional[int] = None,
                      edge_weight=None) -> np.ndarray:
    """Dense adjacency from a (2, E) edge index (gnn/utils.py:325-330)."""
    edge_index = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1 if edge_index.size else 0
    adj = np.zeros((num_nodes, num_nodes))
    w = np.ones(edge_index.shape[1]) if edge_weight is None \
        else np.asarray(edge_weight)
    np.add.at(adj, (edge_index[0], edge_index[1]), w)
    return np.minimum(adj, 1.0) if edge_weight is None else adj


def adj_to_edge_index(adj) -> np.ndarray:
    """(2, E) edge index of the off-diagonal nonzeros (gnn/utils.py:333-336)."""
    adj = np.array(adj, copy=True)
    np.fill_diagonal(adj, 0)
    rows, cols = np.nonzero(adj)
    return np.stack([rows, cols])


def get_knn_graph(X, k: int = 3, return_edge_index: bool = False):
    """Symmetrized k-NN graph with self-loops (gnn/utils.py:355-369)."""
    from sklearn.neighbors import NearestNeighbors
    X = np.asarray(X)
    nn = NearestNeighbors(n_neighbors=k + 1).fit(X)
    _, idx = nn.kneighbors(X)
    n = X.shape[0]
    adj = np.zeros((n, n))
    for i in range(n):
        for j in idx[i, 1:]:           # skip self
            adj[i, j] = 1.0
    adj = ((adj + adj.T) > 0).astype(float)
    np.fill_diagonal(adj, 1.0)
    if return_edge_index:
        return adj, adj_to_edge_index(adj)
    return adj


def fully_connected_labels(labels) -> np.ndarray:
    """Block-diagonal all-ones per class (gnn/utils.py:398-407)."""
    labels = np.asarray(labels)
    return (labels[:, None] == labels[None, :]).astype(float)
