"""Homophily / interaction analysis metrics.

Counterparts of reference ``gnn/plots/interaction_bounds.py:21-98``
(global/local homophily, receptive-field degree, interaction bounds) and
``gnn/plots/utils.py:33-99`` (label informativeness, test receptive field,
edge diff). Vectorized numpy instead of per-node python loops.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..ops.adjacency import normalize_adj  # jax version fine for small use
from .data import edge_index_to_adj


def _no_diag(adj) -> np.ndarray:
    adj = np.array(adj, copy=True, dtype=float)
    np.fill_diagonal(adj, 0)
    return adj


def global_homophily(adj, labels) -> float:
    """Fraction of edges connecting same-label nodes
    (gnn/plots/interaction_bounds.py:21-28)."""
    adj = _no_diag(adj)
    labels = np.asarray(labels)
    rows, cols = np.nonzero(adj)
    if len(rows) == 0:
        return 0.0
    return float(np.mean(labels[rows] == labels[cols]))


def local_homophily(adj, nodes, labels) -> dict:
    """Per-node fraction of same-label neighbors (reference :31-46)."""
    adj = _no_diag(adj)
    labels = np.asarray(labels)
    out = {}
    for u in np.asarray(nodes).tolist():
        neigh = np.nonzero(adj[u])[0]
        out[u] = (float(np.mean(labels[neigh] == labels[u]))
                  if len(neigh) else 0.0)
    return out


def avg_local_homophilies(adj, train_nodes, test_nodes, labels):
    """(reference :49-58)"""
    g = global_homophily(adj, labels)
    tr = local_homophily(adj, train_nodes, labels)
    te = local_homophily(adj, test_nodes, labels)
    return (g, sum(tr.values()) / len(train_nodes),
            sum(te.values()) / len(test_nodes))


def avg_receptive_field_degree(adj, nodes, n_layers: int) -> float:
    """(reference :61-69)"""
    adj = np.asarray(adj, dtype=float)
    adj = ((adj + adj.T) > 0).astype(float)
    np.fill_diagonal(adj, 1.0)
    adj = np.linalg.matrix_power(adj, n_layers)
    np.fill_diagonal(adj, 0.0)
    nodes = np.asarray(nodes)
    return float(np.count_nonzero(adj[nodes, :])) / len(nodes)


def interaction_bound(labels, edge_index=None, adj=None, n_layers: int = 2,
                      test_nodes=None):
    """Intra/inter-class interaction mass of the n-layer normalized
    adjacency (oversquashing bound, reference :72-98).
    Returns (same_class_mass, cross_class_mass)."""
    if edge_index is None and adj is None:
        raise ValueError("Either edge_index or adj must be provided")
    labels = np.asarray(labels)
    if adj is None:
        adj = edge_index_to_adj(edge_index, labels.shape[0])
    adj = ((np.asarray(adj, dtype=float)
            + np.asarray(adj, dtype=float).T) > 0).astype(float)
    norm_adj = np.asarray(normalize_adj(adj))
    norm_adj = np.linalg.matrix_power(norm_adj, n_layers)
    if test_nodes is not None:
        test_nodes = np.asarray(test_nodes)
        keep = np.zeros_like(norm_adj)
        keep[test_nodes, :] = norm_adj[test_nodes, :]
        keep[:, test_nodes] = norm_adj[test_nodes, :].T
        norm_adj = keep
    total = norm_adj.sum()
    same = 0.0
    for c in np.unique(labels):
        nodes = np.nonzero(labels == c)[0]
        same += norm_adj[np.ix_(nodes, nodes)].sum()
    return float(same), float(total - same)


def label_informativeness(labels, edge_index=None, adj=None) -> float:
    """LI = 2 - H(joint edge label dist) / H(degree-weighted label dist)
    (reference gnn/plots/utils.py:33-60)."""
    labels = np.asarray(labels)
    if adj is None:
        adj = edge_index_to_adj(edge_index, labels.shape[0])
    adj = ((np.asarray(adj, dtype=float)
            + np.asarray(adj, dtype=float).T) > 0).astype(float)
    np.fill_diagonal(adj, 0)
    total = adj.sum()
    rows, cols = np.nonzero(adj)
    joint = defaultdict(int)
    for i, j in zip(rows, cols):
        joint[tuple(sorted((labels[i], labels[j])))] += 1
    p_joint = np.array([v / total for v in joint.values()])
    deg = adj.sum(axis=1)
    p_c = np.array([deg[labels == c].sum() / total
                    for c in range(labels.max() + 1)])
    p_c = p_c[p_c > 0]
    return float(2 - (p_joint * np.log(p_joint)).sum()
                 / (p_c * np.log(p_c)).sum())


def test_receptive_field(adj, train_nodes, test_nodes, n_layers: int):
    """Count of train-node receptive fields each test node appears in
    (reference gnn/plots/utils.py:75-86)."""
    adj = np.asarray(adj, dtype=float)
    adj = np.linalg.matrix_power(adj, n_layers)
    adj = (adj > 0).astype(int)
    np.fill_diagonal(adj, 0)
    return adj[np.ix_(np.asarray(train_nodes),
                      np.asarray(test_nodes))].sum(axis=0)


def edge_diff(old_adj, new_adj, labels) -> dict:
    """Added/deleted intra/inter-class edge counts between two graphs
    (reference gnn/plots/utils.py:63-99, with the counting bugs fixed)."""
    labels = np.asarray(labels)
    old = set(map(tuple, np.stack(np.nonzero(_no_diag(old_adj))).T.tolist()))
    new = set(map(tuple, np.stack(np.nonzero(_no_diag(new_adj))).T.tolist()))
    deleted, added = old - new, new - old

    def count(edges):
        intra = sum(1 for i, j in edges if labels[i] == labels[j])
        return intra, len(edges) - intra

    d_intra, d_inter = count(deleted)
    a_intra, a_inter = count(added)
    return {"n_del": len(deleted), "del_intra": d_intra,
            "del_inter": d_inter, "n_add": len(added),
            "add_intra": a_intra, "add_inter": a_inter}
