"""Learned-graph analysis figures (reference gnn/plots/ scripts as library
functions): snapshot iteration, edge counting, and figure construction."""

import os
import pickle

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from laplace_gnn_tpu.graph import (class_sort_order, count_type_edges,
                                   get_learned_graphs,
                                   plot_adjacency_by_class,
                                   plot_avg_local_homophily,
                                   plot_degree_distribution,
                                   plot_interaction_bounds)


def make_graph(n=12, seed=0):
    rng = np.random.default_rng(seed)
    adj = (rng.random((n, n)) < 0.3).astype(float)
    adj = np.minimum(adj + adj.T, 1.0)
    np.fill_diagonal(adj, 0)
    labels = rng.integers(0, 3, n)
    return adj, labels


def test_get_learned_graphs_ordering(tmp_path):
    for epoch in (100, 20, 3):
        with open(tmp_path / f"epoch_{epoch}.pkl", "wb") as f:
            pickle.dump({"epoch": epoch, "edge_index": np.zeros((2, 1))}, f)
    got = [snap["epoch"] for _, snap in get_learned_graphs(str(tmp_path))]
    assert got == [3, 20, 100]  # numeric, not lexicographic
    only = list(get_learned_graphs(str(tmp_path), epoch_num=20))
    assert len(only) == 1 and only[0][1]["epoch"] == 20


def test_count_type_edges():
    labels = np.array([0, 0, 1, 1])
    ei = np.array([[0, 0, 2], [1, 2, 3]])  # intra, inter, intra
    assert count_type_edges(ei, labels) == (2, 1)


def test_class_sort_order_groups_labels():
    _, labels = make_graph()
    order = class_sort_order(labels)
    sorted_labels = labels[order]
    assert (np.diff(sorted_labels) >= 0).all()


def test_figures_build_and_save(tmp_path):
    adj, labels = make_graph()
    fig = plot_adjacency_by_class(adj, labels, title="t",
                                  out_fn=str(tmp_path / "adj.png"))
    assert os.path.exists(tmp_path / "adj.png")
    epochs = [0, 20, 40]
    fig2 = plot_avg_local_homophily(
        epochs, [0.5, 0.6, 0.7], [0.4, 0.5, 0.6],
        losses={"epochs": epochs, "train_loss": [1.0, 0.5, 0.2],
                "val_loss": [1.1, 0.7, 0.6]},
        out_fn=str(tmp_path / "homo.png"))
    fig3 = plot_interaction_bounds(epochs, [1, 2, 3], [3, 2, 1],
                                   [1, 1, 2], [2, 1, 1],
                                   out_fn=str(tmp_path / "ib.png"))
    adj2, _ = make_graph(seed=1)
    fig4 = plot_degree_distribution(adj, adj2,
                                    out_fn=str(tmp_path / "deg.png"))
    for f in ("homo.png", "ib.png", "deg.png"):
        assert os.path.exists(tmp_path / f)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_plot_accepts_edge_index():
    adj, labels = make_graph()
    ei = np.array(np.nonzero(adj))
    fig = plot_adjacency_by_class(ei, labels, num_nodes=labels.shape[0])
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close("all")
