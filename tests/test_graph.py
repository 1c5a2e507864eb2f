"""Graph data layer: conversions, datasets, splits, homophily metrics."""

import os

import numpy as np
import pytest

import laplace_gnn_tpu.graph as G


def test_edge_index_adj_roundtrip():
    e = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    adj = G.edge_index_to_adj(e, 5)
    assert adj.shape == (5, 5)
    assert adj.sum() == 4
    e2 = G.adj_to_edge_index(adj)
    assert set(map(tuple, e2.T.tolist())) == set(map(tuple, e.T.tolist()))
    # diagonal dropped on the way back
    adj2 = adj.copy()
    np.fill_diagonal(adj2, 1)
    assert G.adj_to_edge_index(adj2).shape == e2.shape


@pytest.mark.slow
def test_knn_graph():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((20, 3))
    adj = G.get_knn_graph(X, k=3)
    assert np.allclose(adj, adj.T)
    assert np.all(np.diag(adj) == 1)
    assert adj.sum(1).min() >= 4  # k neighbors + self
    adj2, e = G.get_knn_graph(X, k=3, return_edge_index=True)
    np.testing.assert_array_equal(adj, adj2)


def test_karate_splits_shape():
    d = G.load_data("karate", n_rand_splits=4)
    assert d.num_nodes == 34 and d.num_classes == 4
    for i in range(4):
        tr, va, te = d.split(i)
        assert len(set(tr) | set(va) | set(te)) == 34
        assert not (set(tr) & set(te))
    # splits differ across columns but are deterministic across loads
    d2 = G.load_data("karate", n_rand_splits=4)
    np.testing.assert_array_equal(d.train_indices, d2.train_indices)


def test_synthetic_datasets():
    m = G.moons_dataset(n_samples=60, n_edges=40, hetero_frac=0.25)
    assert m.num_nodes == 60 and m.num_classes == 2
    h = G.global_homophily(m.adjacency(), m.y)
    assert 0.5 < h <= 1.0  # mostly homophilous by construction

    s = G.sbm_dataset(n_nodes=300, n_classes=3, p_in=0.05, p_out=0.005)
    assert s.num_classes == 3
    assert G.global_homophily(s.adjacency(), s.y) > 0.6

    b = G.banana_dataset(n_samples=100)
    assert b.num_nodes in (100, 400)  # synthetic or csv


def test_homophily_metrics_consistency():
    d = G.load_data("karate")
    adj = d.adjacency()
    g = G.global_homophily(adj, d.y)
    local = G.local_homophily(adj, np.arange(34), d.y)
    assert 0 <= g <= 1
    assert all(0 <= v <= 1 for v in local.values())
    gh, trh, teh = G.avg_local_homophilies(adj, np.arange(17),
                                           np.arange(17, 34), d.y)
    assert gh == g
    li = G.label_informativeness(d.y, adj=adj)
    assert 0 <= li <= 2
    deg = G.avg_receptive_field_degree(adj, np.arange(34), 2)
    assert deg > 0
    same, cross = G.interaction_bound(d.y, adj=adj, n_layers=2)
    assert same > 0 and cross > 0
    rf = G.test_receptive_field(adj, np.arange(17), np.arange(17, 34), 2)
    assert rf.shape == (17,)


def test_edge_diff():
    old = np.zeros((4, 4))
    old[0, 1] = old[1, 0] = 1
    new = np.zeros((4, 4))
    new[2, 3] = new[3, 2] = 1
    labels = np.array([0, 0, 0, 1])
    out = G.edge_diff(old, new, labels)
    assert out["n_del"] == 2 and out["n_add"] == 2
    assert out["del_intra"] == 2          # 0-1 same class, both directions
    assert out["add_inter"] == 2          # 2-3 cross class


def test_fully_connected_labels():
    y = np.array([0, 1, 0, 1])
    adj = G.fully_connected_labels(y)
    assert adj[0, 2] == 1 and adj[0, 1] == 0 and adj[1, 3] == 1


def test_unknown_dataset_error(tmp_path):
    with pytest.raises(ValueError, match="Unknown dataset"):
        G.load_data("nonexistent", root=str(tmp_path))


def test_npz_loader(tmp_path):
    x = np.random.randn(10, 4).astype(np.float32)
    # deterministic labels: the global RNG could miss a class entirely
    # (~3.5% of orderings), making num_classes flaky
    y = np.arange(10) % 3
    e = np.array([[0, 1], [1, 2]])
    np.savez(tmp_path / "mini.npz", x=x, y=y, edge_index=e)
    d = G.load_data("mini", root=str(tmp_path), n_rand_splits=2)
    assert d.num_nodes == 10 and d.num_classes == 3
    assert d.train_indices.shape[1] == 2


def _write_geom_gcn_raw(d, dense=True):
    """Tiny graph in the exact geom-gcn raw format (header + tab-separated;
    features comma-separated dense values or one-hot indices)."""
    os.makedirs(d, exist_ok=True)
    if dense:
        rows = ["node_id\tfeature\tlabel",
                "0\t1,0,1\t0", "1\t0,1,0\t1", "2\t1,1,0\t0",
                "3\t0,0,1\t2", "4\t1,0,0\t1"]
    else:  # sparse one-hot indices (Actor style)
        rows = ["node_id\tfeature\tlabel",
                "0\t0,2\t0", "1\t1\t1", "2\t0,1\t0",
                "3\t2\t2", "4\t0\t1"]
    with open(os.path.join(d, "out1_node_feature_label.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    edges = ["id1\tid2", "0\t1", "1\t2", "2\t0", "3\t4", "0\t1"]  # dup edge
    with open(os.path.join(d, "out1_graph_edges.txt"), "w") as f:
        f.write("\n".join(edges) + "\n")


def test_geom_gcn_webkb_loader(tmp_path):
    from laplace_gnn_tpu.graph import datasets
    _write_geom_gcn_raw(tmp_path / "texas" / "raw")
    data = datasets.load_data("texas", root=str(tmp_path))
    assert data.x.shape == (5, 3)
    np.testing.assert_array_equal(data.x[0], [1, 0, 1])
    np.testing.assert_array_equal(data.y, [0, 1, 0, 2, 1])
    # WebKB: to_undirected + coalesce (duplicate 0->1 collapsed)
    edges = set(map(tuple, data.edge_index.T))
    assert (0, 1) in edges and (1, 0) in edges
    assert (3, 4) in edges and (4, 3) in edges
    assert data.edge_index.shape[1] == 8
    # splits attached like every loader
    tr, va, te = data.split(0)
    assert len(tr) + len(va) + len(te) == 5


def test_geom_gcn_wikipedia_keeps_direction(tmp_path):
    from laplace_gnn_tpu.graph import datasets
    _write_geom_gcn_raw(tmp_path / "chameleon" / "raw")
    data = datasets.load_data("chameleon", root=str(tmp_path))
    edges = set(map(tuple, data.edge_index.T))
    assert (3, 4) in edges and (4, 3) not in edges  # directed, coalesced
    assert data.edge_index.shape[1] == 4


def test_geom_gcn_actor_sparse_features(tmp_path):
    from laplace_gnn_tpu.graph import datasets
    _write_geom_gcn_raw(tmp_path / "actor" / "raw", dense=False)
    data = datasets.load_data("actor", root=str(tmp_path))
    assert data.x.shape == (5, 932)  # PyG's fixed Actor bag-of-words dim
    np.testing.assert_array_equal(np.nonzero(data.x[0])[0], [0, 2])
    np.testing.assert_array_equal(np.nonzero(data.x[3])[0], [2])
    assert data.x.sum() == 7  # total listed indices


def test_geom_gcn_falls_back_to_npz(tmp_path):
    from laplace_gnn_tpu.graph import datasets
    rng = np.random.default_rng(0)
    np.savez(tmp_path / "texas.npz",
             x=rng.standard_normal((6, 4)).astype(np.float32),
             y=rng.integers(0, 3, 6), edge_index=np.array([[0, 1], [1, 2]]))
    data = datasets.load_data("texas", root=str(tmp_path))
    assert data.x.shape == (6, 4)


@pytest.mark.slow
def test_convert_dataset_script(tmp_path):
    import subprocess
    import sys
    _write_geom_gcn_raw(tmp_path / "wisconsin" / "raw")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "convert_dataset.py")
    subprocess.run([sys.executable, script, "wisconsin",
                    "--root", str(tmp_path), "--out", str(tmp_path)],
                   check=True, capture_output=True)
    z = np.load(tmp_path / "wisconsin.npz")
    assert z["x"].shape == (5, 3) and z["edge_index"].shape[0] == 2
