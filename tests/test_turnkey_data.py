"""Turnkey real-data path (BASELINE.md metric 3, VERDICT-r2 Missing #2).

Raw Planetoid/geom-gcn files cannot exist in this zero-egress environment,
so these tests drive the ENTIRE fetch -> parse -> validate -> quality_run
chain against synthetic raw fixtures with the download mocked: the first
networked machine that runs

    python scripts/fetch_datasets.py cora --root ~/data
    python scripts/quality_run.py --dataset cora --root ~/data

gets BASELINE metric 3 numbers unattended, because every step of that
pipeline (URL plan, file placement, parser, shape validation, checksum
manifest, the quality driver's data plumbing) is exercised here.
"""

from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

import fetch_datasets  # noqa: E402


# ---------------------------------------------------------------------------
# Synthetic raw fixtures in the exact upstream formats
# ---------------------------------------------------------------------------

def _planetoid_fixture_bytes(name="cora", n_labeled=4, n_unlabeled=2,
                             n_test=3, d=4, c=2, seed=0):
    """Tiny dataset in the exact Yang et al. 2016 Planetoid raw format:
    {ind.<name>.<ext>: bytes}. allx stacks labeled+unlabeled rows; test
    nodes come last with ids n_all..n_all+n_test-1 listed (shuffled) in
    test.index."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    n_all = n_labeled + n_unlabeled

    def feat(n):
        return sp.csr_matrix((rng.random((n, d)) < 0.4).astype(np.float32))

    def labels(n):
        onehot = np.zeros((n, c), np.int64)
        onehot[np.arange(n), rng.integers(0, c, n)] = 1
        return onehot

    allx, tx = feat(n_all), feat(n_test)
    ally, ty = labels(n_all), labels(n_test)
    x, y = allx[:n_labeled], ally[:n_labeled]
    graph = {i: [int(j) for j in rng.choice(n_all + n_test, 2,
                                            replace=False) if j != i]
             for i in range(n_all + n_test)}
    test_index = rng.permutation(np.arange(n_all, n_all + n_test))

    out = {}
    for ext, obj in (("x", x), ("tx", tx), ("allx", allx), ("y", y),
                     ("ty", ty), ("ally", ally), ("graph", graph)):
        out[f"ind.{name}.{ext}"] = pickle.dumps(obj, protocol=2)
    out[f"ind.{name}.test.index"] = "\n".join(
        str(int(i)) for i in test_index).encode() + b"\n"
    return out


def _geom_gcn_fixture_bytes():
    node = ("node_id\tfeature\tlabel\n"
            "0\t1,0,1\t0\n1\t0,1,0\t1\n2\t1,1,0\t0\n"
            "3\t0,0,1\t2\n4\t1,0,0\t1\n")
    edges = "id1\tid2\n0\t1\n1\t2\n2\t0\n3\t4\n"
    return {"out1_node_feature_label.txt": node.encode(),
            "out1_graph_edges.txt": edges.encode()}


@pytest.fixture
def mock_downloads(monkeypatch):
    """urlretrieve writes fixture bytes keyed by the URL's basename; records
    every URL so the download plan itself is pinned."""
    planetoid = _planetoid_fixture_bytes("cora")
    geom = _geom_gcn_fixture_bytes()
    urls = []

    def fake_urlretrieve(url, dest):
        urls.append(url)
        base = os.path.basename(url)
        if base in planetoid:
            content = planetoid[base]
        elif base in geom:
            content = geom[base]
        else:
            raise AssertionError(f"unexpected download: {url}")
        with open(dest, "wb") as f:
            f.write(content)

    monkeypatch.setattr(fetch_datasets.urllib.request, "urlretrieve",
                        fake_urlretrieve)
    return urls


# ---------------------------------------------------------------------------
# fetch -> parse -> validate -> checksums
# ---------------------------------------------------------------------------

def test_fetch_places_and_parses_raw_files(tmp_path, mock_downloads):
    fetch_datasets.main(["cora", "texas", "--root", str(tmp_path),
                         "--no-validate"])

    # files land exactly where load_data expects them
    assert (tmp_path / "Cora" / "raw" / "ind.cora.allx").exists()
    assert (tmp_path / "texas" / "raw" / "out1_graph_edges.txt").exists()
    # the URL plan covers all 8 planetoid + 2 geom-gcn files
    assert len(mock_downloads) == 10
    assert any("kimiyoung/planetoid" in u for u in mock_downloads)
    assert any("geom-gcn" in u and "/texas/" in u for u in mock_downloads)

    # parsers consume them end-to-end
    from laplace_gnn_tpu.graph import datasets
    cora = datasets.load_data("cora", root=str(tmp_path))
    assert cora.num_nodes == 9 and cora.num_features == 4
    texas = datasets.load_data("texas", root=str(tmp_path))
    assert texas.num_nodes == 5 and texas.num_features == 3

    # checksum manifest written and stable
    with open(tmp_path / "checksums.json") as f:
        manifest = json.load(f)
    assert set(manifest) == {
        *(f"cora/ind.cora.{e}" for e in fetch_datasets.PLANETOID_EXTS),
        *(f"texas/{f}" for f in fetch_datasets.GEOM_GCN_FILES)}
    digest = fetch_datasets.sha256_of(
        str(tmp_path / "Cora" / "raw" / "ind.cora.allx"))
    assert manifest["cora/ind.cora.allx"] == digest


def test_shape_validation_gates_bad_downloads(tmp_path, mock_downloads):
    """The published-shape gate must FAIL on the tiny fixture (it is not
    the real 2708-node Cora) — proving a truncated real download cannot
    silently pass."""
    with pytest.raises(ValueError, match="does not match the published"):
        fetch_datasets.main(["cora", "--root", str(tmp_path)])
    assert fetch_datasets.EXPECTED_SHAPES["cora"] == (2708, 1433, 7)


def test_checksum_pinning_detects_tamper(tmp_path, mock_downloads,
                                         monkeypatch):
    fetch_datasets.main(["texas", "--root", str(tmp_path), "--no-validate"])
    pinned = tmp_path / "pinned.json"
    monkeypatch.setattr(fetch_datasets, "PINNED_CHECKSUMS", str(pinned))
    # record trusted values, then corrupt a file: re-verify must fail
    fetch_datasets.checksum_manifest(["texas"], str(tmp_path), record=True)
    f = tmp_path / "texas" / "raw" / "out1_graph_edges.txt"
    f.write_text(f.read_text() + "9\t9\n")
    with pytest.raises(ValueError, match="checksum mismatch"):
        fetch_datasets.checksum_manifest(["texas"], str(tmp_path))


# ---------------------------------------------------------------------------
# the full turnkey command: quality_run on fetched raw files
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_quality_run_on_fetched_cora_fixture(tmp_path, mock_downloads,
                                             capsys):
    """The exact command sequence a networked machine runs for BASELINE
    metric 3, on the mocked fixture: fetch -> quality_run --dataset cora."""
    import quality_run

    fetch_datasets.main(["cora", "--root", str(tmp_path), "--no-validate"])
    rows = quality_run.main([
        "--dataset", "cora", "--root", str(tmp_path),
        "--hidden_channels", "8", "--n_epochs", "6", "--n_epochs_burnin",
        "2", "--marglik_frequency", "2", "--n_hypersteps", "1",
        "--n_hyper_stop", "6", "--dropout_p", "0.0"])
    out = capsys.readouterr().out
    assert "cora: N=9" in out
    for kind in ("map", "laplace"):
        r = rows[kind]
        assert set(r) == {"acc", "nll", "ece"}
        assert 0.0 <= r["acc"] <= 1.0 and np.isfinite(r["nll"])
