"""Parity tests: native C++ graph_prep engine == the numpy reference path.

The native engine (laplace_gnn_tpu/native/graph_prep.cpp) must reproduce
the numpy implementations in graph/container.py exactly (stable orders,
same accumulation order) — it is an accelerator, never a behavior change.
"""

import numpy as np
import pytest

from laplace_gnn_tpu import native
from laplace_gnn_tpu.graph import container

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine unavailable")


def _random_graph(seed=0, n=500, e=4000, hub=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    if hub:  # one very high-degree node to exercise the ELL remainder
        src = np.concatenate([src, rng.integers(0, n, 200).astype(np.int32)])
        dst = np.concatenate([dst, np.full(200, 7, np.int32)])
    w = rng.random(len(src))
    return src, dst, w, n


def test_sort_by_dst_matches_stable_argsort():
    src, dst, w, n = _random_graph()
    so, do, wo, offs = native.sort_by_dst(src, dst, w, n)
    order = np.argsort(dst, kind="stable")
    assert np.array_equal(so, src[order])
    assert np.array_equal(do, dst[order])
    assert np.array_equal(wo, w[order])
    assert np.array_equal(
        offs, np.concatenate([[0], np.cumsum(np.bincount(dst, minlength=n))]))


def test_degree_matches_add_at():
    src, dst, w, n = _random_graph(1)
    deg = np.zeros(n)
    np.add.at(deg, dst, w)
    assert np.allclose(native.degree(dst, w, n), deg, rtol=1e-12)


@pytest.mark.parametrize("budget", [1.1, 1.5, 3.0])
def test_choose_k_matches_numpy_loop(budget):
    src, dst, w, n = _random_graph(2)
    counts = np.bincount(dst, minlength=n)
    offs = np.concatenate([[0], np.cumsum(counts)])
    max_deg = int(counts.max())
    total = max(len(src), 1)
    mk = max_deg
    for k in range(1, max_deg + 1):
        in_ell = np.minimum(counts, k).sum()
        if n * k <= budget * in_ell or in_ell >= 0.98 * total:
            mk = k
            if in_ell >= 0.9 * total:
                break
    assert native.choose_k(offs, budget) == mk


@pytest.mark.parametrize("K", [1, 4, 16])
def test_ell_pack_matches_python_loop(K):
    src, dst, w, n = _random_graph(3)
    so, do, wo, offs = native.sort_by_dst(src, dst, w, n)
    counts = np.diff(offs)
    cols, vals, rs, rd, rw = native.ell_pack(so, wo, offs, K)
    cols2 = np.zeros((n, K), np.int32)
    vals2 = np.zeros((n, K))
    rem = ([], [], [])
    for i in range(n):
        k = int(counts[i])
        kk = min(k, K)
        cols2[i, :kk] = so[offs[i]: offs[i] + kk]
        vals2[i, :kk] = wo[offs[i]: offs[i] + kk]
        if k > K:
            rem[0].append(so[offs[i] + K: offs[i] + k])
            rem[1].append(np.full(k - K, i, np.int64))
            rem[2].append(wo[offs[i] + K: offs[i] + k])
    assert np.array_equal(cols, cols2)
    assert np.array_equal(vals, vals2)
    if rem[0]:
        assert np.array_equal(rs, np.concatenate(rem[0]))
        assert np.array_equal(rd, np.concatenate(rem[1]))
        assert np.array_equal(rw, np.concatenate(rem[2]))
    else:
        assert len(rs) == 0


def _numpy_symmetric(src, dst, w):
    o1 = np.lexsort((src, dst))
    o2 = np.lexsort((dst, src))
    return bool(np.array_equal(src[o1], dst[o2])
                and np.array_equal(dst[o1], src[o2])
                and np.allclose(w[o1], w[o2]))


def test_check_symmetric_parity():
    rng = np.random.default_rng(4)
    n = 300
    a = rng.integers(0, n, 2000)
    b = rng.integers(0, n, 2000)
    m = a < b
    pairs = np.unique(np.stack([a[m], b[m]], 1), axis=0)
    wu = rng.random(len(pairs))
    # symmetric graph: both directions, shared weight
    src = np.concatenate([pairs[:, 0], pairs[:, 1]]).astype(np.int32)
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]]).astype(np.int32)
    w = np.concatenate([wu, wu])
    assert _numpy_symmetric(src, dst, w)
    assert native.check_symmetric(src, dst, w, n)
    # asymmetric: drop one direction of one edge
    assert not _numpy_symmetric(src[1:], dst[1:], w[1:])
    assert not native.check_symmetric(src[1:], dst[1:], w[1:], n)
    # weight-asymmetric
    w2 = w.copy()
    w2[0] += 1.0
    assert not _numpy_symmetric(src, dst, w2)
    assert not native.check_symmetric(src, dst, w2, n)


def test_sparse_from_edge_index_native_equals_numpy(monkeypatch):
    src, dst, w, n = _random_graph(5, n=200, e=1500)
    ei = np.stack([src, dst])
    g_native = container.sparse_from_edge_index(ei, n, fmt="ell")
    monkeypatch.setattr(native, "available", lambda: False)
    g_numpy = container.sparse_from_edge_index(ei, n, fmt="ell")
    for field in ("src", "dst", "weights", "ell_cols", "ell_vals",
                  "rem_src", "rem_dst", "rem_w"):
        a, b = getattr(g_native, field), getattr(g_numpy, field)
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-12), field
    assert g_native.symmetric == g_numpy.symmetric
    assert g_native.ell_cols.shape == g_numpy.ell_cols.shape


def test_transpose_native_equals_numpy(monkeypatch):
    src, dst, w, n = _random_graph(6, n=200, e=1500)
    ei = np.stack([src, dst])
    g = container.sparse_from_edge_index(ei, n, fmt="ell")
    gT_native = g.transpose()
    monkeypatch.setattr(native, "available", lambda: False)
    gT_numpy = g.transpose()
    for field in ("src", "dst", "weights", "ell_cols", "ell_vals"):
        a, b = getattr(gT_native, field), getattr(gT_numpy, field)
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-12), field
