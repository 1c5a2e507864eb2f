"""Sparse graph container + SparseGCN: parity with the dense path, Laplace
compatibility, segment/ell format agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu.graph.container import (SparseGraph, add_ell_format,
                                             sparse_from_edge_index)
from laplace_gnn_tpu.models import GCN
from laplace_gnn_tpu.models.sparse_gnn import SparseGCN
from laplace_gnn_tpu.ops import fill_diagonal, normalize_adj
from laplace_gnn_tpu.utils.data import ArrayLoader


@pytest.fixture(scope="module")
def karate():
    return G.load_data("karate", n_rand_splits=1)


def test_sparse_spmm_matches_dense(karate):
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    x = jax.random.normal(jax.random.PRNGKey(0), (d.num_nodes, 5))
    out_sparse = g.spmm(x)
    # dense reference path: normalize_adj(adj + I) @ x
    dense = jnp.asarray(fill_diagonal(jnp.asarray(d.adjacency(np.float64)),
                                      1.0))
    out_dense = normalize_adj(dense) @ x
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense),
                               atol=1e-9)


def test_ell_matches_segment(karate):
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    g_ell = add_ell_format(g)
    x = jax.random.normal(jax.random.PRNGKey(1), (d.num_nodes, 7))
    np.testing.assert_allclose(np.asarray(g.spmm(x)),
                               np.asarray(g_ell.spmm(x)), atol=1e-9)


@pytest.mark.slow
def test_hybrid_ell_bounded_k_matches_segment(karate):
    """Bounded-K ELL routes overflow edges of high-degree nodes through the
    COO remainder; result must equal the plain segment path exactly."""
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    x = jax.random.normal(jax.random.PRNGKey(2), (d.num_nodes, 7))
    for k in (1, 3, 8):
        g_ell = add_ell_format(g, max_k=k)
        assert g_ell.ell_cols.shape[1] == k
        assert int(g_ell.ell_vals.sum() + g_ell.rem_w.sum()) > 0
        np.testing.assert_allclose(np.asarray(g.spmm(x)),
                                   np.asarray(g_ell.spmm(x)), atol=1e-9)
    # auto-K selection stays within the padding budget and is exact
    g_auto = add_ell_format(g, pad_budget=1.5)
    np.testing.assert_allclose(np.asarray(g.spmm(x)),
                               np.asarray(g_auto.spmm(x)), atol=1e-9)


def test_three_tier_ell_power_law_matches_segment():
    """Power-law degree graph (one hub with deg >> K): the level-2 ELL +
    COO tail decomposition must reproduce the plain segment path exactly,
    and actually populate all three tiers."""
    rng = np.random.default_rng(0)
    n = 120
    # hub 0 connects to everyone, a mid-degree cluster, plus random edges
    src = np.concatenate([np.arange(1, n), rng.integers(0, n, 300),
                          np.tile(np.arange(40, 60), 3)])
    dst = np.concatenate([np.zeros(n - 1, int), rng.integers(0, n, 300),
                          np.repeat(np.arange(1, 4), 20)])
    ei = np.stack([src, dst])
    g = sparse_from_edge_index(ei, n, normalize="sym")
    g_ell = add_ell_format(g, max_k=2, pad_budget=1.2)
    assert len(g_ell.ell_levels) >= 1
    assert g_ell.ell_levels[0][0].shape[0] > 0
    # every edge is in exactly one tier
    total = (int((np.asarray(g_ell.ell_vals) != 0).sum())
             + sum(int((np.asarray(v) != 0).sum())
                   for _, _, v in g_ell.ell_levels)
             + g_ell.rem_src.shape[0])
    assert total == g.n_edges
    x = jax.random.normal(jax.random.PRNGKey(3), (n, 9))
    np.testing.assert_allclose(np.asarray(g.spmm(x)),
                               np.asarray(g_ell.spmm(x)), atol=1e-9)
    # transpose preserves the decomposition and stays exact
    gT = g_ell.transpose()
    np.testing.assert_allclose(np.asarray(gT.spmm(x)),
                               np.asarray(g.to_dense().T @ x), atol=1e-9)


def test_agg_dtype_cast():
    import dataclasses
    rng = np.random.default_rng(0)
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    g = sparse_from_edge_index(ei, 4, normalize="sym")
    g16 = dataclasses.replace(g, agg_dtype="bfloat16")
    x = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    out = g16.spmm(x)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(g.spmm(x)),
                               atol=2e-2)


@pytest.mark.slow
def test_make_spmm_grads_match_dense():
    """Custom-VJP spmm: gradient and jvp equal the dense-adjacency oracle,
    for both symmetric and asymmetric graphs (asymmetric exercises the
    transposed-graph backward)."""
    from laplace_gnn_tpu.graph.container import make_spmm
    rng = np.random.default_rng(0)
    n = 9
    for normalize in ("sym", "row"):  # row-normalized graph is asymmetric
        a = (rng.random((n, n)) < 0.4).astype(float)
        a = np.minimum(a + a.T, 1.0)
        np.fill_diagonal(a, 0)
        ei = np.array(np.nonzero(a))
        g = sparse_from_edge_index(ei, n, normalize=normalize)
        assert g.symmetric == (normalize == "sym")
        spmm = make_spmm(g)
        dense = np.asarray(g.to_dense())
        x = jnp.asarray(rng.standard_normal((n, 5)))
        ct = jnp.asarray(rng.standard_normal((n, 5)))

        out, vjp = jax.vjp(spmm, x)
        np.testing.assert_allclose(np.asarray(out), dense @ np.asarray(x),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(vjp(ct)[0]),
                                   dense.T @ np.asarray(ct), atol=1e-9)
        _, tang = jax.jvp(spmm, (x,), (ct,))
        np.testing.assert_allclose(np.asarray(tang),
                                   dense @ np.asarray(ct), atol=1e-9)


@pytest.mark.slow
def test_fast_agg_in_sparse_gcn_hyperstep(karate):
    """SparseGCN (FastAggGraph path) still supports the full value_and_grad
    + KFAC pipeline (jvp and vjp both flow through the custom spmm)."""
    from laplace_gnn_tpu.curvature import compute_kfac_factors
    from laplace_gnn_tpu.models.sparse_gnn import SparseGCN
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    X = jax.random.normal(jax.random.PRNGKey(0), (d.num_nodes, 6))
    model = SparseGCN(6, 8, 2, 2, X, g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    y = jnp.asarray(np.asarray(d.y) % 2)
    kron = compute_kfac_factors(model, params, None, y, "classification",
                                N=d.num_nodes)
    assert np.isfinite(np.asarray(kron.to_matrix()).sum())


def test_bf16_agg_type2_chunked_marglik_close_to_f32(karate):
    """bf16 gather intermediates under the chunked type-2 pullbacks only
    round the aggregation (factors accumulate f32): marglik value and its
    gradient stay within bf16 tolerance of the f32 path."""
    import dataclasses

    from laplace_gnn_tpu.models.sparse_gnn import SparseGCN
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn
    d = karate
    g = add_ell_format(
        sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym",
                               dtype=jnp.float32))
    X = jax.random.normal(jax.random.PRNGKey(0), (d.num_nodes, 6),
                          dtype=jnp.float32)
    y = jnp.asarray(np.asarray(d.y) % 2)
    vals = {}
    for tag in ("float32", "bfloat16"):
        gg = dataclasses.replace(g, agg_dtype=tag)
        model = SparseGCN(6, 8, 2, 2, X, gg, dropout_p=0.0)
        params = model.init(jax.random.PRNGKey(1), dtype=jnp.float32)
        fn = make_neg_marglik_fn(model, "classification", "kron", "all",
                                 N=d.num_nodes, fisher_type="type-2",
                                 column_chunk=1)
        v, gr = jax.value_and_grad(fn)(params, None, y)
        vals[tag] = (float(v), gr)
    v32, g32 = vals["float32"]
    v16, g16 = vals["bfloat16"]
    assert abs(v16 - v32) < 2e-2 * abs(v32)
    for (n32, l32), (_, l16) in zip(
            sorted((k, v) for k, v in _named(g32)),
            sorted((k, v) for k, v in _named(g16))):
        np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                                   atol=5e-2, rtol=5e-2, err_msg=n32)


def _named(tree):
    from laplace_gnn_tpu.utils import named_leaves
    return named_leaves(tree)


def test_row_normalization_mean_agg(karate):
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="row",
                               add_self_loops=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (d.num_nodes, 4))
    adj = jnp.asarray(d.adjacency(np.float64))
    row_sum = jnp.maximum(adj.sum(1, keepdims=True), 1.0)
    np.testing.assert_allclose(np.asarray(g.spmm(x)),
                               np.asarray((adj / row_sum) @ x), atol=1e-9)


def test_to_dense_roundtrip(karate):
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize=None,
                               add_self_loops=True)
    dense = np.asarray(g.to_dense())
    expected = np.asarray(fill_diagonal(jnp.asarray(d.adjacency(np.float64)),
                                        1.0))
    np.testing.assert_allclose(dense, expected)


def test_sparse_gcn_matches_dense_gcn(karate):
    d = karate
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    dense_model = GCN(d.num_features, 8, d.num_classes, 2,
                      jnp.asarray(d.x, jnp.float64), d.adjacency(np.float64),
                      dropout_p=0.0)
    sparse_model = SparseGCN(d.num_features, 8, d.num_classes, 2,
                             jnp.asarray(d.x, jnp.float64), g, dropout_p=0.0)
    params = dense_model.init(jax.random.PRNGKey(0))
    sparse_params = {"convs": params["convs"]}
    out_d = dense_model.apply(params, jnp.arange(10))
    out_s = sparse_model.apply(sparse_params, jnp.arange(10))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=1e-9)


@pytest.mark.slow
def test_sparse_gcn_laplace_end_to_end(karate):
    """Diag + Kron Laplace and the marglik function work without any 'adj'
    parameter in the pytree."""
    from laplace_gnn_tpu import DiagLaplace, KronLaplace
    from laplace_gnn_tpu.training import make_neg_marglik_fn

    d = karate
    tr, va, te = d.split(0)
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    model = SparseGCN(d.num_features, 8, d.num_classes, 2,
                      jnp.asarray(d.x), g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    loader = ArrayLoader(jnp.asarray(tr), jnp.asarray(d.y[tr]))

    for flavor in (DiagLaplace, KronLaplace):
        la = flavor(model, params, "classification")
        la.fit(loader)
        assert np.isfinite(float(la.log_marginal_likelihood()))
        p = la(jnp.asarray(te), link_approx="probit")
        np.testing.assert_allclose(np.asarray(p.sum(-1)),
                                   np.ones(len(te)), atol=1e-6)

    f = make_neg_marglik_fn(model, "classification", "kron", "all",
                            N=len(tr))
    val = f(params, jnp.asarray(tr), jnp.asarray(d.y[tr]))
    assert np.isfinite(float(val))
    # weights receive marglik gradients
    grads = jax.grad(f)(params, jnp.asarray(tr), jnp.asarray(d.y[tr]))
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(grads))
    assert gsum > 0


@pytest.mark.slow
def test_sparse_gcn_trains(karate):
    d = karate
    tr, va, te = d.split(0)
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym")
    model = SparseGCN(d.num_features, 16, d.num_classes, 2,
                      jnp.asarray(d.x), g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    y = jnp.asarray(d.y)

    @jax.jit
    def step(p):
        def obj(p):
            f = model.apply(p, jnp.asarray(tr))
            logp = jax.nn.log_softmax(f)
            return -jnp.mean(logp[jnp.arange(len(tr)), y[jnp.asarray(tr)]])

        loss, grad = jax.value_and_grad(obj)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, grad), loss

    losses = []
    for _ in range(100):
        params, l = step(params)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8
    f = model.apply(params, jnp.asarray(te))
    acc = float(jnp.mean(jnp.argmax(f, -1) == y[jnp.asarray(te)]))
    assert acc > 0.3


def test_sbm_scale_sparse():
    """A graph too large to keep dense in tests still aggregates."""
    d = G.sbm_dataset(n_nodes=5000, n_classes=5, d_features=16,
                      p_in=0.004, p_out=0.0004)
    g = sparse_from_edge_index(d.edge_index, d.num_nodes, normalize="sym",
                               fmt="segment")
    x = jnp.asarray(d.x)
    out = g.spmm(x)
    assert out.shape == (5000, 16)
    assert np.isfinite(np.asarray(out)).all()
