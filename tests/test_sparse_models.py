"""Sparse scale variants of the SAGE and GAT model families: parity with
the dense models given identical parameters, and Laplace compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.graph.container import sparse_from_edge_index
from laplace_gnn_tpu.laplace import Laplace
from laplace_gnn_tpu.models import (GAT, GraphSAGE, SparseGAT, SparseGCN,
                                    SparseSAGE)

N, D, H, C = 20, 6, 8, 4


def make_graph(seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.random((N, N)) < 0.3).astype(float)
    a = np.minimum(a + a.T, 1.0)
    np.fill_diagonal(a, 0)
    X = rng.standard_normal((N, D))
    y = rng.integers(0, C, N)
    return a, X, y


@pytest.mark.slow
def test_sparse_sage_matches_dense():
    adj, X, y = make_graph()
    ei = np.array(np.nonzero(adj))
    dense = GraphSAGE(D, H, C, 2, jnp.asarray(X), jnp.asarray(adj),
                      dropout_p=0.0)
    params = dense.init(jax.random.PRNGKey(0))
    g = sparse_from_edge_index(ei, N, normalize="row", add_self_loops=False)
    sparse = SparseSAGE(D, H, C, 2, jnp.asarray(X), g, dropout_p=0.0)
    sp = {"convs": params["convs"]}
    out_d = dense.apply(params, jnp.arange(N))
    out_s = sparse.apply(sp, jnp.arange(N))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=1e-8)


@pytest.mark.parametrize("heads", [1, 2])
@pytest.mark.slow
def test_sparse_gat_matches_dense(heads):
    adj, X, y = make_graph(seed=1)
    dense = GAT(D, H, C, 2, jnp.asarray(X), jnp.asarray(adj), dropout_p=0.0,
                heads=heads)
    params = dense.init(jax.random.PRNGKey(0))
    # dense GAT adds self-loops into its stored adj; mirror the pattern
    adj_sl = np.asarray(params["adj"])
    ei = np.array(np.nonzero(adj_sl))
    g = sparse_from_edge_index(ei, N, normalize=None, add_self_loops=False)
    sparse = SparseGAT(D, H, C, 2, jnp.asarray(X), g, heads=heads,
                       dropout_p=0.0)
    sp = {"convs": params["convs"]}
    out_d = dense.apply(params, jnp.arange(N))
    out_s = sparse.apply(sp, jnp.arange(N))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=1e-7)


@pytest.mark.slow
def test_sparse_sage_laplace_end_to_end():
    adj, X, y = make_graph(seed=2)
    ei = np.array(np.nonzero(adj))
    g = sparse_from_edge_index(ei, N, normalize="row", add_self_loops=False)
    model = SparseSAGE(D, H, C, 2, jnp.asarray(X), g, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    la = Laplace(model, params, "classification", subset_of_weights="all",
                 hessian_structure="kron")
    la.fit([(jnp.arange(N), jnp.asarray(y))])
    assert np.isfinite(float(la.log_marginal_likelihood()))
    probs = la(jnp.arange(N), pred_type="glm", link_approx="probit")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_sparse_gat_mixed_kron_and_diag_work():
    adj, X, y = make_graph(seed=3)
    ei = np.array(np.nonzero(adj + np.eye(N)))
    g = sparse_from_edge_index(ei, N, normalize=None, add_self_loops=False)
    model = SparseGAT(D, H, C, 2, jnp.asarray(X), g, heads=2, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    # kron runs mixed-structure KFAC (Kron for Linear sites + exact diag for
    # the attention vectors) — the reference's KFAC crashes on this combo
    la = Laplace(model, params, "classification", subset_of_weights="all",
                 hessian_structure="kron")
    la.fit([(jnp.arange(N), jnp.asarray(y))])
    assert type(la).__name__ == "KronLaplace"
    assert np.isfinite(float(la.log_marginal_likelihood()))
    assert any(len(gk) == 1 and gk[0].ndim == 1 for gk in la.H_facs.kfacs)
    # the strict KFAC operator (reference parity) still refuses by default
    from laplace_gnn_tpu.curvature.kfac import compute_kfac_factors
    with pytest.raises(ValueError, match="dense"):
        compute_kfac_factors(model, params, jnp.arange(N), jnp.asarray(y),
                             "classification", N=N)
    # the autodiff-based diag flavor keeps working
    la = Laplace(model, params, "classification", subset_of_weights="all",
                 hessian_structure="diag")
    la.fit([(jnp.arange(N), jnp.asarray(y))])
    assert np.isfinite(float(la.log_marginal_likelihood()))


def test_sparse_gat_trains():
    adj, X, y = make_graph(seed=4)
    ei = np.array(np.nonzero(adj + np.eye(N)))
    g = sparse_from_edge_index(ei, N, normalize=None, add_self_loops=False)
    model = SparseGAT(D, H, C, 2, jnp.asarray(X), g, heads=2, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum
    yj = jnp.asarray(y)

    @jax.jit
    def step(p):
        def obj(p):
            return cross_entropy_sum(model.apply(p, jnp.arange(N)), yj) / N
        l, gr = jax.value_and_grad(obj)(p)
        return jax.tree_util.tree_map(lambda w, g_: w - 0.1 * g_, p, gr), l

    _, l0 = step(params)
    for _ in range(60):
        params, l = step(params)
    assert float(l) < float(l0)
