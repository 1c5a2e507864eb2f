"""Fused STE/normalize/aggregate op vs the composed reference path —
values AND gradients (the custom VJP includes the degree-normalization
term). On CPU the fused op runs its XLA fallback core; the TPU Pallas core
is exercised by bench.py / the driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.models import GCN, STEGCN
from laplace_gnn_tpu.ops import binarize_ste, fill_diagonal, normalize_adj
from laplace_gnn_tpu.ops.pallas_spmm import (norm_aggregate,
                                             ste_norm_aggregate)

N, D = 20, 5


@pytest.fixture
def data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    adj = jax.random.uniform(k1, (N, N))
    s = jax.random.normal(k2, (N, D))
    return adj, s


def composed_ste(adj, s, threshold=0.5, symmetric=False, sign_grad=False,
                 mask=None):
    a = (adj + adj.T) / 2 if symmetric else adj
    b = binarize_ste(a, threshold, mask, sign_grad)
    b = fill_diagonal(b, 1.0)
    return normalize_adj(b) @ s


@pytest.mark.parametrize("symmetric", [False, True])
def test_ste_fused_forward_matches_composed(data, symmetric):
    adj, s = data
    out_f = ste_norm_aggregate(adj, s, 0.5, symmetric)
    out_c = composed_ste(adj, s, 0.5, symmetric)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               atol=1e-10)


@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("sign_grad", [False, True])
@pytest.mark.slow
def test_ste_fused_gradients_match_composed(data, symmetric, sign_grad):
    adj, s = data

    def loss_f(adj, s):
        return jnp.sum(ste_norm_aggregate(adj, s, 0.5, symmetric,
                                          sign_grad) ** 2)

    def loss_c(adj, s):
        return jnp.sum(composed_ste(adj, s, 0.5, symmetric,
                                    sign_grad=sign_grad) ** 2)

    ga_f, gs_f = jax.grad(loss_f, argnums=(0, 1))(adj, s)
    ga_c, gs_c = jax.grad(loss_c, argnums=(0, 1))(adj, s)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_c),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_c),
                               atol=1e-9)


def test_ste_fused_with_mask(data):
    adj, s = data
    mask = (jax.random.uniform(jax.random.PRNGKey(7), (N, N)) > 0.5) * 1.0

    def loss_f(adj):
        return jnp.sum(ste_norm_aggregate(adj, s, 0.5, False, False, mask))

    def loss_c(adj):
        return jnp.sum(composed_ste(adj, s, mask=mask))

    np.testing.assert_allclose(np.asarray(jax.grad(loss_f)(adj)),
                               np.asarray(jax.grad(loss_c)(adj)), atol=1e-9)


def test_norm_aggregate_matches_composed(data):
    adj, s = data
    adj_b = fill_diagonal((adj > 0.5).astype(adj.dtype), 1.0)

    def loss_f(adj_b, s):
        return jnp.sum(jnp.tanh(norm_aggregate(adj_b, s)))

    def loss_c(adj_b, s):
        return jnp.sum(jnp.tanh(normalize_adj(adj_b) @ s))

    np.testing.assert_allclose(
        np.asarray(norm_aggregate(adj_b, s)),
        np.asarray(normalize_adj(adj_b) @ s), atol=1e-10)
    ga_f, gs_f = jax.grad(loss_f, argnums=(0, 1))(adj_b, s)
    ga_c, gs_c = jax.grad(loss_c, argnums=(0, 1))(adj_b, s)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_c), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_c), atol=1e-9)


@pytest.mark.slow
def test_fused_models_match_unfused(data):
    adj, _ = data
    adj_bin = jnp.minimum((adj > 0.6) + (adj > 0.6).T, 1).astype(jnp.float64)
    X = jax.random.normal(jax.random.PRNGKey(3), (N, 6))
    for cls, kw in ((STEGCN, {}), (GCN, {})):
        m_plain = cls(6, 8, 3, 2, X, adj_bin, dropout_p=0.0, fused=False)
        m_fused = cls(6, 8, 3, 2, X, adj_bin, dropout_p=0.0, fused=True)
        params = m_plain.init(jax.random.PRNGKey(1))
        out_p = m_plain.apply(params, jnp.arange(N))
        out_f = m_fused.apply(params, jnp.arange(N))
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   atol=1e-10, err_msg=cls.__name__)

        def lp(p):
            return jnp.sum(m_plain.apply(p, jnp.arange(N)) ** 2)

        def lf(p):
            return jnp.sum(m_fused.apply(p, jnp.arange(N)) ** 2)

        gp = jax.grad(lp)(params)
        gf = jax.grad(lf)(params)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-9)


def test_pallas_matmul_cpu_interpret():
    """Blocked matmul kernel correctness in interpreter mode (TPU execution
    covered by bench)."""
    from laplace_gnn_tpu.ops import pallas_matmul
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (48, 32), jnp.float32)
    # call the kernel via interpret mode
    with pltpu.force_tpu_interpret_mode():
        out = pallas_matmul.matmul(a, b, bm=32, bn=128, bk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a @ b),
                               atol=1e-5)


def test_static_int8_adjacency_matches_plain():
    from laplace_gnn_tpu.ops.pallas_spmm import StaticNormAdjOp
    key = jax.random.PRNGKey(0)
    adj = fill_diagonal(
        (jax.random.uniform(key, (N, N)) > 0.6).astype(jnp.float64), 1.0)
    s = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    op = StaticNormAdjOp(adj)
    np.testing.assert_allclose(np.asarray(op.spmm(s)),
                               np.asarray(normalize_adj(adj) @ s),
                               atol=1e-6)
    assert op.adj_i8.dtype == jnp.int8


def test_gcn_int8_mode_matches_plain():
    adjr = jax.random.uniform(jax.random.PRNGKey(2), (N, N))
    adj_bin = jnp.minimum((adjr > 0.6) + (adjr > 0.6).T, 1).astype(jnp.float64)
    X = jax.random.normal(jax.random.PRNGKey(3), (N, 6))
    m_plain = GCN(6, 8, 3, 2, X, adj_bin, dropout_p=0.0)
    m_int8 = GCN(6, 8, 3, 2, X, adj_bin, dropout_p=0.0, fused="int8")
    params = m_plain.init(jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(m_int8.apply(params, jnp.arange(N))),
        np.asarray(m_plain.apply(params, jnp.arange(N))), atol=1e-6)


def test_gcn_fused_auto_selects_by_size():
    rng = np.random.default_rng(3)
    n = 32
    adj = np.minimum((rng.random((n, n)) < 0.2)
                     + (rng.random((n, n)) < 0.2).T, 1).astype(np.float32)
    np.fill_diagonal(adj, 0)
    X = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    m = GCN(6, 8, 3, 2, X, jnp.asarray(adj), dropout_p=0.0, fused="auto")
    assert m.fused is False            # below the measured 8k crossover
    p = m.init(jax.random.PRNGKey(0))
    m_plain = GCN(6, 8, 3, 2, X, jnp.asarray(adj), dropout_p=0.0)
    np.testing.assert_allclose(np.asarray(m.apply(p, jnp.arange(n))),
                               np.asarray(m_plain.apply(p, jnp.arange(n))),
                               atol=1e-6)
