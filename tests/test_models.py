import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.models import (GAT, GCN, AttSTEGCN, GraphSAGE,
                                    LoRASTEGCN, STEGCN, STEGraphSAGE)
from laplace_gnn_tpu.nn import TapCollector
from laplace_gnn_tpu.ops import fill_diagonal, normalize_adj
from laplace_gnn_tpu.utils import posterior_mask, named_leaves, split_by_mask

N, D, H, C = 10, 7, 8, 3


@pytest.fixture
def graph():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (N, D))
    a = (jax.random.uniform(k2, (N, N)) < 0.3).astype(jnp.float64)
    adj = jnp.minimum(a + a.T, 1.0) * (1 - jnp.eye(N))
    return X, adj


def _forward(model, seed=0, **kw):
    params = model.init(jax.random.PRNGKey(seed))
    out = model.apply(params, jnp.arange(4), **kw)
    return params, out


def test_gcn_forward_matches_manual(graph):
    X, adj = graph
    model = GCN(D, H, C, 2, X, adj)
    params, out = _forward(model)
    assert out.shape == (4, C)

    # manual: relu(normadj @ (X W0^T + b0)) -> normadj @ (. W1^T + b1)
    na = np.asarray(normalize_adj(fill_diagonal(adj, 1.0)))
    W0 = np.asarray(params["convs"][0]["lin"]["weight"])
    b0 = np.asarray(params["convs"][0]["lin"]["bias"])
    W1 = np.asarray(params["convs"][1]["lin"]["weight"])
    b1 = np.asarray(params["convs"][1]["lin"]["bias"])
    h = np.maximum(na @ (np.asarray(X) @ W0.T + b0), 0.0)
    expected = (na @ (h @ W1.T + b1))[:4]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-10)


def test_gcn_full_output_and_slice(graph):
    X, adj = graph
    model = GCN(D, H, C, 2, X, adj)
    params = model.init(jax.random.PRNGKey(1))
    full = model.apply(params)
    sl = model.apply(params, jnp.array([3, 5]))
    np.testing.assert_allclose(np.asarray(full)[[3, 5]], np.asarray(sl))


def test_three_layer_gcn_and_residual_and_norm(graph):
    X, adj = graph
    for norm in (None, "layer", "batch"):
        model = GCN(D, H, C, 3, X, adj, norm=norm, res=True)
        params, out = _forward(model)
        assert out.shape == (4, C)
        assert len(params["convs"]) == 3
        assert len(params["res"]) == 2
        if norm is not None:
            assert len(params["norms"]) == 2


@pytest.mark.slow
def test_stegcn_adj_gradient_flows(graph):
    X, adj = graph
    model = STEGCN(D, H, C, 2, X, adj, threshold=0.5)
    params = model.init(jax.random.PRNGKey(0))

    def loss(params):
        return jnp.sum(model.apply(params, jnp.arange(N)) ** 2)

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["adj"])).sum() > 0
    # binarized forward adjacency support
    fa = model.full_adj(params)
    assert set(np.unique(np.asarray(fa))) <= {0.0, 1.0}


def test_stegcn_sign_and_mask(graph):
    X, adj = graph
    train_nodes = jnp.array([0, 1, 2])
    model = STEGCN(D, H, C, 2, X, adj, train_masked_update=True,
                   train_nodes=train_nodes, sign_grad=True)
    params = model.init(jax.random.PRNGKey(0))
    g = jax.grad(lambda p: jnp.sum(model.apply(p, jnp.arange(N))))(params)
    vals = np.unique(np.abs(np.asarray(g["adj"])))
    # sign-grad: gradient entries in {-1, 0, 1}
    assert set(np.round(vals, 6)) <= {0.0, 1.0}


def test_lorastegcn(graph):
    X, adj = graph
    model = LoRASTEGCN(D, H, C, 2, X, adj, r=4, lora_alpha=8.0)
    params, out = _forward(model)
    assert params["adj_lora_A"].shape == (4, N)
    assert params["adj_lora_B"].shape == (N, 4)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, jnp.arange(N))))(params)
    assert np.abs(np.asarray(g["adj_lora_B"])).sum() > 0


@pytest.mark.slow
def test_gat_forward_rowsum(graph):
    X, adj = graph
    model = GAT(D, H, C, 2, X, adj, heads=2, concat=False)
    params, out = _forward(model)
    assert out.shape == (4, C)
    assert np.isfinite(np.asarray(out)).all()


def test_gat_chunked_attention_matches_dense():
    """The flash-style row-blocked masked attention (GATConv.row_block /
    auto-chunk at N > AUTO_CHUNK_N) is bit-for-bit the same math as the
    dense path: forward, reverse grads (params AND adjacency), and
    forward-mode jvp (the GGN mat-vec route) all agree. N=70 with block=16
    exercises the padded last block; one isolated node exercises the
    zero-degree row."""
    from laplace_gnn_tpu.models.layers import GATConv

    n, d, f, heads = 70, 7, 4, 2
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((n, d)))
    a = (rng.random((n, n)) < 0.1).astype(np.float64)
    adj = jnp.asarray(np.minimum(a + a.T, 1.0) * (1 - np.eye(n))
                      ).at[5].set(0.0).at[:, 5].set(0.0)  # isolated node

    dense = GATConv(d, f, heads=heads, name="c")
    chunk = GATConv(d, f, heads=heads, name="c", row_block=16)
    params = dense.init(jax.random.PRNGKey(1))

    def run(conv, p, adj):
        return conv.apply(p, adj, X)

    out_d = run(dense, params, adj)
    out_c = run(chunk, params, adj)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               atol=1e-12)

    def loss(conv):
        return lambda p, adj: jnp.sum(jnp.sin(run(conv, p, adj)))

    g_d = jax.grad(loss(dense), argnums=(0, 1))(params, adj)
    g_c = jax.grad(loss(chunk), argnums=(0, 1))(params, adj)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g_c),
                      jax.tree_util.tree_leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-11)

    v = jax.tree_util.tree_map(jnp.ones_like, params)
    _, jv_d = jax.jvp(lambda p: run(dense, p, adj), (params,), (v,))
    _, jv_c = jax.jvp(lambda p: run(chunk, p, adj), (params,), (v,))
    np.testing.assert_allclose(np.asarray(jv_c), np.asarray(jv_d),
                               atol=1e-11)


@pytest.mark.slow
def test_gat_chunked_marglik_hyperstep_matches_dense():
    """The differentiable mixed-structure KFAC marglik (Kron for Linear
    sites + exact diag for attention params) gives the same value and
    d/d_adj through the row-blocked attention path as through the dense
    one — i.e. chunking composes with the full curvature machinery (vmap
    per-sample grads, jvp, vjp), not just the forward."""
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn

    rng = np.random.default_rng(0)
    n, d, c = 16, 4, 2
    a = np.minimum((rng.random((n, n)) < 0.4)
                   + (rng.random((n, n)) < 0.4).T, 1).astype(np.float64)
    np.fill_diagonal(a, 0)
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.integers(0, c, n))
    idx = jnp.arange(n)

    vals = {}
    for name, blk in (("dense", None), ("chunked", 4)):
        model = GAT(d, 4, c, 2, X, jnp.asarray(a), dropout_p=0.0, heads=1,
                    row_block=blk)
        params = model.init(jax.random.PRNGKey(0))
        fn = make_neg_marglik_fn(model, "classification", "kron", "all", N=n)
        vals[name] = jax.jit(jax.value_and_grad(fn))(params, idx, y)

    nm_d, g_d = vals["dense"]
    nm_c, g_c = vals["chunked"]
    np.testing.assert_allclose(float(nm_c), float(nm_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_c["adj"]), np.asarray(g_d["adj"]),
                               atol=1e-10)


def test_gat_heads_divisibility(graph):
    X, adj = graph
    with pytest.raises(ValueError):
        GAT(D, H, 5, 2, X, adj, heads=2, concat=True)


def test_graphsage_mean_agg(graph):
    X, adj = graph
    model = GraphSAGE(D, H, C, 2, X, adj, num_sampled_nodes_per_hop=None)
    params, out = _forward(model)
    assert out.shape == (4, C)
    # sampling path with rng
    model_s = GraphSAGE(D, H, C, 2, X, adj, num_sampled_nodes_per_hop=2)
    out2 = model_s.apply(params, jnp.arange(4), rng=jax.random.PRNGKey(5))
    assert out2.shape == (4, C)


def test_stegraphsage(graph):
    X, adj = graph
    model = STEGraphSAGE(D, H, C, 2, X, adj, num_sampled_nodes_per_hop=None)
    params, out = _forward(model)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, jnp.arange(N))))(params)
    assert np.abs(np.asarray(g["adj"])).sum() > 0


def test_attstegcn_posterior_excludes_adj_W(graph):
    X, adj = graph
    model = AttSTEGCN(D, H, C, 2, X, adj, d_k=4)
    params, out = _forward(model)
    mask = posterior_mask(params)
    sel, _ = split_by_mask(params, mask)
    names = [n for n, l in named_leaves(sel) if l is not None]
    assert not any("adj" in n for n in names)
    assert any("convs" in n for n in names)


def test_dropout_train_vs_eval(graph):
    X, adj = graph
    model = GCN(D, H, C, 2, X, adj, dropout_p=0.5)
    params = model.init(jax.random.PRNGKey(0))
    out_eval = model.apply(params, jnp.arange(N))
    out_eval2 = model.apply(params, jnp.arange(N))
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))
    out_train = model.apply(params, jnp.arange(N), rng=jax.random.PRNGKey(1),
                            train=True)
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))


def test_taps_recorded(graph):
    X, adj = graph
    model = GCN(D, H, C, 2, X, adj)
    params = model.init(jax.random.PRNGKey(0))
    taps = TapCollector()
    model.apply(params, jnp.arange(N), taps=taps)
    assert len(taps.records) == 2
    names = [r[0] for r in taps.records]
    assert names == ["convs.0", "convs.1"]
    a0, s0 = taps.records[0][1], taps.records[0][2]
    assert a0.shape == (N, D) and s0.shape == (N, H)


def test_jit_forward(graph):
    X, adj = graph
    model = GCN(D, H, C, 2, X, adj)
    params = model.init(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, idx: model.apply(p, idx))
    out = f(params, jnp.arange(4))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(model.apply(params, jnp.arange(4))),
                               atol=1e-12)


def test_gat_int8_mask_and_bf16_attention():
    """GAT(mask_dtype='int8') is EXACT (attention only tests adj > 0, and
    GAT never updates its adjacency); attn_dtype='bfloat16' casts only the
    alpha @ h contraction and stays within bf16 tolerance. Both compose
    with row_block chunking."""
    n = 40
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    a = (rng.random((n, n)) < 0.2).astype(np.float32)
    adj = jnp.asarray(np.minimum(a + a.T, 1.0) * (1 - np.eye(n)))
    idx = jnp.arange(n)

    ref = GAT(D, H, C, 2, X, adj, heads=2, concat=False, dropout_p=0.0)
    params = ref.init(jax.random.PRNGKey(0), jnp.float32)
    out_ref = ref.apply(params, idx)

    m_int8 = GAT(D, H, C, 2, X, adj, heads=2, concat=False,
                 dropout_p=0.0, mask_dtype="int8")
    assert m_int8.forward_adj(params).dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(m_int8.apply(params, idx)),
                                  np.asarray(out_ref))

    m_both = GAT(D, H, C, 2, X, adj, heads=2, concat=False,
                 dropout_p=0.0, mask_dtype="int8", attn_dtype="bfloat16",
                 row_block=16)
    out_b = m_both.apply(params, idx)
    assert out_b.dtype == out_ref.dtype
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_ref),
                               rtol=0.05, atol=0.05)
    # gradients flow on the optimized path
    from laplace_gnn_tpu.curvature.losses import cross_entropy_sum
    y = jnp.asarray(rng.integers(0, C, n))
    g = jax.grad(lambda p: cross_entropy_sum(
        m_both.apply(p, idx), y) / n)(params)
    leaves = [l for k, l in g.items() if k != "adj"]
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(leaves))
