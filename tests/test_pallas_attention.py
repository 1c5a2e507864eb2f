"""Flash masked-attention kernel: interpret-mode exactness vs the dense
oracle, custom-VJP gradients, and GATConv integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.models.layers import _masked_attention_dense
from laplace_gnn_tpu.ops.pallas_attention import (_flash_fwd_pallas,
                                                  flash_masked_attention)


def setup(n=70, H=3, F=5, seed=0, iso=True):
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < 0.15).astype(np.float32)
    adj = np.minimum(a + a.T + np.eye(n, dtype=np.float32), 1.0)
    if iso:                       # one fully isolated target row
        adj[5, :] = 0.0
    h = jnp.asarray(rng.standard_normal((n, H, F)), jnp.float32)
    a_src = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    a_dst = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    return a_src, a_dst, jnp.asarray(adj), h


def test_flash_kernel_interpret_matches_dense():
    """Online-softmax recurrence == two-pass masked softmax, including
    ragged edges (n=70 with bm=16/bn=128 blocks), -inf masking, and the
    all-masked (isolated) row."""
    a_src, a_dst, adj, h = setup()
    ref = _masked_attention_dense(a_src, a_dst, adj, h, 0.2)
    out = _flash_fwd_pallas(a_src, a_dst, adj, h, negative_slope=0.2,
                            bm=16, bn=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    assert float(jnp.abs(out[5]).max()) == 0.0       # isolated row -> 0


def test_flash_kernel_interpret_int8_mask():
    """The kernel reads the adjacency only through adj > 0: an int8 mask
    input gives identical output."""
    a_src, a_dst, adj, h = setup(seed=1)
    ref = _flash_fwd_pallas(a_src, a_dst, adj, h, negative_slope=0.2,
                            bm=16, bn=128, interpret=True)
    out = _flash_fwd_pallas(a_src, a_dst, (adj > 0).astype(jnp.int8), h,
                            negative_slope=0.2, bm=16, bn=128,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_flash_custom_vjp_matches_dense_grads():
    """The public entry's backward (XLA recompute) equals the dense path's
    gradients; d/d_adj is the structural zero."""
    a_src, a_dst, adj, h = setup(seed=2)

    def loss_flash(a_s, a_d, adj_, hh):
        return jnp.sum(flash_masked_attention(a_s, a_d, adj_, hh, 0.2) ** 2)

    def loss_dense(a_s, a_d, adj_, hh):
        return jnp.sum(_masked_attention_dense(a_s, a_d, adj_, hh, 0.2) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(a_src, a_dst, adj, h)
    gd = jax.grad(loss_dense, argnums=(0, 1, 3))(a_src, a_dst, adj, h)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gd[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gd[1]),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(gf[2]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(gf[3]), np.asarray(gd[2]),
                               rtol=1e-5, atol=1e-6)


def test_gatconv_flash_option():
    """GATConv(attention_impl='flash') is a drop-in (CPU falls back to the
    XLA path inside the custom-vjp entry, so this runs everywhere)."""
    from laplace_gnn_tpu.models.layers import GATConv
    a_src, a_dst, adj, h = setup(seed=3)
    n = adj.shape[0]
    x = jnp.asarray(np.random.default_rng(4).standard_normal((n, 6)),
                    jnp.float32)
    conv_ref = GATConv(6, 5, heads=3, concat=False)
    conv_fl = GATConv(6, 5, heads=3, concat=False,
                      attention_impl="flash")
    params = conv_ref.init(jax.random.PRNGKey(0), jnp.float32)
    out_ref = conv_ref.apply(params, adj, x)
    out_fl = conv_fl.apply(params, adj, x)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


def test_flash_row_shard_contract():
    """The kernel accepts R <= N target rows (adj (R, N), a_dst (R, H)) —
    the row-sharded attention contract."""
    a_src, a_dst, adj, h = setup(seed=5, iso=False)
    R = 24
    ref = _masked_attention_dense(a_src, a_dst[:R], adj[:R], h, 0.2)
    out = _flash_fwd_pallas(a_src, a_dst[:R], adj[:R], h,
                            negative_slope=0.2, bm=16, bn=128,
                            interpret=True)
    assert out.shape == (R,) + h.shape[1:]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_row_sharded_attention_use_flash_matches():
    """make_row_sharded_gat_attention(use_flash=True) on the virtual mesh
    (CPU fallback inside the custom-vjp entry) matches the plain sharded
    path and the single-device dense oracle, incl. gradients."""
    from laplace_gnn_tpu.parallel.mesh import make_mesh
    from laplace_gnn_tpu.parallel.sharded import \
        make_row_sharded_gat_attention
    n, H, F = 64, 2, 4
    rng = np.random.default_rng(6)
    a = (rng.random((n, n)) < 0.2).astype(np.float64)
    adj = jnp.asarray(np.minimum(a + a.T + np.eye(n), 1.0))
    h = jnp.asarray(rng.standard_normal((n, H, F)))
    a_src = jnp.asarray(rng.standard_normal((n, H)))
    a_dst = jnp.asarray(rng.standard_normal((n, H)))

    mesh = make_mesh(8, model_parallel=1)
    attn = make_row_sharded_gat_attention(mesh, row_block=8, use_flash=True)

    def loss_sh(a_s, a_d, hh):
        return jnp.sum(attn(a_s, a_d, adj, hh, 0.2) ** 2)

    def loss_ref(a_s, a_d, hh):
        return jnp.sum(_masked_attention_dense(a_s, a_d, adj, hh, 0.2) ** 2)

    v_sh, g_sh = jax.value_and_grad(loss_sh, argnums=(0, 1, 2))(
        a_src, a_dst, h)
    v_rf, g_rf = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        a_src, a_dst, h)
    np.testing.assert_allclose(float(v_sh), float(v_rf), rtol=1e-9)
    for a_, b_ in zip(g_sh, g_rf):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-8, atol=1e-10)


def test_flash_bwd_kernel_interpret_matches_dense_grads():
    """The fused Pallas backward (recompute-from-(m,l) + two MXU dots +
    softmax correction) equals the dense path's gradients, including the
    all-masked (isolated) row and ragged block edges."""
    from laplace_gnn_tpu.ops.pallas_attention import (_flash_bwd_pallas,
                                                      _flash_fwd_pallas_aux)
    a_src, a_dst, adj, h = setup(seed=7)
    out, m, l = _flash_fwd_pallas_aux(a_src, a_dst, adj, h,
                                      negative_slope=0.2, bm=16, bn=128,
                                      interpret=True)
    g = jnp.asarray(np.random.default_rng(8).standard_normal(out.shape),
                    jnp.float32)
    g_as, g_ad, g_h = _flash_bwd_pallas(a_src, a_dst, adj, h, g, out, m, l,
                                        negative_slope=0.2, bm=16, bn=128,
                                        interpret=True)
    _, vjp = jax.vjp(
        lambda a_s, a_d, hh: _masked_attention_dense(a_s, a_d, adj, hh, 0.2),
        a_src, a_dst, h)
    r_as, r_ad, r_h = vjp(g)
    np.testing.assert_allclose(np.asarray(g_as), np.asarray(r_as),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(r_ad),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(r_h),
                               rtol=3e-5, atol=3e-6)


def test_flash_bwd_kernel_row_shard_and_mixed_blocks():
    """Backward honors the R <= N row-shard contract, and re-pads the
    forward's (m, l) when fwd/bwd block sizes differ."""
    from laplace_gnn_tpu.ops.pallas_attention import (_flash_bwd_pallas,
                                                      _flash_fwd_pallas_aux)
    a_src, a_dst, adj, h = setup(seed=9, iso=False)
    R = 40
    out, m, l = _flash_fwd_pallas_aux(a_src, a_dst[:R], adj[:R], h,
                                      negative_slope=0.2, bm=8, bn=128,
                                      interpret=True)
    g = jnp.asarray(np.random.default_rng(10).standard_normal(out.shape),
                    jnp.float32)
    g_as, g_ad, g_h = _flash_bwd_pallas(a_src, a_dst[:R], adj[:R], h, g,
                                        out, m, l, negative_slope=0.2,
                                        bm=16, bn=128, interpret=True)
    _, vjp = jax.vjp(
        lambda a_s, a_d, hh: _masked_attention_dense(a_s, a_d, adj[:R],
                                                     hh, 0.2),
        a_src, a_dst[:R], h)
    r_as, r_ad, r_h = vjp(g)
    assert g_ad.shape == (R, a_dst.shape[1])
    np.testing.assert_allclose(np.asarray(g_as), np.asarray(r_as),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(r_ad),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(r_h),
                               rtol=3e-5, atol=3e-6)


def test_flash_model_curvature_paths_jvp_safe():
    """A GAT with attention_impl='flash' must not break the jvp-based
    curvature stack: make_neg_marglik_fn and Laplace.fit swap to the XLA
    attention clone (BaseGNN.jvp_safe) and match the plain model exactly."""
    from laplace_gnn_tpu.laplace import Laplace
    from laplace_gnn_tpu.models import GAT
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn
    from laplace_gnn_tpu.utils.data import ArrayLoader

    n, D, HID, C = 20, 6, 8, 3
    rng = np.random.default_rng(11)
    a = (rng.random((n, n)) < 0.3).astype(np.float32)
    adj = np.minimum(a + a.T + np.eye(n, dtype=np.float32), 1.0)
    X = rng.standard_normal((n, D)).astype(np.float32)
    y = jnp.asarray(rng.integers(0, C, 12))
    idx = jnp.arange(12)

    kw = dict(heads=2, concat=False, dropout_p=0.0)
    model_fl = GAT(D, HID, C, 2, X, adj, attention_impl="flash", **kw)
    model_rf = GAT(D, HID, C, 2, X, adj, **kw)
    params = model_fl.init(jax.random.PRNGKey(1))

    # jvp_safe returns a distinct clone for the flash model, self otherwise
    assert model_rf.jvp_safe() is model_rf
    safe = model_fl.jvp_safe()
    assert safe is not model_fl
    assert all(c.attention_impl is None for c in safe.convs)
    assert model_fl.convs[0].attention_impl == "flash"   # original untouched


    # fused hyperstep value+grad agree with the plain model
    for m in (model_fl, model_rf):
        nm = make_neg_marglik_fn(m, "classification", "kron", "all",
                                 N=12, prior_precision=0.7)
        v, g = jax.value_and_grad(nm)(params, idx, y[:12])
        if m is model_fl:
            v_fl, g_fl = v, g
        else:
            np.testing.assert_allclose(float(v_fl), float(v), rtol=1e-6)

    # Laplace class path fits without the custom-vjp jvp error
    la = Laplace(model_fl, params, "classification",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit(ArrayLoader(idx, y))
    assert np.isfinite(float(la.log_marginal_likelihood()))

    # CALLABLE impls (e.g. the row-sharded shard_map attention) are plain
    # XLA and jvp-capable: jvp_safe must NOT strip them — doing so would
    # silently drop the sharding from the curvature path (regression
    # guard: the 8-device GAT hyperstep memory ratio fell 6.0x -> 1.24x
    # when an earlier jvp_safe stripped every non-None impl)
    from laplace_gnn_tpu.models.layers import _masked_attention_chunked
    impl = lambda a_s, a_d, adj_, hh, ns: _masked_attention_chunked(
        a_s, a_d, adj_, hh, ns, 8)
    model_cb = GAT(D, HID, C, 2, X, adj, attention_impl=impl, **kw)
    assert model_cb.jvp_safe() is model_cb
    nm_cb = make_neg_marglik_fn(model_cb, "classification", "kron", "all",
                                N=12, prior_precision=0.7)
    v_cb = nm_cb(params, idx, y[:12])       # jvp path works through it
    np.testing.assert_allclose(float(v_cb), float(v_fl), rtol=1e-6)


def test_marglik_optimization_with_flash_model():
    """Full marglik training with attention_impl='flash': train steps run
    reverse-mode through the custom-vjp entry, hypersteps route curvature
    jvps through the jvp_safe clone — the loop completes and matches the
    plain model's marglik trace (CPU: both attention impls are the same
    XLA math, so traces are identical)."""
    from laplace_gnn_tpu.models import GAT
    from laplace_gnn_tpu.training.marglik_gnn import marglik_optimization

    n, D, HID, C = 16, 5, 6, 2
    rng = np.random.default_rng(12)
    a = (rng.random((n, n)) < 0.35).astype(np.float32)
    adj = np.minimum(a + a.T + np.eye(n, dtype=np.float32), 1.0)
    X = rng.standard_normal((n, D)).astype(np.float32)
    y = jnp.asarray(rng.integers(0, C, n))
    tr, va = jnp.arange(10), jnp.arange(10, 16)

    kw = dict(lr=0.05, lr_adj=0.1, n_epochs=6, n_hypersteps=1,
              n_epochs_burnin=2, marglik_frequency=2, model_type="gat",
              verbose=False)
    traces = {}
    for name, impl in [("flash", "flash"), ("plain", None)]:
        model = GAT(D, HID, C, 2, X, adj, heads=2, concat=False,
                    dropout_p=0.0, attention_impl=impl)
        params = model.init(jax.random.PRNGKey(0))
        _, _, losses, _, nms = marglik_optimization(
            model, params, tr, y[tr], va, y[va], **kw)
        traces[name] = (np.asarray(losses), np.asarray(nms))
    np.testing.assert_allclose(traces["flash"][0], traces["plain"][0],
                               rtol=1e-6)
    np.testing.assert_allclose(traces["flash"][1], traces["plain"][1],
                               rtol=1e-6)


def test_tile_skip_exact_on_banded_graph():
    """Occupancy-gated tiles (tile_skip) are bit-exact vs the ungated
    kernel on a banded adjacency where most tiles are empty — fwd, stats,
    and the fused backward."""
    from laplace_gnn_tpu.ops.pallas_attention import (_flash_bwd_pallas,
                                                      _flash_fwd_pallas_aux)
    n, H, F = 96, 2, 5
    rng = np.random.default_rng(13)
    band = 8
    a = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        lo, hi = max(0, i - band), min(n, i + band + 1)
        a[i, lo:hi] = (rng.random(hi - lo) < 0.4)
    adj = jnp.asarray(np.minimum(a + a.T + np.eye(n, dtype=np.float32), 1.0))
    h = jnp.asarray(rng.standard_normal((n, H, F)), jnp.float32)
    a_src = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    a_dst = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, H, F)), jnp.float32)

    kw = dict(negative_slope=0.2, bm=16, bn=128, interpret=True)
    o_s, m_s, l_s = _flash_fwd_pallas_aux(a_src, a_dst, adj, h,
                                          tile_skip=True, **kw)
    o_n, m_n, l_n = _flash_fwd_pallas_aux(a_src, a_dst, adj, h,
                                          tile_skip=False, **kw)
    for x, yv in ((o_s, o_n), (m_s, m_n), (l_s, l_n)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(yv))

    bw = dict(negative_slope=0.2, bm=16, bn=128, interpret=True)
    gs = _flash_bwd_pallas(a_src, a_dst, adj, h, g, o_s, m_s, l_s,
                           tile_skip=True, **bw)
    gn = _flash_bwd_pallas(a_src, a_dst, adj, h, g, o_n, m_n, l_n,
                           tile_skip=False, **bw)
    for x, yv in zip(gs, gn):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(yv))
