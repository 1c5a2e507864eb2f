"""KFAC factor computation: exactness on single samples, scaling conventions,
fisher types, and differentiability w.r.t. the adjacency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.curvature import compute_kfac_factors
from laplace_gnn_tpu.curvature.oracles import functorch_ef, functorch_ggn
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils import named_leaves, tree_size

D, H, C = 3, 4, 2


def block_slices(params):
    """Start/stop of each leaf in the flat vector (tree order)."""
    out, cur = {}, 0
    for name, leaf in named_leaves(params):
        n = int(np.prod(leaf.shape))
        out[name] = (cur, cur + n)
        cur += n
    return out


def setup(likelihood, M=1, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    model = MLP([D, H, C], act="tanh")
    params = model.init(keys[0])
    X = jax.random.normal(keys[1], (M, D))
    if likelihood == "classification":
        y = jax.random.randint(keys[2], (M,), 0, C)
    else:
        y = jax.random.normal(keys[2], (M, C))
    return model, params, X, y


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.slow
def test_single_sample_kfac_equals_blockdiag_ggn(likelihood):
    """For a single datum, KFAC weight blocks B (x) A equal the exact
    layer-diagonal GGN blocks (no expectation approximation)."""
    model, params, X, y = setup(likelihood, M=1)
    kron = compute_kfac_factors(model, params, X, y, likelihood,
                                fisher_type="type-2", N=1)
    ggn = functorch_ggn(lambda w, X: model.apply(w, X), likelihood,
                        params, [(X, y)])
    sl = block_slices(params)
    dense = np.asarray(kron.to_matrix())
    cur = 0
    for name, leaf in named_leaves(params):
        n = int(np.prod(leaf.shape))
        a, b = sl[name]
        np.testing.assert_allclose(
            dense[cur:cur + n, cur:cur + n],
            np.asarray(ggn)[a:b, a:b], atol=1e-8,
            err_msg=f"block {name}")
        cur += n


def test_single_sample_empirical_equals_ef_blocks():
    model, params, X, y = setup("classification", M=1)
    kron = compute_kfac_factors(model, params, X, y, "classification",
                                fisher_type="empirical", N=1)
    ef = functorch_ef(lambda w, X: model.apply(w, X), "classification",
                      params, [(X, y)])
    dense = np.asarray(kron.to_matrix())
    cur = 0
    for name, leaf in named_leaves(params):
        n = int(np.prod(leaf.shape))
        np.testing.assert_allclose(
            dense[cur:cur + n, cur:cur + n],
            np.asarray(ef)[cur:cur + n, cur:cur + n], atol=1e-8)
        cur += n


@pytest.mark.slow
def test_A_scaling_with_N():
    model, params, X, y = setup("classification", M=4)
    k1 = compute_kfac_factors(model, params, X, y, "classification", N=4)
    k2 = compute_kfac_factors(model, params, X, y, "classification", N=8)
    # A factors scale as 1/N, B factors don't
    np.testing.assert_allclose(np.asarray(k1.kfacs[1][1]),
                               2 * np.asarray(k2.kfacs[1][1]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(k1.kfacs[1][0]),
                               np.asarray(k2.kfacs[1][0]), atol=1e-10)


@pytest.mark.slow
def test_mc_close_to_type2():
    model, params, X, y = setup("classification", M=8, seed=1)
    kt2 = compute_kfac_factors(model, params, X, y, "classification",
                               fisher_type="type-2", N=8)
    kmc = compute_kfac_factors(model, params, X, y, "classification",
                               fisher_type="mc", mc_samples=3000, N=8)
    for g2, gm in zip(kt2.kfacs, kmc.kfacs):
        # B factors agree in expectation; A factors exactly
        np.testing.assert_allclose(np.asarray(gm[0]), np.asarray(g2[0]),
                                   atol=0.1, rtol=0.3)
        if len(g2) == 2:
            np.testing.assert_allclose(np.asarray(gm[1]), np.asarray(g2[1]),
                                       atol=1e-10)


def test_forward_only_identity_B():
    model, params, X, y = setup("classification", M=4)
    k = compute_kfac_factors(model, params, X, y, "classification",
                             fisher_type="forward-only", N=4)
    np.testing.assert_allclose(np.asarray(k.kfacs[0][0]), np.eye(H))


def test_expand_reduce_2d_equal_B():
    """For 2-d (no sequence dim) inputs expand and reduce coincide."""
    model, params, X, y = setup("classification", M=4)
    ke = compute_kfac_factors(model, params, X, y, "classification",
                              kfac_approx="expand", N=4)
    kr = compute_kfac_factors(model, params, X, y, "classification",
                              kfac_approx="reduce", N=4)
    for ge, gr in zip(ke.kfacs, kr.kfacs):
        for fe, fr in zip(ge, gr):
            np.testing.assert_allclose(np.asarray(fe), np.asarray(fr),
                                       atol=1e-10)


@pytest.mark.slow
def test_kfac_differentiable_wrt_adjacency():
    """The flagship property: d(sum of factors)/d(adj) flows through the
    tap-based factor computation (reference needed curvlinops/kfac.py:637-661
    fork hacks for this)."""
    from laplace_gnn_tpu.models import STEGCN
    key = jax.random.PRNGKey(0)
    Xf = jax.random.normal(key, (8, D))
    a = (jax.random.uniform(jax.random.PRNGKey(1), (8, 8)) < 0.4) * 1.0
    adj = jnp.minimum(a + a.T, 1.0)
    model = STEGCN(D, H, C, 2, Xf, adj)
    params = model.init(jax.random.PRNGKey(2))
    idx = jnp.arange(8)
    y = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, C)

    def scalar_of_factors(p):
        kron = compute_kfac_factors(model, p, idx, y, "classification", N=8)
        return sum(jnp.sum(F) for g in kron.kfacs for F in g)

    g = jax.grad(scalar_of_factors)(params)
    assert np.abs(np.asarray(g["adj"])).sum() > 0


def test_kfac_last_layer():
    model, params, X, y = setup("classification", M=4)
    k = compute_kfac_factors(model, params, X, y, "classification",
                             last_layer=True, N=4)
    assert len(k.kfacs) == 2                # bias + weight of last layer
    assert k.kfacs[0][0].shape == (C, C)    # bias block
    assert k.kfacs[1][0].shape == (C, C)
    assert k.kfacs[1][1].shape == (H, H)


def test_kfac_rejects_non_dense_posterior():
    from laplace_gnn_tpu.models import GAT
    key = jax.random.PRNGKey(0)
    Xf = jax.random.normal(key, (6, D))
    adj = jnp.ones((6, 6))
    model = GAT(D, 4, C, 2, Xf, adj, heads=2, concat=False)
    params = model.init(jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="dense"):
        compute_kfac_factors(model, params, jnp.arange(6),
                             jnp.zeros(6, dtype=int), "classification", N=6)


def test_column_chunk_exact():
    """Chunked cotangent-column accumulation (memory-bounded path for graph
    scale) is exactly the vmapped computation, incl. a non-dividing chunk."""
    model, params, X, y = setup("classification", M=6)
    full = compute_kfac_factors(model, params, X, y, "classification", N=6)
    for chunk in (1, 3):  # C=2: chunk 3 exercises zero-padding
        chunked = compute_kfac_factors(model, params, X, y, "classification",
                                       N=6, column_chunk=chunk)
        np.testing.assert_allclose(np.asarray(chunked.to_matrix()),
                                   np.asarray(full.to_matrix()), atol=1e-12)


@pytest.mark.slow
def test_mixed_diag_kfac_for_gat_matches_exact_ggn_diag():
    """Mixed-structure KFAC (GAT + kron): Kron blocks for the Linear sites,
    exact GGN-diagonal single-factor blocks for the attention vectors and
    biases. The diag blocks must equal the exact GGN diagonal (functorch
    oracle) on their parameter slices — the combination the reference
    crashes on (curvlinops/kfac.py:130)."""
    from laplace_gnn_tpu.models import GAT
    from laplace_gnn_tpu.utils.pytree import (DEFAULT_EXCLUDE, merge_split,
                                              posterior_mask, split_by_mask)

    key = jax.random.PRNGKey(0)
    n = 6
    Xf = jax.random.normal(key, (n, D))
    a = (jax.random.uniform(jax.random.PRNGKey(2), (n, n)) < 0.6)
    adj = jnp.minimum(a + a.T + jnp.eye(n), 1.0).astype(Xf.dtype)
    model = GAT(D, 4, C, 2, Xf, adj, heads=2, concat=False, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    idx = jnp.arange(n)
    y = jnp.asarray([0, 1, 0, 1, 1, 0])

    k = compute_kfac_factors(model, params, idx, y, "classification", N=n,
                             mixed_diag=True)

    mask = posterior_mask(params, DEFAULT_EXCLUDE)
    w, frozen = split_by_mask(params, mask)
    model_fn = lambda w_, X: model.apply(merge_split(w_, frozen), X)
    G = functorch_ggn(model_fn, "classification", w, [(idx, y)])
    slices = block_slices(w)

    # one Kron group per posterior leaf, in tree order
    names = [nm for nm, leaf in named_leaves(w) if leaf is not None]
    assert len(k.kfacs) == len(names)
    n_diag = 0
    for name, group in zip(names, k.kfacs):
        if len(group) == 1 and group[0].ndim == 1:
            lo, hi = slices[name]
            np.testing.assert_allclose(
                np.asarray(group[0]), np.asarray(jnp.diag(G)[lo:hi]),
                rtol=1e-6, atol=1e-10, err_msg=name)
            n_diag += 1
            assert "lin" not in name  # only non-dense leaves get diag blocks
    assert n_diag >= 4  # att_src/att_dst (+ biases) across the two convs


@pytest.mark.slow
def test_type2_sketch_unbiased_and_deterministic():
    """type-2-sketch: seed-averaged B converges to the exact type-2 B
    (unbiased Rademacher projection of the loss-Hessian sqrt columns);
    A factors are untouched; a fixed seed reproduces bit-identically.

    slow tier: 150 eager factor fits (~14 s) whose 0.05/0.15 tolerances
    need the full seed count at k=4 sketch variance."""
    model, params, X, y = setup("classification", M=8, seed=1)
    kt2 = compute_kfac_factors(model, params, X, y, "classification",
                               fisher_type="type-2", N=8)

    def one(seed):
        return compute_kfac_factors(
            model, params, X, y, "classification",
            fisher_type="type-2-sketch", sketch_size=4, seed=seed, N=8)

    ks = [one(s) for s in range(150)]
    for i, g2 in enumerate(kt2.kfacs):
        Bbar = np.mean([np.asarray(k.kfacs[i][0]) for k in ks], axis=0)
        np.testing.assert_allclose(Bbar, np.asarray(g2[0]),
                                   atol=0.05, rtol=0.15)
        if len(g2) == 2:  # A exact for every seed
            np.testing.assert_allclose(np.asarray(ks[0].kfacs[i][1]),
                                       np.asarray(g2[1]), atol=1e-12)
    # determinism at fixed seed
    ka, kb = one(7), one(7)
    for ga, gb in zip(ka.kfacs, kb.kfacs):
        for fa, fb in zip(ga, gb):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_type2_sketch_differentiable_wrt_adjacency():
    """The sketch keeps the flagship property: fixed-seed randomness enters
    linearly through exact sqrt columns, so the factors stay smooth in the
    adjacency and the marglik hyperstep can run on k << C pullbacks."""
    from laplace_gnn_tpu.models import STEGCN
    key = jax.random.PRNGKey(0)
    Xf = jax.random.normal(key, (8, D))
    a = (jax.random.uniform(jax.random.PRNGKey(1), (8, 8)) < 0.4) * 1.0
    adj = jnp.minimum(a + a.T, 1.0)
    model = STEGCN(D, H, C, 2, Xf, adj)
    params = model.init(jax.random.PRNGKey(2))
    idx = jnp.arange(8)
    y = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, C)

    def scalar_of_factors(p):
        kron = compute_kfac_factors(model, p, idx, y, "classification", N=8,
                                    fisher_type="type-2-sketch",
                                    sketch_size=2, seed=3)
        return sum(jnp.sum(F) for g in kron.kfacs for F in g)

    g = jax.grad(scalar_of_factors)(params)
    for _, leaf in named_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert np.abs(np.asarray(g["adj"])).sum() > 0


@pytest.mark.parametrize("fisher_type",
                         ["empirical", "mc", "forward-only",
                          "type-2-sketch"])
@pytest.mark.slow
def test_mixed_diag_other_fisher_types_finite(fisher_type):
    """Mixed diag blocks follow the requested Fisher semantics and stay
    finite/nonnegative for every type."""
    from laplace_gnn_tpu.models import GAT

    key = jax.random.PRNGKey(0)
    n = 6
    Xf = jax.random.normal(key, (n, D))
    adj = jnp.ones((n, n))
    model = GAT(D, 4, C, 2, Xf, adj, heads=2, concat=False, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    k = compute_kfac_factors(model, params, jnp.arange(n),
                             jnp.zeros(n, dtype=int), "classification", N=n,
                             fisher_type=fisher_type, mc_samples=3,
                             mixed_diag=True)
    for group in k.kfacs:
        for f in group:
            assert np.all(np.isfinite(np.asarray(f)))
        if len(group) == 1 and group[0].ndim == 1:
            assert np.all(np.asarray(group[0]) >= -1e-12)


def test_loss_hessian_sqrt_saturated_logits_gradient_finite():
    """Regression: differentiating the TYPE2 loss-Hessian sqrt w.r.t. the
    logits must stay finite when the softmax saturates (a class probability
    underflows to exactly 0). The naive sqrt(softmax(f)) form has
    sqrt'(0) = inf there, which poisoned the adjacency with NaNs during
    marglik hypersteps on well-fit models; exp(log_softmax / 2) underflows
    gracefully. (The torch reference shares the naive-form hazard,
    curvlinops/kfac_utils.py:15.)"""
    from laplace_gnn_tpu.curvature.losses import loss_hessian_sqrt

    f = jnp.array([[800.0, 0.0, -300.0], [-500.0, 200.0, 100.0]])
    S = loss_hessian_sqrt("classification", f)
    assert np.all(np.isfinite(np.asarray(S)))

    g = jax.grad(lambda ff: jnp.sum(
        loss_hessian_sqrt("classification", ff) ** 2))(f)
    assert np.all(np.isfinite(np.asarray(g)))

    # value parity with the naive form away from saturation
    f2 = jax.random.normal(jax.random.PRNGKey(0), (5, 4))
    p = jax.nn.softmax(f2, axis=-1)
    naive = jax.vmap(lambda pi, si: jnp.diag(si) - jnp.outer(pi, si))(
        p, jnp.sqrt(p))
    np.testing.assert_allclose(
        np.asarray(loss_hessian_sqrt("classification", f2)),
        np.asarray(naive), atol=1e-12)


def test_mixed_diag_probes_unbiased_and_deterministic():
    """diag_probes: the Hutchinson estimate of the uncovered-parameter
    curvature diagonal is unbiased for the exact mixed-diag blocks (probe
    average converges), deterministic at fixed seed, PSD (nonnegative), and
    only replaces the DIAG blocks (Kron site factors bit-identical)."""
    from laplace_gnn_tpu.models import GAT

    key = jax.random.PRNGKey(0)
    n = 6
    Xf = jax.random.normal(key, (n, D))
    a = (jax.random.uniform(jax.random.PRNGKey(2), (n, n)) < 0.6)
    adj = jnp.minimum(a + a.T + jnp.eye(n), 1.0).astype(Xf.dtype)
    model = GAT(D, 4, C, 2, Xf, adj, heads=2, concat=False, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    idx = jnp.arange(n)
    y = jnp.asarray([0, 1, 0, 1, 1, 0])

    k_exact = compute_kfac_factors(model, params, idx, y, "classification",
                                   N=n, mixed_diag=True)

    def probed(seed, n_probes=64):
        return compute_kfac_factors(model, params, idx, y, "classification",
                                    N=n, mixed_diag=True, seed=seed,
                                    diag_probes=n_probes)

    ks = [probed(s) for s in range(20)]
    for i, g_ex in enumerate(k_exact.kfacs):
        if len(g_ex) == 1 and g_ex[0].ndim == 1:     # diag block
            bar = np.mean([np.asarray(k.kfacs[i][0]) for k in ks], axis=0)
            np.testing.assert_allclose(bar, np.asarray(g_ex[0]),
                                       rtol=0.25, atol=0.02)
            for k in ks:                              # PSD per seed
                assert np.all(np.asarray(k.kfacs[i][0]) >= 0)
        else:                                         # Kron site factors
            for fa, fb in zip(ks[0].kfacs[i], g_ex):
                np.testing.assert_array_equal(np.asarray(fa),
                                              np.asarray(fb))
    # determinism at fixed seed
    ka, kb = probed(7), probed(7)
    for ga, gb in zip(ka.kfacs, kb.kfacs):
        for fa, fb in zip(ga, gb):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_mixed_diag_probes_differentiable_marglik():
    """The probed mixed-diag keeps the hyperstep differentiable: marglik
    gradients w.r.t. ALL parameters through the probed factors are finite
    and close to the exact-diag gradients at moderate probe count."""
    from laplace_gnn_tpu.models import GAT
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn

    key = jax.random.PRNGKey(3)
    n = 6
    Xf = jax.random.normal(key, (n, D))
    a = (jax.random.uniform(jax.random.PRNGKey(4), (n, n)) < 0.6)
    adj = jnp.minimum(a + a.T + jnp.eye(n), 1.0).astype(Xf.dtype)
    model = GAT(D, 4, C, 2, Xf, adj, heads=2, concat=False, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(5))
    idx = jnp.arange(n)
    y = jnp.asarray([0, 1, 0, 1, 1, 0])

    nm_ex = make_neg_marglik_fn(model, "classification", "kron", "all", N=n)
    nm_pr = make_neg_marglik_fn(model, "classification", "kron", "all", N=n,
                                diag_probes=256)
    v_ex, g_ex = jax.value_and_grad(nm_ex)(params, idx, y)
    v_pr, g_pr = jax.value_and_grad(nm_pr)(params, idx, y)
    assert np.isfinite(float(v_pr))
    np.testing.assert_allclose(float(v_pr), float(v_ex), rtol=0.05)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g_pr),
                      jax.tree_util.tree_leaves(g_ex)):
        assert np.all(np.isfinite(np.asarray(a_)))


def test_mixed_diag_probe_batch_matches_sequential():
    """probe_batch (vmapped probes per lax.map step) gives the same factors
    as the sequential map — same zs, same math, only batching changes."""
    from laplace_gnn_tpu.models import GAT

    key = jax.random.PRNGKey(0)
    n = 6
    Xf = jax.random.normal(key, (n, D))
    a = (jax.random.uniform(jax.random.PRNGKey(2), (n, n)) < 0.6)
    adj = jnp.minimum(a + a.T + jnp.eye(n), 1.0).astype(Xf.dtype)
    model = GAT(D, 4, C, 2, Xf, adj, heads=2, concat=False, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    idx = jnp.arange(n)
    y = jnp.asarray([0, 1, 0, 1, 1, 0])

    def probed(probe_batch):
        return compute_kfac_factors(model, params, idx, y, "classification",
                                    N=n, mixed_diag=True, seed=3,
                                    diag_probes=6, probe_batch=probe_batch)

    k_seq = probed(None)
    for pb in (2, 3, 4, 6, 8):     # incl. non-dividing and > n_probes
        k_b = probed(pb)
        for ga, gb in zip(k_seq.kfacs, k_b.kfacs):
            for fa, fb in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                           rtol=1e-6, atol=1e-8)
