"""Conv2d layer + conv-KFAC support.

Mirrors the reference's conv coverage: curvlinops computes conv Kronecker
factors from im2col patches (curvlinops/kfac.py:839-851,
curvlinops/kfac_utils.py:144-244) and the curvature-backend cross-check tests
run on small CNNs. Oracles here: torch.nn.functional.conv2d for the forward,
explicit im2col for the A factor, and functorch-style dense GGN for the
backend path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.curvature import compute_kfac_factors
from laplace_gnn_tpu.curvature.oracles import functorch_ggn
from laplace_gnn_tpu.laplace import Laplace
from laplace_gnn_tpu.nn import CNN, Conv2d, TapCollector


def make_cnn(seed=0):
    # 6x6 inputs, two 3x3 valid convs -> 2x2 spatial, 3 channels -> head 12
    model = CNN([(2, 4, 3), (4, 3, 3)], head_in=3 * 2 * 2, n_outputs=3)
    params = model.init(jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 1)
    X = jax.random.normal(key, (5, 2, 6, 6))
    y = jax.random.randint(jax.random.PRNGKey(seed + 2), (5,), 0, 3)
    return model, params, X, y


@pytest.mark.parametrize("stride,padding", [(1, 0), (1, 1), (2, 1)])
def test_conv2d_matches_torch(stride, padding):
    torch = pytest.importorskip("torch")
    conv = Conv2d(3, 5, 3, stride=stride, padding=padding, name="c")
    params = conv.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 3, 8, 8)).astype(
        np.asarray(params["weight"]).dtype)
    out = conv.apply(params, jnp.asarray(x))
    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(np.asarray(params["weight"])),
        torch.tensor(np.asarray(params["bias"])), stride=stride,
        padding=padding)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_conv_tap_records_patches():
    """The tap's activation is the im2col patch matrix in (c, kh, kw) feature
    order — the same layout as the row-major flattened torch conv weight."""
    conv = Conv2d(2, 3, 2, name="c")
    params = conv.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4))
    taps = TapCollector()
    conv.apply(params, x, taps=taps)
    (name, a, s), = taps.records
    assert name == "c" and a.shape == (1, 9, 8) and s.shape == (1, 9, 3)
    # explicit im2col oracle at spatial location (i=1, j=2)
    patch = np.asarray(x[0, :, 1:3, 2:4]).reshape(-1)  # (c, kh, kw) ravel
    np.testing.assert_allclose(np.asarray(a[0, 1 * 3 + 2]), patch, atol=1e-7)
    # pre-activation equals patches @ W_flat.T + b
    w_flat = np.asarray(params["weight"]).reshape(3, -1)
    np.testing.assert_allclose(
        np.asarray(s[0]), np.asarray(a[0]) @ w_flat.T
        + np.asarray(params["bias"]), atol=1e-6)


@pytest.mark.slow
def test_conv_kfac_A_factor_expand_reduce():
    """A = patches^T patches / (N * L) for 'expand' (L = spatial positions),
    A = mean-patch covariance / N for 'reduce' (curvlinops conv semantics)."""
    model, params, X, y = make_cnn()
    taps = TapCollector()
    model.apply(params, X, taps=taps)
    acts = {n: a for n, a, s in taps.records}

    for approx in ("expand", "reduce"):
        kron = compute_kfac_factors(model, params, X, y, "classification",
                                    kfac_approx=approx, N=5)
        # first weight block's A factor (tree order is bias-then-weight, so
        # the first 2-factor group is convs.0.weight)
        A0 = np.asarray(next(g for g in kron.kfacs if len(g) == 2)[1])
        a = np.asarray(acts["convs.0"])  # (M, L, ckk)
        if approx == "expand":
            a2 = a.reshape(-1, a.shape[-1])
            expect = a2.T @ a2 / (5 * a.shape[1])
        else:
            a2 = a.mean(axis=1)
            expect = a2.T @ a2 / 5
        np.testing.assert_allclose(A0, expect, atol=1e-6)


@pytest.mark.slow
def test_conv_kfac_single_location_exact():
    """With 1x1 spatial output the conv is a plain linear map, so
    single-sample type-2 KFAC blocks equal the exact block-diagonal GGN
    (same law the Linear layers satisfy)."""
    model = CNN([(2, 3, 3)], head_in=3, n_outputs=2)  # 3x3 input -> 1x1
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 3, 3))
    y = jnp.array([1])
    kron = compute_kfac_factors(model, params, X, y, "classification", N=1)
    dense = np.asarray(kron.to_matrix())
    ggn = np.asarray(functorch_ggn(lambda w, X: model.apply(w, X),
                                   "classification", params, [(X, y)]))
    # compare block-diagonals (tree order: convs.0.{bias,weight}, head.*)
    cur = 0
    from laplace_gnn_tpu.utils import named_leaves
    for name, leaf in named_leaves(params):
        n = int(np.prod(leaf.shape))
        np.testing.assert_allclose(dense[cur:cur + n, cur:cur + n],
                                   ggn[cur:cur + n, cur:cur + n], atol=1e-6,
                                   err_msg=name)
        cur += n


@pytest.mark.parametrize("structure", ["kron", "diag", "full"])
@pytest.mark.slow
def test_laplace_on_cnn(structure):
    """End-to-end: fit a Laplace flavor on the CNN, finite marglik, GLM
    predictive sums to one."""
    model, params, X, y = make_cnn()
    la = Laplace(model, params, "classification",
                 subset_of_weights="all", hessian_structure=structure)
    la.fit([(X, y)])
    assert np.isfinite(float(la.log_marginal_likelihood()))
    probs = la(X, pred_type="glm", link_approx="probit")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_cnn_last_layer_laplace():
    model, params, X, y = make_cnn()
    la = Laplace(model, params, "classification",
                 subset_of_weights="last_layer", hessian_structure="kron")
    la.fit([(X, y)])
    assert np.isfinite(float(la.log_marginal_likelihood()))
