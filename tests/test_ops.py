import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.ops import (binarize_ste, clip_ste, fill_diagonal,
                                 invsqrt_precision, normal_samples,
                                 normalize_adj, power_adj, sample_neigh_adj,
                                 symeig, symmetrize_adj, train_adj_mask)


def rand_adj(key, n, p=0.3):
    a = (jax.random.uniform(key, (n, n)) < p).astype(jnp.float64)
    a = jnp.minimum(a + a.T, 1.0)
    return fill_diagonal(a, 1.0)


def test_normalize_adj_matches_dense_formula():
    adj = rand_adj(jax.random.PRNGKey(0), 9)
    out = normalize_adj(adj)
    d = np.asarray(adj).sum(1)
    dinv = np.where(d > 0, d ** -0.5, 0.0)
    # reference formula (gnn/models/utils.py:106-112): (A @ D)^T @ D
    expected = (np.asarray(adj) @ np.diag(dinv)).T @ np.diag(dinv)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)


def test_normalize_adj_zero_row():
    adj = jnp.zeros((4, 4)).at[0, 1].set(1.0)
    out = normalize_adj(adj)
    assert np.isfinite(np.asarray(out)).all()


def test_binarize_ste_forward_and_grad():
    x = jnp.array([[0.2, 0.7], [0.5, 0.9]])
    y = binarize_ste(x, 0.5)
    np.testing.assert_array_equal(np.asarray(y), [[0.0, 1.0], [0.0, 1.0]])

    # straight-through: d sum(bin(x)*w) / dx == w
    w = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    g = jax.grad(lambda x: jnp.sum(binarize_ste(x, 0.5) * w))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w))

    # masked
    mask = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    g = jax.grad(lambda x: jnp.sum(binarize_ste(x, 0.5, mask) * w))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w * mask))

    # sign-grad
    g = jax.grad(lambda x: jnp.sum(binarize_ste(x, 0.5, None, True) * (-w)))(x)
    np.testing.assert_allclose(np.asarray(g), -np.ones((2, 2)))


def test_clip_ste():
    x = jnp.array([-0.5, 0.5, 1.5])
    np.testing.assert_allclose(np.asarray(clip_ste(x)), [0.0, 0.5, 1.0])
    g = jax.grad(lambda x: jnp.sum(clip_ste(x) * jnp.array([-3.0, 0.5, 2.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 0.5, 1.0])


def test_power_and_symmetrize():
    adj = rand_adj(jax.random.PRNGKey(1), 6)
    np.testing.assert_allclose(np.asarray(power_adj(adj, 3)),
                               np.linalg.matrix_power(np.asarray(adj), 3))
    a = jnp.triu(jnp.ones((3, 3)), 1)
    s = symmetrize_adj(a)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s).T)
    assert np.asarray(s).max() <= 1.0


def test_train_adj_mask():
    m = train_adj_mask(5, jnp.array([1, 3]))
    assert m[1, 3] == 0 and m[3, 1] == 0 and m[1, 1] == 0
    assert m[0, 1] == 1 and m[1, 2] == 1


def test_sample_neigh_adj():
    adj = rand_adj(jax.random.PRNGKey(2), 12, p=0.6)
    adj = fill_diagonal(adj, 0.0)
    k = 3
    s = sample_neigh_adj(jax.random.PRNGKey(3), adj, k)
    s_np, a_np = np.asarray(s), np.asarray(adj)
    assert ((s_np == 1) <= (a_np == 1)).all()
    rows = s_np.sum(1)
    degs = a_np.sum(1)
    np.testing.assert_array_equal(rows, np.minimum(degs, k))
    assert np.array_equal(np.asarray(sample_neigh_adj(None, adj, None)), a_np)


def test_symeig_clamps():
    M = jnp.array([[1.0, 2.0], [2.0, 1.0]])  # eigvals -1, 3
    L, W = symeig(M)
    assert (np.asarray(L) >= 0).all()
    np.testing.assert_allclose(np.asarray(L), [0.0, 3.0], atol=1e-12)


def test_batched_eigvalsh_matches_per_factor():
    """Same-size stacking (the TPU eigh-stall optimization) is exact, for
    values and gradients, across mixed sizes and shared-value duplicates."""
    from laplace_gnn_tpu.ops.linalg import batched_eigvalsh, batched_symeig

    rng = np.random.default_rng(0)

    def psd(d):
        a = rng.standard_normal((d, d))
        return jnp.asarray(a @ a.T)

    mats = [psd(5), psd(12), psd(12), psd(3), psd(12)]
    for m, lam in zip(mats, batched_eigvalsh(mats)):
        np.testing.assert_allclose(np.asarray(lam),
                                   np.linalg.eigvalsh(np.asarray(m)),
                                   atol=1e-10)
    for m, (lam, W) in zip(mats, batched_symeig(mats)):
        rec = np.asarray(W) @ np.diag(np.asarray(lam)) @ np.asarray(W).T
        np.testing.assert_allclose(rec, np.asarray(m), atol=1e-8)

    # gradient parity with per-factor eigvalsh through a logdet-style use
    def f_batched(b, a):
        lb, la = batched_eigvalsh([b, a])
        return jnp.sum(jnp.log(jnp.outer(jnp.clip(lb, min=0),
                                         jnp.clip(la, min=0)) + 0.7))

    def f_single(b, a):
        lb, la = jnp.linalg.eigvalsh(b), jnp.linalg.eigvalsh(a)
        return jnp.sum(jnp.log(jnp.outer(jnp.clip(lb, min=0),
                                         jnp.clip(la, min=0)) + 0.7))

    b, a = psd(7), psd(7)
    vb, gb = jax.value_and_grad(f_batched, argnums=(0, 1))(b, a)
    vs, gs = jax.value_and_grad(f_single, argnums=(0, 1))(b, a)
    np.testing.assert_allclose(float(vb), float(vs), atol=1e-10)
    for x, y in zip(gb, gs):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-8)


def test_invsqrt_precision():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5))
    M = jnp.asarray(A @ A.T + 5 * np.eye(5))
    S = invsqrt_precision(M)
    np.testing.assert_allclose(np.asarray(S @ S.T),
                               np.linalg.inv(np.asarray(M)), atol=1e-10)
    assert np.allclose(np.triu(np.asarray(S), 1), 0.0)  # lower triangular


def test_normal_samples_shapes_and_moments():
    key = jax.random.PRNGKey(0)
    mean = jnp.array([[1.0, -2.0], [0.0, 3.0]])
    var = jnp.array([[0.5, 2.0], [1.0, 0.1]])
    s = normal_samples(key, mean, var, 20000)
    assert s.shape == (20000, 2, 2)
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mean),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(s.var(0)), np.asarray(var),
                               rtol=0.1)
    # full covariance branch
    cov = jnp.stack([jnp.array([[1.0, 0.6], [0.6, 1.0]]),
                     jnp.array([[2.0, -0.5], [-0.5, 0.5]])])
    s = normal_samples(key, mean, cov, 40000)
    emp = np.cov(np.asarray(s[:, 0, :]).T)
    np.testing.assert_allclose(emp, np.asarray(cov[0]), atol=0.05)
