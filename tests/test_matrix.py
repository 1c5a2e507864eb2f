"""Kron/KronDecomposed algebra vs dense reconstruction
(mirrors reference tests/test_matrix.py:146-175 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu.laplace.kron import Kron, KronDecomposed


def psd(key, n):
    A = jax.random.normal(key, (n, n))
    return A @ A.T + n * jnp.eye(n)


@pytest.fixture
def kron():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    # [bias block] + [weight block G, A] like a Linear layer
    return Kron([[psd(ks[0], 3)], [psd(ks[1], 3), psd(ks[2], 4)]])


def test_init_from_tree():
    w = {"layers": [{"bias": jnp.zeros(3), "weight": jnp.zeros((3, 4))}]}
    k = Kron.init_from_tree(w)
    assert k.kfacs[0][0].shape == (3, 3)          # bias leaf first (tree order)
    assert k.kfacs[1][0].shape == (3, 3)
    assert k.kfacs[1][1].shape == (4, 4)


def test_add_mul_roundtrip(kron):
    # addition acts on the factors themselves (reference :74-94)
    two = kron + kron
    for g2, g1 in zip(two.kfacs, kron.kfacs):
        for f2, f1 in zip(g2, g1):
            np.testing.assert_allclose(np.asarray(f2), 2 * np.asarray(f1),
                                       atol=1e-10)
    # scalar multiplication distributes as scalar**(1/len) per factor, so the
    # represented dense matrix scales linearly
    scaled = kron * 4.0
    np.testing.assert_allclose(np.asarray(scaled.to_matrix()),
                               4.0 * np.asarray(kron.to_matrix()), atol=1e-8)


def test_diag_and_logdet_match_dense(kron):
    dense = np.asarray(kron.to_matrix())
    np.testing.assert_allclose(np.asarray(kron.diag()), np.diag(dense),
                               atol=1e-9)
    np.testing.assert_allclose(float(kron.logdet()),
                               np.linalg.slogdet(dense)[1], atol=1e-9)


def test_bmm_vs_dense(kron):
    dense = np.asarray(kron.to_matrix())
    P = dense.shape[0]
    W = jax.random.normal(jax.random.PRNGKey(5), (2, 3, P))
    out = kron.bmm(W)
    expected = np.einsum("pq,bkq->bkp", dense, np.asarray(W))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-8)
    # 1-d and 2-d variants
    v = W[0, 0]
    np.testing.assert_allclose(np.asarray(kron.bmm(v)), dense @ np.asarray(v),
                               atol=1e-8)


def test_decomposed_logdet_and_bmm(kron):
    dense = np.asarray(kron.to_matrix())
    P = dense.shape[0]
    delta = 0.7
    kd = kron.decompose() + jnp.asarray(delta)
    shifted = dense + delta * np.eye(P)
    np.testing.assert_allclose(float(kd.logdet()),
                               np.linalg.slogdet(shifted)[1], atol=1e-8)
    W = jax.random.normal(jax.random.PRNGKey(7), (2, 3, P))
    # exponent -1
    out = kd.bmm(W, exponent=-1)
    expected = np.einsum("pq,bkq->bkp", np.linalg.inv(shifted), np.asarray(W))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-7)
    # inv_square_form = W P^-1 W^T
    isf = kd.inv_square_form(W)
    expected_isf = np.einsum("bkp,pq,blq->bkl", np.asarray(W),
                             np.linalg.inv(shifted), np.asarray(W))
    np.testing.assert_allclose(np.asarray(isf), expected_isf, atol=1e-7)
    # exponent -1/2 squares to inverse
    half = kd.to_matrix(exponent=-0.5)
    np.testing.assert_allclose(half @ half, np.linalg.inv(shifted), atol=1e-7)


def test_decomposed_diag(kron):
    delta = 0.3
    kd = kron.decompose() + jnp.asarray(delta)
    dense = np.asarray(kron.to_matrix()) + delta * np.eye(kron.to_matrix().shape[0])
    np.testing.assert_allclose(np.asarray(kd.diag()), np.diag(dense),
                               atol=1e-8)


def test_damping_logdet(kron):
    delta = 0.5
    kd = kron.decompose(damping=True) + jnp.asarray(delta)
    # damped: per two-factor block eigvals are (l1+sqrt(d))(l2+sqrt(d))
    total = 0.0
    for ls, d in zip(kd.eigenvalues, kd.deltas):
        if len(ls) == 1:
            total += np.sum(np.log(np.asarray(ls[0]) + float(d)))
        else:
            l1 = np.asarray(ls[0]) + np.sqrt(float(d))
            l2 = np.asarray(ls[1]) + np.sqrt(float(d))
            total += np.sum(np.log(np.outer(l1, l2)))
    np.testing.assert_allclose(float(kd.logdet()), total, atol=1e-9)


def test_layerwise_deltas(kron):
    deltas = jnp.array([0.1, 2.0])
    kd = kron.decompose() + deltas
    d0 = np.asarray(kron.kfacs[0][0]) + 0.1 * np.eye(3)
    blk1 = np.kron(np.asarray(kron.kfacs[1][0]),
                   np.asarray(kron.kfacs[1][1])) + 2.0 * np.eye(12)
    expected = np.linalg.slogdet(d0)[1] + np.linalg.slogdet(blk1)[1]
    np.testing.assert_allclose(float(kd.logdet()), expected, atol=1e-8)


def test_invalid_ops(kron):
    with pytest.raises(ValueError):
        kron + 1.0
    with pytest.raises(ValueError):
        kron * jnp.ones(3)
    with pytest.raises(ValueError):
        kron.bmm(jnp.ones((3, 3, 3, 3)))
    kd = kron.decompose()
    with pytest.raises(ValueError):
        kd + jnp.ones(5)


def test_pytree_roundtrip(kron):
    leaves, treedef = jax.tree_util.tree_flatten(kron)
    k2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(np.asarray(k2.to_matrix()),
                               np.asarray(kron.to_matrix()))
    kd = kron.decompose() + 0.5
    leaves, treedef = jax.tree_util.tree_flatten(kd)
    kd2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(float(kd2.logdet()), float(kd.logdet()))

    # jit through a Kron-valued function
    @jax.jit
    def f(k):
        return k.logdet()

    np.testing.assert_allclose(float(f(kron)), float(kron.logdet()),
                               atol=1e-9)
