"""HF-style dict-input (MutableMapping) batch support.

The reference threads ``dict_key_x``/``dict_key_y`` through BaseLaplace and
the curvature interface so models taking a MutableMapping batch work
end-to-end (laplace/baselaplace.py:77-82, curvature.py dict_key usages,
dict-input fakes tests/utils.py:109-127, examples/huggingface_example.py).
Here the same surface is the DictInputModel adapter + mapping-aware
ArrayLoader/fit/validate; these tests pin dict-path == tuple-path equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.nn import MLP, DictInputModel
from laplace_gnn_tpu.utils.data import ArrayLoader, dataset_size

D, H, C, M = 3, 8, 2, 20


def make_data(seed=0, regression=False):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((M, D)))
    if regression:
        y = jnp.asarray(rng.standard_normal((M, 1)))
    else:
        y = jnp.asarray(rng.integers(0, C, M))
    return X, y


def test_array_loader_dict_batches():
    X, y = make_data()
    data = {"input_ids": X, "labels": y}
    loader = ArrayLoader(data, batch_size=8)
    assert dataset_size(loader) == M
    batches = list(loader)
    assert len(batches) == 3
    from collections.abc import MutableMapping
    assert all(isinstance(b, MutableMapping) for b in batches)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b["input_ids"]) for b in batches]),
        np.asarray(X))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b["labels"]) for b in batches]),
        np.asarray(y))
    # (X, y) tuple batches still work when y is given
    loader2 = ArrayLoader(data, y, batch_size=8)
    Xb, yb = next(iter(loader2))
    assert isinstance(Xb, MutableMapping) and yb.shape[0] == 8


@pytest.mark.parametrize("structure", ["kron", "diag", "full"])
def test_dict_input_fit_matches_tuple_fit(structure):
    """Fitting on MutableMapping batches gives bit-identical posteriors and
    marglik to the plain tuple-loader fit of the unwrapped model."""
    X, y = make_data(seed=1)
    base = MLP([D, H, C], act="tanh")
    params = base.init(jax.random.PRNGKey(0))

    la_ref = Laplace(base, params, "classification",
                     subset_of_weights="all", hessian_structure=structure)
    la_ref.fit(ArrayLoader(X, y, batch_size=10))

    model = DictInputModel(base)
    la = Laplace(model, params, "classification",
                 subset_of_weights="all", hessian_structure=structure)
    la.fit(ArrayLoader({"input_ids": X, "labels": y}, batch_size=10))

    np.testing.assert_allclose(float(la.log_marginal_likelihood()),
                               float(la_ref.log_marginal_likelihood()),
                               rtol=1e-12)
    # predictive on a dict batch equals predictive on the raw array
    p_dict = la({"input_ids": X[:5]}, pred_type="glm", link_approx="probit")
    p_ref = la_ref(X[:5], pred_type="glm", link_approx="probit")
    np.testing.assert_allclose(np.asarray(p_dict), np.asarray(p_ref),
                               rtol=1e-10, atol=1e-12)


def test_dict_input_last_layer_and_custom_keys():
    """Last-layer (closed-form jacobians route through features()) + custom
    dict_key_x/dict_key_y names."""
    X, y = make_data(seed=2)
    base = MLP([D, H, C], act="tanh")
    params = base.init(jax.random.PRNGKey(1))
    model = DictInputModel(base, dict_key_x="tokens")
    la = Laplace(model, params, "classification",
                 subset_of_weights="last_layer", hessian_structure="kron",
                 dict_key_x="tokens", dict_key_y="targets")
    la.fit(ArrayLoader({"tokens": X, "targets": y}, batch_size=7))
    assert np.isfinite(float(la.log_marginal_likelihood()))
    probs = la({"tokens": X}, pred_type="glm", link_approx="probit")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)


class _RewardMLP(MLP):
    """(B, 2, d) preference pairs -> (B, 2) Bradley-Terry logits during
    fitting; (B, d) -> (B, 1) scalar rewards at prediction (the reference's
    SimpleRewardModel shape, examples/reward_modeling_example.py)."""

    def apply(self, params, x, **kw):
        if x.ndim == 3:
            b, two, d = x.shape
            out = super().apply(params, x.reshape(-1, d), **kw)
            return out.reshape(b, two)
        return super().apply(params, x, **kw)


def test_dict_input_reward_modeling():
    """The reward-modeling likelihood split (classification fit on pairs,
    regression predictive over the scalar reward — reference
    baselaplace.py:57-63,:1060-1061) on dict batches: the reference designed
    this exactly for HF reward models fed MutableMapping batches."""
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((M, 2, D)))   # preference pairs
    y = jnp.asarray(rng.integers(0, 2, M))            # which is preferred
    base = _RewardMLP([D, H, 1], act="tanh")          # scalar reward head
    params = base.init(jax.random.PRNGKey(2))
    model = DictInputModel(base)
    la = Laplace(model, params, "reward_modeling",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit(ArrayLoader({"input_ids": X, "labels": y}))
    assert np.isfinite(float(la.log_marginal_likelihood()))
    mean, var = la({"input_ids": X[:4, 0]}, pred_type="glm")
    assert mean.shape == (4, 1) and var.shape[0] == 4
    assert np.all(np.asarray(var) >= 0)


def test_optimize_prior_precision_cv_with_dict_loader():
    """The CV gridsearch's validation loop unpacks mapping batches."""
    X, y = make_data(seed=4)
    base = MLP([D, H, C], act="tanh")
    params = base.init(jax.random.PRNGKey(3))
    model = DictInputModel(base)
    la = Laplace(model, params, "classification",
                 subset_of_weights="all", hessian_structure="diag")
    loader = ArrayLoader({"input_ids": X, "labels": y})
    la.fit(loader)
    la.optimize_prior_precision(method="gridsearch", val_loader=loader,
                                grid_size=3)
    assert float(la.prior_precision[0]) > 0


def test_marglik_training_with_dict_loader():
    """The library-level online marglik loop (reference
    marglik_training.py:227 dict unpacking) accepts mapping batches."""
    from laplace_gnn_tpu.laplace import marglik_training
    X, y = make_data(seed=5)
    base = MLP([D, H, C], act="tanh")
    params = base.init(jax.random.PRNGKey(4))
    model = DictInputModel(base)
    loader = ArrayLoader({"input_ids": X, "labels": y}, batch_size=10)
    la, pf, margliks, losses = marglik_training(
        model, params, loader, n_epochs=6, marglik_frequency=2,
        n_hypersteps=2)
    assert len(margliks) >= 2 and np.isfinite(margliks[-1])
    probs = la({"input_ids": X[:5]}, pred_type="glm", link_approx="probit")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
