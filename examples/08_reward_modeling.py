"""Bayesian reward modeling (Bradley-Terry) with Laplace.

Analog of the reference's examples/reward_modeling_example.py: a
single-output reward net trained on pairwise preferences with the
cross-entropy (Bradley-Terry) likelihood, then a Laplace posterior whose
*prediction* is a regression over the scalar reward — mean + epistemic
variance per input (`likelihood="reward_modeling"` switches automatically;
reference laplace/baselaplace.py:57-63, :1060-1061).
"""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.nn import MLP


class RewardMLP(MLP):
    """(B, 2, d) pairs -> (B, 2) logits during fitting; (B, d) -> (B, 1)
    scalar rewards at prediction (the reference's SimpleRewardModel)."""

    def apply(self, params, x, **kw):
        if x.ndim == 3:
            b, two, d = x.shape
            out = super().apply(params, x.reshape(-1, d), **kw)
            return out.reshape(b, two)
        return super().apply(params, x, **kw)


def main():
    rng = np.random.default_rng(0)
    n, d = 128, 3
    w_true = np.array([1.5, -2.0, 0.5])

    # preference pairs: label = which of x0/x1 has higher true reward
    x0 = rng.standard_normal((n, d)).astype(np.float32)
    x1 = rng.standard_normal((n, d)).astype(np.float32)
    r0, r1 = x0 @ w_true, x1 @ w_true
    label = (r1 > r0).astype(np.int64)          # class 1 = x1 preferred
    X = jnp.asarray(np.stack([x0, x1], axis=1))  # (n, 2, d)
    y = jnp.asarray(label)

    model = RewardMLP([d, 32, 1], act="tanh")
    params = model.init(jax.random.PRNGKey(0))

    import optax
    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        def obj(p):
            logits = model.apply(p, X)           # (n, 2) Bradley-Terry
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        l, g = jax.value_and_grad(obj)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for i in range(800):
        params, st, loss = step(params, st)
    acc = float((model.apply(params, X).argmax(-1) == y).mean())
    print(f"preference train accuracy {acc:.3f}, CE loss {float(loss):.3f}")

    la = Laplace(model, params, "reward_modeling",
                 subset_of_weights="all", hessian_structure="kron")
    la.fit([(X, y)])
    la.optimize_prior_precision(method="marglik")
    print(f"marglik {float(la.log_marginal_likelihood()):.1f}")

    # prediction = regression over the scalar reward
    x_test = jnp.asarray(rng.standard_normal((6, d)), jnp.float32)
    r_mu, r_var = la(x_test)
    r_std = np.sqrt(np.asarray(r_var).reshape(-1))
    true_r = np.asarray(x_test) @ w_true
    corr = np.corrcoef(np.asarray(r_mu)[:, 0], true_r)[0, 1]
    for m, s, t in zip(np.asarray(r_mu)[:, 0], r_std, true_r):
        print(f"  reward {m:+.2f} +- {s:.2f}   (true {t:+.2f})")
    print(f"rank correlation with true reward: {corr:.3f}")
    assert corr > 0.9
    print("reward modeling example OK")


if __name__ == "__main__":
    main()
