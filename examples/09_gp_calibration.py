"""GP (FunctionalLaplace) calibration: post-hoc GGN-Laplace as a Gaussian
process with subset-of-data, tuning the prior precision by GP marginal
likelihood (counterpart of the reference's calibration_gp_example.py:
same workflow — fit GP Laplace on a trained classifier, optimize the
prior, compare NLL/ECE against the MAP softmax).

Run: python examples/09_gp_calibration.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.utils.data import ArrayLoader
from laplace_gnn_tpu.utils.metrics import (expected_calibration_error,
                                           nll_loss)


def main():
    key = jax.random.PRNGKey(0)
    n, d, c = 400, 5, 3
    ks = jax.random.split(key, 4)
    means = jax.random.normal(ks[0], (c, d)) * 1.2
    y = jax.random.randint(ks[1], (n,), 0, c)
    X = means[y] + jax.random.normal(ks[2], (n, d))
    X_tr, y_tr, X_te, y_te = X[:300], y[:300], X[300:], y[300:]

    model = MLP([d, 32, c], act="tanh")
    params = model.init(ks[3])
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def obj(p):
            logp = jax.nn.log_softmax(model.apply(p, X_tr))
            return -jnp.mean(logp[jnp.arange(300), y_tr])

        loss, g = jax.value_and_grad(obj)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(2000):  # overfit on purpose
        params, state, _ = step(params, state)

    probs_map = np.asarray(jax.nn.softmax(model.apply(params, X_te), -1))
    print(f"MAP:        NLL={nll_loss(probs_map, np.asarray(y_te)):.3f} "
          f"ECE={expected_calibration_error(probs_map, np.asarray(y_te)):.3f}")

    # GGN-Laplace as a GP (reference hessian_structure='gp'): subset-of-data
    # kernel, prior precision tuned on the GP marginal likelihood
    la = Laplace(model, params, "classification",
                 subset_of_weights="all", hessian_structure="gp",
                 n_subset=150)
    la.fit(ArrayLoader(X_tr, y_tr, batch_size=100))
    la.optimize_prior_precision(method="marglik", n_steps=150, lr=0.1)
    print(f"GP prior precision: {float(la.prior_precision.ravel()[0]):.3f}, "
          f"log marglik: {float(la.log_marginal_likelihood()):.2f}")

    probs_gp = np.asarray(la(X_te, pred_type="gp"))
    nll = nll_loss(probs_gp, np.asarray(y_te))
    ece = expected_calibration_error(probs_gp, np.asarray(y_te))
    print(f"GP Laplace: NLL={nll:.3f} ECE={ece:.3f}")
    assert np.isfinite(nll)
    print("gp calibration example OK")


if __name__ == "__main__":
    main()
