"""Loss functions and their output-space Hessians (closed forms).

Conventions follow the reference exactly: the Laplace stack always uses
sum-reduction losses (CrossEntropyLoss(reduction='sum') /
MSELoss(reduction='sum'), laplace/curvature/curvature.py:63-73) with a
likelihood conversion ``factor`` (1.0 classification, 0.5 regression).

Closed-form loss Hessians w.r.t. the model output f (per sample):
  - CE:  H = diag(p) - p p^T,          sqrt S = diag(sqrt p) - p sqrt(p)^T
  - MSE(sum): H = 2 I,                 sqrt S = sqrt(2) I
  - BCE(sum): H = diag(s(1-s)),        sqrt S = diag(sqrt(s(1-s)))
(reference curvlinops/kfac_utils.py:15-143, curvlinops kfac TYPE2 path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLASSIFICATION = "classification"
REGRESSION = "regression"
REWARD_MODELING = "reward_modeling"


def cross_entropy_sum(f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum-reduced cross entropy over integer labels. f: (M, C), y: (M,)."""
    logp = jax.nn.log_softmax(f, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, y[:, None], axis=-1))


def mse_sum(f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum-reduced squared error (torch MSELoss(reduction='sum'))."""
    return jnp.sum((f - y) ** 2)


def bce_with_logits_sum(f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.clip(f, 0) - f * y + jnp.log1p(jnp.exp(-jnp.abs(f))))


def get_loss_fn(likelihood: str):
    if likelihood in (CLASSIFICATION, REWARD_MODELING):
        return cross_entropy_sum
    if likelihood == REGRESSION:
        return mse_sum
    raise ValueError(f"Unknown likelihood {likelihood!r}")


def likelihood_factor(likelihood: str) -> float:
    """Torch-loss -> log-likelihood conversion factor
    (laplace/curvature/curvature.py:63-73)."""
    return 0.5 if likelihood == REGRESSION else 1.0


# ---------------------------------------------------------------------------
# Output-space Hessian actions (per batch of outputs f: (M, C))
# ---------------------------------------------------------------------------

def loss_hessian_mvp(likelihood: str, f: jnp.ndarray,
                     v: jnp.ndarray) -> jnp.ndarray:
    """H_loss(f) @ v applied per sample; f, v: (M, C) -> (M, C)."""
    if likelihood == REGRESSION:
        return 2.0 * v
    p = jax.nn.softmax(f, axis=-1)
    return p * v - p * jnp.sum(p * v, axis=-1, keepdims=True)


def loss_hessian_diag(likelihood: str, f: jnp.ndarray) -> jnp.ndarray:
    if likelihood == REGRESSION:
        return 2.0 * jnp.ones_like(f)
    p = jax.nn.softmax(f, axis=-1)
    return p * (1.0 - p)


def loss_hessian(likelihood: str, f: jnp.ndarray) -> jnp.ndarray:
    """Dense per-sample loss Hessians, f: (M, C) -> (M, C, C)."""
    M, C = f.shape
    if likelihood == REGRESSION:
        return jnp.tile(2.0 * jnp.eye(C, dtype=f.dtype), (M, 1, 1))
    p = jax.nn.softmax(f, axis=-1)
    return jax.vmap(lambda pi: jnp.diag(pi) - jnp.outer(pi, pi))(p)


def loss_hessian_sqrt(likelihood: str, f: jnp.ndarray) -> jnp.ndarray:
    """Per-sample matrix square roots S with S S^T = H_loss.
    f: (M, C) -> (M, C, C). (curvlinops/kfac_utils.py:15-143)."""
    M, C = f.shape
    if likelihood == REGRESSION:
        return jnp.tile(jnp.sqrt(2.0) * jnp.eye(C, dtype=f.dtype), (M, 1, 1))
    p = jax.nn.softmax(f, axis=-1)
    # sqrt(p) as exp(log_softmax / 2): sqrt'(0) is infinite, so once a logit
    # saturates (p underflows to exactly 0 in f32) differentiating the naive
    # jnp.sqrt(softmax(f)) w.r.t. f — which the marglik hyperstep does,
    # through the TYPE2 KFAC factors — yields inf * 0 = NaN and poisons the
    # adjacency. The log-space form underflows gracefully (d exp(x/2) -> 0)
    # and is bit-comparable elsewhere. (The torch reference has the same
    # hazard in curvlinops/kfac.py:637-661; this formulation removes it.)
    sp = jnp.exp(0.5 * jax.nn.log_softmax(f, axis=-1))
    return jax.vmap(lambda pi, si: jnp.diag(si) - jnp.outer(pi, si))(p, sp)


def sample_labels(key, likelihood: str, f: jnp.ndarray) -> jnp.ndarray:
    """Sample would-be labels from the model's predictive (MC Fisher,
    curvlinops/kfac.py:698-746 / fisher.py:263)."""
    if likelihood == REGRESSION:
        # y ~ N(f, 1/2) so that grad of sum-MSE has covariance = GGN middle 2I
        return f + jax.random.normal(key, f.shape, f.dtype) / jnp.sqrt(2.0)
    p = jax.nn.softmax(f, axis=-1)
    return jax.random.categorical(key, jnp.log(p + 1e-32), axis=-1)
