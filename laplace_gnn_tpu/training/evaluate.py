"""Predictive-quality evaluation: accuracy / NLL / ECE / Brier.

The benchmark plan (BASELINE.md) requires node-classification accuracy, NLL
and ECE for quality parity; the reference computes accuracy/loss inline
(gnn/marglik_training.py:332-353) and uses torchmetrics in the library
validate loop (laplace/utils/utils.py:40-101). This module provides both
views: MAP and Bayesian predictives, all four metrics.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..utils.metrics import (accuracy, brier_score,
                             expected_calibration_error, nll_loss)


def evaluate_map(model, params, indices, labels) -> dict:
    """Metrics of the softmax MAP predictive."""
    import jax
    f = model.apply(params, jnp.asarray(indices))
    probs = np.asarray(jax.nn.softmax(f, axis=-1))
    return _metrics(probs, np.asarray(labels))


def evaluate_predictive(la, indices, labels, pred_type: str = "glm",
                        link_approx: str = "probit",
                        n_samples: int = 100) -> dict:
    """Metrics of the Bayesian posterior predictive of a fitted Laplace."""
    p = la(jnp.asarray(indices), pred_type=pred_type,
           link_approx=link_approx, n_samples=n_samples)
    if isinstance(p, tuple):
        raise ValueError("evaluate_predictive expects a classification "
                         "posterior predictive.")
    return _metrics(np.asarray(p), np.asarray(labels))


def validate(la, loader, pred_type: str = "glm",
             link_approx: str = "probit", n_samples: int = 100) -> dict:
    """Batched predictive evaluation over a loader
    (laplace/utils/utils.py:40-101 analog)."""
    probs, targets = [], []
    for X, y in loader:
        p = la(X, pred_type=pred_type, link_approx=link_approx,
               n_samples=n_samples)
        if isinstance(p, tuple):
            p = p[0]
        probs.append(np.asarray(p))
        targets.append(np.asarray(y))
    return _metrics(np.concatenate(probs), np.concatenate(targets))


def _metrics(probs: np.ndarray, labels: np.ndarray) -> dict:
    return {
        "acc": accuracy(probs, labels),
        "nll": nll_loss(probs, labels),
        "ece": expected_calibration_error(probs, labels),
        "brier": brier_score(probs, labels),
    }
