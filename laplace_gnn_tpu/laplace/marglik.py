"""Online marginal-likelihood training (Immer et al. 2021).

TPU-native counterpart of reference ``laplace/marglik_training.py:34-358``:
jointly train the network weights (SGD/Adam on the regularized loss) and the
hyperparameters {log prior precision, log sigma noise} (Adam on the negative
log marginal likelihood of a freshly fit Laplace approximation every
``marglik_frequency`` epochs), keeping the best-marglik snapshot.
"""

from __future__ import annotations

import copy
import logging
from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..curvature.losses import get_loss_fn, likelihood_factor
from ..utils.data import dataset_size
from ..utils.pytree import merge_split, posterior_mask, split_by_mask
from .dispatch import Laplace
from .enums import Likelihood, PriorStructure

logger = logging.getLogger(__name__)


def marglik_training(model, params, train_loader,
                     likelihood: str = Likelihood.CLASSIFICATION.value,
                     hessian_structure: str = "kron",
                     backend=None,
                     optimizer: str = "adam",
                     optimizer_kwargs: Optional[dict] = None,
                     scheduler=None,
                     n_epochs: int = 300,
                     lr_hyp: float = 1e-1,
                     prior_structure: str = PriorStructure.LAYERWISE.value,
                     n_epochs_burnin: int = 0,
                     n_hypersteps: int = 10,
                     marglik_frequency: int = 1,
                     prior_prec_init: float = 1.0,
                     sigma_noise_init: float = 1.0,
                     temperature: float = 1.0,
                     fix_sigma_noise: bool = False,
                     enable_backprop: bool = False,
                     dict_key_x: str = "input_ids",
                     dict_key_y: str = "labels",
                     seed: int = 0,
                     progress_bar: bool = False):
    """Returns (la, params, margliks, losses) — the fitted Laplace on the
    best-marglik weights, the weights, and the traces
    (reference laplace/marglik_training.py:34-358)."""
    from collections.abc import MutableMapping
    loss_fn = get_loss_fn(likelihood)
    factor = likelihood_factor(likelihood)
    N = dataset_size(train_loader, dict_key_y=dict_key_y)

    def unpack(data):
        # HF-style dict batches (reference marglik_training.py:227)
        if isinstance(data, MutableMapping):
            return data, data[dict_key_y]
        return data

    mask = posterior_mask(params)
    w0, frozen = split_by_mask(params, mask)
    n_layers = len(jax.tree_util.tree_leaves(w0))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(w0))

    # hyperparameters: log prior precision (+ log sigma for regression)
    hyper_n = {PriorStructure.SCALAR.value: 1,
               PriorStructure.LAYERWISE.value: n_layers,
               PriorStructure.DIAG.value: n_params}[prior_structure]
    log_prior_prec = jnp.full((hyper_n,), float(np.log(prior_prec_init)))
    log_sigma = jnp.asarray(float(np.log(sigma_noise_init)))

    opt_kwargs = dict(optimizer_kwargs or {})
    lr = opt_kwargs.pop("lr", 1e-3)
    # scheduler: an optax schedule (callable step -> lr) replaces the
    # reference's torch lr_scheduler (laplace/marglik_training.py:241-249)
    lr_or_schedule = scheduler if callable(scheduler) else lr
    if optimizer.lower() == "adam":
        opt = optax.adam(lr_or_schedule, **opt_kwargs)
    elif optimizer.lower() == "sgd":
        opt = optax.sgd(lr_or_schedule, **opt_kwargs)
    else:
        raise ValueError(f"Optimizer {optimizer} not supported.")
    opt_state = opt.init(w0)

    hyper_opt = optax.adam(lr_hyp)
    hyper_state = hyper_opt.init((log_prior_prec, log_sigma))

    def expand_prior(pp_log):
        pp = jnp.exp(pp_log)
        if pp.shape[0] == 1:
            return pp[0] * jnp.ones(n_params)
        if pp.shape[0] == n_params:
            return pp
        sizes = [int(np.prod(l.shape))
                 for l in jax.tree_util.tree_leaves(w0)]
        return jnp.concatenate([p * jnp.ones(s) for p, s in zip(pp, sizes)])

    crit_factor = temperature * (2 * factor)

    @jax.jit
    def train_step(w, opt_state, X, y, pp_log, sig_log):
        """Regularized loss step (reference :252): loss + 0.5 * (delta*theta)
        @ theta / N / crit_factor."""
        delta = expand_prior(pp_log)
        sigma2 = jnp.exp(2 * sig_log)

        def obj(w_):
            f = model.apply(merge_split(w_, frozen), X)
            if likelihood == Likelihood.REGRESSION.value:
                base = loss_fn(f, y) / (2 * sigma2) / y.shape[0]
            else:
                base = loss_fn(f, y) / y.shape[0]
            from ..utils.pytree import tree_vector
            theta = tree_vector(w_)
            reg = 0.5 * ((delta * theta) @ theta) / N / crit_factor
            return base + reg

        loss, g = jax.value_and_grad(obj)(w)
        updates, opt_state = opt.update(g, opt_state, w)
        return optax.apply_updates(w, updates), opt_state, loss

    w = w0
    best = {"marglik": np.inf, "w": w, "pp": jnp.exp(log_prior_prec),
            "sigma": jnp.exp(log_sigma)}
    margliks, losses = [], []

    for epoch in range(1, n_epochs + 1):
        epoch_loss = 0.0
        for data in train_loader:
            X, y = unpack(data)
            w, opt_state, l = train_step(w, opt_state, X, y, log_prior_prec,
                                         log_sigma)
            epoch_loss += float(l)
        losses.append(epoch_loss)

        if epoch < n_epochs_burnin or (epoch % marglik_frequency) != 0:
            continue

        # fit Laplace and take hypersteps (reference :274-311)
        sigma = (jnp.exp(log_sigma)
                 if likelihood == Likelihood.REGRESSION.value else 1.0)
        full_params = merge_split(w, frozen)
        la = Laplace(model, full_params, likelihood,
                     subset_of_weights="all",
                     hessian_structure=hessian_structure,
                     sigma_noise=sigma,
                     prior_precision=jnp.exp(log_prior_prec),
                     dict_key_x=dict_key_x, dict_key_y=dict_key_y,
                     temperature=temperature, backend=backend)
        la.fit(train_loader)
        for _ in range(n_hypersteps):
            def neg_marglik(h):
                pp_log, sig_log = h
                sig = (jnp.exp(sig_log)
                       if likelihood == Likelihood.REGRESSION.value
                       and not fix_sigma_noise else 1.0)
                return -la._pure_log_marglik(jnp.exp(pp_log), sig)

            val, g = jax.value_and_grad(neg_marglik)(
                (log_prior_prec, log_sigma))
            updates, hyper_state = hyper_opt.update(g, hyper_state)
            log_prior_prec, log_sigma = optax.apply_updates(
                (log_prior_prec, log_sigma), updates)
        marglik = float(-val)
        margliks.append(marglik)

        if -marglik < best["marglik"]:
            best = {"marglik": -marglik, "w": w,
                    "pp": jnp.exp(log_prior_prec),
                    "sigma": jnp.exp(log_sigma)}
            if progress_bar:
                logger.info(f"MARGLIK[epoch={epoch}]: marglik optimization. "
                            f"MargLik={-marglik:.2f}. Saving new best model.")

    # final: refit Laplace at best weights (reference :344-357)
    sigma = (best["sigma"]
             if likelihood == Likelihood.REGRESSION.value else 1.0)
    full_params = merge_split(best["w"], frozen)
    la = Laplace(model, full_params, likelihood,
                 subset_of_weights="all", hessian_structure=hessian_structure,
                 sigma_noise=sigma, prior_precision=best["pp"],
                 dict_key_x=dict_key_x, dict_key_y=dict_key_y,
                 temperature=temperature, backend=backend)
    la.fit(train_loader)
    return la, full_params, margliks, losses
