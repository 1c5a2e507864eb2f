"""Graph-structure-learning marglik training (the flagship workload).

TPU-native counterpart of reference ``gnn/marglik_training.py:42-353``
(marglik_optimization): Adam on weights excluding 'adj' (reference :91-93),
SGD(+momentum) on the adjacency (:102-104), burn-in, then every
``marglik_frequency`` epochs ``n_hypersteps`` updates of the adjacency on
the negative log marginal likelihood of a freshly fit KFAC Laplace
(:194-224), with marglik- and valloss-based early stopping (PATIENCE=20,
:279-303).

TPU-first design: where the reference's hyperstep is fit-hooks + retained
autograd graphs + backward, here the *entire hyperstep* — KFAC factor
computation, eigendecomposition, marginal likelihood, gradient w.r.t. the
adjacency — is one jitted pure function ``neg_marglik_and_grad(params)``.
One compiled XLA program per hyperstep; factors never leave the device.
"""

from __future__ import annotations

import copy
import math as _math
import os
import pickle
import time
import warnings
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..curvature.interface import GGNBackend
from ..curvature.losses import cross_entropy_sum
from ..graph.data import adj_to_edge_index
from ..ops.linalg import batched_eigvalsh
from ..graph.homophily import avg_local_homophilies, global_homophily
from ..laplace.dispatch import Laplace
from ..utils.data import ArrayLoader
from ..utils.pytree import path_mask

PATIENCE = 20

NO_ADJ_UPDATE_MODELS = ("gcn", "gat", "graphsage")
ADJ_PARAM_FILTERS = {
    # which params the adjacency optimizer updates, per model type
    "lorastegcn": lambda p: p.startswith("adj_lora"),
    "default": lambda p: p == "adj",
}




def make_neg_marglik_fn(model, likelihood: str, hessian_structure: str,
                        subset_of_weights: str, N: int,
                        prior_precision: float = 1.0,
                        temperature: float = 1.0,
                        sigma_noise: float = 1.0,
                        cache_static_factors: bool = True,
                        fisher_type: str = "type-2",
                        column_chunk=None,
                        sketch_size: int = 8,
                        mc_samples: int = 1,
                        diag_probes=None,
                        probe_batch=None,
                        fisher_seed: int = 0) -> Callable:
    """Pure differentiable -log marglik of a freshly fit Laplace
    approximation, as a function of the *full* parameter pytree (gradients
    flow into params['adj'] through the KFAC factors).

    TPU optimization (``cache_static_factors``): for GCN-style models the
    first dense layer's KFAC input covariance is A0 = X^T X / N — constant in
    every parameter. Its eigendecomposition (the single most expensive op in
    the hyperstep: eigh of a d_in x d_in matrix, d_in = 1433 on Cora) is
    computed once here and only its eigenvalues enter the traced marglik.
    Measured on TPU v5e this cuts the hyperstep from ~61 ms to the cost of
    the small-factor eigh (see bench.py)."""
    # Models with non-Linear posterior parameters (GAT attention vectors)
    # run mixed-structure KFAC: Kron blocks for the Linear sites + exact
    # curvature-diagonal blocks for the rest (the reference crashes on this
    # combination, curvlinops/kfac.py:130).
    # Curvature products run on forward-mode jvp, which cannot trace
    # through the flash kernel's custom_vjp — swap any flash-attention
    # convs to the mathematically identical XLA chunked path here
    model = model.jvp_safe() if hasattr(model, "jvp_safe") else model
    # H_factor = 1/sigma^2/temperature, exactly as BaseLaplace._H_factor
    # (laplace/base.py; reference laplace/baselaplace.py:566-568) — so the
    # fused value below is pinned equal to
    # Laplace(...).log_marginal_likelihood() by
    # tests/test_marglik_equivalence.py.
    H_factor = 1.0 / (sigma_noise ** 2) / temperature

    # Precompute the constant input-covariance eigenvalues where valid: the
    # first tap of a BaseGNN whose first conv consumes raw X (GCNConv).
    static_A_eigvals: dict = {}
    if (cache_static_factors and hessian_structure == "kron"
            and getattr(model, "first_tap_static", False)
            and subset_of_weights == "all"):
        from ..curvature.losses import likelihood_factor as _lf
        Xfull = model.X
        A0 = (Xfull.T @ Xfull) / N
        lam, _ = jnp.linalg.eigh(A0)
        site0 = model.tap_sites(None)[0]["name"]
        # the backend returns `kron * factor`, which scales a len-2 group's
        # A by sqrt(factor) (laplace/kron.py:80-87) — bake that in so the
        # cache is exact for regression (factor 0.5) too
        static_A_eigvals[site0] = jnp.clip(lam, min=0.0) * jnp.sqrt(
            _lf(likelihood))

    def _kron_logdet(kron, group_sites, prior_prec):
        """log det (H_factor * (B (x) A) + delta I) per block, using cached
        eigenvalues for constant A factors. Matches
        KronDecomposed.logdet (laplace/utils/matrix.py:371-394) with the
        Kron * H_factor eigenvalue-scaling convention.

        All small factor eigendecompositions run in ONE batched eigvalsh
        (ops/linalg.py::batched_eigvalsh): XLA's TPU eigh is latency-bound,
        so per-factor calls serialize ~120 us each while the batch costs one.
        Factors shared between groups (a layer's B reused by its weight and
        bias blocks) are deduplicated by object identity."""
        sqrt_f = jnp.sqrt(H_factor)
        # pass 1: unique dense factors that need an eigendecomposition.
        # Dedup is semantic — a site's weight and bias groups share the same
        # B matrix, but after `kron * factor` they are distinct (equal)
        # tensors, so the key is (site, role), not object identity. The
        # equality only holds when the likelihood factor is 1.0: Kron.__mul__
        # scales len-1 groups by factor but len-2 groups by sqrt(factor)
        # (laplace/kron.py:80-87), so for regression (factor 0.5) the
        # group length enters the key and the two Bs decompose separately.
        from ..curvature.losses import likelihood_factor
        shared_b = likelihood_factor(likelihood) == 1.0
        tasks, task_idx = [], {}

        def _task_key(site_name, role, f, glen):
            if site_name is None:
                return id(f)
            return (site_name, role) if shared_b else (site_name, role, glen)

        def _add_task(site_name, role, f, glen):
            k = _task_key(site_name, role, f, glen)
            if k not in task_idx:
                task_idx[k] = len(tasks)
                tasks.append(f)

        for group, site_name in zip(kron.kfacs, group_sites):
            if len(group) == 1:
                if group[0].ndim != 1:
                    _add_task(site_name, "B", group[0], 1)
            else:
                _add_task(site_name, "B", group[0], 2)
                if site_name not in static_A_eigvals:
                    _add_task(site_name, "A", group[1], 2)
        eigs = batched_eigvalsh(tasks)

        def lam_of(site_name, role, f, glen):
            return jnp.clip(
                eigs[task_idx[_task_key(site_name, role, f, glen)]],
                min=0.0)

        out = 0.0
        for group, site_name in zip(kron.kfacs, group_sites):
            if len(group) == 1:
                if group[0].ndim == 1:   # mixed-structure exact-diag block
                    lb = jnp.clip(group[0], min=0.0)
                else:
                    lb = lam_of(site_name, "B", group[0], 1)
                out = out + jnp.sum(jnp.log(H_factor * lb + prior_prec))
            else:
                B, A = group
                lb = lam_of(site_name, "B", B, 2)
                if site_name in static_A_eigvals:
                    la = static_A_eigvals[site_name]
                else:
                    la = lam_of(site_name, "A", A, 2)
                out = out + jnp.sum(jnp.log(
                    jnp.outer(sqrt_f * lb, sqrt_f * la) + prior_prec))
        return out

    def _group_sites(backend):
        """Owning tap-site name per Kron block (posterior-leaf order);
        None for mixed-structure exact-diag blocks (no dense site)."""
        from ..curvature.kfac import _owning_site, _posterior_sites
        from ..utils.pytree import named_leaves
        sites, _ = _posterior_sites(model, backend.params, backend.exclude,
                                    backend.last_layer,
                                    allow_incomplete=True)
        by_prefix = {tuple(s["param_path"]): s for s in sites}
        out = []
        for name, leaf in named_leaves(backend.w):
            if leaf is None:
                continue
            site = _owning_site(name, by_prefix, sites, strict=False)
            out.append(site["name"] if site is not None else None)
        return out

    def fn(params, X, y):
        backend = GGNBackend(model, params, likelihood,
                             last_layer=(subset_of_weights == "last_layer"))
        if hessian_structure == "kron":
            loss, H = backend.kron(X, y, N=N, fisher_type=fisher_type,
                                   column_chunk=column_chunk,
                                   sketch_size=sketch_size,
                                   mc_samples=mc_samples,
                                   diag_probes=diag_probes,
                                   probe_batch=probe_batch,
                                   seed=fisher_seed)
        else:
            closure = {"diag": backend.diag,
                       "full": backend.full}[hessian_structure]
            loss, H = closure(X, y, N=N)
        loglik = -H_factor * loss
        if likelihood == "regression":
            # Gaussian normalization constant (BaseLaplace.log_likelihood;
            # reference laplace/baselaplace.py:211-232) — constant in the
            # adjacency, but kept so the fused value equals the class path
            n_outputs = y.shape[-1] if y.ndim > 1 else 1
            loglik = loglik - N * n_outputs * _math.log(
                sigma_noise * _math.sqrt(2 * _math.pi))

        n_params = backend.n_params
        prior_diag = prior_precision * jnp.ones(n_params)
        logdet_prior = jnp.sum(jnp.log(prior_diag))
        theta = backend.mean_vector()
        scatter = jnp.sum(theta ** 2 * prior_diag)

        if hessian_structure == "kron":
            logdet_post = _kron_logdet(H, _group_sites(backend),
                                       jnp.asarray(prior_precision))
        elif hessian_structure == "diag":
            logdet_post = jnp.sum(jnp.log(H_factor * H + prior_diag))
        else:
            logdet_post = jnp.linalg.slogdet(
                H_factor * H + jnp.diag(prior_diag))[1]

        marglik = loglik - 0.5 * (logdet_post - logdet_prior + scatter)
        return -marglik

    return fn


# ---------------------------------------------------------------------------
# Jitted-program cache: grid searches re-run the same training configuration
# over many splits/repeats; rebuilding jax.jit closures per call re-pays the
# full Python trace + lowering (~2 s for the scan program — 7x the actual
# device time of a 200-epoch Cora-sized run). Programs are cached on the
# model keyed by the static config, with the data (indices/labels) as traced
# ARGUMENTS so every same-shape split reuses one executable.
# ---------------------------------------------------------------------------

def _model_program_cache(model) -> dict:
    return model.__dict__.setdefault("_jit_program_cache", {})


def _zero_masked_out(g, mask):
    """optax.masked passes masked-out updates through unchanged, so the raw
    gradients must be zeroed for parameters a given optimizer does not own."""
    return jax.tree_util.tree_map(
        lambda gr, m: gr if m else jnp.zeros_like(gr), g, mask)


def _ce_mean(f, yy):
    return cross_entropy_sum(f, yy) / yy.shape[0]


def _static_key(*parts):
    """Hashable cache key, or None when a part is unhashable (e.g. an array
    prior precision) — then the caller builds uncached."""
    try:
        hash(parts)
        return parts
    except TypeError:
        return None


def _build_training_programs(model, params, *, lr, weight_decay, lr_adj,
                             weight_decay_adj, momentum_adj, grad_norm,
                             hessian_structure, subset_of_weights,
                             prior_precision, N, model_type,
                             fisher_type="type-2", sketch_size=8,
                             column_chunk=None, mc_samples=1,
                             diag_probes=None, probe_batch=None,
                             fisher_seed=0):
    """Optimizers + the four jitted programs of the eager marglik loop."""
    # PATIENCE and the params tree structure are baked into the compiled
    # closures (masks are built from this params pytree), so both belong in
    # the cache key: a monkeypatched PATIENCE or a structurally different
    # params tree must not reuse a stale executable.
    key = _static_key("eager", lr, weight_decay, lr_adj, weight_decay_adj,
                      momentum_adj, grad_norm, hessian_structure,
                      subset_of_weights, prior_precision, N, model_type,
                      fisher_type, sketch_size, column_chunk, mc_samples,
                      diag_probes, probe_batch, fisher_seed,
                      PATIENCE, jax.tree_util.tree_structure(params))
    cache = _model_program_cache(model)
    if key is not None and key in cache:
        return cache[key]

    adj_filter = ADJ_PARAM_FILTERS.get(model_type,
                                       ADJ_PARAM_FILTERS["default"])
    weight_mask = path_mask(params, lambda p: "adj" not in p)
    adj_mask = path_mask(params, adj_filter)
    weight_opt = optax.masked(
        optax.chain(optax.add_decayed_weights(weight_decay),
                    optax.adam(lr)), weight_mask)
    adj_opt = optax.masked(
        optax.chain(optax.add_decayed_weights(weight_decay_adj),
                    optax.sgd(lr_adj, momentum=momentum_adj or None)),
        adj_mask)
    neg_marglik_fn = make_neg_marglik_fn(
        model, "classification", hessian_structure, subset_of_weights, N,
        prior_precision, fisher_type=fisher_type, sketch_size=sketch_size,
        column_chunk=column_chunk, mc_samples=mc_samples,
        diag_probes=diag_probes, probe_batch=probe_batch,
        fisher_seed=fisher_seed)

    @jax.jit
    def train_step(params, opt_state, idx, yy, rng):
        # train mode: dropout active, exactly like the reference's epoch
        # loop (model.train(), gnn/marglik_training.py:166-170); Laplace
        # fits and marglik evaluations below stay in eval mode
        def obj(p):
            f = model.apply(p, idx, rng=rng, train=True)
            return _ce_mean(f, yy), f

        (loss, f), g = jax.value_and_grad(obj, has_aux=True)(params)
        g = _zero_masked_out(g, weight_mask)
        updates, opt_state = weight_opt.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(f, axis=1) == yy)
        return new_params, opt_state, loss, acc

    @jax.jit
    def hyperstep(params, adj_state, idx, yy):
        nm, g = jax.value_and_grad(neg_marglik_fn)(params, idx, yy)
        if grad_norm:
            gnorm = jnp.sqrt(jnp.sum(g["adj"] ** 2))
            scale = jnp.minimum(1.0, 1.0 / jnp.maximum(gnorm, 1e-12))
            g = dict(g, adj=g["adj"] * scale)
        g = _zero_masked_out(g, adj_mask)
        updates, adj_state = adj_opt.update(g, adj_state, params)
        return optax.apply_updates(params, updates), adj_state, nm

    neg_marglik_eval = jax.jit(neg_marglik_fn)

    @jax.jit
    def val_metrics(params, vidx, vy):
        f = model.apply(params, vidx)
        return (_ce_mean(f, vy), jnp.mean(jnp.argmax(f, axis=1) == vy))

    # fused per-epoch tracking: ONE device->host fetch per epoch instead of
    # four (each fetch costs ~28 ms on tunneled TPU backends, see bench.py)
    @jax.jit
    def epoch_metrics(params, loss, idx, yy, vidx, vy):
        nm = neg_marglik_fn(params, idx, yy)
        f = model.apply(params, vidx)
        return jnp.stack([loss, nm, _ce_mean(f, vy),
                          jnp.mean(jnp.argmax(f, axis=1) == vy)])

    @jax.jit
    def epoch_metrics_noval(params, loss, idx, yy):
        return jnp.stack([loss, neg_marglik_fn(params, idx, yy)])

    progs = {"weight_opt": weight_opt, "adj_opt": adj_opt,
             "train_step": train_step, "hyperstep": hyperstep,
             "neg_marglik_eval": neg_marglik_eval,
             "val_metrics": val_metrics,
             "epoch_metrics": epoch_metrics,
             "epoch_metrics_noval": epoch_metrics_noval}
    if key is not None:
        cache[key] = progs
    return progs


def marglik_optimization(model, params,
                         train_indices, train_labels,
                         val_indices=None, val_labels=None,
                         y=None,
                         stop_criterion: str = "marglik",
                         lr: float = 0.01,
                         lr_adj: float = 0.1,
                         weight_decay: float = 0.5,
                         weight_decay_adj: float = 0.0,
                         momentum_adj: float = 0.0,
                         n_epochs: int = 100,
                         n_hypersteps: int = 20,
                         n_epochs_burnin: int = 40,
                         n_hyper_stop: Optional[int] = None,
                         marglik_frequency: int = 20,
                         subset_of_weights: str = "all",
                         hessian_structure: str = "kron",
                         prior_precision: float = 1.0,
                         grad_norm: bool = False,
                         early_stop: bool = False,
                         model_type: str = "stegcn",
                         fisher_type: str = "type-2",
                         sketch_size: int = 8,
                         column_chunk: Optional[int] = None,
                         mc_samples: int = 1,
                         diag_probes: Optional[int] = None,
                         probe_batch: Optional[int] = None,
                         fisher_seed: int = 0,
                         learned_graphs_dir: Optional[str] = None,
                         verbose: bool = True,
                         log_every: int = 20):
    """Returns (results, params_dict, losses, val_losses, neg_margliks) where
    results mirrors the reference's
    {'marglik': {'params', 'epoch'}, 'valloss': {'params', 'epoch'}}."""
    if stop_criterion == "valloss" and val_indices is None:
        raise ValueError("Validation mask is required for val loss stopping "
                         "criterion")
    if "adj" not in params:
        raise ValueError("Expected 'adj' in model parameters")
    if learned_graphs_dir is not None:
        os.makedirs(learned_graphs_dir, exist_ok=True)

    train_indices = jnp.asarray(train_indices)
    train_labels = jnp.asarray(train_labels)
    if val_indices is not None:
        val_indices = jnp.asarray(val_indices)
        val_labels = jnp.asarray(val_labels)
    y_np = np.asarray(y) if y is not None else None

    no_adj_update = model_type in NO_ADJ_UPDATE_MODELS
    n_hyper_stop = n_hyper_stop if n_hyper_stop is not None else n_epochs
    N = int(train_labels.shape[0])

    # --- optimizers + jitted programs (cached per model x config) ----------
    progs = _build_training_programs(
        model, params, lr=lr, weight_decay=weight_decay, lr_adj=lr_adj,
        weight_decay_adj=weight_decay_adj, momentum_adj=momentum_adj,
        grad_norm=grad_norm, hessian_structure=hessian_structure,
        subset_of_weights=subset_of_weights, prior_precision=prior_precision,
        N=N, model_type=model_type, fisher_type=fisher_type,
        sketch_size=sketch_size, column_chunk=column_chunk,
        mc_samples=mc_samples, diag_probes=diag_probes,
        probe_batch=probe_batch, fisher_seed=fisher_seed)
    train_step = progs["train_step"]
    hyperstep = progs["hyperstep"]
    neg_marglik_eval = progs["neg_marglik_eval"]
    val_metrics = progs["val_metrics"]
    weight_state = progs["weight_opt"].init(params)
    adj_state = progs["adj_opt"].init(params)

    # --- analysis helpers (reference :137-149) -----------------------------
    eval_indices = None
    if y_np is not None:
        all_idx = np.arange(len(y_np))
        eval_indices = np.setdiff1d(all_idx, np.asarray(train_indices))

    def print_graph_stats(params):
        if not verbose or y_np is None:
            return
        _adj = np.asarray(model.full_adj(params))
        gh, trh, evh = avg_local_homophilies(
            _adj, np.asarray(train_indices), eval_indices, y_np)
        print(f"Homophily global, local train, local eval:"
              f"{gh:.3f}, {trh:.3f}, {evh:.3f}")
        tr = np.asarray(train_indices)
        print(f"Num edges: {_adj.sum()} "
              f"(train {_adj[tr, :].sum()}, eval {_adj[eval_indices, :].sum()})")

    print_graph_stats(params)

    losses, val_losses, neg_margliks = [], [], []
    best_neg_marglik, best_valloss = np.inf, np.inf
    best_marglik_params, best_valloss_params = None, None
    best_marglik_epoch = best_valloss_epoch = 0
    marglik_patience = val_patience = 0
    rng = jax.random.PRNGKey(0)

    for epoch in range(1, n_epochs + 1):
        rng, sub = jax.random.split(rng)
        params, weight_state, loss, acc = train_step(params, weight_state,
                                                     train_indices,
                                                     train_labels, sub)

        # --- adjacency hypersteps (reference :194-224) ---------------------
        if (epoch < n_hyper_stop and not no_adj_update
                and (epoch % marglik_frequency) == 0
                and epoch >= n_epochs_burnin):
            for _ in range(n_hypersteps):
                params, adj_state, nm = hyperstep(params, adj_state,
                                                  train_indices, train_labels)
            if learned_graphs_dir is not None:
                _adj = np.asarray(model.full_adj(params))
                edge_index = adj_to_edge_index(_adj)
                h = global_homophily(_adj, y_np) if y_np is not None else None
                with open(os.path.join(learned_graphs_dir,
                                       f"epoch_{epoch}.pkl"), "wb") as f:
                    pickle.dump({"edge_index": edge_index,
                                 "marglik": -float(nm),
                                 "num_edges": float(_adj.sum()),
                                 "homophily": h, "epoch": epoch}, f)
                np.save(os.path.join(learned_graphs_dir, "latest_adj.npy"),
                        _adj)
            print_graph_stats(params)

        # --- per-epoch marglik + valloss tracking (reference :261-303),
        # fused into ONE device->host fetch -------------------------------
        if val_indices is not None:
            m = np.asarray(progs["epoch_metrics"](
                params, loss, train_indices, train_labels,
                val_indices, val_labels))
            loss_f, nm, vl, va = (float(m[0]), float(m[1]),
                                  float(m[2]), float(m[3]))
            val_losses.append(vl)
        else:
            m = np.asarray(progs["epoch_metrics_noval"](
                params, loss, train_indices, train_labels))
            loss_f, nm = float(m[0]), float(m[1])
            vl = va = np.nan
        losses.append(loss_f)
        neg_margliks.append(nm)

        if ("ste" not in model_type) or epoch > n_epochs_burnin:
            if not early_stop or marglik_patience < PATIENCE:
                if nm < best_neg_marglik:
                    best_neg_marglik = nm
                    best_marglik_params = jax.tree_util.tree_map(
                        lambda x: x, params)
                    best_marglik_epoch = epoch
                    marglik_patience = 0
                else:
                    marglik_patience += 1
            if val_indices is not None and (not early_stop
                                            or val_patience < PATIENCE):
                if vl < best_valloss:
                    best_valloss = vl
                    best_valloss_params = jax.tree_util.tree_map(
                        lambda x: x, params)
                    best_valloss_epoch = epoch
                    val_patience = 0
                else:
                    val_patience += 1
            if early_stop and marglik_patience == PATIENCE:
                if verbose:
                    print("Early stopping on marginal likelihood. No more "
                          "graph update.")
                no_adj_update = True
                marglik_patience += 1

        if verbose and epoch % log_every == 0:
            print(f"Epoch {epoch}: Loss={loss_f:.3f}, "
                  f"Perf={float(acc):.3f}, Marglik={-nm:.3}, "
                  f"Val Loss={vl:.3f}, Val Acc={va:.3f}")

    results = {
        "marglik": {"params": best_marglik_params,
                    "epoch": best_marglik_epoch},
        "valloss": {"params": best_valloss_params,
                    "epoch": best_valloss_epoch},
    }
    return results, params, losses, val_losses, neg_margliks


# ---------------------------------------------------------------------------
# Evaluation (reference gnn/marglik_training.py:332-353)
# ---------------------------------------------------------------------------

def mean_eval(model, params, indices, labels):
    """MAP loss/accuracy (reference mean_eval :332-339)."""
    f = model.apply(params, jnp.asarray(indices))
    labels = jnp.asarray(labels)
    loss = float(cross_entropy_sum(f, labels) / labels.shape[0])
    acc = float(jnp.mean(jnp.argmax(f, axis=1) == labels)) * 100
    return loss, acc


def mc_eval(la, indices, labels, pred_type: str = "nn", n_samples: int = 100,
            diagonal_output: bool = False):
    """Bayesian predictive loss/accuracy (reference mc_eval :342-353)."""
    p = la(jnp.asarray(indices), pred_type=pred_type, link_approx="mc",
           n_samples=n_samples, diagonal_output=diagonal_output)
    labels = np.asarray(labels)
    logp = np.log(np.clip(np.asarray(p), 1e-12, None))
    loss = float(-np.mean(logp[np.arange(len(labels)), labels]))
    acc = float(np.mean(np.argmax(np.asarray(p), axis=1) == labels)) * 100
    return loss, acc


def fit_laplace(model, params, train_indices, train_labels,
                subset_of_weights: str = "all",
                hessian_structure: str = "kron", **kwargs):
    """Fresh Laplace fit on the training nodes (reference :197-201).

    Models with non-Linear posterior parameters (GAT attention vectors)
    use mixed-structure KFAC under ``hessian_structure='kron'``: Kron
    blocks for the Linear sites + exact curvature-diagonal blocks for the
    attention vectors/biases (the reference crashes on this combination,
    curvlinops/kfac.py:130 — and only after the training epochs have been
    paid for)."""
    la = Laplace(model, params, "classification",
                 subset_of_weights=subset_of_weights,
                 hessian_structure=hessian_structure, **kwargs)
    la.fit(ArrayLoader(jnp.asarray(train_indices), jnp.asarray(train_labels)))
    return la


def marglik_optimization_scan(model, params,
                              train_indices, train_labels,
                              val_indices, val_labels,
                              lr: float = 0.01,
                              lr_adj: float = 0.1,
                              weight_decay: float = 0.5,
                              weight_decay_adj: float = 0.0,
                              momentum_adj: float = 0.0,
                              n_epochs: int = 100,
                              n_hypersteps: int = 20,
                              n_epochs_burnin: int = 40,
                              n_hyper_stop: Optional[int] = None,
                              marglik_frequency: int = 20,
                              subset_of_weights: str = "all",
                              hessian_structure: str = "kron",
                              prior_precision: float = 1.0,
                              grad_norm: bool = False,
                              early_stop: bool = False,
                              model_type: str = "stegcn",
                              fisher_type: str = "type-2",
                              sketch_size: int = 8,
                              column_chunk: Optional[int] = None,
                              mc_samples: int = 1,
                              diag_probes: Optional[int] = None,
                              probe_batch: Optional[int] = None,
                              fisher_seed: int = 0,
                              learned_graphs_dir: Optional[str] = None,
                              y=None):
    """TPU-throughput variant of :func:`marglik_optimization`: the ENTIRE
    training run — every epoch, every hyperstep, best-model tracking for
    both stop criteria — executes inside one jitted ``lax.fori_loop``.
    Nothing crosses the device boundary until training finishes (on
    tunneled TPU backends a single device->host fetch permanently degrades
    dispatch latency ~300x; see bench.py).

    ``early_stop=True`` implements the reference's PATIENCE-based dual
    criterion (gnn/marglik_training.py:279-303) on-device: best tracking
    freezes once a criterion's patience is exhausted, and exhausting the
    marglik patience halts further adjacency hypersteps (the lax.fori_loop
    keeps running weight epochs, exactly like the eager loop, which also
    only sets ``no_adj_update`` rather than breaking). Returns
    (results, final_params, losses, val_losses, neg_margliks) with traces
    as numpy arrays.

    ``learned_graphs_dir`` opts into per-hyper-phase learned-graph
    snapshots, the scan analog of the eager loop's ``epoch_*.pkl`` dumps
    (reference gnn/marglik_training.py:244-253): the binarized adjacency of
    each hyper phase is captured ON DEVICE into a preallocated
    (n_phases, N, N) bool buffer (1 byte/entry; the where-select costs ~one
    epoch's tracking), nothing crosses the host boundary until training
    finishes, and the pkl files (edge_index/marglik/num_edges/homophily/
    epoch) are written afterwards — so ``graph.plots.get_learned_graphs``
    and the learned-graph evolution figures work identically on scan runs.
    Pass ``y`` (full labels) to include homophily in the snapshots.
    """
    train_indices = jnp.asarray(train_indices)
    train_labels = jnp.asarray(train_labels)
    val_indices = jnp.asarray(val_indices)
    val_labels = jnp.asarray(val_labels)
    N = int(train_labels.shape[0])
    snapshots = learned_graphs_dir is not None

    run = _build_scan_run(
        model, params, lr=lr, lr_adj=lr_adj, weight_decay=weight_decay,
        weight_decay_adj=weight_decay_adj, momentum_adj=momentum_adj,
        n_epochs=n_epochs, n_hypersteps=n_hypersteps,
        n_epochs_burnin=n_epochs_burnin, n_hyper_stop=n_hyper_stop,
        marglik_frequency=marglik_frequency,
        subset_of_weights=subset_of_weights,
        hessian_structure=hessian_structure,
        prior_precision=prior_precision, grad_norm=grad_norm,
        early_stop=early_stop, model_type=model_type, N=N,
        fisher_type=fisher_type, sketch_size=sketch_size,
        column_chunk=column_chunk, mc_samples=mc_samples,
        diag_probes=diag_probes, probe_batch=probe_batch,
        fisher_seed=fisher_seed, snapshots=snapshots)

    params_final, traces, best, snaps = run(
        params, train_indices, train_labels, val_indices, val_labels)
    jax.block_until_ready(params_final)

    if snapshots:
        _write_scan_snapshots(model, learned_graphs_dir, snaps, traces,
                              params_final, y)

    results = {
        "marglik": {"params": best["nm_params"],
                    "epoch": int(best["nm_epoch"])},
        "valloss": {"params": best["vl_params"],
                    "epoch": int(best["vl_epoch"])},
    }
    return (results, params_final, np.asarray(traces["loss"]),
            np.asarray(traces["val_loss"]),
            np.asarray(traces["neg_marglik"]))


def _write_scan_snapshots(model, learned_graphs_dir, snaps, traces,
                          params_final, y):
    """Host-side pkl dump of the on-device hyper-phase snapshots — same
    file schema as the eager loop (edge_index/marglik/num_edges/homophily/
    epoch + latest_adj.npy), so graph.plots consumes both."""
    os.makedirs(learned_graphs_dir, exist_ok=True)
    count = int(snaps["count"])
    adjs = np.asarray(snaps["adj"][:count])
    epochs = np.asarray(snaps["epoch"][:count])
    n_edges = np.asarray(snaps["num_edges"][:count])
    nm_trace = np.asarray(traces["neg_marglik"])
    y_np = np.asarray(y) if y is not None else None
    for k in range(count):
        adj = adjs[k].astype(np.float32)
        epoch = int(epochs[k])
        h = global_homophily(adj, y_np) if y_np is not None else None
        with open(os.path.join(learned_graphs_dir,
                               f"epoch_{epoch}.pkl"), "wb") as f:
            pickle.dump({"edge_index": adj_to_edge_index(adj),
                         "marglik": -float(nm_trace[epoch - 1]),
                         "num_edges": float(n_edges[k]),
                         "homophily": h, "epoch": epoch}, f)
    np.save(os.path.join(learned_graphs_dir, "latest_adj.npy"),
            np.asarray(model.full_adj(params_final)))


def _build_scan_run(model, params, *, lr, lr_adj, weight_decay,
                    weight_decay_adj, momentum_adj, n_epochs, n_hypersteps,
                    n_epochs_burnin, n_hyper_stop, marglik_frequency,
                    subset_of_weights, hessian_structure, prior_precision,
                    grad_norm, early_stop, model_type, N,
                    fisher_type="type-2", sketch_size=8, column_chunk=None,
                    mc_samples=1, diag_probes=None, probe_batch=None,
                    fisher_seed=0, snapshots=False):
    """The whole-training jitted program of
    :func:`marglik_optimization_scan`, cached per model x static config with
    the split data as traced arguments. Re-tracing this program costs ~2 s
    of host work — 7x the device time of a Cora-sized 200-epoch run — so
    grid searches over splits/repeats must reuse the executable."""
    n_hyper_stop = n_hyper_stop if n_hyper_stop is not None else n_epochs
    key = _static_key("scan", lr, lr_adj, weight_decay, weight_decay_adj,
                      momentum_adj, n_epochs, n_hypersteps, n_epochs_burnin,
                      n_hyper_stop, marglik_frequency, subset_of_weights,
                      hessian_structure, prior_precision, grad_norm,
                      early_stop, model_type, N, fisher_type, sketch_size,
                      column_chunk, mc_samples, diag_probes, probe_batch,
                      fisher_seed, snapshots,
                      PATIENCE, jax.tree_util.tree_structure(params))
    cache = _model_program_cache(model)
    if key is not None and key in cache:
        return cache[key]

    no_adj_update = model_type in NO_ADJ_UPDATE_MODELS
    is_ste = "ste" in model_type
    adj_filter = ADJ_PARAM_FILTERS.get(model_type,
                                       ADJ_PARAM_FILTERS["default"])
    weight_mask = path_mask(params, lambda p: "adj" not in p)
    adj_mask = path_mask(params, adj_filter)
    weight_opt = optax.masked(
        optax.chain(optax.add_decayed_weights(weight_decay),
                    optax.adam(lr)), weight_mask)
    adj_opt = optax.masked(
        optax.chain(optax.add_decayed_weights(weight_decay_adj),
                    optax.sgd(lr_adj, momentum=momentum_adj or None)),
        adj_mask)
    neg_marglik_fn = make_neg_marglik_fn(
        model, "classification", hessian_structure, subset_of_weights, N,
        prior_precision, fisher_type=fisher_type, sketch_size=sketch_size,
        column_chunk=column_chunk, mc_samples=mc_samples,
        diag_probes=diag_probes, probe_batch=probe_batch,
        fisher_seed=fisher_seed)

    def train_step(params, wstate, tr_idx, tr_y, rng):
        def obj(p):
            return _ce_mean(model.apply(p, tr_idx, rng=rng, train=True),
                            tr_y)

        loss, g = jax.value_and_grad(obj)(params)
        g = _zero_masked_out(g, weight_mask)
        updates, wstate = weight_opt.update(g, wstate, params)
        return optax.apply_updates(params, updates), wstate, loss

    def hyper_phase(params, astate, tr_idx, tr_y):
        def one(_, carry):
            params, astate = carry
            g = jax.grad(neg_marglik_fn)(params, tr_idx, tr_y)
            if grad_norm:
                gn = jnp.sqrt(jnp.sum(g["adj"] ** 2))
                scale = jnp.minimum(1.0, 1.0 / jnp.maximum(gn, 1e-12))
                g = dict(g, adj=g["adj"] * scale)
            g = _zero_masked_out(g, adj_mask)
            updates, astate = adj_opt.update(g, astate, params)
            return optax.apply_updates(params, updates), astate

        return jax.lax.fori_loop(0, n_hypersteps, one, (params, astate))

    # static snapshot capacity: hyper phases fire at statically-known epochs
    # (the early-stop halt can only make fewer fire — 'count' reports how
    # many actually did)
    n_snap = 0
    if snapshots and not no_adj_update:
        n_snap = sum(1 for e in range(1, n_epochs + 1)
                     if e < n_hyper_stop and e % marglik_frequency == 0
                     and e >= n_epochs_burnin)
    n_nodes = int(params["adj"].shape[0]) if "adj" in params else 0

    @jax.jit
    def run(params, tr_idx, tr_y, va_idx, va_y):
        wstate = weight_opt.init(params)
        astate = adj_opt.init(params)
        traces = {
            "loss": jnp.zeros(n_epochs),
            "val_loss": jnp.zeros(n_epochs),
            "neg_marglik": jnp.zeros(n_epochs),
        }
        snaps = {
            "adj": jnp.zeros((n_snap, n_nodes, n_nodes), bool),
            "epoch": jnp.zeros(n_snap, jnp.int32),
            "num_edges": jnp.zeros(n_snap),
            "count": jnp.asarray(0, jnp.int32),
        }
        best = {
            "nm": jnp.inf, "nm_epoch": jnp.asarray(0),
            "nm_params": params,
            "vl": jnp.inf, "vl_epoch": jnp.asarray(0),
            "vl_params": params,
            # PATIENCE early-stop state (reference :279-303); only consumed
            # when early_stop is compiled in
            "m_pat": jnp.asarray(0), "v_pat": jnp.asarray(0),
            "no_adj": jnp.asarray(False),
        }

        def epoch_body(i, carry):
            params, wstate, astate, rng, traces, best, snaps = carry
            epoch = i + 1
            # identical rng chain to the eager loop (split per epoch, use
            # the subkey) so trajectories match exactly under dropout
            rng, sub = jax.random.split(rng)
            params, wstate, loss = train_step(params, wstate, tr_idx, tr_y,
                                              sub)

            if not no_adj_update:
                do_hyper = ((epoch < n_hyper_stop)
                            & (epoch % marglik_frequency == 0)
                            & (epoch >= n_epochs_burnin))
                if early_stop:
                    do_hyper = do_hyper & jnp.logical_not(best["no_adj"])
                params, astate = jax.lax.cond(
                    do_hyper,
                    lambda pa: hyper_phase(*pa, tr_idx, tr_y),
                    lambda pa: pa, (params, astate))
                if n_snap:
                    # on-device learned-graph snapshot (eager analog:
                    # marglik_optimization's per-hyper-phase pkl dump)
                    k = snaps["count"]
                    adj_full = model.full_adj(params)
                    snaps = {
                        "adj": snaps["adj"].at[k].set(jnp.where(
                            do_hyper, adj_full > 0, snaps["adj"][k])),
                        "epoch": snaps["epoch"].at[k].set(jnp.where(
                            do_hyper, epoch, snaps["epoch"][k])),
                        "num_edges": snaps["num_edges"].at[k].set(jnp.where(
                            do_hyper, jnp.sum(adj_full),
                            snaps["num_edges"][k])),
                        "count": k + do_hyper.astype(jnp.int32),
                    }

            nm = neg_marglik_fn(params, tr_idx, tr_y)
            vf = model.apply(params, va_idx)
            vl = _ce_mean(vf, va_y)

            traces = {
                "loss": traces["loss"].at[i].set(loss),
                "val_loss": traces["val_loss"].at[i].set(vl),
                "neg_marglik": traces["neg_marglik"].at[i].set(nm),
            }

            track = True if not is_ste else (epoch > n_epochs_burnin)
            # a criterion stays active until its patience is exhausted
            # (mirrors the eager loop exactly: the patience counter and the
            # no-more-graph-updates flag advance in the same order)
            m_active = (best["m_pat"] < PATIENCE) if early_stop else True
            v_active = (best["v_pat"] < PATIENCE) if early_stop else True
            upd_m = track & m_active & (nm < best["nm"])
            upd_v = track & v_active & (vl < best["vl"])
            sel = jax.tree_util.tree_map
            m_pat, v_pat, no_adj = best["m_pat"], best["v_pat"], best["no_adj"]
            if early_stop:
                m_pat = jnp.where(track & m_active,
                                  jnp.where(upd_m, 0, m_pat + 1), m_pat)
                v_pat = jnp.where(track & v_active,
                                  jnp.where(upd_v, 0, v_pat + 1), v_pat)
                hit = track & (m_pat == PATIENCE)
                no_adj = no_adj | hit
                m_pat = jnp.where(hit, m_pat + 1, m_pat)
            best = {
                "nm": jnp.where(upd_m, nm, best["nm"]),
                "nm_epoch": jnp.where(upd_m, epoch, best["nm_epoch"]),
                "nm_params": sel(lambda new, old: jnp.where(upd_m, new, old),
                                 params, best["nm_params"]),
                "vl": jnp.where(upd_v, vl, best["vl"]),
                "vl_epoch": jnp.where(upd_v, epoch, best["vl_epoch"]),
                "vl_params": sel(lambda new, old: jnp.where(upd_v, new, old),
                                 params, best["vl_params"]),
                "m_pat": m_pat, "v_pat": v_pat, "no_adj": no_adj,
            }
            return params, wstate, astate, rng, traces, best, snaps

        rng0 = jax.random.PRNGKey(0)
        params, wstate, astate, _, traces, best, snaps = jax.lax.fori_loop(
            0, n_epochs, epoch_body,
            (params, wstate, astate, rng0, traces, best, snaps))
        return params, traces, best, snaps

    if key is not None:
        cache[key] = run
    return run
