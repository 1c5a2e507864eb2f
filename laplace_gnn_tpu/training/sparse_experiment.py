"""Scale CLI: fixed-graph sparse models end-to-end.

The dense driver (:mod:`.experiment`) mirrors the reference's CLI and is
coupled to the learnable N x N adjacency (STE structure learning,
homophily-of-adj diagnostics). This driver is the scale extension with no
reference counterpart: SparseGCN/SAGE/GAT over a
:class:`~laplace_gnn_tpu.graph.container.SparseGraph`, whole training loop
in one jitted ``fori_loop``, post-hoc Laplace with marglik prior tuning,
and MAP-vs-Bayes quality metrics.

    python -m laplace_gnn_tpu.training.sparse_experiment \\
        --dataset sbm --n_nodes 20000 --model_type sparsegcn

Datasets: any name :func:`~laplace_gnn_tpu.graph.datasets.load_data`
accepts (planetoid / karate / moons / banana / sbm / npz files such as
ogbn-arxiv exports).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


SPARSE_MODELS = ("sparsegcn", "sparsesage", "sparsegat")


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="sbm")
    p.add_argument("--model_type", default="sparsegcn",
                   choices=SPARSE_MODELS)
    p.add_argument("--n_nodes", type=int, default=10_000,
                   help="synthetic datasets only")
    p.add_argument("--n_classes", type=int, default=8)
    p.add_argument("--d_features", type=int, default=32)
    p.add_argument("--hidden_channels", type=int, default=128)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=400)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--subset_of_weights", default="last_layer",
                   choices=["all", "last_layer"])
    p.add_argument("--hessian_structure", default="kron",
                   choices=["full", "kron", "diag"])
    p.add_argument("--agg_dtype", default="bfloat16")
    p.add_argument("--ell", type=int, default=1,
                   help="attach the hybrid-ELL format")
    # curvature estimator knobs — the measured scale configurations
    # (BENCH_NOTES): mc+bf16 is the fast hyperstep, type-2-sketch the
    # exact-flavored one, plain type-2 the reporting-grade refit
    p.add_argument("--fisher_type", default=None,
                   choices=["type-2", "type-2-sketch", "mc", "empirical"],
                   help="kron Fisher flavor (default: backend default, "
                        "i.e. exact type-2)")
    p.add_argument("--sketch_size", type=int, default=8)
    p.add_argument("--column_chunk", type=int, default=None)
    p.add_argument("--mc_samples", type=int, default=1)
    p.add_argument("--diag_probes", type=int, default=None,
                   help="mixed-structure KFAC (sparsegat): Hutchinson "
                        "probes for the attention-parameter diagonal")
    p.add_argument("--probe_batch", type=int, default=None,
                   help="vmapped probes per lax.map step (same numerics, "
                        "amortized gather descriptors)")
    p.add_argument("--fisher_seed", type=int, default=0)
    p.add_argument("--n_mc_samples", type=int, default=30)
    p.add_argument("--checkpoint_dir", default=None,
                   help="rolling train checkpoints; restart resumes from "
                        "the newest one")
    p.add_argument("--checkpoint_every", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    return p


def build_graph(args, data):
    from ..graph.container import add_ell_format, sparse_from_edge_index
    import dataclasses

    normalize = {"sparsegcn": "sym", "sparsesage": "row",
                 "sparsegat": None}[args.model_type]
    g = sparse_from_edge_index(data.edge_index, data.num_nodes,
                               normalize=normalize)
    # ELL + bf16 aggregation apply to every sparse model: GCN/SAGE via the
    # SpMM primitive, GAT via the runtime-coefficient ELL path
    # (ell_aggregate_edge_coeff)
    if args.ell:
        g = add_ell_format(g)
    if args.agg_dtype:
        g = dataclasses.replace(g, agg_dtype=args.agg_dtype)
    return g


def build_model(args, data, g):
    import jax.numpy as jnp

    from ..models import SparseGAT, SparseGCN, SparseSAGE

    kw = dict(in_channels=data.num_features,
              hidden_channels=args.hidden_channels,
              out_channels=data.num_classes,
              num_layers=args.num_layers, X=jnp.asarray(data.x),
              graph=g, dropout_p=0.0)
    if args.model_type == "sparsegcn":
        return SparseGCN(**kw)
    if args.model_type == "sparsesage":
        return SparseSAGE(**kw)
    return SparseGAT(heads=args.heads, **kw)


def main(argv=None):
    args = argument_parser().parse_args(argv)
    args.dataset = args.dataset.lower()

    # multi-host launch path: joins the JAX distributed runtime when the
    # LAPLACE_GNN_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID env vars are set
    # (no-op otherwise); must run before any other JAX call
    from ..parallel.distributed import initialize as distributed_init
    multihost = distributed_init()

    import jax
    if multihost:
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    import jax.numpy as jnp
    import optax

    from .. import Laplace
    from ..graph import datasets
    from ..utils.metrics import (accuracy, expected_calibration_error,
                                 nll_loss)

    synth = dict(n_nodes=args.n_nodes, n_classes=args.n_classes,
                 d_features=args.d_features, seed=args.seed) \
        if args.dataset == "sbm" else {}
    data = datasets.load_data(args.dataset, **synth)
    g = build_graph(args, data)
    print(f"{args.dataset}: N={data.num_nodes} E={g.n_edges} "
          f"C={data.num_classes} d={data.num_features}")

    # the loader's 60/20/20 ShuffleSplit — same split every driver uses,
    # so results are comparable across tools for a given seed/dataset
    tr, va, te = data.split(0)

    model = build_model(args, data, g)
    params = model.init(jax.random.PRNGKey(args.seed))
    y = jnp.asarray(np.asarray(data.y))
    tr_j, y_tr = jnp.asarray(tr), y[jnp.asarray(tr)]

    opt = optax.adam(args.lr)

    def train_loop(params, opt_state, n_steps):
        def body(i, carry):
            p, s = carry

            def obj(p):
                f = model.apply(p, tr_j)
                return optax.softmax_cross_entropy_with_integer_labels(
                    f, y_tr).mean()

            _, grads = jax.value_and_grad(obj)(p)
            u, s = opt.update(grads, s)
            return optax.apply_updates(p, u), s

        return jax.lax.fori_loop(0, n_steps, body, (params, opt_state))

    fit = jax.jit(train_loop, static_argnums=2)
    opt_state = opt.init(params)
    t0 = time.perf_counter()
    if args.checkpoint_dir:
        # chunked loop with rolling checkpoints: a killed run resumes from
        # the newest checkpoint on restart (capability the reference lacks).
        # The optimizer state is part of the carry AND the checkpoint
        # payload, so a chunked/resumed run is step-for-step identical to
        # a single uninterrupted fit.
        from ..utils.checkpoint import TrainCheckpointer
        ck = TrainCheckpointer(args.checkpoint_dir)
        start = 0
        latest = ck.latest()
        if latest is not None:
            start = int(latest["step"])
            params = latest["state"]["params"]
            if "opt_state" in latest["state"]:
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state),
                    jax.tree_util.tree_leaves(latest["state"]["opt_state"]))
            print(f"resumed from checkpoint step {start}")
        step = args.checkpoint_every
        for s0 in range(start, args.n_steps, step):
            n = min(step, args.n_steps - s0)
            params, opt_state = jax.block_until_ready(
                fit(params, opt_state, n))
            ck.save(s0 + n, {"params": params, "opt_state": opt_state})
    else:
        params, opt_state = jax.block_until_ready(
            fit(params, opt_state, args.n_steps))
    print(f"{args.n_steps} full-graph steps: "
          f"{time.perf_counter() - t0:.1f}s incl. compile")

    t0 = time.perf_counter()
    # sparsegat + kron runs mixed-structure KFAC (Kron for the Linear
    # sites, exact diag for the attention vectors) — the reference's
    # curvlinops KFAC crashes on that combination
    backend_kwargs = {"seed": args.fisher_seed}
    if args.fisher_type is not None:
        backend_kwargs.update(fisher_type=args.fisher_type,
                              sketch_size=args.sketch_size,
                              mc_samples=args.mc_samples)
    if args.column_chunk is not None:
        backend_kwargs["column_chunk"] = args.column_chunk
    if args.diag_probes is not None:
        backend_kwargs["diag_probes"] = args.diag_probes
    if args.probe_batch is not None:
        backend_kwargs["probe_batch"] = args.probe_batch
    la = Laplace(model, params, "classification",
                 subset_of_weights=args.subset_of_weights,
                 hessian_structure=args.hessian_structure,
                 backend_kwargs=backend_kwargs)
    la.fit([(tr_j, y_tr)])
    la.optimize_prior_precision(method="marglik", n_steps=100)
    print(f"Laplace fit + marglik prior tuning: "
          f"{time.perf_counter() - t0:.1f}s; "
          f"marglik {float(la.log_marginal_likelihood()):.1f}")

    te_j = jnp.asarray(te)
    y_te = np.asarray(y[te_j])
    results = {}
    probs_map = np.asarray(jax.nn.softmax(model.apply(params, te_j)))
    probs_bayes = np.asarray(la(te_j, pred_type="nn", link_approx="mc",
                                n_samples=args.n_mc_samples))
    for name, p in (("map", probs_map), ("laplace", probs_bayes)):
        acc = float(accuracy(p, y_te))
        nll = float(nll_loss(p, y_te))
        ece = float(expected_calibration_error(p, y_te))
        results[name] = {"acc": acc, "nll": nll, "ece": ece}
        print(f"{name:8s} test acc {acc:.4f}  NLL {nll:.4f}  ECE {ece:.4f}")
    return results


def cli() -> None:
    """Console entry point (discards main()'s results dict so the script
    exits 0 on success)."""
    main()


if __name__ == "__main__":
    main()
