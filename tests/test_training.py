"""Training loops: GNN marglik optimization, library marglik_training,
experiment driver, homophily analysis, datasets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laplace_gnn_tpu.graph as G
from laplace_gnn_tpu.laplace import marglik_training
from laplace_gnn_tpu.models import GCN, STEGCN
from laplace_gnn_tpu.nn import MLP
from laplace_gnn_tpu.training import (fit_laplace, make_neg_marglik_fn,
                                      marglik_optimization, mc_eval,
                                      mean_eval)
from laplace_gnn_tpu.utils.data import ArrayLoader


@pytest.fixture(scope="module")
def karate():
    return G.load_data("karate", n_rand_splits=1)


def build_model(d, cls=STEGCN, **kw):
    model = cls(d.num_features, 8, d.num_classes, 2, jnp.asarray(d.x),
                d.adjacency(), dropout_p=0.0, **kw)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.mark.slow
def test_marglik_optimization_learns_structure(karate):
    d = karate
    tr, va, te = d.split(0)
    model, params = build_model(d)
    results, pf, losses, vls, nms = marglik_optimization(
        model, params, tr, d.y[tr], va, d.y[va], y=d.y,
        lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=30,
        n_hypersteps=3, n_epochs_burnin=5, marglik_frequency=5,
        model_type="stegcn", verbose=False)
    assert losses[-1] < losses[0]
    assert len(nms) == 30
    assert np.isfinite(nms).all()
    # adjacency actually moved
    assert float(jnp.abs(pf["adj"] - model.init_adj).sum()) > 0
    # both stop criteria captured
    assert results["marglik"]["params"] is not None
    assert results["valloss"]["params"] is not None
    l, a = mean_eval(model, results["valloss"]["params"], te, d.y[te])
    assert np.isfinite(l) and 0 <= a <= 100


def test_marglik_optimization_gcn_no_adj_update(karate):
    d = karate
    tr, va, te = d.split(0)
    model, params = build_model(d, cls=GCN)
    results, pf, *_ = marglik_optimization(
        model, params, tr, d.y[tr], va, d.y[va], y=d.y,
        lr=0.05, n_epochs=15, n_epochs_burnin=2, marglik_frequency=5,
        model_type="gcn", verbose=False)
    np.testing.assert_allclose(np.asarray(pf["adj"]),
                               np.asarray(model.init_adj))


@pytest.mark.slow
def test_neg_marglik_structures_agree_on_direction(karate):
    """kron/diag/full margliks are different approximations but must all be
    finite and differentiable w.r.t. the adjacency."""
    d = karate
    tr, _, _ = d.split(0)
    model, params = build_model(d)
    idx, yy = jnp.asarray(tr), jnp.asarray(d.y[tr])
    for structure in ("kron", "diag", "full"):
        f = make_neg_marglik_fn(model, "classification", structure, "all",
                                N=len(tr))
        val, g = jax.value_and_grad(f)(params, idx, yy)
        assert np.isfinite(float(val)), structure
        assert np.isfinite(np.asarray(g["adj"])).all(), structure
        assert np.abs(np.asarray(g["adj"])).sum() > 0, structure


@pytest.mark.slow
def test_fit_laplace_and_bayes_eval(karate):
    d = karate
    tr, va, te = d.split(0)
    model, params = build_model(d)
    la = fit_laplace(model, params, tr, d.y[tr])
    assert np.isfinite(float(la.log_marginal_likelihood()))
    loss, acc = mc_eval(la, te, d.y[te], n_samples=20)
    assert np.isfinite(loss)


@pytest.mark.slow
def test_library_marglik_training():
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    M, D, C = 30, 3, 2
    X = jax.random.normal(keys[0], (M, D))
    y = jax.random.randint(keys[1], (M,), 0, C)
    model = MLP([D, 8, C], act="tanh")
    params = model.init(keys[2])
    loader = ArrayLoader(X, y, batch_size=M)
    la, final_params, margliks, losses = marglik_training(
        model, params, loader, likelihood="classification",
        hessian_structure="kron", n_epochs=20, n_hypersteps=5,
        marglik_frequency=5, optimizer_kwargs={"lr": 0.05}, lr_hyp=0.1)
    assert len(margliks) == 4
    assert np.isfinite(margliks).all()
    assert losses[-1] < losses[0]
    # hyperparameters moved off their init
    assert not np.allclose(np.asarray(la.prior_precision), 1.0)
    p = la(X, link_approx="probit")
    assert p.shape == (M, C)


@pytest.mark.slow
def test_experiment_driver_smoke(tmp_path):
    from laplace_gnn_tpu.training.experiment import main
    out = main(["--dataset", "karate", "--model_type", "gcn",
                "--n_data_rand_splits", "1", "--n_epochs", "5",
                "--overwrite_config", "true", "--lr", "0.05",
                "--weight_decay", "5e-4", "--hidden_channels", "8",
                "--dropout_p", "0.0", "--res", "false",
                "--n_epochs_burnin", "2",
                "--base_out_dir", str(tmp_path)])
    assert out["summary"]["valloss"] is not None
    assert (tmp_path / "karate" / "stats.pkl").exists()


@pytest.mark.slow
def test_learned_graphs_saved(tmp_path, karate):
    d = karate
    tr, va, _ = d.split(0)
    model, params = build_model(d)
    marglik_optimization(
        model, params, tr, d.y[tr], va, d.y[va], y=d.y,
        lr=0.03, lr_adj=0.2, n_epochs=6, n_hypersteps=2,
        n_epochs_burnin=2, marglik_frequency=2, model_type="stegcn",
        learned_graphs_dir=str(tmp_path / "graphs"), verbose=False)
    files = list((tmp_path / "graphs").iterdir())
    assert any(f.name.startswith("epoch_") for f in files)
    assert (tmp_path / "graphs" / "latest_adj.npy").exists()


@pytest.mark.slow
def test_marglik_grad_stable_with_degenerate_factors():
    """SURVEY.md 'hard parts': eigh gradients blow up on degenerate
    eigenvalues. The hyperstep differentiates eigvalsh (values only), whose
    VJP is well-defined under degeneracy — verify no NaNs on a graph with
    many identical rows (rank-deficient, repeated-eigenvalue factors)."""
    key = jax.random.PRNGKey(0)
    n, d, h, c = 16, 4, 6, 3
    X = jnp.tile(jax.random.normal(key, (2, d)), (8, 1))  # rank-2 features
    adj = jnp.ones((n, n)) - jnp.eye(n)                   # complete graph
    model = STEGCN(d, h, c, 2, X, adj, dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(1))
    y = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, c)
    for structure in ("kron", "diag"):
        f = make_neg_marglik_fn(model, "classification", structure, "all",
                                N=n)
        val, g = jax.value_and_grad(f)(params, jnp.arange(n), y)
        assert np.isfinite(float(val)), structure
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all(), structure


@pytest.mark.slow
def test_scan_loop_matches_eager(karate):
    """The on-device scan training loop must produce the same trajectory as
    the eager loop (early_stop=False semantics)."""
    from laplace_gnn_tpu.training import marglik_optimization_scan
    d = karate
    tr, va, te = d.split(0)
    kwargs = dict(lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=12,
                  n_hypersteps=3, n_epochs_burnin=4, marglik_frequency=4,
                  model_type="stegcn")
    model, params = build_model(d)
    r1, p1, l1, v1, n1 = marglik_optimization(
        model, params, tr, d.y[tr], va, d.y[va], verbose=False, **kwargs)
    r2, p2, l2, v2, n2 = marglik_optimization_scan(
        model, params, tr, d.y[tr], va, d.y[va], **kwargs)
    np.testing.assert_allclose(np.asarray(l1), l2, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n1), n2, rtol=1e-5, atol=1e-5)
    assert r1["marglik"]["epoch"] == r2["marglik"]["epoch"]
    assert r1["valloss"]["epoch"] == r2["valloss"]["epoch"]
    np.testing.assert_allclose(np.asarray(p1["adj"]),
                               np.asarray(p2["adj"]), atol=1e-6)


def test_training_program_cache_reuse(karate):
    """Repeated runs with the same config on one model must reuse the
    cached jitted programs (grid-search pattern: re-tracing costs seconds
    per run) while different configs get separate entries."""
    from laplace_gnn_tpu.training import marglik_optimization_scan
    d = karate
    tr, va, te = d.split(0)
    model, params = build_model(d)
    kwargs = dict(lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=4,
                  n_hypersteps=1, n_epochs_burnin=1, marglik_frequency=2,
                  model_type="stegcn")
    marglik_optimization(model, params, tr, d.y[tr], va, d.y[va],
                         verbose=False, **kwargs)
    cache = model._jit_program_cache
    assert len(cache) == 1
    marglik_optimization(model, params, tr, d.y[tr], va, d.y[va],
                         verbose=False, **kwargs)
    assert len(cache) == 1  # second identical run reuses the entry
    marglik_optimization(model, params, tr, d.y[tr], va, d.y[va],
                         verbose=False, **dict(kwargs, lr=0.01))
    assert len(cache) == 2  # config change gets its own entry
    marglik_optimization_scan(model, params, tr, d.y[tr], va, d.y[va],
                              **kwargs)
    assert len(cache) == 3  # scan program cached separately
    marglik_optimization_scan(model, params, tr, d.y[tr], va, d.y[va],
                              **kwargs)
    assert len(cache) == 3


def test_scan_loop_matches_eager_with_dropout(karate):
    """Training runs with dropout ACTIVE (reference model.train() epochs,
    gnn/marglik_training.py:166-170); eager and scan loops share the same
    per-epoch rng chain so their trajectories stay identical."""
    from laplace_gnn_tpu.training import marglik_optimization_scan
    d = karate
    tr, va, te = d.split(0)
    kwargs = dict(lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=10,
                  n_hypersteps=2, n_epochs_burnin=3, marglik_frequency=3,
                  model_type="stegcn")
    model = STEGCN(d.num_features, 8, d.num_classes, 2, jnp.asarray(d.x),
                   d.adjacency(), dropout_p=0.5)
    params = model.init(jax.random.PRNGKey(0))
    r1, p1, l1, v1, n1 = marglik_optimization(
        model, params, tr, d.y[tr], va, d.y[va], verbose=False, **kwargs)
    r2, p2, l2, v2, n2 = marglik_optimization_scan(
        model, params, tr, d.y[tr], va, d.y[va], **kwargs)
    np.testing.assert_allclose(np.asarray(l1), l2, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n1), n2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["adj"]),
                               np.asarray(p2["adj"]), atol=1e-6)
    # dropout must actually change the trajectory vs the eval-mode model
    model0 = STEGCN(d.num_features, 8, d.num_classes, 2, jnp.asarray(d.x),
                    d.adjacency(), dropout_p=0.0)
    _, _, l0, _, _ = marglik_optimization(
        model0, params, tr, d.y[tr], va, d.y[va], verbose=False, **kwargs)
    assert not np.allclose(np.asarray(l0), l1)


def test_scan_loop_matches_eager_early_stop(karate):
    """On-device PATIENCE early-stop (reference :279-303) must reproduce the
    eager loop: same best epochs, same frozen best params, same traces. A
    short patience is forced by monkeypatching PATIENCE so the dual
    criterion actually triggers within a small run."""
    import laplace_gnn_tpu.training.marglik_gnn as mg
    from laplace_gnn_tpu.training import marglik_optimization_scan
    d = karate
    tr, va, te = d.split(0)
    kwargs = dict(lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=14,
                  n_hypersteps=2, n_epochs_burnin=2, marglik_frequency=3,
                  early_stop=True, model_type="stegcn")
    old = mg.PATIENCE
    mg.PATIENCE = 3
    try:
        model, params = build_model(d)
        r1, p1, l1, v1, n1 = marglik_optimization(
            model, params, tr, d.y[tr], va, d.y[va], verbose=False, **kwargs)
        r2, p2, l2, v2, n2 = marglik_optimization_scan(
            model, params, tr, d.y[tr], va, d.y[va], **kwargs)
    finally:
        mg.PATIENCE = old
    np.testing.assert_allclose(np.asarray(l1), l2, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n1), n2, rtol=1e-5, atol=1e-5)
    assert r1["marglik"]["epoch"] == r2["marglik"]["epoch"]
    assert r1["valloss"]["epoch"] == r2["valloss"]["epoch"]
    for crit in ("marglik", "valloss"):
        np.testing.assert_allclose(
            np.asarray(r1[crit]["params"]["adj"]),
            np.asarray(r2[crit]["params"]["adj"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1["adj"]),
                               np.asarray(p2["adj"]), atol=1e-6)


@pytest.mark.slow
def test_sparse_experiment_cli():
    from laplace_gnn_tpu.training.sparse_experiment import main
    r = main(["--dataset", "sbm", "--n_nodes", "400", "--n_classes", "3",
              "--d_features", "8", "--hidden_channels", "16",
              "--n_steps", "60", "--n_mc_samples", "8"])
    assert set(r) == {"map", "laplace"}
    assert r["map"]["acc"] > 0.5
    assert np.isfinite(r["laplace"]["nll"])


@pytest.mark.slow
def test_sparse_experiment_cli_gat():
    from laplace_gnn_tpu.training.sparse_experiment import main
    r = main(["--dataset", "sbm", "--n_nodes", "300", "--n_classes", "4",
              "--d_features", "8", "--hidden_channels", "8",
              "--model_type", "sparsegat", "--heads", "2",
              "--n_steps", "40", "--n_mc_samples", "5"])
    assert np.isfinite(r["laplace"]["nll"])


@pytest.mark.slow
def test_sparse_experiment_checkpoint_resume(tmp_path):
    from laplace_gnn_tpu.training.sparse_experiment import main
    base = ["--dataset", "sbm", "--n_nodes", "300", "--n_classes", "3",
            "--d_features", "8", "--hidden_channels", "16",
            "--n_mc_samples", "5"]
    common = base + ["--checkpoint_dir", str(tmp_path),
                     "--checkpoint_every", "20"]
    # partial run leaves checkpoints behind
    main(common + ["--n_steps", "40"])
    ckpts = sorted(f for f in os.listdir(tmp_path) if f.startswith("ckpt"))
    assert ckpts, "no checkpoints written"
    # rerun with a larger budget resumes instead of restarting
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        r = main(common + ["--n_steps", "80"])
    assert "resumed from checkpoint step 40" in buf.getvalue()
    assert np.isfinite(r["laplace"]["nll"])
    # optimizer state rides in the checkpoint, so the chunked+resumed run
    # is step-for-step equivalent to one uninterrupted 80-step fit
    r_straight = main(base + ["--n_steps", "80"])
    for k in ("map", "laplace"):
        assert np.allclose(r[k]["nll"], r_straight[k]["nll"], atol=1e-5), \
            (k, r[k], r_straight[k])


@pytest.mark.slow
def test_gat_kron_mixed_structure():
    # GAT's attention vectors are non-Linear posterior params; under kron
    # they now get exact-diagonal blocks while the Linear sites keep Kron
    # factors (mixed-structure KFAC). The reference crashes on this combo —
    # our previous behavior was a wholesale diag fallback.
    from laplace_gnn_tpu.models import GAT
    from laplace_gnn_tpu.training.marglik_gnn import (fit_laplace,
                                                      make_neg_marglik_fn)
    rng = np.random.default_rng(0)
    n, d, c = 16, 4, 2
    adj = np.minimum((rng.random((n, n)) < 0.4)
                     + (rng.random((n, n)) < 0.4).T, 1).astype(np.float32)
    np.fill_diagonal(adj, 0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    model = GAT(d, 4, c, 2, X, jnp.asarray(adj), dropout_p=0.0, heads=1)
    params = model.init(jax.random.PRNGKey(0))
    y = jnp.asarray(rng.integers(0, c, n))
    idx = jnp.arange(n)

    # the jitted marglik closure runs under kron and its gradient flows
    # into the adjacency (a marglik hyperstep on a GAT)
    fn = make_neg_marglik_fn(model, "classification", "kron", "all", N=n)
    nm, gm = jax.jit(jax.value_and_grad(fn))(params, idx, y)
    assert np.isfinite(float(nm))
    assert np.all(np.isfinite(np.asarray(gm["adj"])))

    la = fit_laplace(model, params, idx, y, hessian_structure="kron")
    assert type(la).__name__ == "KronLaplace"
    assert any(len(g) == 1 and g[0].ndim == 1 for g in la.H_facs.kfacs)
    assert np.isfinite(float(la.log_marginal_likelihood()))
    probs = la(idx, pred_type="glm", link_approx="probit")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_scan_snapshots_match_eager(karate, tmp_path):
    """learned_graphs_dir on the scan loop produces the same per-hyper-phase
    snapshot files as the eager loop (edge_index/num_edges/epoch schema),
    consumable by graph.plots.get_learned_graphs."""
    from laplace_gnn_tpu.graph.plots import get_learned_graphs
    from laplace_gnn_tpu.training import marglik_optimization_scan
    d = karate
    tr, va, _ = d.split(0)
    kwargs = dict(lr=0.03, lr_adj=0.2, weight_decay=5e-4, n_epochs=12,
                  n_hypersteps=3, n_epochs_burnin=4, marglik_frequency=4,
                  model_type="stegcn")
    model, params = build_model(d)
    eager_dir, scan_dir = str(tmp_path / "eager"), str(tmp_path / "scan")
    marglik_optimization(model, params, tr, d.y[tr], va, d.y[va], y=d.y,
                         verbose=False, learned_graphs_dir=eager_dir,
                         **kwargs)
    marglik_optimization_scan(model, params, tr, d.y[tr], va, d.y[va],
                              y=d.y, learned_graphs_dir=scan_dir, **kwargs)

    eager = {s["epoch"]: s for _, s in get_learned_graphs(eager_dir)}
    scan = {s["epoch"]: s for _, s in get_learned_graphs(scan_dir)}
    assert set(scan) == set(eager) == {4, 8}   # burnin=4, freq=4, stop<12
    for e in eager:
        np.testing.assert_array_equal(scan[e]["edge_index"],
                                      eager[e]["edge_index"])
        np.testing.assert_allclose(scan[e]["num_edges"],
                                   eager[e]["num_edges"], rtol=1e-6)
        np.testing.assert_allclose(scan[e]["homophily"],
                                   eager[e]["homophily"], rtol=1e-6)
    # latest_adj written by both
    a1 = np.load(os.path.join(eager_dir, "latest_adj.npy"))
    a2 = np.load(os.path.join(scan_dir, "latest_adj.npy"))
    np.testing.assert_allclose(a1, a2, atol=1e-6)


@pytest.mark.slow
def test_fisher_knobs_threaded_through_training(karate):
    """fisher_type/sketch_size/mc_samples/fisher_seed reach the hyperstep:
    a different fisher_seed changes the sketch-estimator marglik trace
    (proving the knob is live), while exact type-2 ignores the seed."""
    d = karate
    tr, va, _ = d.split(0)
    model, params = build_model(d)
    kw = dict(lr=0.03, lr_adj=0.2, n_epochs=8, n_hypersteps=2,
              n_epochs_burnin=2, marglik_frequency=2, model_type="stegcn",
              verbose=False)

    def run(**fk):
        _, _, _, _, nms = marglik_optimization(
            model, params, tr, d.y[tr], va, d.y[va], **kw, **fk)
        return np.asarray(nms)

    nm_a = run(fisher_type="type-2-sketch", sketch_size=2, fisher_seed=0)
    nm_b = run(fisher_type="type-2-sketch", sketch_size=2, fisher_seed=1)
    assert not np.allclose(nm_a, nm_b)     # seed is live for the sketch
    nm_c = run(fisher_type="type-2", fisher_seed=0)
    nm_d = run(fisher_type="type-2", fisher_seed=1)
    np.testing.assert_allclose(nm_c, nm_d)  # exact path: seed inert
    nm_mc1 = run(fisher_type="mc", mc_samples=1, fisher_seed=0)
    nm_mc4 = run(fisher_type="mc", mc_samples=4, fisher_seed=0)
    assert not np.allclose(nm_mc1, nm_mc4)  # mc_samples is live


@pytest.mark.slow
def test_experiment_cli_fisher_flags(tmp_path):
    """The dense driver round-trips the estimator flags end-to-end."""
    from laplace_gnn_tpu.training.experiment import main
    out = main(["--dataset", "karate", "--model_type", "stegcn",
                "--n_data_rand_splits", "1", "--n_epochs", "6",
                "--overwrite_config", "true", "--lr", "0.05",
                "--lr_adj", "0.1", "--weight_decay", "5e-4",
                "--weight_decay_adj", "0.0",
                "--hidden_channels", "8", "--dropout_p", "0.0",
                "--res", "false", "--n_epochs_burnin", "2",
                "--n_hypersteps", "2", "--marglik_frequency", "2",
                "--fisher_type", "type-2-sketch", "--sketch_size", "4",
                "--column_chunk", "2", "--fisher_seed", "3",
                "--base_out_dir", str(tmp_path)])
    assert out["summary"]["valloss"] is not None


@pytest.mark.slow
def test_sparse_experiment_cli_fisher_flags():
    """The sparse driver reaches the sketch estimator via backend_kwargs,
    and SparseGAT now runs WITH ELL + bf16 aggregation (the round-4 silent
    guard is gone)."""
    from laplace_gnn_tpu.training.sparse_experiment import main
    r = main(["--dataset", "sbm", "--n_nodes", "300", "--n_classes", "3",
              "--d_features", "8", "--hidden_channels", "16",
              "--n_steps", "40", "--n_mc_samples", "5",
              "--fisher_type", "type-2-sketch", "--sketch_size", "4"])
    assert np.isfinite(r["laplace"]["nll"])
    r2 = main(["--dataset", "sbm", "--n_nodes", "300", "--n_classes", "4",
               "--d_features", "8", "--hidden_channels", "8",
               "--model_type", "sparsegat", "--heads", "2",
               "--n_steps", "30", "--n_mc_samples", "5",
               "--ell", "1", "--agg_dtype", "bfloat16",
               "--fisher_type", "mc", "--mc_samples", "2",
               "--diag_probes", "2", "--probe_batch", "2"])
    assert np.isfinite(r2["laplace"]["nll"])


@pytest.mark.slow
def test_sketch_structure_learning_tracks_exact():
    """End-to-end guard for the type-2-sketch estimator (BENCH_NOTES r5
    sweep, scripts/bench_sketch_quality.py): structure learning through
    sketched factors reaches final accuracy within noise of exact type-2,
    learns a similar-size graph with overlapping support, and produces a
    near-identical marglik trace — unlike a genuinely different estimator
    (mc), whose learned support diverges."""
    import laplace_gnn_tpu.graph as G2
    data = G2.load_data("sbm", n_nodes=400, n_classes=4, d_features=16,
                        p_in=0.01, p_out=0.01, feature_signal=1.0, seed=0)
    tr, va, te = data.split(0)
    adj0 = G2.edge_index_to_adj(data.edge_index, data.num_nodes)
    model = STEGCN(data.num_features, 16, data.num_classes, 2,
                   jnp.asarray(data.x), jnp.asarray(adj0), dropout_p=0.0,
                   symmetric=True)
    y = jnp.asarray(data.y)

    def run(fisher, **fk):
        params = model.init(jax.random.PRNGKey(0))
        results, pf, _, _, nms = marglik_optimization(
            model, params, jnp.asarray(tr), y[jnp.asarray(tr)],
            jnp.asarray(va), y[jnp.asarray(va)],
            lr=1e-2, lr_adj=0.8, momentum_adj=0.9, weight_decay=5e-5,
            weight_decay_adj=5e-4, n_epochs=60, n_epochs_burnin=20,
            marglik_frequency=10, n_hypersteps=5, grad_norm=True,
            hessian_structure="kron", model_type="stegcn",
            fisher_type=fisher, stop_criterion="marglik", verbose=False,
            **fk)
        best = results["marglik"]["params"] or pf
        f = model.apply(best, jnp.asarray(te))
        acc = float(jnp.mean(jnp.argmax(f, -1) == y[jnp.asarray(te)]))
        a = np.asarray(model.full_adj(best))
        a = a - np.diag(np.diag(a))
        sup = set(zip(*np.nonzero(a > 0)))
        return acc, sup, np.asarray(nms)

    acc_ex, sup_ex, nms_ex = run("type-2")
    acc_sk, sup_sk, nms_sk = run("type-2-sketch", sketch_size=16)
    # accuracy within noise; graph size comparable; support overlaps
    assert abs(acc_sk - acc_ex) < 0.15, (acc_sk, acc_ex)
    assert 0.5 < len(sup_sk) / max(len(sup_ex), 1) < 2.0
    jac = len(sup_sk & sup_ex) / max(len(sup_sk | sup_ex), 1)
    assert jac > 0.3, jac
    # the marglik trace tracks exact closely through the whole run
    m = np.isfinite(nms_ex) & np.isfinite(nms_sk)
    rel = np.abs(nms_sk[m] - nms_ex[m]) / np.maximum(np.abs(nms_ex[m]), 1.0)
    assert float(np.median(rel)) < 0.1, float(np.median(rel))
