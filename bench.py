"""Benchmark: flagship marglik hyperstep + aggregation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: wall-clock of one differentiable KFAC-marglik hyperstep
(fit factors + log-marglik + gradient w.r.t. the adjacency) on a Cora-sized
STE-GCN — the hot hyper loop of the reference (gnn/marglik_training.py:
206-224). ``vs_baseline`` is the speedup over a torch-CPU implementation of
the same math via retained autograd graphs (the reference's strategy; the
reference itself cannot run here — its backpack/asdl deps are absent).

Timing methodology: the axon TPU tunnel permanently degrades per-dispatch
latency after the first device->host transfer, so every timed region runs K
iterations inside ONE jitted lax.fori_loop (iterations chained through the
adjacency so XLA cannot hoist the loop body), and nothing is fetched until
all clocks have stopped. Reported per-iteration time is (t_2K - t_K) / K,
which also cancels the single-dispatch overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_NODES, N_FEAT, HIDDEN, N_CLASS = 2708, 1433, 64, 7  # Cora dimensions
DENSITY = 10556 / (2708 * 2708)                        # Cora edge density


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_graph(rng):
    X = rng.standard_normal((N_NODES, N_FEAT), dtype=np.float32)
    adj = (rng.random((N_NODES, N_NODES)) < DENSITY).astype(np.float32)
    adj = np.minimum(adj + adj.T, 1.0)
    np.fill_diagonal(adj, 0.0)
    y = rng.integers(0, N_CLASS, N_NODES)
    return X, adj, y


def _timed_loop(jitted, params, K):
    """Run jitted(params, K), blocking; return wall seconds."""
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    jax.block_until_ready(jitted(params, jnp.asarray(K)))
    return time.perf_counter() - t0


def bench_jax(X, adj, y, n_train=140, K=50):
    import jax
    # persistent compile cache: bench re-runs skip the ~2-5 min XLA compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from functools import partial

    from laplace_gnn_tpu.models import STEGCN
    from laplace_gnn_tpu.training.marglik_gnn import make_neg_marglik_fn

    model = STEGCN(N_FEAT, HIDDEN, N_CLASS, 2, jnp.asarray(X),
                   jnp.asarray(adj), dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    idx = jnp.arange(n_train)
    yy = jnp.asarray(y[:n_train])

    # --- forward loop -------------------------------------------------------
    @jax.jit
    def fwd_loop(params, K):
        def body(i, carry):
            acc, adj_p = carry
            p = dict(params, adj=adj_p)
            f = model.apply(p, idx)
            acc = acc + jnp.sum(f)
            # chain: next adjacency genuinely depends on this output (1e-30
            # perturbation — non-zero so XLA cannot fold the dependency away)
            return acc, adj_p + 1e-30 * acc
        acc, _ = jax.lax.fori_loop(0, K, body, (0.0, params["adj"]))
        return acc

    # --- hyperstep loop -----------------------------------------------------
    neg_marglik = make_neg_marglik_fn(model, "classification", "kron",
                                      "all", N=n_train)
    vg = jax.value_and_grad(neg_marglik)

    @jax.jit
    def hyper_loop(params, K):
        def body(i, carry):
            acc, adj_p = carry
            p = dict(params, adj=adj_p)
            nm, g = vg(p, idx, yy)
            return acc + nm, adj_p + 1e-30 * nm + 1e-30 * g["adj"]
        acc, _ = jax.lax.fori_loop(0, K, body, (0.0, params["adj"]))
        return acc

    # warmups (compile; dynamic trip count -> one executable each), then
    # timed runs — no host fetch until the end
    KF = 500  # forward is ~0.07 ms; need a long loop for resolution
    log("compiling fwd loop...")
    _timed_loop(fwd_loop, params, 1)
    log("timing fwd loop...")
    t_fwd_K = _timed_loop(fwd_loop, params, KF)
    t_fwd_2K = _timed_loop(fwd_loop, params, 4 * KF)
    log("compiling hyper loop...")
    _timed_loop(hyper_loop, params, 1)
    log("timing hyper loop...")
    # median-of-5 on the K-vs-2K difference: tunnel delays are one-sided,
    # but a delay landing INSIDE the first (K) segment biases the
    # difference DOWN, so the minimum is not robust (it occasionally
    # reports impossible speedups); the median rejects both directions
    diffs = []
    for _ in range(5):
        t_hyp_K = _timed_loop(hyper_loop, params, K)
        t_hyp_2K = _timed_loop(hyper_loop, params, 2 * K)
        diffs.append(t_hyp_2K - t_hyp_K)

    t_fwd = max((t_fwd_2K - t_fwd_K) / (3 * KF), 1e-9)
    t_hyper = max(float(np.median(diffs)) / K, 1e-9)

    # now safe to fetch for sanity reporting
    nm_val = float(jax.jit(neg_marglik)(params, idx, yy))
    # reference-semantics value (non-detached TYPE2 sqrt, the fork's
    # curvlinops/kfac.py:631-642 behavior) for the torch cross-check below:
    # the torch-CPU baseline reimplements exactly that math, so with pinned
    # weights the two must agree
    neg_marglik_fork = make_neg_marglik_fn(
        model, "classification", "kron", "all", N=n_train,
        fisher_type="type-2-fork")
    nm_fork = float(jax.jit(neg_marglik_fork)(params, idx, yy))
    n_edges = float(np.asarray(adj).sum()) + N_NODES
    edges_per_s = 2 * n_edges / t_fwd
    log(f"jax forward: {t_fwd * 1e3:.3f} ms "
        f"({edges_per_s / 1e6:.1f}M edges/s effective)")
    log(f"jax hyperstep: {t_hyper * 1e3:.3f} ms (neg_marglik={nm_val:.2f}, "
        f"reference-semantics neg_marglik={nm_fork:.2f})")
    assert np.isfinite(nm_val)
    params_np = {
        "convs": [{"lin": {"weight": np.asarray(c["lin"]["weight"]),
                           "bias": np.asarray(c["lin"]["bias"])}}
                  for c in params["convs"]],
    }
    return t_hyper, t_fwd, edges_per_s, nm_fork, params_np


def _median_loop_time(loopfn, arg, K, reps=5):
    """Median of `reps` chained K-vs-2K differences (see bench_jax: the
    minimum is biased by delays inside the first segment)."""
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(loopfn(arg, jnp.asarray(1)))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loopfn(arg, jnp.asarray(K)))
        t1 = time.perf_counter()
        jax.block_until_ready(loopfn(arg, jnp.asarray(2 * K)))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return max(float(np.median(diffs)) / K, 1e-9)


def bench_absolute(X, adj, y, n_train=140):
    """Absolute metrics (round-comparable without the torch-CPU ratio):
    GGN mat-vec time/edges/s on the flagship, sparse-SpMM edges/s vs the
    HBM gather roofline, and the projected multi-chip scaling table from
    measured single-chip time + the partition's halo widths."""
    import jax
    import jax.numpy as jnp

    from laplace_gnn_tpu.curvature.interface import GGNBackend
    from laplace_gnn_tpu.curvature.operators import ggn_vp_tree
    from laplace_gnn_tpu.graph.container import sparse_from_edge_index
    from laplace_gnn_tpu.models import STEGCN
    from laplace_gnn_tpu.parallel import apply_node_order, rcm_order
    from laplace_gnn_tpu.parallel.scaling import (V5E_HBM_BW, format_table,
                                                  projected_scaling)

    model = STEGCN(N_FEAT, HIDDEN, N_CLASS, 2, jnp.asarray(X),
                   jnp.asarray(adj), dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    idx = jnp.arange(n_train)
    be = GGNBackend(model, params, "classification")
    n_edges = float(np.asarray(adj).sum()) + N_NODES

    # --- GGN mat-vec (the curvature hot path; backward reuses the SpMM) ----
    v0 = jax.tree_util.tree_map(jnp.ones_like, be.w)

    @jax.jit
    def ggn_loop(w, K):
        def body(i, v):
            gv = ggn_vp_tree(be.model_fn, "classification", w, idx, v)
            nrm = jnp.sqrt(sum(jnp.sum(l * l)
                               for l in jax.tree_util.tree_leaves(gv)))
            return jax.tree_util.tree_map(
                lambda a: a / jnp.maximum(nrm, 1e-30), gv)
        return jax.lax.fori_loop(0, K, body, v0)

    t_ggn = _median_loop_time(ggn_loop, be.w, 50)
    # one GGN mvp = jvp fwd + vjp bwd = 2 full-graph passes, 2 agg each
    ggn_edges_per_s = 4 * n_edges / t_ggn
    log(f"ggn mat-vec: {t_ggn * 1e3:.3f} ms "
        f"({ggn_edges_per_s / 1e6:.1f}M edges/s effective)")

    # --- sparse SpMM + gather roofline + scaling projection ----------------
    ei = np.asarray(np.nonzero(adj))
    order = rcm_order(ei, N_NODES)
    ei_rcm, = apply_node_order(ei, order)
    g = sparse_from_edge_index(ei_rcm, N_NODES, normalize="sym")
    d = HIDDEN
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N_NODES, d)), jnp.float32)

    @jax.jit
    def spmm_loop(x, K):
        def body(i, x):
            o = g.spmm(x)
            return o / jnp.maximum(jnp.linalg.norm(o), 1e-30)
        return jax.lax.fori_loop(0, K, body, x)

    t_spmm = _median_loop_time(spmm_loop, x0, 200)
    E = g.n_edges
    spmm_edges_per_s = E / t_spmm
    # gather-bound roofline: E rows of d fp32 gathered + N written from HBM
    t_roof = (E * d * 4 + N_NODES * d * 4) / V5E_HBM_BW
    pct_roof = 100.0 * t_roof / t_spmm
    log(f"sparse spmm: {t_spmm * 1e6:.1f} us ({spmm_edges_per_s / 1e6:.1f}M "
        f"edges/s, {pct_roof:.0f}% of HBM gather roofline)")

    rows = projected_scaling(g, d_features=d, t_compute_1chip=t_spmm,
                             n_chips=(2, 4))
    log("projected scaling (RCM-ordered, all_to_all halo):\n"
        + format_table(rows))

    # --- ring dense aggregation: single-chip 2-stage pipeline simulation ---
    # chunked per-panel matmuls (the ring's compute structure) vs the one
    # fused matmul (the all-gather formulation's compute); the difference
    # is the chunking overhead the overlap must pay for
    from laplace_gnn_tpu.parallel.scaling import ring_dense_projection
    a_dense = jnp.asarray(adj)
    n_sim = 4
    Bn = N_NODES // n_sim

    @jax.jit
    def full_mm(x, K):
        def body(i, x):
            o = a_dense @ x
            return o / jnp.maximum(jnp.linalg.norm(o), 1e-30)
        return jax.lax.fori_loop(0, K, body, x)

    @jax.jit
    def chunk_mm(x, K):
        def body(i, x):
            o = sum(a_dense[:, k * Bn:(k + 1) * Bn]
                    @ x[k * Bn:(k + 1) * Bn] for k in range(n_sim))
            return o / jnp.maximum(jnp.linalg.norm(o), 1e-30)
        return jax.lax.fori_loop(0, K, body, x)

    # ~8 us/iter: needs a long chain for the diff to rise above jitter
    t_full = _median_loop_time(full_mm, x0, 1000)
    t_chunk = _median_loop_time(chunk_mm, x0, 500)
    ring_rows = ring_dense_projection(N_NODES, d, t_chunk, n_chips=(2, 4, 8))
    log(f"dense matmul: fused {t_full * 1e6:.1f} us, {n_sim}-chunk "
        f"{t_chunk * 1e6:.1f} us (chunking overhead "
        f"{100 * (t_chunk / t_full - 1):.0f}%)")
    for r in ring_rows:
        log(f"  ring vs all-gather @n={r['n']}: "
            f"{r['t_ring_us']:.1f}us vs {r['t_allgather_us']:.1f}us "
            f"(speedup {r['ring_speedup']:.2f}x, eff "
            f"{r['ring_efficiency']:.2f})")

    return {
        "dense_mm_us": round(t_full * 1e6, 1),
        "dense_mm_chunked_us": round(t_chunk * 1e6, 1),
        "ring_vs_allgather_speedup": {str(r["n"]): round(r["ring_speedup"], 2)
                                      for r in ring_rows},
        "ggn_mvp_ms": round(t_ggn * 1e3, 3),
        "ggn_mvp_medges_per_s": round(ggn_edges_per_s / 1e6, 1),
        "spmm_us": round(t_spmm * 1e6, 1),
        "spmm_medges_per_s": round(spmm_edges_per_s / 1e6, 1),
        # Cora-sized SpMM is LAUNCH-OVERHEAD-BOUND (2708 nodes, ~250 us):
        # this percentage is not a statement about the lowering's quality —
        # the at-scale roofline lives in spmm_roofline_arxiv_recorded below
        # (measured by scripts/bench_spmm_roofline.py at N=169k, where the
        # binding ceiling is the gather engine's per-row-descriptor rate,
        # not sequential HBM bandwidth; BENCH_NOTES "Roofline honesty")
        "spmm_pct_hbm_roofline_cora_launchbound": round(pct_roof, 1),
        "projected_scaling_eff": {str(r["n"]): round(r["efficiency"], 3)
                                  for r in rows},
    }


def bench_full_train(X, adj, y):
    """Whole-training product metric: a 200-epoch Cora-sized STE-GCN
    structure-learning run (80 marglik hypersteps) as ONE jitted program,
    timed warm (the cached-executable path a grid search takes)."""
    import jax
    import jax.numpy as jnp

    from laplace_gnn_tpu.models import STEGCN
    from laplace_gnn_tpu.training import marglik_optimization_scan

    model = STEGCN(N_FEAT, HIDDEN, N_CLASS, 2, jnp.asarray(X),
                   jnp.asarray(adj), dropout_p=0.0)
    params = model.init(jax.random.PRNGKey(0))
    tr, va = np.arange(140), np.arange(140, 640)
    kw = dict(lr=1e-3, lr_adj=0.8, weight_decay=5e-5, n_epochs=200,
              n_hypersteps=10, n_epochs_burnin=50, marglik_frequency=20,
              grad_norm=True, model_type="stegcn")
    log("compiling full-training scan program...")
    marglik_optimization_scan(model, params, tr, y[:140], va, y[140:640],
                              **kw)
    t0 = time.perf_counter()
    r, pf, losses, _, nms = marglik_optimization_scan(
        model, params, tr, y[:140], va, y[140:640], **kw)
    t = time.perf_counter() - t0
    assert np.isfinite(np.asarray(pf["adj"])).all(), "NaN in trained adj"
    log(f"full 200-epoch training (warm, one jitted program): {t:.2f}s "
        f"(loss {losses[0]:.3f}->{losses[-1]:.3f})")
    return t


def bench_torch_cpu(X, adj, y, params_np=None, n_train=140, repeats=1):
    """Torch-CPU hyperstep with the reference's strategy: KFAC factors via
    per-column backward passes with retained graphs (non-detached TYPE2
    sqrt, exactly the fork's curvlinops/kfac.py:631-661 semantics),
    differentiable marglik, backward into the adjacency.

    ``params_np`` pins the weights to the JAX model's, so the printed
    neg_marglik is directly comparable to the JAX reference-semantics value
    (the cross-check main() asserts); without it, fresh random weights."""
    import torch

    torch.set_num_threads(max(torch.get_num_threads(), 8))
    X_t = torch.tensor(X)
    y_t = torch.tensor(y[:n_train])
    if params_np is not None:
        W0 = torch.tensor(params_np["convs"][0]["lin"]["weight"],
                          requires_grad=True)
        b0 = torch.tensor(params_np["convs"][0]["lin"]["bias"],
                          requires_grad=True)
        W1 = torch.tensor(params_np["convs"][1]["lin"]["weight"],
                          requires_grad=True)
        b1 = torch.tensor(params_np["convs"][1]["lin"]["bias"],
                          requires_grad=True)
    else:
        W0 = (torch.randn(HIDDEN, N_FEAT) * 0.05).requires_grad_()
        b0 = torch.zeros(HIDDEN, requires_grad=True)
        W1 = (torch.randn(N_CLASS, HIDDEN) * 0.05).requires_grad_()
        b1 = torch.zeros(N_CLASS, requires_grad=True)
    adj_p = torch.tensor(adj, requires_grad=True)

    def hyperstep():
        # STE binarize + self loops + sym-normalize (reference forward_adj)
        hard = (adj_p > 0.5).float()
        a = adj_p + (hard - adj_p).detach()      # straight-through
        a = a * (1 - torch.eye(N_NODES)) + torch.eye(N_NODES)
        d = a.sum(1).clamp(min=1e-12).pow(-0.5)
        a_norm = d[:, None] * a * d[None, :]

        s0 = X_t @ W0.T + b0                      # tap site 0
        h = torch.relu(a_norm @ s0)
        s1 = h @ W1.T + b1                        # tap site 1
        f = (a_norm @ s1)[:n_train]

        # KFAC factors (TYPE2): A = act cov / N, B = sum_c g_c^T g_c
        p = torch.softmax(f, dim=1)
        sp = p.sqrt()
        S = torch.diag_embed(sp) - p.unsqueeze(2) * sp.unsqueeze(1)
        A0 = X_t.T @ X_t / n_train
        A1 = h.T @ h / n_train
        B = [torch.zeros(s.shape[1], s.shape[1]) for s in (s0, s1)]
        for c in range(N_CLASS):
            g0, g1 = torch.autograd.grad(
                (f * S[:, :, c]).sum(), (s0, s1), retain_graph=True,
                create_graph=True)
            B[0] = B[0] + g0.T @ g0
            B[1] = B[1] + g1.T @ g1

        loss = torch.nn.functional.cross_entropy(f, y_t, reduction="sum")
        logdet = 0.0
        for Bk, Ak in ((B[0], A0), (B[1], A1)):
            lb = torch.linalg.eigvalsh(Bk).clamp(min=0)
            la = torch.linalg.eigvalsh(Ak).clamp(min=0)
            logdet = logdet + torch.log(torch.outer(lb, la) + 1.0).sum()
            logdet = logdet + torch.log(lb + 1.0).sum()  # bias block
        theta2 = (W0 ** 2).sum() + (b0 ** 2).sum() + (W1 ** 2).sum() \
            + (b1 ** 2).sum()
        neg_marglik = loss + 0.5 * (logdet + theta2)
        grad_adj = torch.autograd.grad(neg_marglik, adj_p)[0]
        return neg_marglik.detach(), grad_adj

    hyperstep()  # warmup
    t0 = time.perf_counter()
    for _ in range(repeats):
        nm, g = hyperstep()
    t = (time.perf_counter() - t0) / repeats
    log(f"torch-cpu hyperstep: {t * 1e3:.2f} ms "
        f"(neg_marglik={float(nm):.2f}, |g_adj|={float(g.abs().sum()):.3f})")
    return t, float(nm)


def main():
    rng = np.random.default_rng(0)
    X, adj, y = make_graph(rng)
    t_hyper, t_fwd, edges_per_s, nm_fork, params_np = bench_jax(X, adj, y)
    try:
        extras = bench_absolute(X, adj, y)
    except Exception as e:
        log(f"absolute-metric bench failed: {e}")
        extras = {}
    extras["fwd_ms"] = round(t_fwd * 1e3, 4)
    extras["fwd_medges_per_s"] = round(edges_per_s / 1e6, 1)
    try:
        extras["train_200ep_warm_s"] = round(bench_full_train(X, adj, y), 3)
    except Exception as e:
        log(f"full-training bench failed: {e}")
    try:
        t_torch, nm_torch = bench_torch_cpu(X, adj, y, params_np)
        vs_baseline = t_torch / t_hyper
        # the torch baseline runs the SAME weights and the same math
        # (non-detached TYPE2 sqrt); a disagreement means one side is wrong,
        # so the bench is also the hyperstep cross-check
        rel = abs(nm_torch - nm_fork) / max(abs(nm_fork), 1.0)
        extras["hyperstep_crosscheck_reldiff"] = round(rel, 8)
        log(f"hyperstep cross-check: jax(ref-semantics) {nm_fork:.3f} vs "
            f"torch {nm_torch:.3f} (rel diff {rel:.2e})")
        assert rel < 1e-3, (nm_fork, nm_torch)
    except Exception as e:  # torch missing or OOM: report 1.0
        log(f"torch baseline failed: {e}")
        vs_baseline = 1.0
    # GAT-at-scale numbers recorded by scripts/bench_gat_scale.py on this
    # chip (several minutes of compiles — run separately, merged here so
    # the driver artifact carries them; see BENCH_NOTES "Round 4")
    gat_fn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_GAT.json")
    if os.path.exists(gat_fn):
        with open(gat_fn) as f:
            extras["gat_scale_recorded"] = json.load(f)
    # Laplace-at-scale sweep (scripts/bench_laplace_scale.py): exact type-2
    # vs sketch vs MC at ogbn-arxiv scale, recorded the same way
    ls_fn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAPLACE_SCALE.json")
    if os.path.exists(ls_fn):
        with open(ls_fn) as f:
            extras["laplace_scale_recorded"] = json.load(f)
    # arxiv-scale SpMM roofline (scripts/bench_spmm_roofline.py): the
    # headline roofline entry — aggregation time vs the measured
    # gather-engine descriptor ceiling AND the sequential-HBM bound, at a
    # size where launch overhead is irrelevant
    rf_fn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_SPMM_ROOFLINE.json")
    if os.path.exists(rf_fn):
        with open(rf_fn) as f:
            extras["spmm_roofline_arxiv_recorded"] = json.load(f)
    # SparseGAT at arxiv scale (scripts/bench_sparse_gat.py): the round-5
    # bf16 + runtime-coefficient-ELL attention path
    sg_fn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_SPARSE_GAT.json")
    if os.path.exists(sg_fn):
        with open(sg_fn) as f:
            extras["sparse_gat_scale_recorded"] = json.load(f)
    print(json.dumps({
        "metric": "marglik_hyperstep_ms",
        "value": round(t_hyper * 1e3, 3),
        "unit": "ms",
        # speedup over a torch-CPU reimplementation of the same math (the
        # real reference cannot run here: backpack/asdl absent); see
        # "extras" for absolute, strawman-free numbers
        "vs_baseline": round(vs_baseline, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
