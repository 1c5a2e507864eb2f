"""Multi-host (DCN) scale-out.

The reference is single-process torch (SURVEY.md §2.5: no torch.distributed
anywhere), so this layer is designed fresh, TPU-first:

- **Launch**: :func:`initialize` wraps ``jax.distributed.initialize`` (env-var
  driven, idempotent) so ``python -m ...`` per host turns N hosts into one
  JAX runtime.
- **Mesh**: :func:`make_hybrid_mesh` builds a 3-axis ('dcn', 'graph',
  'model') mesh where each process's local devices form one contiguous
  graph x model tile. Collectives over 'graph'/'model' therefore stay on
  ICI within a host; only collectives over 'dcn' cross the (slow) data-
  center network.
- **Aggregation**: :func:`make_dcn_halo_aggregate` stripes the edge set
  across 'dcn' slices. Within a slice the existing halo machinery
  (parallel/sharded.py) exchanges boundary node features over ICI; each
  slice produces a *partial* aggregation from its owned edges, and one
  ``psum`` over 'dcn' — a single (N/n_graph, d)-sized reduction per
  aggregation — is the only traffic that crosses DCN. This matches the
  scaling-book recipe: bandwidth-hungry gather/scatter on ICI,
  latency-tolerant reductions on DCN.
- **Model integration**: :class:`DcnAggGraph` is a duck-typed graph whose
  ``spmm`` is the DCN aggregation, so SparseGCN/SparseSAGE (and the
  KFAC-marglik machinery, which differentiates straight through the
  collectives) run multi-host unchanged.

Single-process validation: every function also accepts a purely local
hybrid mesh (``make_hybrid_mesh(dcn_parallel=k)`` splits the local devices),
so correctness is testable on the virtual CPU mesh; a true multi-process
CPU test lives in tests/test_distributed.py (Gloo collectives).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded import (build_halo_exchange, make_halo_gat_aggregate,
                      _halo_partition, _local_only_aggregate)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the JAX distributed runtime (idempotent).

    Arguments default to the environment variables
    ``LAPLACE_GNN_COORDINATOR`` / ``LAPLACE_GNN_NUM_PROCESSES`` /
    ``LAPLACE_GNN_PROCESS_ID`` (and, like ``jax.distributed.initialize``
    itself, to cluster auto-detection when launched under a recognized
    scheduler). Returns True when running multi-process after the call.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "LAPLACE_GNN_COORDINATOR")
    if num_processes is None and "LAPLACE_GNN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["LAPLACE_GNN_NUM_PROCESSES"])
    if process_id is None and "LAPLACE_GNN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["LAPLACE_GNN_PROCESS_ID"])
    # NOTE: jax.process_count()/jax.devices() must not run before
    # jax.distributed.initialize (they would initialize the XLA backend
    # single-process), so idempotence is checked via is_initialized().
    if not jax.distributed.is_initialized():
        if coordinator_address is None and num_processes is None:
            return False
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count() > 1


def make_hybrid_mesh(dcn_parallel: Optional[int] = None,
                     model_parallel: int = 1,
                     axis_names: Sequence[str] = ("dcn", "graph", "model"),
                     n_devices: Optional[int] = None) -> Mesh:
    """3-axis mesh ('dcn', 'graph', 'model').

    Multi-process: 'dcn' is the process axis — devices are grouped by
    ``process_index`` so each process's local devices form one
    graph x model tile (ICI), and 'dcn' neighbors live on different hosts
    (DCN). ``dcn_parallel`` defaults to ``jax.process_count()`` and, when
    larger, further splits each host tile (hierarchical DCN-within-host —
    useful only for validation).

    Single-process: ``dcn_parallel`` (default 1) splits the local devices,
    giving the same program shape on a virtual mesh.
    """
    devices = jax.devices()
    n_proc = jax.process_count()
    if n_devices is not None:
        if n_proc > 1:
            raise ValueError("n_devices limit is single-process only")
        devices = devices[:n_devices]
    if dcn_parallel is None:
        dcn_parallel = n_proc
    n = len(devices)
    if dcn_parallel % n_proc != 0 and n_proc % dcn_parallel != 0:
        raise ValueError(f"dcn_parallel={dcn_parallel} incompatible with "
                         f"{n_proc} processes")
    if n % (dcn_parallel * model_parallel) != 0:
        raise ValueError(f"{n} devices not divisible by dcn_parallel * "
                         f"model_parallel = {dcn_parallel}*{model_parallel}")
    graph_parallel = n // (dcn_parallel * model_parallel)
    # order devices so the dcn axis varies slowest BY PROCESS: within one
    # dcn slice all devices share a host (ICI), across slices they do not
    order = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.array(order).reshape(dcn_parallel, graph_parallel,
                                   model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))


def stripe_edges(graph, n_dcn: int):
    """Round-robin edge striping: slice k owns edges ``k::n_dcn``.

    Returns a list of n_dcn lightweight views (n_nodes/src/dst/weights)
    over the same node set — inputs to the per-slice halo plans. Striping
    (vs contiguous split) balances edge counts and spreads each block's
    boundary evenly across slices, so per-slice halo widths stay near
    E_halo/n_dcn.
    """
    import types

    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.weights)
    return [types.SimpleNamespace(n_nodes=graph.n_nodes, src=src[k::n_dcn],
                                  dst=dst[k::n_dcn], weights=w[k::n_dcn])
            for k in range(n_dcn)]


def make_dcn_halo_aggregate(mesh: Mesh, graph, d_features: int = 0):
    """Edge-striped, halo-exchanged SpMM over a ('dcn', 'graph'[, 'model'])
    mesh.

    DCN slice k owns edges ``k::n_dcn``; within the slice, boundary node
    features move over the ICI 'graph' axis (one all_to_all, issued before
    the local segment-sum so it overlaps). Partial per-block outputs are
    then ``psum``-reduced over 'dcn' — the only DCN-crossing collective.
    Fully differentiable (the transpose is a psum-then-transposed-exchange),
    so GGN/KFAC mat-vecs reuse the path.

    Returns (aggregate_fn, put, stats).
    """
    n_dcn = mesh.shape["dcn"]
    n_graph = mesh.shape["graph"]
    if n_dcn == 1 and n_graph == 1:
        return _local_only_aggregate(mesh, graph)

    slices = stripe_edges(graph, n_dcn)
    if n_graph == 1:
        return _dcn_only_aggregate(mesh, graph, slices)

    # common paddings across slices: remote-src indices encode H, so H must
    # be fixed before packing (build_halo_exchange H_min)
    widths, els, ers = [], [], []
    for s in slices:
        needed, _, _ = _halo_partition(s, n_graph)
        widths.append(max((len(needed[p][q]) for p in range(n_graph)
                           for q in range(n_graph) if p != q), default=0))
        o_src = np.asarray(s.src) // (graph.n_nodes // n_graph)
        o_dst = np.asarray(s.dst) // (graph.n_nodes // n_graph)
        els.append(int(max(((o_dst == p) & (o_src == p)).sum()
                           for p in range(n_graph))))
        ers.append(int(max(((o_dst == p) & (o_src != p)).sum()
                           for p in range(n_graph))))
    H = max(1, max(widths))
    EL, ER = max(1, max(els)), max(1, max(ers))

    plans = [build_halo_exchange(s, n_graph, H_min=H, EL_min=EL, ER_min=ER)
             for s in slices]
    block = plans[0]["block"]
    stacked = {k: np.stack([pl[k] for pl in plans])
               for k in ("send_idx", "src_l", "dst_l", "w_l",
                         "src_r", "dst_r", "w_r")}

    def local(send_idx_b, src_l, dst_l, w_l, src_r, dst_r, w_r, x_blk):
        # plan arrays: (1, 1, ...) per device; x_blk: (block, d)
        buf = x_blk[send_idx_b[0, 0]]                 # (n_graph, H, d)
        halo = jax.lax.all_to_all(buf, "graph", split_axis=0,
                                  concat_axis=0, tiled=False)
        out = jax.ops.segment_sum(w_l[0, 0][:, None] * x_blk[src_l[0, 0]],
                                  dst_l[0, 0], num_segments=block)
        halo_flat = halo.reshape(n_graph * H, -1)
        out = out + jax.ops.segment_sum(
            w_r[0, 0][:, None] * halo_flat[src_r[0, 0]], dst_r[0, 0],
            num_segments=block)
        # the ONLY DCN-crossing collective: one (block, d) reduction
        return jax.lax.psum(out, "dcn")

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dcn", "graph"),) * 7 + (P("graph", None),),
        out_specs=P("graph", None))

    x_spec = NamedSharding(mesh, P("graph", None))

    def aggregate_fn(x):
        # plan arrays stay host-side and are materialized inside the trace:
        # multi-process jit cannot close over globally-sharded device
        # constants (and tracers must not be cached across traces)
        a = {k: jnp.asarray(v) for k, v in stacked.items()}
        return sharded(a["send_idx"], a["src_l"], a["dst_l"],
                       a["w_l"], a["src_r"], a["dst_r"], a["w_r"], x)

    def put(x):
        return jax.device_put(x, x_spec)

    ici_rows = (n_graph - 1) * H                  # per device, per apply
    dcn_rows = block                              # psum payload rows
    stats = {"halo_rows_per_device": ici_rows,
             "dcn_psum_rows_per_device": dcn_rows,
             "H": H, "n_dcn": n_dcn, "n_graph": n_graph}
    return aggregate_fn, put, stats


def _dcn_only_aggregate(mesh: Mesh, graph, slices):
    """Degenerate n_graph == 1 case: each dcn slice segment-sums its edge
    stripe over the full (replicated) feature matrix, then psums."""
    n_nodes = graph.n_nodes
    E = max(max(len(s.src) for s in slices), 1)
    src = np.zeros((len(slices), E), np.int32)
    dst = np.zeros((len(slices), E), np.int32)
    w = np.zeros((len(slices), E), np.asarray(graph.weights).dtype)
    for k, s in enumerate(slices):
        src[k, :len(s.src)] = s.src
        dst[k, :len(s.dst)] = s.dst
        w[k, :len(s.weights)] = s.weights

    def local(src_b, dst_b, w_b, x):
        out = jax.ops.segment_sum(w_b[0][:, None] * x[src_b[0]], dst_b[0],
                                  num_segments=n_nodes)
        return jax.lax.psum(out, "dcn")

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dcn"), P("dcn"), P("dcn"), P()),
        out_specs=P())

    rep = NamedSharding(mesh, P())

    def aggregate_fn(x):
        # host-side plan arrays, materialized per trace (see above)
        return sharded(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), x)

    def put(x):
        return jax.device_put(x, rep)

    stats = {"halo_rows_per_device": 0,
             "dcn_psum_rows_per_device": n_nodes,
             "H": 0, "n_dcn": len(slices), "n_graph": 1}
    return aggregate_fn, put, stats


def make_dcn_gat_aggregate(mesh: Mesh, graph):
    """Edge-striped multi-host GAT edge-softmax over a
    ('dcn', 'graph'[, 'model']) mesh.

    GAT's per-destination softmax needs a cross-slice reduction when edges
    are DCN-striped: a destination's neighbor set is split across slices, so
    neither the max-shift nor the denominator is local to one slice. The
    same two-pass trick the ICI halo GAT uses across its local/remote edge
    sets (sharded.py::_edge_softmax) runs here across the 'dcn' axis:

      1. each slice computes per-destination score maxima over its owned
         edges; one ``pmax`` over 'dcn' makes the shift global. The shift is
         value-irrelevant (softmax(s - c) is independent of c), so it is
         taken under ``stop_gradient`` — gradients stay exact and the pmax
         never enters the AD graph;
      2. each slice computes its partial softmax numerator (block, heads, F)
         and denominator (block, heads); one fused ``psum`` over 'dcn'
         completes both, and the quotient is the attention output.

    Within a slice, boundary h-rows move over the ICI 'graph' axis exactly
    like the SpMM halo (shared plan machinery, common padded widths across
    slices). DCN traffic per apply: one (block, heads) pmax + one
    (block, heads, (F+1)) psum — same order as the SpMM DCN psum.

    Reference being scaled: the dense (N, N, heads) masked softmax of
    gnn/models/layers.py:101-124, which is single-device by construction.

    Returns (gat_fn, put) with
    ``gat_fn(h, att_src, att_dst, negative_slope) -> (N, heads, F)``.
    """
    n_dcn = mesh.shape["dcn"]
    n_graph = mesh.shape["graph"]
    if n_dcn == 1:
        # no DCN striping — intra-slice halo GAT (psum-free); shard_map
        # specs over 'graph' simply replicate across the size-1 'dcn' axis
        return make_halo_gat_aggregate(mesh, graph)

    slices = stripe_edges(graph, n_dcn)
    if n_graph == 1:
        return _dcn_only_gat(mesh, graph, slices)

    # common halo/edge paddings across slices (remote-src indices encode H,
    # so H must be fixed before packing — same constraint as the SpMM path)
    widths, els, ers = [], [], []
    for s in slices:
        needed, _, _ = _halo_partition(s, n_graph)
        widths.append(max((len(needed[p][q]) for p in range(n_graph)
                           for q in range(n_graph) if p != q), default=0))
        o_src = np.asarray(s.src) // (graph.n_nodes // n_graph)
        o_dst = np.asarray(s.dst) // (graph.n_nodes // n_graph)
        els.append(int(max(((o_dst == p) & (o_src == p)).sum()
                           for p in range(n_graph))))
        ers.append(int(max(((o_dst == p) & (o_src != p)).sum()
                           for p in range(n_graph))))
    H = max(1, max(widths))
    EL, ER = max(1, max(els)), max(1, max(ers))

    plans = [build_halo_exchange(s, n_graph, H_min=H, EL_min=EL, ER_min=ER)
             for s in slices]
    block = plans[0]["block"]
    stacked = {k: np.stack([pl[k] for pl in plans])
               for k in ("send_idx", "src_l", "dst_l", "m_l",
                         "src_r", "dst_r", "m_r")}

    def local(send_idx_b, src_l, dst_l, ml, src_r, dst_r, mr,
              h_blk, att_s, att_d, slope):
        heads, F = h_blk.shape[1], h_blk.shape[2]
        buf = h_blk[send_idx_b[0, 0]]          # (n_graph, H, heads, F)
        halo = jax.lax.all_to_all(buf, "graph", split_axis=0,
                                  concat_axis=0, tiled=False)
        halo_flat = halo.reshape(n_graph * H, heads, F)
        sl, dl, ml_ = src_l[0, 0], dst_l[0, 0], ml[0, 0]
        sr, dr, mr_ = src_r[0, 0], dst_r[0, 0], mr[0, 0]

        neg = jnp.asarray(-1e30, h_blk.dtype)
        a_src_blk = jnp.sum(h_blk * att_s, axis=-1)          # (block, heads)
        a_dst_blk = jnp.sum(h_blk * att_d, axis=-1)
        a_src_halo = jnp.sum(halo_flat * att_s, axis=-1)     # (n_graph*H, heads)
        s_l = jax.nn.leaky_relu(a_src_blk[sl] + a_dst_blk[dl], slope)
        s_r = jax.nn.leaky_relu(a_src_halo[sr] + a_dst_blk[dr], slope)
        s_l = jnp.where(ml_[:, None], s_l, neg)
        s_r = jnp.where(mr_[:, None], s_r, neg)

        smax = jnp.maximum(
            jax.ops.segment_max(s_l, dl, num_segments=block),
            jax.ops.segment_max(s_r, dr, num_segments=block))
        smax = jax.lax.pmax(jax.lax.stop_gradient(smax), "dcn")
        smax = jnp.where(smax > neg / 2, smax, 0.0)

        ex_l = jnp.where(ml_[:, None], jnp.exp(s_l - smax[dl]), 0.0)
        ex_r = jnp.where(mr_[:, None], jnp.exp(s_r - smax[dr]), 0.0)
        denom = (jax.ops.segment_sum(ex_l, dl, num_segments=block)
                 + jax.ops.segment_sum(ex_r, dr, num_segments=block))
        numer = (jax.ops.segment_sum(ex_l[:, :, None] * h_blk[sl], dl,
                                     num_segments=block)
                 + jax.ops.segment_sum(ex_r[:, :, None] * halo_flat[sr], dr,
                                       num_segments=block))
        denom, numer = jax.lax.psum((denom, numer), "dcn")
        return numer / jnp.maximum(denom[:, :, None], 1e-16)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dcn", "graph"),) * 7
        + (P("graph", None, None), P(), P(), P()),
        out_specs=P("graph", None, None))

    spec = NamedSharding(mesh, P("graph", None))

    def gat_fn(h, att_src, att_dst, negative_slope):
        # host-side plan arrays, materialized per trace (see
        # make_dcn_halo_aggregate)
        a = {k: jnp.asarray(v) for k, v in stacked.items()}
        return sharded(a["send_idx"], a["src_l"], a["dst_l"], a["m_l"],
                       a["src_r"], a["dst_r"], a["m_r"],
                       h, att_src, att_dst,
                       jnp.asarray(negative_slope, h.dtype))

    def put(x):
        return jax.device_put(x, spec)

    return gat_fn, put


def _dcn_only_gat(mesh: Mesh, graph, slices):
    """Degenerate n_graph == 1 case: each dcn slice computes the partial
    softmax over its edge stripe on the replicated h; pmax + psum finish."""
    n_nodes = graph.n_nodes
    E = max(max(len(s.src) for s in slices), 1)
    src = np.zeros((len(slices), E), np.int32)
    dst = np.zeros((len(slices), E), np.int32)
    m = np.zeros((len(slices), E), bool)
    for k, s in enumerate(slices):
        src[k, :len(s.src)] = s.src
        dst[k, :len(s.dst)] = s.dst
        m[k, :len(s.src)] = True

    def local(src_b, dst_b, m_b, h, att_s, att_d, slope):
        sb, db, mb = src_b[0], dst_b[0], m_b[0]
        neg = jnp.asarray(-1e30, h.dtype)
        a_src = jnp.sum(h * att_s, axis=-1)
        a_dst = jnp.sum(h * att_d, axis=-1)
        s = jax.nn.leaky_relu(a_src[sb] + a_dst[db], slope)
        s = jnp.where(mb[:, None], s, neg)
        smax = jax.ops.segment_max(s, db, num_segments=n_nodes)
        smax = jax.lax.pmax(jax.lax.stop_gradient(smax), "dcn")
        smax = jnp.where(smax > neg / 2, smax, 0.0)
        ex = jnp.where(mb[:, None], jnp.exp(s - smax[db]), 0.0)
        denom = jax.ops.segment_sum(ex, db, num_segments=n_nodes)
        numer = jax.ops.segment_sum(ex[:, :, None] * h[sb], db,
                                    num_segments=n_nodes)
        denom, numer = jax.lax.psum((denom, numer), "dcn")
        return numer / jnp.maximum(denom[:, :, None], 1e-16)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dcn"), P("dcn"), P("dcn"), P(), P(), P(), P()),
        out_specs=P())

    rep = NamedSharding(mesh, P())

    def gat_fn(h, att_src, att_dst, negative_slope):
        return sharded(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(m),
                       h, att_src, att_dst,
                       jnp.asarray(negative_slope, h.dtype))

    def put(x):
        return jax.device_put(x, rep)

    return gat_fn, put


class DcnAggGraph:
    """Duck-typed graph (like parallel.sharded.HaloAggGraph) whose ``spmm``
    runs edge-striped over 'dcn' with ICI halo exchange over 'graph'.
    Construct sparse models with it and the entire training step —
    forward, backward, differentiable KFAC marglik — runs multi-host.

    SparseGCN/SparseSAGE aggregate via :meth:`spmm`; SparseGAT routes its
    edge-softmax through :meth:`gat_aggregate` (cross-slice two-pass
    softmax, see :func:`make_dcn_gat_aggregate`)."""

    def __init__(self, mesh: Mesh, graph, d_features: int = 0):
        self.mesh = mesh
        self.graph = graph
        self.n_nodes = graph.n_nodes
        self.shape = (graph.n_nodes, graph.n_nodes)
        self._gat = None
        self.spmm, self.put, self.stats = make_dcn_halo_aggregate(
            mesh, graph, d_features)

    def gat_aggregate(self, h, att_src, att_dst, negative_slope):
        """DCN-striped GAT edge-softmax aggregation (built lazily).
        ``h`` is (N, heads, F)."""
        if self._gat is None:
            self._gat = make_dcn_gat_aggregate(self.mesh, self.graph)[0]
        return self._gat(h, att_src, att_dst, negative_slope)
