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

from .sharded import build_halo_exchange, _halo_partition, _local_only_aggregate


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


class DcnAggGraph:
    """Duck-typed graph (like parallel.sharded.HaloAggGraph) whose ``spmm``
    runs edge-striped over 'dcn' with ICI halo exchange over 'graph'.
    Construct sparse models with it and the entire training step —
    forward, backward, differentiable KFAC marglik — runs multi-host."""

    def __init__(self, mesh: Mesh, graph, d_features: int = 0):
        self.mesh = mesh
        self.graph = graph
        self.n_nodes = graph.n_nodes
        self.shape = (graph.n_nodes, graph.n_nodes)
        self.spmm, self.put, self.stats = make_dcn_halo_aggregate(
            mesh, graph, d_features)
