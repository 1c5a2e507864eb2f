"""Partitioned aggregation and sharded training steps.

TPU-native scale-out of the flagship workload (no reference counterpart —
the reference is single-device; SURVEY.md §2.5). Two paths:

1. **Automatic (pjit)**: annotate the adjacency with a row sharding over the
   'graph' mesh axis and jit the ordinary training step — XLA partitions the
   N x N @ N x d aggregation and inserts the all-gathers over ICI.

2. **Manual (shard_map)**: ``sharded_aggregate`` expresses the row-block
   partition explicitly — each device holds an (N/n_g, N) block of the
   (normalized) adjacency and its (N/n_g, d) block of features, all-gathers
   the feature blocks over the graph axis, and computes its local output
   block. This is the scaffold the Pallas latency-hiding kernel plugs into
   (overlap all-gather chunks with local matmul).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_aggregate(mesh: Mesh, adj_block: jnp.ndarray,
                      x_block: jnp.ndarray) -> jnp.ndarray:
    """Row-partitioned ``adj @ x`` under shard_map.

    adj_block: (N, N) sharded P('graph', None); x_block: (N, d) sharded
    P('graph', None). Returns (N, d) sharded P('graph', None).
    """

    def local(adj_blk, x_blk):
        x_full = jax.lax.all_gather(x_blk, "graph", axis=0, tiled=True)
        return jnp.dot(adj_blk, x_full, preferred_element_type=x_blk.dtype)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph", None), P("graph", None)),
        out_specs=P("graph", None))(adj_block, x_block)


def make_ring_dense_aggregate(mesh: Mesh, n_nodes: int):
    """Latency-hiding dense aggregation: ``adj @ x`` with the all-gather
    decomposed into a ppermute ring pipelined against per-chunk matmuls.

    ``sharded_aggregate`` all-gathers the full (N, d) feature matrix and
    then runs one (B, N) x (N, d) matmul — the collective and the MXU work
    are serialized. Here each device starts from its own (B, d) block and,
    for n-1 steps, (a) issues the ppermute moving the block one hop around
    the ring and (b) multiplies the (B, B) column panel of its adjacency
    block against the chunk it currently holds. Steps (a) and (b) have no
    data dependence, so XLA's latency-hiding scheduler overlaps each hop
    with the previous chunk's matmul: communication hides behind compute
    whenever t_matmul(B, B, d) >= t_ppermute(B*d), i.e. for
    B >= ici_bytes_per_s / (2 * flops_per_s / d) ... in practice whenever
    the per-chunk panel is MXU-saturating (see parallel/scaling.py to
    price it). The loop is unrolled (n is static) so every hop gets its
    own buffer.

    Returns (aggregate_fn, put): aggregate_fn(adj_sharded, x_sharded) with
    adj (N, N) and x (N, d) both row-sharded over 'graph'. Differentiable
    (ppermute/dot transpose cleanly), so backward/GGN reuse the ring.
    """
    n_parts = mesh.shape["graph"]
    if n_nodes % n_parts != 0:
        raise ValueError(f"n_nodes={n_nodes} must divide n_parts={n_parts}")
    B = n_nodes // n_parts

    def local(adj_blk, x_blk):
        # adj_blk: (B, N); x_blk: (B, d) — my row block of x
        me = jax.lax.axis_index("graph")
        perm = [(q, (q + 1) % n_parts) for q in range(n_parts)]
        out = jnp.zeros((B, x_blk.shape[1]), x_blk.dtype)
        cur = x_blk
        for s in range(n_parts):
            owner = (me - s) % n_parts
            # issue the next hop BEFORE consuming cur: independent ops, so
            # the collective overlaps the matmul below
            nxt = jax.lax.ppermute(cur, "graph", perm) \
                if s + 1 < n_parts else cur
            start = (owner * B).astype(jnp.int32)
            panel = jax.lax.dynamic_slice(
                adj_blk, (jnp.int32(0), start), (B, B))
            out = out + jnp.dot(panel, cur,
                                preferred_element_type=x_blk.dtype)
            cur = nxt
        return out

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph", None), P("graph", None)),
        out_specs=P("graph", None))

    spec = NamedSharding(mesh, P("graph", None))

    def put(x):
        return jax.device_put(x, spec)

    return sharded, put


def make_sharded_train_step(model, mesh: Mesh, loss_fn, lr: float = 0.01):
    """Jitted sharded SGD step over a GNN params pytree whose adjacency is
    row-sharded (automatic partitioning path)."""
    from .mesh import shard_gnn_params

    def step(params, idx, y):
        def obj(p):
            f = model.apply(p, idx)
            return loss_fn(f, y)

        loss, g = jax.value_and_grad(obj)(params)
        params = jax.tree_util.tree_map(lambda x, gx: x - lr * gx, params, g)
        return params, loss

    def shard_params(params):
        shardings = shard_gnn_params(mesh, params)
        return jax.device_put(params, shardings), shardings

    return jax.jit(step), shard_params


# ---------------------------------------------------------------------------
# Edge-partitioned sparse aggregation (the BASELINE.json north star:
# edge-partition the graph, exchange boundary features over ICI, aggregate
# locally; curvature mat-vecs reuse the same path through autodiff)
# ---------------------------------------------------------------------------

def partition_sparse_graph(graph, n_parts: int):
    """Split a SparseGraph's edges by owner of their destination node
    (contiguous node blocks of N/n_parts), padding each device's edge list to a
    common length with zero-weight edges. Returns device-stacked arrays
    (n_parts, E_max) for src, local dst, weights, plus the node block size.
    """
    import numpy as np

    n = graph.n_nodes
    if n % n_parts != 0:
        raise ValueError(f"n_nodes={n} must divide by n_parts={n_parts} "
                         "(pad the graph first)")
    block = n // n_parts
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.weights)
    owner = dst // block
    e_max = int(max((owner == p).sum() for p in range(n_parts)))
    srcs = np.zeros((n_parts, e_max), dtype=np.int32)
    dsts = np.zeros((n_parts, e_max), dtype=np.int32)
    ws = np.zeros((n_parts, e_max), dtype=w.dtype)
    for p in range(n_parts):
        m = owner == p
        k = int(m.sum())
        srcs[p, :k] = src[m]
        dsts[p, :k] = dst[m] - p * block       # local row index
        ws[p, :k] = w[m]
    return jnp.asarray(srcs), jnp.asarray(dsts), jnp.asarray(ws), block


def make_sharded_sparse_aggregate(mesh: Mesh, graph, d_features: int):
    """Returns (aggregate_fn, put) where aggregate_fn(x_sharded) computes
    the edge-partitioned SpMM under shard_map: each device all-gathers the
    boundary node features over the 'graph' ICI axis and segment-sums its
    owned edges into its node block."""
    n_parts = mesh.shape["graph"]
    srcs, dsts, ws, block = partition_sparse_graph(graph, n_parts)

    def local(src_b, dst_b, w_b, x_blk):
        # (1, E), (1, E), (1, E), (block, d)
        x_full = jax.lax.all_gather(x_blk, "graph", axis=0, tiled=True)
        msgs = w_b[0][:, None] * x_full[src_b[0]]
        return jax.ops.segment_sum(msgs, dst_b[0], num_segments=block)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph", None), P("graph", None), P("graph", None),
                  P("graph", None)),
        out_specs=P("graph", None))

    spec = NamedSharding(mesh, P("graph", None))
    srcs = jax.device_put(srcs, spec)
    dsts = jax.device_put(dsts, spec)
    ws = jax.device_put(ws, spec)

    def aggregate_fn(x):
        return sharded(srcs, dsts, ws, x)

    def put(x):
        return jax.device_put(x, spec)

    return aggregate_fn, put


# ---------------------------------------------------------------------------
# Halo exchange: the all_gather above moves the FULL (N, d) feature matrix
# to every device. With contiguous node blocks (especially after
# parallel.rcm_order) each device only needs the *boundary* rows referenced
# by its owned edges — the halo. Exchange exactly those rows with one
# all_to_all over ICI, and issue it BEFORE the local-edge aggregation so
# XLA's latency-hiding scheduler overlaps the collective with the
# independent local segment-sum.
# ---------------------------------------------------------------------------

def _halo_partition(graph, n_parts: int):
    """Shared host-side partition pass for the halo schedules.

    Splits edges by owner of dst into per-device local/remote sets and
    computes ``needed[p][q]`` — the sorted unique sources device p must
    receive from device q. Packing of the remote-edge source indices is
    schedule-specific (flat halo-table layouts differ), so this returns the
    raw pieces plus a packer that takes a ``flat_index(p, q, pos)`` map."""
    import numpy as np

    n = graph.n_nodes
    if n % n_parts != 0:
        raise ValueError(f"n_nodes={n} must divide by n_parts={n_parts} "
                         "(pad the graph first)")
    block = n // n_parts
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    w = np.asarray(graph.weights)
    o_src = src // block
    o_dst = dst // block

    needed = [[np.unique(src[(o_dst == p) & (o_src == q)])
               for q in range(n_parts)] for p in range(n_parts)]

    def pack_edges(flat_index, EL_min: int = 0, ER_min: int = 0):
        el = [((o_dst == p) & (o_src == p)).sum() for p in range(n_parts)]
        er = [((o_dst == p) & (o_src != p)).sum() for p in range(n_parts)]
        EL = max(1, int(max(el)), EL_min)
        ER = max(1, int(max(er)), ER_min)
        src_l = np.zeros((n_parts, EL), np.int32)
        dst_l = np.zeros((n_parts, EL), np.int32)
        w_l = np.zeros((n_parts, EL), w.dtype)
        src_r = np.zeros((n_parts, ER), np.int32)
        dst_r = np.zeros((n_parts, ER), np.int32)
        w_r = np.zeros((n_parts, ER), w.dtype)
        m_l = np.zeros((n_parts, EL), bool)
        m_r = np.zeros((n_parts, ER), bool)
        for p in range(n_parts):
            m = (o_dst == p) & (o_src == p)
            k = int(m.sum())
            src_l[p, :k] = src[m] - p * block
            dst_l[p, :k] = dst[m] - p * block
            w_l[p, :k] = w[m]
            m_l[p, :k] = True
            m = (o_dst == p) & (o_src != p)
            k = int(m.sum())
            sq = o_src[m]
            pos = np.empty(k, np.int64)
            for q in range(n_parts):
                mq = sq == q
                if mq.any():
                    pos[mq] = flat_index(
                        p, q, np.searchsorted(needed[p][q], src[m][mq]))
            src_r[p, :k] = pos
            dst_r[p, :k] = dst[m] - p * block
            w_r[p, :k] = w[m]
            m_r[p, :k] = True
        return {"src_l": src_l, "dst_l": dst_l, "w_l": w_l,
                "src_r": src_r, "dst_r": dst_r, "w_r": w_r,
                "m_l": m_l, "m_r": m_r}

    return needed, pack_edges, block


def halo_widths(graph, n_parts: int, allow_pad: bool = False):
    """(n_parts, n_parts) matrix W[p, q] = rows p needs from q — one
    O(E log E) pass (unique (dst-owner, src) pairs), no plan construction.
    Used by HaloAggGraph's auto schedule to price ring vs all_to_all
    without building both plans.

    ``allow_pad=True`` mirrors what a real run does for non-divisible node
    counts (pad_to_blocks): blocks of size ceil(n/n_parts); padding nodes
    are isolated, so the widths equal those of the padded graph."""
    import numpy as np

    n = graph.n_nodes
    if n % n_parts != 0:
        if not allow_pad:
            raise ValueError(f"n_nodes={n} must divide by n_parts={n_parts} "
                             "(pad the graph first)")
        block = -(-n // n_parts)
        n = block * n_parts
    else:
        block = n // n_parts
    src = np.asarray(graph.src).astype(np.int64)
    dst = np.asarray(graph.dst).astype(np.int64)
    o_src = src // block
    o_dst = dst // block
    pairs = np.unique(o_dst * n + src)          # distinct (receiver, source)
    W = np.bincount((pairs // n) * n_parts + (pairs % n) // block,
                    minlength=n_parts * n_parts).reshape(n_parts, n_parts)
    np.fill_diagonal(W, 0)
    return W


def build_halo_exchange(graph, n_parts: int, H_min: int = 0,
                        EL_min: int = 0, ER_min: int = 0):
    """Host-side halo plan for contiguous node-block partitions
    (all_to_all schedule).

    For each device p (owner of node block [p*B, (p+1)*B)):
      - local edges: both endpoints in block p;
      - remote edges: dst in block p, src owned by q != p.
    ``needed[p][q]`` = sorted unique remote sources p must receive from q.
    All lists are padded to the fleet-wide maximum H so the exchange is one
    static-shape all_to_all of (n_parts, H, d) per device.

    ``H_min``/``EL_min``/``ER_min`` force larger paddings so plans built
    for different edge subsets of one graph stack to a common shape (the
    DCN edge-striping in parallel/distributed.py needs this — remote-edge
    indices encode H, so H must be fixed *before* packing).

    Returns a dict of device-stacked arrays:
      send_idx (n_parts, n_parts, H)  local row q sends to slot (p, k)
      src_l/dst_l/w_l (n_parts, EL)   local edges, dst block-local
      src_r/dst_r/w_r (n_parts, ER)   remote edges, src = flat halo index
      block, H
    """
    import numpy as np

    needed, pack_edges, block = _halo_partition(graph, n_parts)
    H = max(1, H_min,
            max((len(needed[p][q])
                 for p in range(n_parts) for q in range(n_parts)
                 if p != q), default=0))

    send_idx = np.zeros((n_parts, n_parts, H), np.int32)
    for p in range(n_parts):
        for q in range(n_parts):
            if p == q:
                continue
            rows = needed[p][q] - q * block   # local rows on sender q
            send_idx[q, p, :len(rows)] = rows

    plan = pack_edges(lambda p, q, pos: q * H + pos,
                      EL_min=EL_min, ER_min=ER_min)
    plan.update(send_idx=send_idx, block=block, H=H)
    return plan


def _local_only_aggregate(mesh: Mesh, graph):
    """n_parts == 1 degenerate case: no halo, plain segment-sum."""
    spec = NamedSharding(mesh, P("graph", None))

    def aggregate_fn(x):
        return graph.spmm(x)

    def put(x):
        return jax.device_put(x, spec)

    stats = {"halo_rows_per_device": 0,
             "allgather_rows_per_device": 0,
             "comm_volume_ratio": 0.0}
    return aggregate_fn, put, stats


def make_halo_sparse_aggregate(mesh: Mesh, graph, d_features: int = 0):
    """Edge-partitioned SpMM with halo exchange under shard_map.

    Per device and per application, (n_parts-1)*H halo rows cross ICI
    (the all_to_all's self-chunk stays local) instead of the
    N*(n_parts-1)/n_parts rows an all_gather moves
    (``make_sharded_sparse_aggregate``); with RCM-ordered graphs H is a
    small fraction of the block size. The all_to_all is issued before the
    local-edge segment-sum so the collective overlaps with independent
    compute. Differentiable: the cotangent path is the transposed exchange
    (autodiff of all_to_all / segment_sum), so GGN mat-vecs reuse it.

    Returns (aggregate_fn, put, stats) — stats reports ICI-crossing rows
    vs the all_gather baseline.
    """
    n_parts = mesh.shape["graph"]
    if n_parts == 1:
        return _local_only_aggregate(mesh, graph)
    plan = build_halo_exchange(graph, n_parts)
    block, H = plan["block"], plan["H"]

    def local(send_idx_b, src_l, dst_l, w_l, src_r, dst_r, w_r, x_blk):
        # send_idx_b: (1, n_parts, H); x_blk: (block, d)
        buf = x_blk[send_idx_b[0]]                      # (n_parts, H, d)
        halo = jax.lax.all_to_all(buf, "graph", split_axis=0,
                                  concat_axis=0, tiled=False)
        # independent local work — overlaps with the collective
        out = jax.ops.segment_sum(w_l[0][:, None] * x_blk[src_l[0]],
                                  dst_l[0], num_segments=block)
        halo_flat = halo.reshape(n_parts * H, -1)
        out = out + jax.ops.segment_sum(
            w_r[0][:, None] * halo_flat[src_r[0]], dst_r[0],
            num_segments=block)
        return out

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph",), P("graph",), P("graph",), P("graph",),
                  P("graph",), P("graph",), P("graph",), P("graph", None)),
        out_specs=P("graph", None))

    spec = NamedSharding(mesh, P("graph", None))
    dev = {k: jax.device_put(jnp.asarray(v), spec)
           for k, v in plan.items()
           if k not in ("block", "H", "m_l", "m_r")}

    def aggregate_fn(x):
        return sharded(dev["send_idx"], dev["src_l"], dev["dst_l"],
                       dev["w_l"], dev["src_r"], dev["dst_r"], dev["w_r"], x)

    def put(x):
        return jax.device_put(x, spec)

    crossing = (n_parts - 1) * H
    allgather_crossing = graph.n_nodes * (n_parts - 1) // n_parts
    stats = {
        "halo_rows_per_device": crossing,
        "allgather_rows_per_device": allgather_crossing,
        "comm_volume_ratio": crossing / max(allgather_crossing, 1),
    }
    return aggregate_fn, put, stats


def build_ring_halo_exchange(graph, n_parts: int):
    """Ring-schedule halo plan: per hop distance s, device q sends to
    p = (q + s) mod n_parts. Buffers are padded per-shift (H_s = max over
    devices of the rows needed at that distance), not to the global
    worst-case pair — on locality-ordered graphs (rcm_order) only the
    s = 1 and s = n_parts-1 hops carry real rows, so the exchanged volume
    collapses to the true boundary instead of n_parts * max-pair.

    Returns arrays like :func:`build_halo_exchange` plus per-shift
    send-index lists; remote srcs index the concatenated per-shift halo
    table (offsets = cumsum of H_s).
    """
    import numpy as np

    needed, pack_edges, block = _halo_partition(graph, n_parts)
    # per-shift widths: at shift s, receiver p gets from q = (p - s) mod n
    H_s = [max(1, max(len(needed[p][(p - s) % n_parts])
                      for p in range(n_parts)))
           for s in range(1, n_parts)]
    offsets_s = np.concatenate([[0], np.cumsum(H_s)])  # into the halo table

    send_idx = []   # one (n_parts, H_s) array per shift: rows q sends
    for s in range(1, n_parts):
        si = np.zeros((n_parts, H_s[s - 1]), np.int32)
        for q in range(n_parts):
            p = (q + s) % n_parts
            rows = needed[p][q] - q * block
            si[q, :len(rows)] = rows
        send_idx.append(si)

    plan = pack_edges(
        lambda p, q, pos: offsets_s[(p - q) % n_parts - 1] + pos)
    plan.update(send_idx=send_idx, H_s=H_s, block=block)
    return plan


def make_ring_halo_sparse_aggregate(mesh: Mesh, graph, d_features: int = 0):
    """Edge-partitioned SpMM whose halo rides n_parts-1 ``ppermute`` hops
    with per-shift buffer sizes — the ICI-ring formulation of
    :func:`make_halo_sparse_aggregate`. All hops are issued before the
    local-edge segment-sum, so they overlap with independent compute (and
    with each other: each hop uses a disjoint buffer)."""
    n_parts = mesh.shape["graph"]
    if n_parts == 1:
        return _local_only_aggregate(mesh, graph)
    plan = build_ring_halo_exchange(graph, n_parts)
    block = plan["block"]

    def local(src_l, dst_l, w_l, src_r, dst_r, w_r, x_blk, *send_idx):
        halos = []
        for s, si in enumerate(send_idx, start=1):
            buf = x_blk[si[0]]                        # (H_s, d)
            perm = [(q, (q + s) % n_parts) for q in range(n_parts)]
            halos.append(jax.lax.ppermute(buf, "graph", perm))
        out = jax.ops.segment_sum(w_l[0][:, None] * x_blk[src_l[0]],
                                  dst_l[0], num_segments=block)
        halo_flat = jnp.concatenate(halos, axis=0)
        return out + jax.ops.segment_sum(
            w_r[0][:, None] * halo_flat[src_r[0]], dst_r[0],
            num_segments=block)

    n_shifts = n_parts - 1
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph",), P("graph",), P("graph",), P("graph",),
                  P("graph",), P("graph",), P("graph", None))
        + (P("graph",),) * n_shifts,
        out_specs=P("graph", None))

    spec = NamedSharding(mesh, P("graph", None))
    dev = {k: jax.device_put(jnp.asarray(v), spec)
           for k, v in plan.items()
           if k in ("src_l", "dst_l", "w_l", "src_r", "dst_r", "w_r")}
    send_dev = tuple(jax.device_put(jnp.asarray(si), spec)
                     for si in plan["send_idx"])

    def aggregate_fn(x):
        return sharded(dev["src_l"], dev["dst_l"], dev["w_l"],
                       dev["src_r"], dev["dst_r"], dev["w_r"], x, *send_dev)

    def put(x):
        return jax.device_put(x, spec)

    crossing = int(sum(plan["H_s"]))
    allgather_crossing = graph.n_nodes * (n_parts - 1) // n_parts
    stats = {
        "halo_rows_per_device": crossing,
        "allgather_rows_per_device": allgather_crossing,
        "comm_volume_ratio": crossing / max(allgather_crossing, 1),
        "H_s": plan["H_s"],
    }
    return aggregate_fn, put, stats


class HaloAggGraph:
    """Duck-typed stand-in for SparseGraph/FastAggGraph inside the sparse
    models: aggregation runs edge-partitioned over the mesh's 'graph' axis
    with halo exchange. Construct the model with ``HaloAggGraph(mesh, g)``
    and the whole training step — forward, backward, KFAC taps — is
    sharded; everything composes because the exchange is an ordinary
    differentiable jit region.

    Supported models: SparseGCN and SparseSAGE aggregate via
    ``graph.spmm``; SparseGAT routes its edge-softmax attention through
    :meth:`gat_aggregate` (halo of the transformed h rows, combined
    local+remote segment softmax).
    """

    def __init__(self, mesh: Mesh, graph, d_features: int = 0,
                 schedule: str = "auto"):
        self.mesh = mesh
        self.graph = graph
        self.n_nodes = graph.n_nodes
        self.shape = (graph.n_nodes, graph.n_nodes)
        self._gat = None
        if schedule not in ("auto", "alltoall", "ring"):
            raise ValueError(f"Unknown halo schedule {schedule!r}")
        n_parts = mesh.shape["graph"]
        if schedule == "auto" and n_parts > 1:
            # Price both schedules from the width matrix alone (one cheap
            # pass, no plan construction). ICI-crossing rows: ring pads
            # per shift, all_to_all pads every pair to the global max but
            # its self-chunk stays local. Prefer the single fused
            # all_to_all when ring saves <20% — fewer collectives wins on
            # latency for near-uniform traffic.
            W = halo_widths(graph, n_parts)
            H = int(W.max())
            ring_rows = sum(
                max(1, max(int(W[p][(p - s) % n_parts])
                           for p in range(n_parts)))
                for s in range(1, n_parts))
            a2a_rows = (n_parts - 1) * max(1, H)
            schedule = "ring" if ring_rows < 0.8 * a2a_rows else "alltoall"
        elif schedule == "auto":
            schedule = "alltoall"     # degenerate single-part mesh
        self.schedule = schedule
        maker = (make_ring_halo_sparse_aggregate if schedule == "ring"
                 else make_halo_sparse_aggregate)
        self.spmm, self.put, self.stats = maker(mesh, graph, d_features)

    def gat_aggregate(self, h, att_src, att_dst, negative_slope):
        """Halo-partitioned GAT edge-softmax aggregation (built lazily;
        see :func:`make_halo_gat_aggregate`). ``h`` is (N, heads, F)."""
        if self._gat is None:
            self._gat = make_halo_gat_aggregate(self.mesh, self.graph,
                                                schedule=self.schedule)[0]
        return self._gat(h, att_src, att_dst, negative_slope)


def make_row_sharded_gat_attention(mesh: Mesh, row_block: Optional[int] = 512,
                                   use_flash: bool = False):
    """Row-partitioned DENSE-adjacency GAT attention under shard_map — the
    scaling path for dense GAT *structure learning*, where the adjacency is
    the learnable N x N object (the sparse halo GAT above serves fixed
    graphs).

    Each device owns a (N/n_g, N) row block of the adjacency and computes
    the masked softmax for its target rows. Only the small per-node tensors
    cross ICI: one all_gather of alpha_src (N, heads) and one of h
    (N, heads, F) — O(N * hidden) bytes vs the O(N^2) adjacency, which
    never moves. Within a device the flash-style row-blocked kernel
    (models/layers.py::_masked_attention_chunked) bounds attention memory
    to row_block * N * heads.

    Why shard_map and not jit auto-sharding: the row-blocked kernel slices
    the adjacency at traced offsets (lax.map over dynamic_slice), which the
    SPMD partitioner cannot prove local — it replicates the whole program
    per device (measured: 8-device temps EQUAL single-device at N=8192).
    Under shard_map the locality is stated, not inferred.

    Returns ``attention(alpha_src, alpha_dst, adj, h, negative_slope)``
    with adj/alpha_dst/h row-sharded P('graph', ...) and output row-sharded
    — a drop-in ``GATConv.attention_impl``. Fully differentiable (vjp of
    all_gather is a reduce-scatter; jvp passes through), so the KFAC
    hyperstep's pullbacks ride the same path.
    """
    n_parts = mesh.shape["graph"]

    def attention(alpha_src, alpha_dst, adj, h, negative_slope):
        from ..models.layers import (_masked_attention_chunked,
                                     _masked_attention_dense)

        def local(a_src_blk, a_dst_blk, adj_blk, h_blk):
            a_src = jax.lax.all_gather(a_src_blk, "graph", axis=0,
                                       tiled=True)            # (N, H)
            h_full = jax.lax.all_gather(h_blk, "graph", axis=0,
                                        tiled=True)           # (N, H, F)
            if use_flash:
                # fused online-softmax Pallas kernel per device block
                # (ops/pallas_attention; falls back to the XLA path on
                # CPU meshes) — the kernel accepts the same R <= N
                # row-shard contract
                from ..ops.pallas_attention import flash_masked_attention
                return flash_masked_attention(a_src, a_dst_blk, adj_blk,
                                              h_full, negative_slope)
            if row_block and row_block < adj_blk.shape[0]:
                return _masked_attention_chunked(
                    a_src, a_dst_blk, adj_blk, h_full, negative_slope,
                    row_block)
            return _masked_attention_dense(a_src, a_dst_blk, adj_blk,
                                           h_full, negative_slope)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("graph", None), P("graph", None),
                      P("graph", None), P("graph", None, None)),
            out_specs=P("graph", None, None))(alpha_src, alpha_dst, adj, h)

    return attention


def make_halo_gat_aggregate(mesh: Mesh, graph, schedule: str = "alltoall"):
    """Halo-partitioned GAT edge-softmax aggregation.

    GAT needs, per owned edge, the *transformed* source row h[src] (for
    both the attention logit's a_src term and the message) — h = lin(x) is
    row-wise, so each device transforms its own block and the halo
    exchange moves h rows exactly like SpMM moves x rows (``schedule``:
    'alltoall' = one fused collective, 'ring' = per-shift ppermute hops,
    same trade-off as the SpMM schedules). The edge softmax combines the
    local and remote edge sets of each destination segment (shared max,
    summed denominators); padding edges are masked out via the plan's
    explicit real-edge masks — a zero weight silences a pad in a
    segment-*sum*, but would still contribute exp(score) to a softmax
    denominator, and real edges may legitimately carry weight 0.

    Returns (gat_fn, put) with
    ``gat_fn(h, att_src, att_dst, negative_slope) -> (N, heads, F)``
    where h is the (N, heads, F) transformed-and-reshaped features and
    att_src/att_dst are the (1, heads, F) attention vectors (traced —
    gradients flow into them).
    """
    n_parts = mesh.shape["graph"]
    spec = NamedSharding(mesh, P("graph", None))

    if n_parts == 1:
        def gat_fn_local(h, att_src, att_dst, negative_slope):
            g = graph
            n = h.shape[0]
            a_src = jnp.sum(h * att_src, axis=-1)
            a_dst = jnp.sum(h * att_dst, axis=-1)
            scores = jax.nn.leaky_relu(a_src[g.src] + a_dst[g.dst],
                                       negative_slope)
            smax = jax.ops.segment_max(scores, g.dst, num_segments=n)
            ex = jnp.exp(scores - smax[g.dst])
            denom = jax.ops.segment_sum(ex, g.dst, num_segments=n)
            coeff = ex / jnp.maximum(denom[g.dst], 1e-16)
            return jax.ops.segment_sum(coeff[:, :, None] * h[g.src], g.dst,
                                       num_segments=n)

        return gat_fn_local, (lambda x: jax.device_put(x, spec))

    ring = schedule == "ring"
    plan = (build_ring_halo_exchange if ring
            else build_halo_exchange)(graph, n_parts)
    block = plan["block"]
    n_shifts = n_parts - 1

    def _edge_softmax(h_blk, halo_flat, src_l, dst_l, ml, src_r, dst_r, mr,
                      att_s, att_d, slope):
        neg = jnp.asarray(-1e30, h_blk.dtype)
        a_src_blk = jnp.sum(h_blk * att_s, axis=-1)          # (B, heads)
        a_dst_blk = jnp.sum(h_blk * att_d, axis=-1)
        a_src_halo = jnp.sum(halo_flat * att_s, axis=-1)     # (nH, heads)

        s_l = jax.nn.leaky_relu(a_src_blk[src_l] + a_dst_blk[dst_l], slope)
        s_r = jax.nn.leaky_relu(a_src_halo[src_r] + a_dst_blk[dst_r], slope)
        s_l = jnp.where(ml[:, None], s_l, neg)
        s_r = jnp.where(mr[:, None], s_r, neg)
        smax = jnp.maximum(
            jax.ops.segment_max(s_l, dst_l, num_segments=block),
            jax.ops.segment_max(s_r, dst_r, num_segments=block))
        smax = jnp.where(smax > neg / 2, smax, 0.0)
        ex_l = jnp.where(ml[:, None], jnp.exp(s_l - smax[dst_l]), 0.0)
        ex_r = jnp.where(mr[:, None], jnp.exp(s_r - smax[dst_r]), 0.0)
        denom = (jax.ops.segment_sum(ex_l, dst_l, num_segments=block)
                 + jax.ops.segment_sum(ex_r, dst_r, num_segments=block))
        c_l = ex_l / jnp.maximum(denom[dst_l], 1e-16)
        c_r = ex_r / jnp.maximum(denom[dst_r], 1e-16)
        out = jax.ops.segment_sum(c_l[:, :, None] * h_blk[src_l], dst_l,
                                  num_segments=block)
        return out + jax.ops.segment_sum(
            c_r[:, :, None] * halo_flat[src_r], dst_r, num_segments=block)

    def local(src_l, dst_l, ml, src_r, dst_r, mr, h_blk, att_s, att_d,
              slope, *send_idx):
        heads, F = h_blk.shape[1], h_blk.shape[2]
        if ring:
            halos = []
            for s, si in enumerate(send_idx, start=1):
                buf = h_blk[si[0]]                     # (H_s, heads, F)
                perm = [(q, (q + s) % n_parts) for q in range(n_parts)]
                halos.append(jax.lax.ppermute(buf, "graph", perm))
            halo_flat = jnp.concatenate(halos, axis=0)
        else:
            buf = h_blk[send_idx[0][0]]          # (n_parts, H, heads, F)
            halo = jax.lax.all_to_all(buf, "graph", split_axis=0,
                                      concat_axis=0, tiled=False)
            halo_flat = halo.reshape(-1, heads, F)
        return _edge_softmax(h_blk, halo_flat, src_l[0], dst_l[0], ml[0],
                             src_r[0], dst_r[0], mr[0], att_s, att_d,
                             slope)

    n_send = n_shifts if ring else 1
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("graph",), P("graph",), P("graph",), P("graph",),
                  P("graph",), P("graph",), P("graph", None, None),
                  P(), P(), P()) + (P("graph",),) * n_send,
        out_specs=P("graph", None, None))

    # Keep the plan as host arrays and convert per call: gat_fn may be
    # (lazily) built inside an enclosing jit trace, where device_put would
    # produce tracers that must not be cached across traces. jnp.asarray
    # of a numpy constant is safe in any trace.
    host = {k: plan[k] for k in ("src_l", "dst_l", "m_l", "src_r",
                                 "dst_r", "m_r")}
    send_host = (tuple(plan["send_idx"]) if ring
                 else (plan["send_idx"],))

    def gat_fn(h, att_src, att_dst, negative_slope):
        a = {k: jnp.asarray(v) for k, v in host.items()}
        send = tuple(jnp.asarray(si) for si in send_host)
        return sharded(a["src_l"], a["dst_l"], a["m_l"],
                       a["src_r"], a["dst_r"], a["m_r"],
                       h, att_src, att_dst,
                       jnp.asarray(negative_slope, h.dtype), *send)

    def put(x):
        return jax.device_put(x, spec)

    return gat_fn, put

