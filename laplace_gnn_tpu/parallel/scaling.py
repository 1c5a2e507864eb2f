"""Projected multi-chip scaling efficiency from single-chip measurements.

Multi-chip hardware is not always available; this module converts
quantities that CAN be measured on one chip — per-aggregation compute time
and the partition's halo widths — into a projected scaling curve using an
ICI/DCN bandwidth cost model (the scaling-book approach: compute splits
with the partition, communication is volume / bandwidth, and a collective
issued before independent local work overlaps with it).

Default link bandwidths are TPU v5e numbers: ICI ~4.5e10 B/s per direction
per link (2-D torus), DCN ~2.5e10 B/s per host. Both are parameters —
measure and override for other parts.

Used by bench.py to report a projected edges/s scaling table next to the
measured single-chip numbers (BASELINE.md metric 1 asks >=80 % scaling
efficiency; `HaloAggGraph.stats['comm_volume_ratio']` gives the volume
argument, this gives the time argument).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

V5E_ICI_BW = 4.5e10    # bytes/s per direction per link
V5E_DCN_BW = 2.5e10    # bytes/s per host
V5E_HBM_BW = 8.1e11    # bytes/s per chip


def projected_scaling(graph, d_features: int, t_compute_1chip: float,
                      n_chips: Sequence[int] = (2, 4, 8, 16),
                      bytes_per_el: int = 4,
                      ici_bw: float = V5E_ICI_BW,
                      overlap: bool = True,
                      t_fixed: float = 0.0) -> list[dict]:
    """Project edges/s scaling efficiency of the halo-partitioned
    aggregation.

    Per chip and aggregation at ``n`` chips:
      t_comp(n) = t_fixed + (t_compute_1chip - t_fixed) / n
                  (edge work splits across the 'graph' axis; ``t_fixed``
                  models the non-scaling launch/latency floor)
      t_comm(n) = halo_rows(n) * d * bytes / ici_bw
                  with halo_rows from the actual partition
                  (sharded.halo_widths), all_to_all schedule: the widest
                  pair padded across the n-1 remote peers
      t_step(n) = max(t_comp, t_comm)   if overlap (the exchange is issued
                  before the independent local segment-sum)
                  t_comp + t_comm       otherwise
      efficiency(n) = t_compute_1chip / (n * t_step(n))

    Returns one dict per n: {n, halo_rows, t_comp, t_comm, t_step,
    efficiency, edges_per_s}.
    """
    from .sharded import halo_widths

    n_edges = len(np.asarray(graph.src))
    out = []
    for n in n_chips:
        # non-divisible node counts take the same padded blocks a real run
        # uses (pad_to_blocks): halo widths computed on ceil(N/n) blocks
        W = halo_widths(graph, n, allow_pad=True)
        H = int(W.max())
        halo_rows = (n - 1) * max(1, H)
        t_comp = t_fixed + (t_compute_1chip - t_fixed) / n
        t_comm = halo_rows * d_features * bytes_per_el / ici_bw
        t_step = max(t_comp, t_comm) if overlap else t_comp + t_comm
        eff = t_compute_1chip / (n * t_step)
        out.append({
            "n": int(n),
            "halo_rows": int(halo_rows),
            "t_comp_us": t_comp * 1e6,
            "t_comm_us": t_comm * 1e6,
            "t_step_us": t_step * 1e6,
            "efficiency": float(eff),
            "edges_per_s": float(n_edges / t_step),
        })
    return out


def dcn_projection(n_nodes: int, d_features: int, n_dcn: int,
                   t_step_1slice: float, bytes_per_el: int = 4,
                   dcn_bw: float = V5E_DCN_BW,
                   n_graph: int = 1) -> dict:
    """Extra cost of the DCN edge-striping layer: one psum of the
    (n_nodes/n_graph, d) partial block per aggregation crosses DCN
    (parallel/distributed.py). A ring/tree all-reduce moves
    2*(n_dcn-1)/n_dcn of the payload per host.

    Priced SERIALIZED (t_comp + t_psum): the psum is on the OUTPUT of the
    aggregation being computed and the next layer depends on it, so
    overlapping would require cross-layer (feature-chunk) pipelining that
    ``make_dcn_halo_aggregate`` does not implement. No overlap is assumed
    that no program performs."""
    payload = (n_nodes // max(n_graph, 1)) * d_features * bytes_per_el
    t_psum = 2.0 * (n_dcn - 1) / max(n_dcn, 1) * payload / dcn_bw
    t_comp = t_step_1slice / n_dcn
    t_step = t_comp + t_psum
    return {"n_dcn": int(n_dcn), "t_psum_us": t_psum * 1e6,
            "t_step_us": t_step * 1e6,
            "efficiency": float(t_step_1slice / (n_dcn * t_step))}


def ring_dense_projection(n_nodes: int, d_features: int,
                          t_matmul_1chip: float,
                          n_chips: Sequence[int] = (2, 4, 8),
                          bytes_per_el: int = 4,
                          ici_bw: float = V5E_ICI_BW) -> list[dict]:
    """Price the latency-hiding ring dense aggregation
    (sharded.make_ring_dense_aggregate) against the all-gather formulation
    (sharded.sharded_aggregate).

    Ring: n per-chunk (B, B) x (B, d) matmuls; each of the n-1 ppermute
    hops (B*d payload) overlaps the previous chunk's matmul, so
      t_ring = max(t_comp/n, (n-1) * t_hop + t_comp/n^2)
    (pipeline bound: all compute, or all hops plus one exposed chunk).
    All-gather: collective then one matmul, serialized:
      t_ag = (n-1)/n * N*d*bytes / ici_bw + t_comp/n.
    """
    out = []
    for n in n_chips:
        B = n_nodes / n
        t_comp_n = t_matmul_1chip / n
        t_hop = B * d_features * bytes_per_el / ici_bw
        t_ring = max(t_comp_n, (n - 1) * t_hop + t_comp_n / n)
        t_ag = (n - 1) / n * n_nodes * d_features * bytes_per_el / ici_bw \
            + t_comp_n
        out.append({"n": int(n),
                    "t_ring_us": t_ring * 1e6, "t_allgather_us": t_ag * 1e6,
                    "ring_speedup": float(t_ag / t_ring),
                    "ring_efficiency": float(t_matmul_1chip / (n * t_ring))})
    return out


def format_table(rows: list[dict]) -> str:
    hdr = (f"{'n':>4} {'halo_rows':>10} {'t_comp':>9} {'t_comm':>9} "
           f"{'t_step':>9} {'eff':>6} {'Medges/s':>9}")
    lines = [hdr]
    for r in rows:
        lines.append(
            f"{r['n']:>4} {r['halo_rows']:>10} {r['t_comp_us']:>8.1f}u "
            f"{r['t_comm_us']:>8.1f}u {r['t_step_us']:>8.1f}u "
            f"{r['efficiency']:>6.2f} {r['edges_per_s'] / 1e6:>9.1f}")
    return "\n".join(lines)
