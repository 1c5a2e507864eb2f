"""Pallas TPU blocked matmul — the aggregation workhorse.

The dense aggregation ``adj @ s`` (gnn/models/layers.py:45-46) is an
(N, N) x (N, d) matmul. XLA's native dot is already MXU-tiled; this kernel
exists to (a) own the schedule for the fused adjacency-transform variant in
pallas_spmm.py, and (b) serve as the measured-against-XLA baseline in
bench.py. Grid (M/BM, N/BN, K/BK) with a VMEM accumulator, K-major
iteration, and float32 accumulation (MXU preferred_element_type).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _round_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def matmul(a: jnp.ndarray, b: jnp.ndarray, bm: int = 512, bn: int = 256,
           bk: int = 512) -> jnp.ndarray:
    """a (M, K) @ b (K, N) with zero-padding to tile multiples."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    bm, bn, bk = min(bm, _round_to(M, 8)), min(bn, _round_to(N, 128)), \
        min(bk, _round_to(K, 128))
    Mp, Kp, Np = _round_to(M, bm), _round_to(K, bk), _round_to(N, bn)
    a_p = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    b_p = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), a.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=(Mp * Kp + Kp * Np + Mp * Np) * a.dtype.itemsize,
            transcendentals=0),
    )(a_p, b_p)
    return out[:M, :N]
