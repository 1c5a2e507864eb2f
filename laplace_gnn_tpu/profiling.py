"""Profiling / tracing hooks.

The reference has no profiling subsystem (SURVEY.md §5 — tqdm bars only);
this wraps the JAX profiler into context managers and a lightweight
device-timing helper that respects the D2H-poisoning constraint of tunneled
TPU backends (see bench.py): timed regions run K chained iterations inside
one jit and nothing is fetched until the clock stops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/laplace_gnn_trace",
          create_perfetto_link: bool = False):
    """Capture an xprof/perfetto trace of the enclosed region:

        with profiling.trace("/tmp/trace"):
            train_step(...)
    """
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_time(fn: Callable, *args, iters: int = 20,
                chain: Optional[Callable] = None) -> float:
    """Per-iteration device time of ``fn(*args)`` in seconds.

    Runs ``iters`` and ``4*iters`` repetitions inside single jitted
    fori_loops, chaining iterations through a 1e-30 perturbation of the
    first array argument so XLA cannot hoist the body; returns the slope.
    ``chain(out) -> scalar`` customizes the chaining value (default: sum of
    the first output leaf).
    """
    def default_chain(out):
        return jnp.sum(jax.tree_util.tree_leaves(out)[0])

    chain = chain or default_chain

    @jax.jit
    def loop(args, n):
        leaves0, treedef0 = jax.tree_util.tree_flatten(args[0])

        def body(i, acc):
            # rebuild the first argument with a non-foldable dependency on
            # the previous iteration's output
            pert = [leaves0[0]
                    + (1e-30 * acc).astype(leaves0[0].dtype)] + leaves0[1:]
            a0 = jax.tree_util.tree_unflatten(treedef0, pert)
            out = fn(a0, *args[1:])
            return acc + chain(out)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0))

    jax.block_until_ready(loop(args, jnp.asarray(1)))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(args, jnp.asarray(iters)))
    t1 = time.perf_counter()
    jax.block_until_ready(loop(args, jnp.asarray(4 * iters)))
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (3 * iters), 0.0)


def memory_stats() -> dict:
    """Per-device memory statistics (bytes) where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
