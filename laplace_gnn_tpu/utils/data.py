"""Minimal data-loading utilities (torch DataLoader analog).

A "loader" anywhere in this framework is any iterable of ``(X, y)`` batches
OR of ``MutableMapping`` batches (HF-style dict inputs: the whole mapping is
the model input, targets under a ``dict_key_y`` key — reference
laplace/baselaplace.py:77-82, :798-807); ``dataset_size(loader)`` resolves
N, preferring an explicit attribute — mirroring the reference's reliance on
``len(train_loader.dataset)`` (laplace/baselaplace.py:838).
"""

from __future__ import annotations

from collections.abc import MutableMapping
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np


class ArrayLoader:
    """Batched iterable over (X, y) arrays with known dataset size.

    ``X`` may be a ``MutableMapping`` of same-leading-dim arrays (HF-style
    dict input); then each batch is the sliced mapping. Pass ``y=None`` to
    yield the bare mapping (targets already inside under ``dict_key_y``),
    matching the reference's dict-input loaders (tests/utils.py:109-127)."""

    def __init__(self, X, y=None, batch_size: Optional[int] = None,
                 shuffle: bool = False, seed: int = 0):
        self.X = X
        self.y = y
        if isinstance(X, MutableMapping):
            self.n = int(next(iter(X.values())).shape[0])
        else:
            self.n = int(X.shape[0])
        self.batch_size = batch_size or self.n
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    @property
    def dataset_size(self) -> int:
        return self.n

    def __len__(self) -> int:
        return (self.n + self.batch_size - 1) // self.batch_size

    def _slice_x(self, sl):
        if isinstance(self.X, MutableMapping):
            return type(self.X)({k: v[sl] for k, v in self.X.items()})
        return self.X[sl]

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        for i in range(0, self.n, self.batch_size):
            sl = idx[i: i + self.batch_size]
            if self.y is None:
                yield self._slice_x(sl)
            else:
                yield self._slice_x(sl), self.y[sl]


def batch_size_of(data, dict_key_y: str = "labels") -> int:
    """Leading dimension of one loader batch (tuple or mapping)."""
    if isinstance(data, MutableMapping):
        if dict_key_y in data:
            return int(np.shape(data[dict_key_y])[0])
        return int(np.shape(next(iter(data.values())))[0])
    return int(np.shape(data[1])[0])


def dataset_size(loader, dict_key_y: str = "labels") -> int:
    if hasattr(loader, "dataset_size"):
        return int(loader.dataset_size)
    if hasattr(loader, "dataset"):
        return len(loader.dataset)
    return sum(batch_size_of(b, dict_key_y) for b in loader)
