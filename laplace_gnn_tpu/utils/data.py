"""Minimal data-loading utilities (torch DataLoader analog).

A "loader" anywhere in this framework is any iterable of ``(X, y)`` batches;
``dataset_size(loader)`` resolves N, preferring an explicit attribute —
mirroring the reference's reliance on ``len(train_loader.dataset)``
(laplace/baselaplace.py:838).
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np


class ArrayLoader:
    """Batched iterable over (X, y) arrays with known dataset size."""

    def __init__(self, X, y, batch_size: Optional[int] = None,
                 shuffle: bool = False, seed: int = 0):
        self.X = X
        self.y = y
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

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        for i in range(0, self.n, self.batch_size):
            sl = idx[i: i + self.batch_size]
            yield self.X[sl], self.y[sl]


def dataset_size(loader) -> int:
    if hasattr(loader, "dataset_size"):
        return int(loader.dataset_size)
    if hasattr(loader, "dataset"):
        return len(loader.dataset)
    return sum(int(np.shape(y)[0]) for _, y in loader)
