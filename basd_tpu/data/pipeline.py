"""Host->HBM input pipeline: shuffled epochs with device prefetch.

The reference overlaps host augmentation with device compute via 8
dataloader workers + pinned-memory async copies (`src/data/datasets.py:
158-166`). Here the host work is only batch slicing of uint8 arrays; the
overlap comes from double-buffered `jax.device_put` — batch k+1 is already
in flight to HBM while step k executes (JAX dispatch is async, so keeping a
small deque of live device batches is sufficient).
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

import jax
import numpy as np


def epoch_batches(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    rng: np.random.Generator,
    *,
    drop_last: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Shuffled full batches (drop_last matches reference
    `datasets.py:165`)."""
    order = rng.permutation(len(labels))
    num_batches = len(labels) // batch_size
    for b in range(num_batches):
        idx = order[b * batch_size : (b + 1) * batch_size]
        yield images[idx], labels[idx]
    if not drop_last and len(labels) % batch_size:
        idx = order[num_batches * batch_size :]
        yield images[idx], labels[idx]


def prefetch_to_device(
    iterator: Iterator[tuple[np.ndarray, ...]],
    *,
    sharding=None,
    size: int = 2,
) -> Iterator[tuple[jax.Array, ...]]:
    """Keep `size` batches in flight to the device (double buffering)."""

    def put(batch):
        if sharding is not None:
            return tuple(jax.device_put(a, sharding) for a in batch)
        return tuple(jax.device_put(a) for a in batch)

    queue: deque = deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
