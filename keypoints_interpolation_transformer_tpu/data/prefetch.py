"""Host->device prefetch (double buffering).

The reference's input pipeline is a synchronous single-process
DataLoader(batch_size=1) (A1_train.py:244-245).  Here host batch assembly
overlaps device compute: batches are pushed to the device ``depth`` steps
ahead of consumption, so the TPU never waits on host packing / transfer.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterable, depth: int = 2,
                       transform: Optional[Callable] = None,
                       device=None) -> Iterator:
    """Yield items device_put ``depth`` steps ahead.

    ``transform`` maps the raw host item to the pytree of arrays to
    transfer (e.g. Batch -> tuple of numpy arrays).
    """
    queue = collections.deque()

    def put(item):
        if transform is not None:
            item = transform(item)
        if device is not None and jax.process_count() > 1:
            # multi-process: every rank holds the same full host batch and
            # contributes only its addressable shards
            from ..parallel.distributed import global_put
            return jax.tree.map(lambda a: global_put(a, device), item)
        return jax.device_put(item, device)

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        nxt = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt
