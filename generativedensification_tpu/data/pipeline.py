"""Batching + host->device feed.

Replaces torch ``DataLoader`` + Lightning's implicit ``DistributedSampler``
(SURVEY.md §2.8): per-process scene sharding by ``jax.process_index()``,
background-thread prefetch, numpy collation, jnp conversion at the edge.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from .base import BATCH_ARRAY_KEYS


def collate(samples: list[dict]) -> dict:
    """Stack a list of sample dicts into a batch dict (metas listed)."""
    out = {}
    for k in samples[0]:
        if k == "meta":
            out["meta"] = [s["meta"] for s in samples]
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class BatchLoader:
    """Shuffling, sharding, prefetching batch iterator."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
        epoch_fraction: float = 1.0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_prefetch = num_prefetch
        if process_index is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count or 1
        self.epoch_fraction = epoch_fraction
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        n = int(n * self.epoch_fraction)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        # per-process shard (round-robin, the DistributedSampler scheme)
        idx = idx[self.process_index:: self.process_count]
        idx = idx[: int(len(idx) * self.epoch_fraction)]
        return idx

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.num_prefetch)
        stop = object()

        err: list[BaseException] = []

        def worker():
            try:
                for b in range(nb):
                    sel = idx[b * self.batch_size: (b + 1) * self.batch_size]
                    if len(sel) < self.batch_size and self.drop_last:
                        break
                    q.put(collate([self.dataset[int(i)] for i in sel]))
            except BaseException as e:  # re-raised on the consumer side
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                # surface dataset errors in the consumer (a swallowed
                # worker exception used to appear as a bare StopIteration
                # from the training loop — r5 debugging tax)
                if err:
                    raise RuntimeError(
                        "BatchLoader worker failed while building a batch"
                    ) from err[0]
                break
            yield item
        self.epoch += 1


def to_device_batch(batch: dict, keep_meta: bool = False) -> dict:
    """numpy batch -> jnp arrays (meta stripped unless requested)."""
    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        if k == "meta":
            if keep_meta:
                out[k] = v
            continue
        if k in BATCH_ARRAY_KEYS or isinstance(v, np.ndarray):
            out[k] = jnp.asarray(v)
    return out
