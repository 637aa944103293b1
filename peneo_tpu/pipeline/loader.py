"""Host data feed: shuffled batching + background prefetch + device placement.

Replaces the reference's torch DataLoader workers (SURVEY.md §3.1 "PROCESS
BOUNDARY"): the collator output is a pytree of fixed-shape numpy arrays, so
the feed thread overlaps host-side parsing/label-building with device
compute, and ``device_put`` (with the dp batch sharding) overlaps H2D with
the previous step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class DataFeed:
    """Iterate (shuffled) fixed-size batches from a map-style dataset through
    a collator, with items parsed in a pool of worker threads and batches
    prefetched into a bounded queue."""

    def __init__(
        self,
        dataset,
        collator,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        device_put_fn: Optional[Callable] = None,
        cache_items: Optional[bool] = None,
    ) -> None:
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.device_put_fn = device_put_fn
        # Cache parsed items across epochs: __getitem__ re-tokenizes and
        # rebuilds label spots every epoch (the reference's DataLoader does
        # too — torch re-parses per epoch). The parse is GIL-bound python;
        # on small corpora it can otherwise bound the whole train step.
        # Auto-enable from the dataset's own ``deterministic`` property
        # (RFUND/SIBR datasets declare it; augmentation makes it False) —
        # a dataset without the property is assumed deterministic, matching
        # plain item lists.
        if cache_items is None:
            cache_items = bool(getattr(dataset, "deterministic", True))
        self._cache: Optional[dict] = {} if cache_items else None
        self._epoch = 0
        self._skip = 0

    def _get_item(self, i):
        i = int(i)
        if self._cache is None:
            return self.dataset[i]
        v = self._cache.get(i)
        if v is None:
            v = self.dataset[i]
            self._cache[i] = v
        return v

    def set_state(self, epoch: int, batches_consumed: int) -> None:
        """Restore feed position (checkpoint resume): the next ``iter(self)``
        replays epoch ``epoch``'s shuffle order and skips its first
        ``batches_consumed`` batches — training continues on exactly the data
        an uninterrupted run would have seen next (HF Trainer's
        ``ignore_data_skip=False`` behavior)."""
        self._epoch = int(epoch)
        self._skip = int(batches_consumed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> Sequence[Sequence[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        n_full = len(idx) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        if not self.drop_last and len(idx) % self.batch_size:
            batches.append(idx[n_full * self.batch_size:])
        return batches

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        if self._skip:
            batches = batches[self._skip:]
            self._skip = 0
        self._epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        feats = list(pool.map(self._get_item, b))
                        batch = self.collator(feats)
                        if self.device_put_fn is not None:
                            batch = self.device_put_fn(batch)
                        out_q.put(batch)
            except BaseException as e:  # surface worker errors to consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def batch_arrays(batch):
    """Collator Batch → host numpy dict (model inputs only)."""
    arrays = {
        "input_ids": batch.input_ids,
        "bbox": batch.bbox,
        "attention_mask": batch.attention_mask,
        "labels": batch.labels,
    }
    if batch.image is not None:
        arrays["image"] = batch.image
    return arrays


def batch_to_device(batch, sharding=None):
    """Collator Batch → dict of device arrays for the jitted step (+ host-side
    side data kept as python lists)."""
    import jax

    arrays = batch_arrays(batch)
    if sharding is not None:
        arrays = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), arrays)
    else:
        arrays = jax.tree_util.tree_map(jax.device_put, arrays)
    return arrays
