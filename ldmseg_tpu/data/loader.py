"""Host-sharded batching loader with background prefetch.

Replaces torch DataLoader + DistributedSampler (reference:
trainers_ldm_cond.py:244-271): each JAX process reads its own shard of the
index space (``indices[process_index::process_count]`` after a per-epoch
seeded shuffle — same semantics as DistributedSampler with set_epoch), and a
small thread pool prefetches batches ahead of the device.

Collation (reference collate_fn, utils/utils.py:261-286): arrays stacked to
NHWC numpy; 'text' and 'meta' stay python lists.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

_ARRAY_KEYS = ("image", "semseg", "image_semseg", "mask", "inpainting_mask", "tokens")
_LIST_KEYS = ("text", "meta")


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k in _ARRAY_KEYS:
        if k in samples[0] and samples[0][k] is not None:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    for k in _LIST_KEYS:
        if k in samples[0]:
            out[k] = [s[k] for s in samples]
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        num_threads: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        return self._indices_flags()[0]

    def _indices_flags(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-process index shard plus a parallel is-padding flag.

        Padding happens at two levels and BOTH must be flagged so that
        evaluators can count each image exactly once across processes
        (ADVICE r4 #2 — a per-process ``seen_ids`` dedup misses a padded
        duplicate that lands on a DIFFERENT process): (1) the global index
        list is wrap-padded to a multiple of process_count — every global
        position >= len(dataset) is padding; (2) the final partial batch is
        repeat-padded below in :meth:`_batches`."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # pad so every process sees the same number of samples
        per = -(-n // self.process_count)
        total = per * self.process_count
        pad = np.zeros(total, dtype=bool)
        if len(idx) < total:
            idx = np.concatenate([idx, idx[: total - n]])
            pad[n:] = True
        return (idx[self.process_index:: self.process_count],
                pad[self.process_index:: self.process_count])

    def __len__(self) -> int:
        per = len(self._indices())
        return per // self.batch_size if self.drop_last else -(-per // self.batch_size)

    def _batches(self) -> Iterator[Tuple[List[int], List[bool]]]:
        idx, padf = self._indices_flags()
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size: (b + 1) * self.batch_size]
            flags = padf[b * self.batch_size: (b + 1) * self.batch_size]
            if len(chunk) < self.batch_size and not self.drop_last:
                # repeat-pad the final partial batch to keep shapes static
                pad = self.batch_size - len(chunk)
                chunk = np.concatenate([chunk, chunk[:1].repeat(pad)])
                flags = np.concatenate([flags, np.ones(pad, dtype=bool)])
            yield list(chunk), [bool(f) for f in flags]

    def _load(self, chunk: List[int], flags: List[bool]) -> Dict[str, Any]:
        batch = collate([self.dataset[i] for i in chunk])
        if "meta" in batch:
            for m, f in zip(batch["meta"], flags):
                m["is_padding"] = f
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.num_threads <= 0:
            for chunk, flags in self._batches():
                yield self._load(chunk, flags)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for chunk, flags in self._batches():
                    q.put(self._load(chunk, flags))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
