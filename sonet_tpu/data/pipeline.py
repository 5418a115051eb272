"""Host-side input pipeline: dataset protocol + threaded batch loader.

Replaces ``torch.utils.data.DataLoader(num_workers=8)``
(modelnet/train.py:25).  Items are dicts of numpy arrays; the loader
shuffles, collates fixed-shape batches and prefetches on a background
thread pool so augmentation overlaps device compute.  Unlike the
reference there is no per-item Faiss call to hide — SOM-node kNN happens
on device inside the encoder — so the host work is only file reads +
augmentation.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Protocol, Sequence

import numpy as np


class Dataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]: ...


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items]) for k in keys
            if items[0][k] is not None}


class BatchLoader:
    """Shuffling, drop-last batch iterator with threaded prefetch.

    ``pad_last=True`` instead repeats items to fill the final batch and
    reports ``batch["valid"]`` counts so eval loops can weight correctly
    (the reference weights test metrics by true batch size,
    modelnet/train.py:78-90).
    """

    def __init__(self, dataset: Dataset, batch_size: int, *,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 pad_last: bool = False, num_threads: int = 4,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last and not pad_last
        self.pad_last = pad_last
        self.rng = np.random.default_rng(seed)
        self.num_threads = num_threads
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = self.batch_size
        nfull = len(idx) // bs
        batches = [idx[i * bs:(i + 1) * bs] for i in range(nfull)]
        rem = idx[nfull * bs:]
        if len(rem) and not self.drop_last:
            valid = len(rem)
            if self.pad_last:
                fill = idx[: bs - valid]
                rem = np.concatenate([rem, fill])
            batches.append((rem, valid))
        return [(b, self.batch_size) if not isinstance(b, tuple) else b
                for b in batches]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        if self.num_threads <= 1:
            for b, valid in batches:
                yield self._make(b, valid)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_threads) as ex:
                futs = [ex.submit(self._make, b, v) for b, v in batches]
                for f in futs:
                    if stop.is_set():
                        return
                    q.put(f.result())
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def _make(self, indices, valid) -> Dict[str, np.ndarray]:
        batch = collate([self.dataset[int(i)] for i in indices])
        batch["valid"] = np.asarray(valid, np.int32)
        return batch
