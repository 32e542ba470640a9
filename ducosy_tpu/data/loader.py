"""Asynchronous host loader: thread-pool sample decode + batch prefetch.

TPU replacement for the reference's DataLoader(num_workers=16, pin_memory,
prefetch_factor=2, persistent_workers) (modules/trainer.py:432-433): a thread
pool decodes DICOM + generates masks (NumPy releases the GIL for the heavy
scipy/numpy work), batches are assembled as stacked NHWC arrays, and a
bounded queue keeps `prefetch` batches ready so host I/O overlaps device
steps. Batches are padded to a fixed batch size by wrapping (static shapes
for jit; the reference instead emits a ragged final batch) — a padded batch
carries a per-sample "weight" vector (1 real / 0 padded) so the loss suite
can reproduce the ragged batch's gradients exactly (losses/basic.wmean).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


class HostLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 8, prefetch: int = 2,
                 drop_last: bool = False, pad_final: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.pad_final = pad_final
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._index_order()
        self._epoch += 1
        n = len(order)
        batches = []  # (indices, n_real) pairs
        for start in range(0, n, self.batch_size):
            chunk = order[start:start + self.batch_size]
            n_real = len(chunk)
            if n_real < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_final:
                    # wrap-around padding; cycles when the dataset itself is
                    # smaller than one batch (static shapes for jit). The
                    # duplicates are masked out downstream via "weight".
                    pad = np.resize(order, self.batch_size - n_real)
                    chunk = np.concatenate([chunk, pad])
            batches.append((chunk, n_real))

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list = []

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk, n_real in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__,
                                                chunk))
                        batch = {
                            k: np.stack([s[k] for s in samples])
                            for k in samples[0]
                        }
                        if n_real < len(chunk):
                            w = np.zeros(len(chunk), np.float32)
                            w[:n_real] = 1.0
                            batch["weight"] = w
                        out_q.put(batch)
            except BaseException as e:  # propagate to the consumer
                error.append(e)
            finally:
                out_q.put(None)  # always unblock the consumer

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    if error:
                        raise RuntimeError(
                            "HostLoader worker failed") from error[0]
                    return
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
