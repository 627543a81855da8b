"""Host-side batching loader with background prefetch.

The TPU replacement for ``torch.utils.data.DataLoader(num_workers=...)``
(reference: ``train.py``'s loaders): a thread pool decodes/collates
upcoming batches while the device computes, and batches are handed to JAX
as stacked numpy arrays (static shapes, drop_last) so each train step is a
single host->device transfer. Heavy augmentation does NOT happen here — it
runs on device (see ``data/augment.py``), so host work is just decode +
stack, which threads (GIL-releasing imageio/numpy) parallelize fine.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _collate(items: list[dict]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key in items[0]:
        out[key] = np.stack([it[key] for it in items])
    return out


class BatchLoader:
    """Iterates dict batches over an indexable dataset.

    drop_last is always on: static batch shapes mean zero recompilation.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        epoch_size: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        n_batches = len(dataset) // batch_size
        self.epoch_size = min(epoch_size, n_batches) if epoch_size else n_batches

    def __len__(self) -> int:
        return self.epoch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(self.epoch_size)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer stopped (avoids a
            producer thread wedged on a full queue holding batch memory)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # exceptions from dataset decode must reach the consumer — a
            # silently-dead producer would hang train_epoch on q.get()
            try:
                if hasattr(self.dataset, "get_batch"):
                    # vectorized batch fetch (packed datasets): one numpy
                    # gather per batch, no per-item Python or thread pool
                    for idxs in batches:
                        if stop.is_set():
                            return
                        if not put(self.dataset.get_batch(idxs)):
                            return
                    put(None)
                    return
                with ThreadPoolExecutor(self.num_workers) as pool:
                    def make_batch(idxs):
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        return _collate(items)

                    for idxs in batches:
                        if stop.is_set():
                            return
                        if not put(make_batch(idxs)):
                            return
                put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised by consumer
                put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
