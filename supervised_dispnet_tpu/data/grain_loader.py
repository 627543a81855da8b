"""Optional grain-backed input pipeline.

The built-in ``data/loader.py::BatchLoader`` (threads) is the default; this
module provides the same batch contract through `grain` (Google's
production TPU input-pipeline library: multiprocess workers, deterministic
global shuffling, per-epoch seeding) for large-scale runs where Python
threads can't keep the chip fed.

Usage:
    from supervised_dispnet_tpu.data.grain_loader import make_grain_loader
    loader = make_grain_loader(dataset, batch_size=32, num_workers=8, seed=0)
    for batch in loader:  # dict of stacked numpy arrays
        ...
"""

from __future__ import annotations

import numpy as np


def make_grain_loader(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    num_workers: int = 0,
    seed: int = 0,
    num_epochs: int | None = 1,
):
    """Wrap an indexable dataset (SequenceFolder / ValidationSet) in a grain
    DataLoader yielding dict batches with a static batch dimension.

    ``num_epochs=None`` builds an endless sampler (deterministic per-epoch
    reshuffle from ``seed``) so ONE worker pool serves the whole training
    run instead of being torn down and re-forked every epoch."""
    import grain.python as grain

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            sample = dataset[int(idx)]
            # multiprocess workers batch into shared memory, which cannot
            # allocate zero-byte segments — drop empty leaves (e.g. the
            # (0, H, W, 3) ref_imgs a sequence_length=1 supervised
            # SequenceFolder emits; no consumer reads them)
            return {k: v for k, v in sample.items()
                    if getattr(v, "size", 1) != 0}

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.NoSharding(),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
    )
    return grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=num_workers,
    )
