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
):
    """Wrap an indexable dataset (SequenceFolder / ValidationSet) in a grain
    DataLoader yielding dict batches with a static batch dimension."""
    import grain.python as grain

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            return dataset[int(idx)]

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.NoSharding(),
        shuffle=shuffle,
        seed=seed,
        num_epochs=1,
    )
    return grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=num_workers,
    )
