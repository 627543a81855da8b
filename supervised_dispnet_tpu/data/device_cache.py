"""Device-resident dataset: the whole packed split lives in HBM.

The reference streams every batch from host workers through PCIe each step
(reference: ``train.py`` DataLoader loop). On TPU the roles invert: HBM is
large (16 GB on v5e) relative to this workload's data — the full KITTI
training dump is ~40k frames x 160 KB uint8 ~ 6.4 GB — so the fastest
input pipeline is NO pipeline: upload the packed arrays once, and build
each batch ON DEVICE with a leading-axis gather driven by a tiny host
index array (a few hundred bytes/step instead of 17-55 MB/step).

This matters doubly on tunneled single-chip setups where the host link
runs at tens of MB/s (BASELINE.md round-2 transport findings), and it is
how the training loop should look on real hosts too: the host's only
per-step job is drawing the shuffle indices.

Batches are bit-identical to the ``BatchLoader(PackedSequenceDataset)``
path: same sample table, same shuffle law (``np.random.default_rng(seed +
epoch)`` over the sample order), same uint8/f16 transport dtypes.
"""

from __future__ import annotations

import numpy as np

from supervised_dispnet_tpu.data.packed import PackedSequenceDataset


class DeviceResidentSequence:
    """Epoch iterable yielding per-batch INDEX dicts; the actual batch is
    gathered on device by the step wrapper (see ``Trainer``).

    Yields {'tgt_idx': (B,), 'scene_idx': (B,)} int32 (+ 'ref_idx': (B, R)
    for self-supervised snippets). Mirrors BatchLoader's epoch semantics:
    drop_last, reshuffle per epoch, ``epoch`` attr for exact resume.
    """

    def __init__(
        self,
        root,
        batch_size: int,
        train: bool = True,
        sequence_length: int = 3,
        with_depth: bool = False,
        seed: int = 0,
        shuffle: bool = True,
        epoch_size: int | None = None,
        hbm_budget_bytes: int = 10 * 1024**3,
        mesh=None,
        steps_per_item: int = 1,
    ):
        # dataset-level shuffle ON with the same seed, so the sample order
        # (and therefore every batch's composition) matches the
        # BatchLoader(PackedSequenceDataset) path exactly
        ds = PackedSequenceDataset(
            root, seed=seed, train=train, sequence_length=sequence_length,
            with_depth=with_depth, shuffle=shuffle, uint8=True,
        )
        self.sequence_length = sequence_length
        self.with_depth = with_depth
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.steps_per_item = max(1, steps_per_item)
        n_batches = len(ds.samples) // batch_size
        self.epoch_size = min(epoch_size, n_batches) if epoch_size else n_batches
        # with multi-step dispatch, an epoch is a whole number of items
        self.epoch_size -= self.epoch_size % self.steps_per_item

        split = ds.split
        if with_depth and split.depth is None:
            raise FileNotFoundError(
                f"{root}: packed train split has no GT depth — re-run "
                "prepare_train_data with --with-depth before packing, or "
                "train with --loss selfsup")
        imgs = split.images
        need = imgs.nbytes + (split.depth.shape[0] * split.depth.shape[1]
                              * split.depth.shape[2] * 2
                              if (with_depth and split.depth is not None) else 0)
        if need > hbm_budget_bytes:
            raise ValueError(
                f"device-resident split needs {need / 1e9:.1f} GB > budget "
                f"{hbm_budget_bytes / 1e9:.1f} GB — use loader='threads'")

        import jax

        # one-time uploads (uint8 images; f16 depth — the train step's
        # transport dtypes, converted to f32 on device per batch).
        # Multi-device mesh: the FRAME axis is sharded over the data axis
        # (each chip holds 1/N of the dataset); the per-batch global
        # gather under jit lets XLA insert the cross-chip collectives, and
        # the batch composition stays bit-identical to the host path.
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from supervised_dispnet_tpu.parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            frames = NamedSharding(mesh, P(DATA_AXIS))
            repl = NamedSharding(mesh, P())

            def put_frames(a):
                # jax.device_put requires the sharded axis to divide evenly;
                # real datasets have arbitrary frame counts, so pad the frame
                # axis with zeros — the index tables only ever reference real
                # frames, so padding is never gathered into a batch
                pad = (-a.shape[0]) % n_data
                if pad:
                    a = np.concatenate(
                        [a, np.zeros((pad,) + a.shape[1:], a.dtype)])
                return jax.device_put(a, frames)

            put_repl = lambda a: jax.device_put(a, repl)  # noqa: E731
        else:
            put_frames = put_repl = jax.device_put
        self.images = put_frames(np.asarray(imgs))
        self.depth = None
        if with_depth and split.depth is not None:
            self.depth = put_frames(np.asarray(split.depth, dtype=np.float16))
        self.intrinsics = put_repl(split.intrinsics)

        samples = ds.samples  # [(scene, tgt, refs)]
        self._scene = np.asarray([s for s, _, _ in samples], np.int32)
        self._tgt = np.asarray([t for _, t, _ in samples], np.int32)
        self._refs = np.asarray([r for _, _, r in samples], np.int32)

    def __len__(self) -> int:
        return self.epoch_size // self.steps_per_item

    def _index_batch(self, sel) -> dict:
        out = {
            "tgt_idx": self._tgt[sel],
            "scene_idx": self._scene[sel],
        }
        if self.sequence_length > 1:
            out["ref_idx"] = self._refs[sel]
        return out

    def __iter__(self):
        order = np.arange(len(self._tgt))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        B, K = self.batch_size, self.steps_per_item
        if K == 1:
            for i in range(self.epoch_size):
                yield self._index_batch(order[i * B:(i + 1) * B])
            return
        for i in range(self.epoch_size // K):
            # (K, B[, R]) stacked index batches for one lax.scan dispatch
            batches = [self._index_batch(order[(i * K + k) * B:
                                               (i * K + k + 1) * B])
                       for k in range(K)]
            yield {key: np.stack([b[key] for b in batches])
                   for key in batches[0]}


