"""Validation-loop overhead: device-side metric accumulation (round 3)
vs the legacy per-batch readback pattern.

The train loop got one-step-lagged readback in round 2, but
``Trainer.validate``/``validate_without_gt`` still paid a tunnel RTT per
float() per batch. Round 3 accumulates the metric scalars on device and
reads back once per epoch; this benchmark measures both patterns on the
same eval step + loader so the saving is attributable.

Run on TPU: python benchmarks/val_bench.py [--frames 512 --batch 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.epoch_bench import make_dump  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--network", default="disp_res_50")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    args = ap.parse_args()

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from supervised_dispnet_tpu.data.loader import BatchLoader
    from supervised_dispnet_tpu.data.packed import (
        PackedValidationSet, pack_split,
    )
    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.parallel.mesh import shard_batch
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig
    from supervised_dispnet_tpu.utils.logging import TermLogger

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "dump"
        make_dump(root, args.frames, args.height, args.width)
        packed = Path(td) / "packed"
        pack_split(root, packed, "train")
        pack_split(root, packed, "val")

        cfg = TrainerConfig(
            data=str(packed), save_path=str(Path(td) / "run"),
            loss="berhu", network=args.network, batch_size=args.batch,
            workers=4, bf16=True,
            img_height=args.height, img_width=args.width,
        )
        trainer = Trainer(cfg, get_disp_net(args.network))
        val_set = PackedValidationSet(str(packed), uint8=True)
        loader = BatchLoader(val_set, args.batch, shuffle=False, num_workers=4)
        trainer.val_with_gt = True
        logger = TermLogger(1, 1, len(loader))

        def legacy_validate():
            """The pre-round-3 pattern: float() per metric per batch."""
            sums: dict[str, float] = {}
            n = 0
            for i, np_batch in enumerate(loader):
                batch = shard_batch({
                    "img": np_batch["img"],
                    "depth": np_batch["depth"].astype(np.float16),
                }, trainer.mesh)
                errs = trainer.eval_step(
                    trainer.eval_params(), trainer.state.batch_stats, batch)
                for k, v in errs.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                n += 1
            return {k: v / max(n, 1) for k, v in sums.items()}

        # warmup (compile) both paths
        trainer.validate(loader, logger)
        legacy_validate()

        t0 = time.perf_counter()
        new_errs = trainer.validate(loader, logger)
        t_new = time.perf_counter() - t0
        t0 = time.perf_counter()
        old_errs = legacy_validate()
        t_old = time.perf_counter() - t0

        for k in new_errs:
            assert abs(new_errs[k] - old_errs[k]) < 1e-4 * (1 + abs(old_errs[k])), \
                (k, new_errs[k], old_errs[k])

        n_imgs = len(loader) * args.batch
        print(json.dumps({
            "metric": "validation_epoch_seconds",
            "value": {"device_accumulated": round(t_new, 2),
                      "legacy_per_batch_readback": round(t_old, 2)},
            "images": n_imgs,
            "images_per_sec": {"device_accumulated": round(n_imgs / t_new, 1),
                               "legacy": round(n_imgs / t_old, 1)},
            "speedup": round(t_old / t_new, 2),
            "unit": f"seconds ({args.network} bf16 eval, B={args.batch}, "
                    "packed loader, metrics identical)",
        }))


if __name__ == "__main__":
    main()
