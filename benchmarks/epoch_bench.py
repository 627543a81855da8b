"""Sustained END-TO-END training throughput: host input pipeline + device
train step together, through the real Trainer epoch loop.

train_bench.py times the device step alone; this benchmark answers the
production question — what does a full epoch sustain when the 1-vCPU host
must also feed the chip? It compares the JPEG-folder pipeline against the
packed zero-decode pipeline (data/packed.py) on identical frames.

Run on TPU:  python benchmarks/epoch_bench.py [--frames 1536 --batch 64]
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


def make_dump(root: Path, frames: int, H: int, W: int) -> None:
    import cv2

    scene = root / "scene_a"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]])
    np.savetxt(scene / "cam.txt", K)
    for i in range(frames):
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        cv2.imwrite(str(scene / f"{i:010d}.jpg"), img)
        depth = (rng.uniform(1, 60, (H, W))
                 * (rng.uniform(size=(H, W)) > 0.5)).astype(np.float32)
        np.save(scene / f"{i:010d}.npy", depth)
    (root / "train.txt").write_text("scene_a\n")
    (root / "val.txt").write_text("scene_a\n")


def run_epochs(data_root: Path, batch: int, workers: int, network: str,
               save: Path, loader: str = "threads",
               steps_per_dispatch: int = 1, bf16: bool = False,
               selfsup: bool = False) -> float:
    """Build a Trainer, run one warmup epoch (compile) + one timed epoch;
    return sustained images/sec of the timed epoch."""
    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig
    from supervised_dispnet_tpu.utils.logging import (
        CsvLogger, JsonlLogger, TermLogger,
    )

    cfg = TrainerConfig(
        data=str(data_root), save_path=str(save),
        loss="selfsup" if selfsup else "berhu",
        network=network, batch_size=batch, workers=workers, epochs=2,
        loader=loader, steps_per_dispatch=steps_per_dispatch, bf16=bf16,
    )
    pose_model = None
    if selfsup:
        from supervised_dispnet_tpu.models import PoseExpNet

        pose_model = PoseExpNet(nb_ref_imgs=cfg.sequence_length - 1,
                                output_exp=True)
    trainer = Trainer(cfg, get_disp_net(network), pose_model=pose_model)
    train_loader, _ = trainer.make_loaders()
    logger = TermLogger(2, len(train_loader), 1)
    csv = CsvLogger(save)
    jsonl = JsonlLogger(save / "metrics.jsonl")
    logger.epoch_start(0)
    trainer.train_epoch(train_loader, logger, csv, jsonl)  # compile + warm
    import jax

    jax.block_until_ready(trainer.state.params)
    step_before = int(trainer.state.step)
    logger.epoch_start(1)
    t0 = time.perf_counter()
    trainer.train_epoch(train_loader, logger, csv, jsonl)
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - t0
    jsonl.close()
    n_imgs = (int(trainer.state.step) - step_before) * batch
    return n_imgs / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1536)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--network", default="disp_res_50")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 trunk (the headline training config)")
    ap.add_argument("--mode", default="supervised",
                    choices=["supervised", "selfsup"],
                    help="selfsup: 3-frame snippets, DispNet+PoseExpNet, "
                         "photometric loss (BASELINE config 5)")
    args = ap.parse_args()
    selfsup = args.mode == "selfsup"
    if selfsup and args.network == "disp_res_50":
        args.network = "dispnet"  # the reference's self-sup pairing

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "dump"
        make_dump(root, args.frames, args.height, args.width)

        from supervised_dispnet_tpu.data.packed import pack_split

        packed = Path(td) / "packed"
        t0 = time.perf_counter()
        pack_split(root, packed, "train")
        pack_split(root, packed, "val")
        print(f"pack: {time.perf_counter() - t0:.1f}s one-off", flush=True)

        jpg_ips = run_epochs(root, args.batch, args.workers, args.network,
                             Path(td) / "run_jpg", bf16=args.bf16, selfsup=selfsup)
        print(f"jpeg-folder pipeline: {jpg_ips:.0f} img/s sustained", flush=True)
        packed_ips = run_epochs(packed, args.batch, args.workers, args.network,
                                Path(td) / "run_packed", bf16=args.bf16, selfsup=selfsup)
        print(f"packed pipeline:      {packed_ips:.0f} img/s sustained", flush=True)
        device_ips = run_epochs(packed, args.batch, args.workers, args.network,
                                Path(td) / "run_device", loader="device",
                                bf16=args.bf16, selfsup=selfsup)
        print(f"device-resident:      {device_ips:.0f} img/s sustained", flush=True)
        scan_ips = run_epochs(packed, args.batch, args.workers, args.network,
                              Path(td) / "run_scan", loader="device",
                              steps_per_dispatch=8, bf16=args.bf16,
                              selfsup=selfsup)
        print(f"device + scan(8):     {scan_ips:.0f} img/s sustained", flush=True)

        print(json.dumps({
            "metric": "sustained_epoch_images_per_sec",
            "value": {"jpeg": round(jpg_ips, 1), "packed": round(packed_ips, 1),
                      "device": round(device_ips, 1),
                      "device_scan8": round(scan_ips, 1)},
            "unit": f"images/sec (end-to-end epoch, {args.network} "
                    f"{args.mode} "
                    f"B={args.batch}, host loader + device step; 'device' = "
                    "HBM-resident dataset, on-device gathers; 'device_scan8' "
                    "= 8 steps per dispatch via lax.scan)",
        }))


if __name__ == "__main__":
    main()
