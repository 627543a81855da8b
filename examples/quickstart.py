"""Quickstart: the full workflow on synthetic data, end to end.

    python examples/quickstart.py [--workdir /tmp/sdt_quickstart]

1. Synthesizes a tiny dumped dataset (prepare_train_data layout).
2. Trains DispResNet-18 supervised (BerHu) for 2 epochs via the Trainer.
3. Restores the best checkpoint and prints validation metrics.
4. Runs folder inference and writes depth PNGs.
5. Exports the forward pass as a StableHLO serving artifact.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 64, 160


def make_dataset(root: Path, n_frames: int = 24) -> None:
    import cv2

    rng = np.random.default_rng(0)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    for scene in ("scene_train", "scene_val"):
        d = root / scene
        d.mkdir(parents=True, exist_ok=True)
        np.savetxt(d / "cam.txt", K)
        for i in range(n_frames):
            # learnable structure: depth is a function of brightness
            low = rng.uniform(0, 1, (H // 8, W // 8, 3)).astype(np.float32)
            img = np.repeat(np.repeat(low, 8, axis=0), 8, axis=1)
            depth = 5.0 + 40.0 * img.mean(axis=-1)
            cv2.imwrite(str(d / f"{i:010d}.jpg"),
                        (img[:, :, ::-1] * 255).astype(np.uint8))
            np.save(d / f"{i:010d}.npy", depth.astype(np.float32))
    (root / "train.txt").write_text("scene_train\n")
    (root / "val.txt").write_text("scene_val\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/sdt_quickstart"))
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    data = args.workdir / "data"
    print(f"=> synthesizing dataset under {data}")
    make_dataset(data)

    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    save = args.workdir / "run"
    cfg = TrainerConfig(
        data=str(data), save_path=str(save), loss="berhu",
        epochs=args.epochs, batch_size=4, workers=2,
        img_height=H, img_width=W, lr=1e-4,
    )
    trainer = Trainer(cfg, DispResNet(encoder_depth=18))
    print("=> training")
    best = trainer.fit()
    print(f"=> best val abs_rel: {best:.4f}")
    trainer.restore_best()  # inference/export below use the best weights

    # inference on the val images
    from supervised_dispnet_tpu.utils.viz import save_depth_png
    from supervised_dispnet_tpu.data.validation_folders import ValidationSet

    out_dir = args.workdir / "predictions"
    out_dir.mkdir(exist_ok=True)
    val = ValidationSet(data)
    disp = trainer.predict(val[0]["img"][None])
    save_depth_png(out_dir / "example_disp.png", disp[0])
    print(f"=> wrote {out_dir / 'example_disp.png'}")

    # serving export
    from supervised_dispnet_tpu.utils.export import export_forward

    artifact = args.workdir / "dispresnet18.stablehlo"
    export_forward(
        trainer.disp_model,
        {"params": trainer.state.params["disp"],
         "batch_stats": trainer.state.batch_stats["disp"]},
        artifact, batch_size=1, img_height=H, img_width=W,
    )
    print(f"=> exported serving artifact: {artifact} "
          f"({artifact.stat().st_size // 1024} KiB)")

    # deployment check: reload the artifact (needs NO model code) and
    # verify it reproduces the in-process forward
    import numpy as np

    from supervised_dispnet_tpu.utils.export import load_forward

    from supervised_dispnet_tpu.data.augment import normalize_images

    served = load_forward(artifact)
    x = val[0]["img"][None]
    # the artifact takes the network-input tensor (normalized); Trainer
    # .predict normalizes internally from [0, 1] images
    xn = np.asarray(normalize_images(x, trainer.aug.mean, trainer.aug.std))
    got = np.asarray(served(xn))
    ref = np.asarray(trainer.predict(x))
    # TPU convs multiply in bf16 by default and the standalone program
    # tiles differently than the in-process one — per-pixel noise reaches
    # ~2% through the sigmoid/1-over-x head, so check the distribution
    rel = np.abs(got[..., 0] / ref - 1.0)
    assert np.median(rel) < 0.01 and rel.max() < 0.05, (
        f"served forward diverged: median {np.median(rel):.4f}, "
        f"max {rel.max():.4f}")
    print("=> served artifact reproduces the in-process forward "
          f"(median rel diff {np.median(rel):.2e})")

    # 6. QAT fine-tune (the zero-cost int8 serving recipe, docs/QUANT.md):
    # warm-start from the fp best checkpoint, train 1 epoch through the
    # int8 quantization grid, then bake an int8 serving artifact
    from supervised_dispnet_tpu.utils.checkpoint import restore_checkpoint

    print("=> QAT fine-tune (1 epoch)")
    qat_cfg = TrainerConfig(
        data=str(data), save_path=str(args.workdir / "run_qat"), loss="berhu",
        epochs=1, batch_size=4, workers=2,
        img_height=H, img_width=W, lr=1e-4, qat=True,
    )
    qat_trainer = Trainer(qat_cfg, DispResNet(encoder_depth=18))
    qat_trainer.state = restore_checkpoint(save, qat_trainer.state, best=True)
    qat_best = qat_trainer.fit()
    print(f"=> QAT val abs_rel: {qat_best:.4f} (fp was {best:.4f})")
    qat_trainer.restore_best()

    # int8 export: calibrate on a val batch (QAT weights prefer plain
    # absmax — it is what training simulated), bake scales + int8 weights
    from supervised_dispnet_tpu.data.augment import normalize_images as _norm
    from supervised_dispnet_tpu.ops.quant import calibrate_conv_ranges

    qat_vars = {"params": qat_trainer.state.params["disp"],
                "batch_stats": qat_trainer.state.batch_stats["disp"]}
    calib_x = np.asarray(_norm(
        np.stack([val[i]["img"] for i in range(min(4, len(val)))]),
        qat_trainer.aug.mean, qat_trainer.aug.std))
    ranges = calibrate_conv_ranges(qat_trainer.disp_model, qat_vars, [calib_x])
    int8_artifact = args.workdir / "dispresnet18_int8.stablehlo"
    export_forward(qat_trainer.disp_model, qat_vars, int8_artifact,
                   batch_size=1, img_height=H, img_width=W,
                   int8_ranges=ranges)
    served_int8 = load_forward(int8_artifact)
    got8 = np.asarray(served_int8(xn))
    ref8 = np.asarray(qat_trainer.predict(x))
    rel8 = np.abs(got8[..., 0] / ref8 - 1.0)
    assert np.median(rel8) < 0.05, f"int8 artifact diverged: {np.median(rel8)}"
    print(f"=> int8 serving artifact: {int8_artifact} "
          f"({int8_artifact.stat().st_size // 1024} KiB, "
          f"median rel diff vs fp forward {np.median(rel8):.2e})")


if __name__ == "__main__":
    main()
