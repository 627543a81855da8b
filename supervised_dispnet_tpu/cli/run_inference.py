"""Folder inference CLI — rebuild of the reference ``run_inference.py``:
image folder -> disparity/depth PNGs (and optional .npy dumps).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Run disparity inference on a folder of images",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--pretrained", required=True)
    p.add_argument("--network", default="dispnet")
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--img-height", type=int, default=128)
    p.add_argument("--img-width", type=int, default=416)
    p.add_argument("--output-disp", action="store_true")
    p.add_argument("--output-depth", action="store_true")
    p.add_argument("--save-npy", action="store_true")
    p.add_argument("--img-exts", nargs="+", default=["png", "jpg", "bmp"])
    p.add_argument("--fused-upsample", action="store_true",
                   help="disp_res*/disp_vgg_bn: fused decoder upsample-conv (exact; "
                        "dims must be divisible by 32)")
    p.add_argument("--imagenet-normalization", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve with the int8 PTQ path (ops/quant.py): "
                        "calibrates on the first images, then runs every "
                        "conv in int8 on the MXU (measured 1.1-1.2x; "
                        "quality cost in BASELINE.md)")
    p.add_argument("--batch-size", type=int, default=8,
                   help="images per device dispatch (tail padded to a "
                        "static shape)")
    p.add_argument("--calib-batches", type=int, default=1,
                   help="--int8: calibrate activation ranges on this many "
                        "8-image batches from the folder head (more "
                        "batches widen the observed ranges)")
    p.add_argument("--percentile", type=float, default=None,
                   help="--int8: calibrate to this percentile of "
                        "|activation| instead of the max (99.9 is the "
                        "measured recommendation for trained checkpoints "
                        "— BASELINE.md round-3 calibration table)")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    # persistent XLA compile cache: first compiles through the remote
    # tunnel take minutes; cached re-invocations are instant
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    if not (args.output_disp or args.output_depth or args.save_npy):
        args.output_depth = True

    import cv2
    import jax.numpy as jnp

    from supervised_dispnet_tpu.cli.test_disp import load_params
    from supervised_dispnet_tpu.data.augment import (
        HALF_MEAN, HALF_STD, IMAGENET_MEAN, IMAGENET_STD, normalize_images,
    )
    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.utils.viz import save_depth_png

    model = get_disp_net(args.network,
                         fused_upsample=args.fused_upsample)
    params, batch_stats = load_params(
        args.pretrained, args.network, model, (args.img_height, args.img_width)
    )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    mean = IMAGENET_MEAN if args.imagenet_normalization else HALF_MEAN
    std = IMAGENET_STD if args.imagenet_normalization else HALF_STD

    import jax

    # FCRN emits metric depth directly; disparity nets emit multi-scale
    # disparity lists (depth = 1/disp)
    direct_depth = args.network == "fcrn"

    from supervised_dispnet_tpu.models.common import apply_model

    src = Path(args.dataset_dir)
    dst = Path(args.output_dir)
    dst.mkdir(parents=True, exist_ok=True)
    files = sorted(
        f for ext in args.img_exts for f in src.glob(f"*.{ext}")
    )
    print(f"{len(files)} files to test")
    if not files:
        # exit before int8 calibration: an all-zeros dummy batch would
        # produce degenerate activation ranges and a confusing error
        return

    def _load(f):
        img = cv2.imread(str(f))[:, :, ::-1].astype(np.float32) / 255.0
        img = cv2.resize(img, (args.img_width, args.img_height),
                         interpolation=cv2.INTER_AREA)
        return normalize_images(jnp.asarray(img[None]), mean, std)

    if args.int8:
        from supervised_dispnet_tpu.ops.quant import (
            calibrate_conv_ranges, quantized_apply,
        )

        n_calib = 8 * max(1, args.calib_batches)
        calib = [jnp.concatenate([_load(f) for f in files[c:c + 8]])
                 for c in range(0, min(n_calib, len(files)), 8)]
        ranges = calibrate_conv_ranges(model, variables, calib,
                                       percentile=args.percentile)
        print(f"int8 PTQ: calibrated {len(ranges)} ranges on "
              f"{sum(c.shape[0] for c in calib)} images")

        @jax.jit
        def forward(x):
            out = quantized_apply(model, variables, x, ranges=ranges)
            if isinstance(out, (list, tuple)):
                return out[0][..., 0]
            return out[..., 0]
    else:
        @jax.jit
        def forward(x):
            out = apply_model(model, variables, x)
            if isinstance(out, (list, tuple)):
                return out[0][..., 0]
            return out[..., 0]
    # batch the folder: B images per dispatch (tail padded to the static
    # shape) — the per-image loop paid one host->device round trip each
    B = max(1, args.batch_size)
    for c0 in range(0, len(files), B):
        chunk = files[c0:c0 + B]
        xs = [_load(f) for f in chunk]
        xs += [xs[-1]] * (B - len(xs))
        outs = np.asarray(forward(jnp.concatenate(xs)))
        for k, f in enumerate(chunk):
            out = outs[k]
            if direct_depth:
                depth = np.maximum(out, 1e-6)
                disp = 1.0 / depth
            else:
                disp = out
                depth = 1.0 / np.maximum(disp, 1e-6)
            if args.output_disp:
                save_depth_png(dst / f"{f.stem}_disp.png", disp)
            if args.output_depth:
                save_depth_png(dst / f"{f.stem}_depth.png", depth,
                               max_value=80.0)
            if args.save_npy:
                np.save(dst / f"{f.stem}_depth.npy", depth)
    print(f"wrote outputs to {dst}")


if __name__ == "__main__":
    main()
