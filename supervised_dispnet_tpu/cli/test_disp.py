"""Eigen-split depth evaluation CLI — rebuild of the reference ``test_disp.py``.

  python test_disp.py --pretrained-dispnet ckpt --network disp_res_50 \
      --dataset-dir /data/kitti_raw --dataset-list test_files_eigen.txt \
      [--classification] [--median-scaling] [--max-depth 80]

Pipeline per image (reference: ``test_disp.py::main``): resize to the
network input (416x128), normalize, forward, upsample prediction to GT
resolution, depth = 1/disp (or soft classification decode), optional
median scaling, Garg crop + cap, accumulate Eigen errors. Batched on
device for throughput.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="KITTI Eigen-split depth evaluation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--pretrained-dispnet", required=True,
                   help="orbax checkpoint dir or torch .pth.tar")
    p.add_argument("--network", default="dispnet")
    p.add_argument("--dataset-dir", required=True, help="KITTI raw root")
    p.add_argument("--dataset-list", required=True,
                   help="Eigen test file list (one image path per line)")
    p.add_argument("--img-height", type=int, default=128)
    p.add_argument("--img-width", type=int, default=416)
    p.add_argument("--min-depth", type=float, default=1e-3)
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--no-resize", action="store_true")
    p.add_argument("--classification", action="store_true")
    p.add_argument("--num-bins", type=int, default=64)
    p.add_argument("--median-scaling", action="store_true",
                   help="per-image median scaling (self-supervised models)")
    p.add_argument("--imagenet-normalization", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--output-dir", default=None, help="dump predicted depth .npy")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ serving path (ops/quant.py), calibrated "
                        "lazily on the first eval batches; reports the "
                        "same metric table at higher throughput")
    p.add_argument("--calib-batches", type=int, default=1,
                   help="--int8: number of leading eval batches to "
                        "calibrate activation ranges on (first-batch-only "
                        "calibration is a silent quality dependency; more "
                        "batches widen the observed ranges)")
    p.add_argument("--fused-upsample", action="store_true",
                   help="disp_res*/disp_vgg_bn decoder: run (2x upsample -> conv) as "
                        "ONE lhs-dilated conv (exact reparametrization of "
                        "the same checkpoint; ops/fused_upconv.py) — "
                        "removes the materialized full-res resize "
                        "intermediates. Needs --img-height/width "
                        "divisible by 32")
    p.add_argument("--percentile", type=float, default=None,
                   help="--int8: calibrate to this percentile of "
                        "|activation| instead of the max. 99.9 is the "
                        "measured recommendation for trained checkpoints "
                        "(+0.004 abs_rel vs +0.010 for absmax; absmax "
                        "also degrades as --calib-batches grows — "
                        "BASELINE.md round-3 calibration table)")
    return p


def load_params(path: str, network: str, model, img_hw, head: str = "disp"):
    """orbax dir or torch .pth.tar -> (params, batch_stats)."""
    import jax
    import jax.numpy as jnp

    p = Path(path)
    if p.is_file():
        from supervised_dispnet_tpu.utils.checkpoint import load_torch_state_dict
        from supervised_dispnet_tpu.utils.convert_models import convert_network

        sd = load_torch_state_dict(p)
        return convert_network(sd, network, head=head)
    # orbax: raw restore — no optimizer template needed, so checkpoints
    # from any optimizer (adam, adamw, ...) load
    from supervised_dispnet_tpu.utils.checkpoint import restore_raw

    restored, _ = restore_raw(p)
    return restored["params"]["disp"], restored["batch_stats"].get("disp", {})


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    # persistent XLA compile cache: first compiles through the remote
    # tunnel take minutes; cached re-invocations are instant
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.data.augment import (
        HALF_MEAN, HALF_STD, IMAGENET_MEAN, IMAGENET_STD, normalize_images,
    )
    from supervised_dispnet_tpu.kitti_eval.depth_evaluation_utils import (
        EvalConfig, KittiEigenFramework, evaluate_depth,
    )
    from supervised_dispnet_tpu.losses.classification import DepthBins, logits_to_depth
    from supervised_dispnet_tpu.models import get_disp_net

    head = "classification" if args.classification else "disp"
    model = get_disp_net(args.network, head=head, num_bins=args.num_bins,
                         fused_upsample=args.fused_upsample)
    img_hw = (args.img_height, args.img_width)
    params, batch_stats = load_params(
        args.pretrained_dispnet, args.network, model, img_hw, head=head
    )
    bins = DepthBins(num_bins=args.num_bins, max_depth=args.max_depth)
    mean = IMAGENET_MEAN if args.imagenet_normalization else HALF_MEAN
    std = IMAGENET_STD if args.imagenet_normalization else HALF_STD

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    import functools

    from supervised_dispnet_tpu.models.common import apply_model

    def _to_depth(out):
        if args.classification:
            if isinstance(out, (list, tuple)):
                out = out[0]  # finest-scale logits
            return logits_to_depth(out, bins)
        if isinstance(out, (list, tuple)):
            return 1.0 / out[0][..., 0]
        return out[..., 0]

    @functools.partial(jax.jit, static_argnums=())
    def _fp_forward(x):
        return _to_depth(apply_model(model, variables, x))

    if args.int8:
        from supervised_dispnet_tpu.ops.quant import (
            calibrate_conv_ranges, quantized_apply,
        )

        _q: dict = {"fn": None, "calib": []}

        def forward(x):
            # calibrate lazily on the first --calib-batches eval batches
            # (serving them in fp), then serve int8 for the rest
            if _q["fn"] is None:
                _q["calib"].append(x)
                if len(_q["calib"]) >= max(1, args.calib_batches):
                    ranges = calibrate_conv_ranges(
                        model, variables, _q["calib"],
                        percentile=args.percentile)
                    print(f"int8 PTQ: calibrated {len(ranges)} ranges on "
                          f"{len(_q['calib'])} batches")
                    _q["calib"].clear()
                    _q["fn"] = jax.jit(lambda xx: _to_depth(
                        quantized_apply(model, variables, xx, ranges=ranges)))
                    return _q["fn"](x)
                return _fp_forward(x)
            return _q["fn"](x)
    else:
        forward = _fp_forward

    from supervised_dispnet_tpu.data.filelist_validation import validate_eigen_list

    fmt_errors = validate_eigen_list(args.dataset_list, expect_count=False)
    if fmt_errors:
        # warn only: custom lists (non-KITTI layouts) are allowed
        print(f"WARNING: {args.dataset_list} does not look like a canonical "
              f"Eigen list ({fmt_errors[0]})")
    test_files = [l for l in open(args.dataset_list)]
    framework = KittiEigenFramework(
        args.dataset_dir, test_files, args.min_depth, args.max_depth
    )
    import cv2

    # Double-buffered eval pipeline: a host thread decodes the NEXT batch
    # while the device runs the current one, and device->host readback lags
    # one batch behind dispatch (jax async dispatch overlaps the transfer
    # with the next forward). Prediction upsampling to GT resolution happens
    # on the HOST with cv2 — GT sizes vary per image and a per-image device
    # resize would cost one ~23 ms tunnel round trip each.
    import queue
    import threading

    gt_list, pred_list = [], []

    def produce(q):
        batch_imgs, batch_gt = [], []
        try:
            for i, sample in enumerate(framework):
                img = sample["img"].astype(np.float32) / 255.0
                if not args.no_resize:
                    img = cv2.resize(img, (args.img_width, args.img_height),
                                     interpolation=cv2.INTER_AREA)
                batch_imgs.append(img)
                batch_gt.append(sample["gt_depth"])
                if len(batch_imgs) == args.batch_size:
                    q.put((np.stack(batch_imgs), batch_gt))
                    batch_imgs, batch_gt = [], []
                if i % 50 == 0:
                    print(f"  {i}/{len(framework)}", flush=True)
            if batch_imgs:
                q.put((np.stack(batch_imgs), batch_gt))
            q.put(None)
        except BaseException as e:  # surface decode errors in the main thread
            q.put(e)

    q: "queue.Queue" = queue.Queue(maxsize=2)
    threading.Thread(target=produce, args=(q,), daemon=True).start()

    def drain(depth_dev, gts):
        depth = np.asarray(depth_dev)  # readback (lagged one batch)
        for d, gt in zip(depth, gts):
            pred_list.append(cv2.resize(d, (gt.shape[1], gt.shape[0]),
                                        interpolation=cv2.INTER_LINEAR))
            gt_list.append(gt)

    in_flight = None
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        if item is None:
            break
        imgs_np, gts = item
        x = normalize_images(jnp.asarray(imgs_np), mean, std)
        depth_dev = forward(x)  # async dispatch — do not block here
        if in_flight is not None:
            drain(*in_flight)
        in_flight = (depth_dev, gts)
    if in_flight is not None:
        drain(*in_flight)

    cfg = EvalConfig(min_depth=args.min_depth, max_depth=args.max_depth,
                     median_scaling=args.median_scaling)
    results = evaluate_depth(gt_list, pred_list, cfg)

    if args.output_dir:
        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / "predictions.npy", np.asarray(pred_list, dtype=object),
                allow_pickle=True)

    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    print()
    print("".join(f"{n:>10}" for n in names))
    print("".join(f"{results[n]:10.4f}" for n in names))


if __name__ == "__main__":
    main()
