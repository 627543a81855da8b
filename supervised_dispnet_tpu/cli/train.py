"""Training CLI — flag-compatible rebuild of the reference ``train.py``.

Examples (reference: README training commands):

  # supervised BerHu on dumped KITTI
  python train.py /data/kitti_dump --network disp_res_50 --loss berhu \
      -b 4 --lr 2e-4 --epochs 80 --with-gt

  # depth-as-classification
  python train.py /data/kitti_dump --network disp_res_50 --loss classification

  # self-supervised 3-frame snippets
  python train.py /data/kitti_dump --network dispnet --loss selfsup \
      --sequence-length 3 -p 1.0 -m 0.2 -s 0.1
"""

from __future__ import annotations

import argparse
import datetime
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native supervised/self-supervised DispNet training",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("data", help="path to the dumped dataset (prepare_train_data output)")
    p.add_argument("--network", default="dispnet",
                   choices=["dispnet", "disp_res", "disp_res_18", "disp_res_50",
                            "disp_vgg_bn", "fcrn"])
    p.add_argument("--loss", default="berhu",
                   choices=["l1", "berhu", "scale_invariant", "classification",
                            "selfsup"])
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--epoch-size", type=int, default=0,
                   help="limit batches per epoch (0 = full)")
    p.add_argument("-b", "--batch-size", type=int, default=4)
    p.add_argument("--lr", "--learning-rate", type=float, default=2e-4)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "step", "cosine"],
                   help="learning-rate schedule (extension; the reference "
                        "trained at a fixed lr)")
    p.add_argument("--lr-warmup-steps", type=int, default=0,
                   help="linear 0->lr warmup, in optimizer steps")
    p.add_argument("--lr-decay-steps", type=int, default=0,
                   help="step: staircase period; cosine: total decay span "
                        "(optimizer steps)")
    p.add_argument("--lr-decay-rate", type=float, default=0.5,
                   help="decay factor per period for --lr-schedule step")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help=">0 keeps an EMA shadow of the params and validates "
                        "with it (e.g. 0.999)")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="adam beta1 (reference flag name)")
    p.add_argument("--beta", type=float, default=0.999,
                   help="adam beta2 (reference flag name)")
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--sequence-length", type=int, default=3)
    p.add_argument("--rotation-mode", default="euler", choices=["euler", "quat"])
    p.add_argument("--padding-mode", default="zeros", choices=["zeros", "border"])
    p.add_argument("-p", "--photo-loss-weight", type=float, default=1.0)
    p.add_argument("-m", "--mask-loss-weight", type=float, default=0.2)
    p.add_argument("-s", "--smooth-loss-weight", type=float, default=0.1)
    p.add_argument("--num-bins", type=int, default=64)
    p.add_argument("--multiscale-classification", action="store_true",
                   help="supervise bin logits at all 4 decoder scales "
                        "(classification head)")
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--imagenet-normalization", action="store_true")
    p.add_argument("--hue", type=float, default=0.0,
                   help="hue-jitter amplitude (fraction of the color wheel)")
    p.add_argument("--with-gt", action="store_true",
                   help="validate against dumped GT depth (always on here)")
    p.add_argument("-j", "--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--img-height", type=int, default=128)
    p.add_argument("--img-width", type=int, default=416)
    p.add_argument("--half-res-photo", action="store_true",
                   help="compute the photometric loss one octave down "
                        "(~4x cheaper warp gathers; deviates from the "
                        "reference loss)")
    p.add_argument("--stochastic-photo", type=int, default=1, metavar="N",
                   help="evaluate the photometric loss at every N-th "
                        "pixel per axis at a random per-step phase "
                        "(unbiased 1/N^2 subsample; ~N^2x cheaper warp "
                        "gathers; deviates from the reference loss)")
    p.add_argument("--use-pallas-warp", action="store_true",
                   help="use the Pallas MXU-gather sampler in the "
                        "photometric loss (self-supervised)")
    p.add_argument("--use-pallas-losses", action="store_true",
                   help="use the fused Pallas loss-reduction kernels "
                        "(berhu / classification)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 trunk compute (params/heads fp32); the "
                        "configuration the headline TPU numbers use")
    p.add_argument("--remat", nargs="?", const=True, default=False,
                   choices=["full", "conv"],
                   help="activation checkpointing (jax.checkpoint) on the "
                        "disp net's conv stages: recompute intra-stage "
                        "activations in the backward pass instead of "
                        "holding them in HBM — raises the batch size the "
                        "working set allows (the self-sup B=64 cliff is "
                        "activation-bound); all --network choices. "
                        "Bare --remat (= 'full') recomputes everything; "
                        "'conv' saves conv outputs and recomputes only "
                        "elementwise tails (both measured NEGATIVE for "
                        "throughput at 128x416 — use only when memory-"
                        "bound, e.g. full-resolution: BASELINE.md)")
    p.add_argument("--fused-upsample", action="store_true",
                   help="build the disp net's decoder with each 2x "
                        "upsample composed into the following conv (one "
                        "lhs-dilated conv, exact — ops/fused_upconv.py): "
                        "the full-res resize intermediates never hit HBM, "
                        "forward OR backward. Same param tree, so the "
                        "checkpoint serves fused or unfused. disp_res_* / "
                        "disp_vgg_bn only")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: fake-quantize every "
                        "quantizable conv of the disp net so the "
                        "checkpoint serves --int8 with less quality loss "
                        "than post-training calibration")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--loader", default="threads",
                   choices=["threads", "grain", "device"],
                   help="input pipeline backend; 'device' keeps the whole "
                        "packed train split in HBM and gathers batches on "
                        "device (requires a packed dataset root)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="loader='device' only: run this many train steps "
                        "per device call via lax.scan (amortizes the host "
                        "round trip; metrics become per-dispatch means)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help=">1: gradient accumulation over k micro-batches "
                        "(effective batch = k * batch-size, same HBM)")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help=">1: also shard image height over a second mesh "
                        "axis (GSPMD conv halo exchange) — for full-"
                        "resolution inputs whose activations outgrow one "
                        "chip; needs height/max-stride >= shards and "
                        "devices divisible by shards")
    p.add_argument("--profile-steps", type=int, default=0,
                   help=">0: capture a jax.profiler trace of this many "
                        "steady-state train steps into <run>/profile")
    p.add_argument("-f", "--training-output-freq", type=int, default=0,
                   help="log disp images to tensorboard every N iters")
    p.add_argument("--name", default="exp", help="experiment name")
    p.add_argument("--checkpoints-dir", default="checkpoints")
    p.add_argument("--pretrained-disp", default=None,
                   help="torch .pth.tar or orbax dir to initialize the disp net")
    p.add_argument("--pretrained-exppose", default=None,
                   help="torch exp_pose .pth.tar to initialize the pose net")
    p.add_argument("--pretrained-encoder", default=None,
                   help="torchvision resnet .pth state_dict for ImageNet "
                        "encoder init (disp_res_* networks)")
    p.add_argument("--resume", action="store_true",
                   help="resume the most recent run under "
                        "<checkpoints-dir>/<name> exactly (params + "
                        "optimizer + PRNG + epoch + best metric)")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    # persistent XLA compile cache: first compiles through the remote
    # tunnel take minutes; cached re-invocations are instant
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from supervised_dispnet_tpu.models import PoseExpNet, get_disp_net
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    timestamp = datetime.datetime.now().strftime("%m-%d-%H.%M")
    save_path = Path(args.checkpoints_dir) / args.name / timestamp
    if args.resume:
        # continue the most recent run dir for this experiment name
        runs = sorted(d for d in (Path(args.checkpoints_dir) / args.name).glob("*")
                      if d.is_dir()) if (Path(args.checkpoints_dir) / args.name).exists() else []
        if runs:
            save_path = runs[-1]
        else:
            print(f"=> --resume: no previous run under "
                  f"{Path(args.checkpoints_dir) / args.name}, starting fresh")

    cfg = TrainerConfig(
        data=args.data,
        save_path=str(save_path),
        network=args.network,
        loss=args.loss,
        epochs=args.epochs,
        epoch_size=args.epoch_size,
        batch_size=args.batch_size,
        lr=args.lr,
        lr_schedule=args.lr_schedule,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_decay_steps=args.lr_decay_steps,
        lr_decay_rate=args.lr_decay_rate,
        ema_decay=args.ema_decay,
        beta1=args.momentum,
        beta2=args.beta,
        weight_decay=args.weight_decay,
        sequence_length=args.sequence_length,
        rotation_mode=args.rotation_mode,
        padding_mode=args.padding_mode,
        photo_loss_weight=args.photo_loss_weight,
        mask_loss_weight=args.mask_loss_weight,
        smooth_loss_weight=args.smooth_loss_weight,
        num_bins=args.num_bins,
        max_depth=args.max_depth,
        imagenet_normalization=args.imagenet_normalization,
        hue=args.hue,
        workers=args.workers,
        seed=args.seed,
        img_height=args.img_height,
        img_width=args.img_width,
        use_pallas_warp=args.use_pallas_warp,
        half_res_photo=args.half_res_photo,
        stochastic_photo=args.stochastic_photo,
        remat=args.remat,
        use_pallas_losses=args.use_pallas_losses,
        qat=args.qat,
        fused_upsample=args.fused_upsample,
        bf16=args.bf16,
        debug_nans=args.debug_nans,
        loader=args.loader,
        steps_per_dispatch=args.steps_per_dispatch,
        profile_steps=args.profile_steps,
        accum_steps=args.accum_steps,
        spatial_shards=args.spatial_shards,
        training_output_freq=args.training_output_freq,
        resume=args.resume,
    )

    head = "classification" if args.loss == "classification" else "disp"
    disp_model = get_disp_net(
        args.network, head=head, num_bins=args.num_bins,
        multiscale_classification=args.multiscale_classification,
        remat=args.remat, fused_upsample=args.fused_upsample)
    pose_model = None
    if args.loss == "selfsup":
        pose_model = PoseExpNet(nb_ref_imgs=args.sequence_length - 1,
                                output_exp=args.mask_loss_weight > 0)

    trainer = Trainer(cfg, disp_model, pose_model)

    if args.pretrained_disp:
        _load_pretrained_disp(trainer, args.pretrained_disp, args.network)
    if args.pretrained_encoder:
        _load_pretrained_encoder(trainer, args.pretrained_encoder, args.network)
    if args.pretrained_exppose:
        _load_pretrained_exppose(trainer, args.pretrained_exppose,
                                 args.mask_loss_weight > 0)

    print(f"=> saving to {save_path}")
    best = trainer.fit()
    metric = "abs_rel" if trainer.val_with_gt else "photo_loss"
    print(f"=> best val {metric} {best:.4f}")


def _load_pretrained_disp(trainer, path: str, network: str) -> None:
    """Initialize disp params from a torch .pth.tar (converted) or orbax dir."""
    p = Path(path)
    if p.is_dir():
        from supervised_dispnet_tpu.utils.checkpoint import restore_checkpoint

        trainer.state = restore_checkpoint(p, trainer.state)
        return
    from supervised_dispnet_tpu.utils.checkpoint import load_torch_state_dict
    from supervised_dispnet_tpu.utils.convert_models import convert_network

    sd = load_torch_state_dict(p)
    head = "classification" if trainer.classification else "disp"
    params, stats = convert_network(sd, network, head=head)
    trainer.state = trainer.state.replace(
        params={**trainer.state.params, "disp": params},
        batch_stats={**trainer.state.batch_stats, "disp": stats},
    )


def _load_pretrained_encoder(trainer, path: str, network: str) -> None:
    """ImageNet init: torchvision resnet state_dict -> our encoder subtree
    (reference: DispResNet's optional torchvision pretrained encoder)."""
    if not network.startswith("disp_res"):
        raise ValueError("--pretrained-encoder applies to disp_res_* networks")
    depth = 50 if network.endswith("50") else 18
    from supervised_dispnet_tpu.utils.checkpoint import (
        convert_resnet_encoder, load_torch_state_dict,
    )

    sd = load_torch_state_dict(path)
    enc_params, enc_stats = convert_resnet_encoder(sd, depth=depth)
    disp_params = dict(trainer.state.params["disp"])
    disp_params["encoder"] = enc_params
    disp_stats = dict(trainer.state.batch_stats["disp"])
    disp_stats["encoder"] = enc_stats
    trainer.state = trainer.state.replace(
        params={**trainer.state.params, "disp": disp_params},
        batch_stats={**trainer.state.batch_stats, "disp": disp_stats},
    )


def _load_pretrained_exppose(trainer, path: str, output_exp: bool) -> None:
    from supervised_dispnet_tpu.utils.checkpoint import (
        convert_pose_exp_net, load_torch_state_dict,
    )

    sd = load_torch_state_dict(path)
    trainer.state = trainer.state.replace(
        params={**trainer.state.params,
                "pose": convert_pose_exp_net(sd, output_exp=output_exp)}
    )


if __name__ == "__main__":
    main()
