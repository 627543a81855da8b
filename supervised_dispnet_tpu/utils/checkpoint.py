"""Checkpointing (orbax) and torch->JAX checkpoint conversion.

Replaces the reference's ``utils.py::save_checkpoint`` (``.pth.tar`` files,
best-copy on improvement) with orbax: atomic, async-capable, stores params
+ BN stats + optimizer state + PRNG key + step (the reference lineage did
NOT checkpoint optimizer state — we do, and resume is exact).

The converters ingest the reference's torch ``state_dict`` layouts
(reference: ``models/DispNetS.py`` Sequential naming ``convN.0/convN.2``,
``upconvN.0``, ``iconvN.0``, ``predict_dispN.0``; torchvision ResNet
``layerN.B.convM``; ``models/PoseExpNet.py``) and emit our flax pytrees:
conv kernels OIHW->HWIO, transposed convs IOHW->HWIO with spatial flip
(verified numerically against torch), BN running stats -> batch_stats.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax save / restore
# ---------------------------------------------------------------------------

def save_checkpoint(
    directory: str | Path,
    state,
    step: int | None = None,
    is_best: bool = False,
    keep: int = 3,
) -> None:
    """Save a TrainState; mirror to 'best' when ``is_best``
    (reference: ``utils.py::save_checkpoint`` best-copy behavior)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    if step is None:
        step = int(state.step)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "step": np.asarray(state.step),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    with ocp.CheckpointManager(
        directory / "ckpts",
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(payload))
    if is_best:
        with ocp.CheckpointManager(directory / "best") as mgr:
            mgr.save(step, args=ocp.args.StandardSave(payload))


def latest_checkpoint_step(directory: str | Path, best: bool = False) -> int | None:
    """Highest saved step (the trainer saves one per epoch), or None."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute() / ("best" if best else "ckpts")
    if not directory.exists():
        return None
    with ocp.CheckpointManager(directory) as mgr:
        return mgr.latest_step()


def restore_raw(directory: str | Path, best: bool = False):
    """Restore the latest checkpoint as a raw pytree (no template needed —
    works regardless of which optimizer the run used)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute() / ("best" if best else "ckpts")
    with ocp.CheckpointManager(directory) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
        return mgr.restore(step), step


def restore_checkpoint(directory: str | Path, state, best: bool = False):
    """Restore the latest (or best) checkpoint into a template TrainState."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    sub = "best" if best else "ckpts"
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "step": np.asarray(state.step),
    }
    has_ema = getattr(state, "ema_params", None) is not None
    if has_ema:
        template["ema_params"] = state.ema_params
    with ocp.CheckpointManager(directory / sub) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory / sub}")
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        except BaseException:
            if not has_ema:
                raise
            # pre-EMA checkpoint restored into an EMA-enabled state: restore
            # without the shadow and re-seed it from the live params
            template.pop("ema_params")
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    new_ema = state.ema_params
    if has_ema:
        new_ema = restored.get("ema_params", restored["params"])
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        rng=jax.numpy.asarray(restored["rng"]),
        ema_params=new_ema,
    )


# ---------------------------------------------------------------------------
# torch state_dict -> flax conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


class ConversionError(KeyError):
    pass


def sd_get(sd: dict, key: str):
    """sd[key] with a diagnostic listing near-miss keys on failure (e.g. a
    checkpoint from a different --network family)."""
    if key in sd:
        return sd[key]
    stem = key.split(".")[0]
    near = sorted(k for k in sd if k.startswith(stem))[:8]
    raise ConversionError(
        f"state_dict key {key!r} not found; nearby keys: {near}. "
        "Checkpoint/network mismatch, or the reference fork names this "
        "layer differently (repoint the name map in utils/convert_models.py)."
    )


def t2j_conv(w) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def t2j_conv_transpose(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax (kh, kw, I, O)
    with spatial flip (verified vs torch numerically)."""
    return _np(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def load_torch_state_dict(path: str | Path) -> dict:
    """Load a reference ``.pth.tar`` checkpoint's state_dict (handles the
    {'epoch', 'state_dict'} wrapper and DataParallel 'module.' prefixes)."""
    import torch

    blob = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k.removeprefix("module."): v for k, v in sd.items()}


def convert_dispnet(sd: dict) -> dict:
    """Reference DispNetS state_dict -> our flax params pytree."""
    p: dict[str, Any] = {}
    for i in range(1, 8):
        p[f"conv{i}"] = {
            "conv_a": {"Conv_0": {"kernel": t2j_conv(sd_get(sd, f"conv{i}.0.weight")),
                                   "bias": _np(sd_get(sd, f"conv{i}.0.bias"))}},
            "conv_b": {"Conv_0": {"kernel": t2j_conv(sd_get(sd, f"conv{i}.2.weight")),
                                   "bias": _np(sd_get(sd, f"conv{i}.2.bias"))}},
        }
    for i in range(1, 8):
        p[f"upconv{i}"] = {"ConvTranspose_0": {
            "kernel": t2j_conv_transpose(sd_get(sd, f"upconv{i}.0.weight")),
            "bias": _np(sd_get(sd, f"upconv{i}.0.bias")),
        }}
        p[f"iconv{i}"] = {"Conv_0": {
            "kernel": t2j_conv(sd_get(sd, f"iconv{i}.0.weight")),
            "bias": _np(sd_get(sd, f"iconv{i}.0.bias")),
        }}
    for i in range(1, 5):
        p[f"predict_disp{i}"] = {"Conv_0": {
            "kernel": t2j_conv(sd_get(sd, f"predict_disp{i}.0.weight")),
            "bias": _np(sd_get(sd, f"predict_disp{i}.0.bias")),
        }}
    return p


def convert_pose_exp_net(sd: dict, output_exp: bool = True) -> dict:
    """Reference PoseExpNet state_dict -> our flax params pytree."""
    p: dict[str, Any] = {}
    for i in range(1, 8):
        p[f"conv{i}"] = {"Conv_0": {
            "kernel": t2j_conv(sd_get(sd, f"conv{i}.0.weight")),
            "bias": _np(sd_get(sd, f"conv{i}.0.bias")),
        }}
    p["pose_pred"] = {
        "kernel": t2j_conv(sd_get(sd, "pose_pred.weight")),
        "bias": _np(sd_get(sd, "pose_pred.bias")),
    }
    if output_exp:
        for i in range(1, 6):
            if f"upconv{i}.0.weight" in sd:
                p[f"upconv{i}"] = {"ConvTranspose_0": {
                    "kernel": t2j_conv_transpose(sd_get(sd, f"upconv{i}.0.weight")),
                    "bias": _np(sd_get(sd, f"upconv{i}.0.bias")),
                }}
        for i in range(1, 5):
            key = f"predict_mask{i}.weight"
            if key in sd:
                p[f"predict_mask{i}"] = {
                    "kernel": t2j_conv(sd[key]),
                    "bias": _np(sd_get(sd, f"predict_mask{i}.bias")),
                }
    return p


def _convert_bn(sd: dict, prefix: str):
    params = {"scale": _np(sd_get(sd, f"{prefix}.weight")), "bias": _np(sd_get(sd, f"{prefix}.bias"))}
    stats = {"mean": _np(sd_get(sd, f"{prefix}.running_mean")),
             "var": _np(sd_get(sd, f"{prefix}.running_var"))}
    return params, stats


def convert_resnet_encoder(sd: dict, depth: int = 18, prefix: str = ""):
    """torchvision ResNet state_dict -> (params, batch_stats) for
    ``models/resnet.py::ResNetEncoder``. ``prefix`` strips e.g. 'encoder.'."""
    if prefix:
        sd = {k.removeprefix(prefix): v for k, v in sd.items() if k.startswith(prefix)}
    from supervised_dispnet_tpu.models.resnet import RESNET_SPECS

    block_cls, stage_sizes, _ = RESNET_SPECS[depth]
    n_convs = 3 if block_cls.__name__ == "Bottleneck" else 2
    params: dict[str, Any] = {"conv1": {"kernel": t2j_conv(sd_get(sd, "conv1.weight"))}}
    bn_p, bn_s = _convert_bn(sd, "bn1")
    params["bn1"] = bn_p
    stats: dict[str, Any] = {"bn1": bn_s}
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t_pref = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            blk_p: dict[str, Any] = {}
            blk_s: dict[str, Any] = {}
            for c in range(1, n_convs + 1):
                blk_p[f"conv{c}"] = {"kernel": t2j_conv(sd_get(sd, f"{t_pref}.conv{c}.weight"))}
                bp, bs = _convert_bn(sd, f"{t_pref}.bn{c}")
                blk_p[f"bn{c}"] = bp
                blk_s[f"bn{c}"] = bs
            if f"{t_pref}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": t2j_conv(sd_get(sd, f"{t_pref}.downsample.0.weight"))
                }
                bp, bs = _convert_bn(sd, f"{t_pref}.downsample.1")
                blk_p["downsample_bn"] = bp
                blk_s["downsample_bn"] = bs
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


# ---------------------------------------------------------------------------
# flax -> torch export (reverse interop: models trained here usable by
# torch-based reference tooling)
# ---------------------------------------------------------------------------

def j2t_conv(k) -> np.ndarray:
    """flax conv kernel (kh, kw, I, O) -> torch Conv2d weight (O, I, kh, kw)."""
    return np.asarray(k).transpose(3, 2, 0, 1)


def j2t_conv_transpose(k) -> np.ndarray:
    """flax ConvTranspose kernel -> torch ConvTranspose2d weight (inverse of
    t2j_conv_transpose: unflip spatially, (kh, kw, I, O) -> (I, O, kh, kw))."""
    return np.asarray(k)[::-1, ::-1].transpose(2, 3, 0, 1).copy()


def export_dispnet_to_torch(params: dict) -> dict:
    """Our flax DispNetS params -> a reference-layout torch state_dict
    (numpy values; wrap with torch.as_tensor to save as .pth.tar)."""
    sd: dict[str, np.ndarray] = {}
    for i in range(1, 8):
        a = params[f"conv{i}"]["conv_a"]["Conv_0"]
        b = params[f"conv{i}"]["conv_b"]["Conv_0"]
        sd[f"conv{i}.0.weight"] = j2t_conv(a["kernel"])
        sd[f"conv{i}.0.bias"] = np.asarray(a["bias"])
        sd[f"conv{i}.2.weight"] = j2t_conv(b["kernel"])
        sd[f"conv{i}.2.bias"] = np.asarray(b["bias"])
    for i in range(1, 8):
        u = params[f"upconv{i}"]["ConvTranspose_0"]
        sd[f"upconv{i}.0.weight"] = j2t_conv_transpose(u["kernel"])
        sd[f"upconv{i}.0.bias"] = np.asarray(u["bias"])
        c = params[f"iconv{i}"]["Conv_0"]
        sd[f"iconv{i}.0.weight"] = j2t_conv(c["kernel"])
        sd[f"iconv{i}.0.bias"] = np.asarray(c["bias"])
    for i in range(1, 5):
        h = params[f"predict_disp{i}"]["Conv_0"]
        sd[f"predict_disp{i}.0.weight"] = j2t_conv(h["kernel"])
        sd[f"predict_disp{i}.0.bias"] = np.asarray(h["bias"])
    return sd
