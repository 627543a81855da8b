"""Model registry (reference: ``models/__init__.py`` + the ``--network``
flag dispatch in ``train.py``/``test_disp.py``)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from supervised_dispnet_tpu.models.dispnet import DispNetS
from supervised_dispnet_tpu.models.dispresnet import DispResNet
from supervised_dispnet_tpu.models.disp_vgg_bn import DispVggBN
from supervised_dispnet_tpu.models.fcrn import FCRN
from supervised_dispnet_tpu.models.posenet import PoseExpNet, PoseNet
from supervised_dispnet_tpu.models.resnet import ResNetEncoder

# --network flag values mirroring the reference CLI
_REGISTRY = {
    "dispnet": lambda **kw: DispNetS(**kw),
    "disp_res": lambda **kw: DispResNet(encoder_depth=18, **kw),
    "disp_res_18": lambda **kw: DispResNet(encoder_depth=18, **kw),
    "disp_res_50": lambda **kw: DispResNet(encoder_depth=50, **kw),
    "disp_vgg_bn": lambda **kw: DispVggBN(**kw),
    "fcrn": lambda **kw: FCRN(**kw),
}


def get_disp_net(name: str, head: str = "disp", num_bins: int = 64,
                 multiscale_classification: bool = False,
                 remat: bool | str = False, fused_upsample: bool = False) -> nn.Module:
    """Build a disparity/depth network by its ``--network`` name."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown network {name!r}; choices: {sorted(_REGISTRY)}")
    kw: dict[str, Any] = {}
    if key.startswith("disp_res"):
        kw = {"head": head, "num_bins": num_bins,
              "multiscale_classification": multiscale_classification}
    elif head != "disp":
        raise ValueError(f"classification head is only supported on disp_res*, got {name!r}")
    if remat:
        kw["remat"] = remat  # True/'full' or 'conv' (selective policy)
    if fused_upsample:
        if not (key.startswith("disp_res") or key == "disp_vgg_bn"):
            # dispnet's analog (pixel-shuffle ConvTranspose,
            # ops/fused_deconv.py) measured NEGATIVE end-to-end on TPU
            # (-19%, BASELINE.md round 5) — XLA's ConvTranspose lowering
            # already skips the dilation zeros, so the reorder only adds
            # a full-res memory pass. Available on DispNetS(...) directly
            # for study; not exposed here.
            raise ValueError(
                "--fused-upsample is only supported on disp_res* / "
                f"disp_vgg_bn (resize->conv decoders), got {name!r}")
        kw["fused_upsample"] = True
    return _REGISTRY[key](**kw)


__all__ = [
    "DispNetS",
    "DispResNet",
    "DispVggBN",
    "FCRN",
    "PoseExpNet",
    "PoseNet",
    "ResNetEncoder",
    "get_disp_net",
]
