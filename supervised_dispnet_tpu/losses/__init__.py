"""Loss functions and evaluation metrics (jit-safe masked reductions)."""

from supervised_dispnet_tpu.losses.supervised import (
    l1_loss,
    berhu_loss,
    scale_invariant_loss,
    multiscale_supervised_loss,
)
from supervised_dispnet_tpu.losses.classification import (
    DepthBins,
    depth_classification_loss,
    logits_to_depth,
    multiscale_classification_loss,
)
from supervised_dispnet_tpu.losses.selfsup import (
    photometric_reconstruction_loss,
    explainability_loss,
    smooth_loss,
)
from supervised_dispnet_tpu.losses.metrics import compute_errors

__all__ = [
    "l1_loss",
    "berhu_loss",
    "scale_invariant_loss",
    "multiscale_supervised_loss",
    "DepthBins",
    "depth_classification_loss",
    "logits_to_depth",
    "multiscale_classification_loss",
    "photometric_reconstruction_loss",
    "explainability_loss",
    "smooth_loss",
    "compute_errors",
]
