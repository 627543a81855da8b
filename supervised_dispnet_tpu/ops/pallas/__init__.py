"""Hand-written Pallas TPU kernels for the hot paths.

Per the north star (BASELINE.json): fused per-pixel loss reductions and
fused sampling. Each kernel has a pure-XLA reference implementation in
``losses``/``ops`` used for correctness tests; the Pallas versions avoid
materializing per-pixel intermediates (log-softmax planes, BerHu branch
maps) in HBM — the reduction happens in VMEM as data streams through.
"""

from supervised_dispnet_tpu.ops.pallas.losses import (
    berhu_loss_pallas,
    depth_classification_loss_pallas,
)

__all__ = ["berhu_loss_pallas", "depth_classification_loss_pallas"]
