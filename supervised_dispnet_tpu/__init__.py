"""supervised_dispnet_tpu — a TPU-native monocular-depth framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
``zenithfang/supervised_dispnet`` (WACV 2020, arXiv:1909.03686):

- DispNetS / DispResNet (ResNet-18/50) / VGG16-BN / FCRN disparity networks
  with multi-scale heads, plus a depth-as-classification variant.
- PoseExpNet / PoseNet for self-supervised 3-frame snippets.
- Supervised losses (L1, BerHu, scale-invariant, binned-depth cross-entropy)
  and self-supervised losses (inverse-warp photometric, explainability,
  smoothness).
- KITTI ETL + Eigen-split evaluation harness.
- Data-parallel training over a ``jax.sharding.Mesh`` with on-device fused
  augmentation, optax optimizers and orbax checkpointing.

Everything is NHWC, jit-compiled, and designed around the TPU memory
hierarchy (see ops/pallas for hand-written kernels on the hot paths).

Reference citations use ``path::symbol`` per SURVEY.md §0 (the reference
mount was empty; BASELINE.json attests the capability list).
"""

__version__ = "0.1.0"
