"""Pose / explainability networks for self-supervised snippets.

Rebuild of the reference nets (reference: ``models/PoseExpNet.py::PoseExpNet``
and the pose-only ``models/PoseNet.py`` variant): a shared stride-2 conv+ELU
encoder over the channel-concatenated (target, refs) snippet; a 1x1 pose
head emitting 6-DoF per reference frame, globally averaged and scaled by
0.01; an optional transposed-conv decoder emitting multi-scale sigmoid
explainability masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from supervised_dispnet_tpu.models.common import ConvELU, UpConvELU, crop_like, xavier_uniform

ENC_PLANES = (16, 32, 64, 128, 256, 256, 256)
ENC_KERNELS = (7, 5, 3, 3, 3, 3, 3)
DEC_PLANES = (256, 128, 64, 32, 16)
POSE_SCALE = 0.01


class PoseExpNet(nn.Module):
    """Pose + explainability network.

    __call__(tgt, refs) -> (exp_masks or None, pose):
      tgt: (B, H, W, 3); refs: list of (B, H, W, 3), len = nb_ref_imgs.
      pose: (B, nb_ref_imgs, 6) = [t, r] * 0.01.
      exp_masks: list of 4 sigmoid masks (finest first) each
        (B, H/2^s, W/2^s, nb_ref_imgs), or None if output_exp=False.
    """

    nb_ref_imgs: int = 2
    output_exp: bool = True
    dtype: object = None  # compute dtype (bf16 for MXU speed); params fp32

    @nn.compact
    def __call__(self, tgt: jax.Array, refs: list[jax.Array]):
        assert len(refs) == self.nb_ref_imgs
        x = jnp.concatenate([tgt, *refs], axis=-1)

        feats = []
        h = x
        for n, (planes, k) in enumerate(zip(ENC_PLANES, ENC_KERNELS)):
            h = ConvELU(planes, k, stride=2, dtype=self.dtype,
                        name=f"conv{n + 1}")(h)
            feats.append(h)
        c1, c2, c3, c4, c5, c6, c7 = feats

        # pose head computes fp32 (6-DoF feeds the geometry stack)
        pose = nn.Conv(6 * self.nb_ref_imgs, (1, 1), kernel_init=xavier_uniform,
                       dtype=jnp.float32, name="pose_pred")(c7.astype(jnp.float32))
        pose = pose.mean(axis=(1, 2)) * POSE_SCALE
        pose = pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)

        if not self.output_exp:
            return None, pose

        def mask_head(feat, n):
            # mask head in fp32: sigmoid output multiplies the photometric
            # residuals directly
            logits = nn.Conv(self.nb_ref_imgs, (3, 3), padding=1,
                             kernel_init=xavier_uniform, dtype=jnp.float32,
                             name=f"predict_mask{n}")(feat.astype(jnp.float32))
            return nn.sigmoid(logits)

        u5 = crop_like(UpConvELU(DEC_PLANES[0], dtype=self.dtype, name="upconv5")(c5), c4)
        u4 = crop_like(UpConvELU(DEC_PLANES[1], dtype=self.dtype, name="upconv4")(u5), c3)
        exp4 = mask_head(u4, 4)  # 1/8
        u3 = crop_like(UpConvELU(DEC_PLANES[2], dtype=self.dtype, name="upconv3")(u4), c2)
        exp3 = mask_head(u3, 3)  # 1/4
        u2 = crop_like(UpConvELU(DEC_PLANES[3], dtype=self.dtype, name="upconv2")(u3), c1)
        exp2 = mask_head(u2, 2)  # 1/2
        u1 = crop_like(UpConvELU(DEC_PLANES[4], dtype=self.dtype, name="upconv1")(u2), tgt)
        exp1 = mask_head(u1, 1)  # full

        return [exp1, exp2, exp3, exp4], pose


class PoseNet(nn.Module):
    """Pose-only variant (no explainability decoder)."""

    nb_ref_imgs: int = 2

    @nn.compact
    def __call__(self, tgt: jax.Array, refs: list[jax.Array]) -> jax.Array:
        _, pose = PoseExpNet(self.nb_ref_imgs, output_exp=False)(tgt, refs)
        return pose
