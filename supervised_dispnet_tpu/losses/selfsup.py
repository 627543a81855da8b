"""Self-supervised losses: photometric inverse-warp, explainability,
second-order smoothness.

Rebuild of the reference's SfmLearner-lineage losses (reference:
``loss_functions.py::{photometric_reconstruction_loss, explainability_loss,
smooth_loss}``). Multi-scale, multi-reference-frame; the image pyramid is
2x average pooling, intrinsics are rescaled per scale, and the loss means
run over all pixels with invalid (out-of-view) diffs zeroed — matching the
reference's normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.ops.resize import downsample2x_avg
from supervised_dispnet_tpu.ops.warp import inverse_warp


def _scale_intrinsics(intrinsics: jax.Array, factor: float) -> jax.Array:
    """Scale fx, fy, cx, cy by ``factor`` (downsampled image plane)."""
    scale = jnp.array(
        [[factor, 1.0, factor], [1.0, factor, factor], [1.0, 1.0, 1.0]],
        dtype=intrinsics.dtype,
    )
    return intrinsics * scale


def _phase_subsample(x: jax.Array, s: int, oy: jax.Array, ox: jax.Array):
    """Keep every s-th pixel starting at traced phase (oy, ox).

    x: (B, H, W[, C]) with H, W divisible by s -> (B, H/s, W/s[, C]).
    Reshape + tiny dynamic takes keep shapes static under jit.
    """
    B, H, W = x.shape[:3]
    rest = x.shape[3:]
    if H % s or W % s:
        raise ValueError(
            f"stochastic_stride {s} must divide every scale's spatial dims; "
            f"got ({H}, {W})")
    v = x.reshape(B, H // s, s, W // s, s, *rest)
    v = jnp.take(v, oy, axis=2)
    return jnp.take(v, ox, axis=3)


def _subsample_intrinsics(K: jax.Array, s: int, oy, ox) -> jax.Array:
    """K' = A^-1 K for the affine grid map x_full = s * x_sub + ox: the
    back-projection of sub-grid index (i, j) through K' equals the
    back-projection of its true full-res pixel (s*i + oy, s*j + ox)
    through K."""
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    skew = K[:, 0, 1]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx / s, skew / s, (cx - ox) / s], axis=-1)
    row1 = jnp.stack([zeros, fy / s, (cy - oy) / s], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=1)


def photometric_reconstruction_loss(
    tgt_img: jax.Array,
    ref_imgs: list[jax.Array],
    intrinsics: jax.Array,
    depths: list[jax.Array],
    explainability_masks: list[jax.Array] | None,
    pose: jax.Array,
    rotation_mode: str = "euler",
    padding_mode: str = "zeros",
    use_pallas_warp: bool = False,
    half_res: bool = False,
    remat: bool = False,
    batch_refs: bool = False,
    stochastic_stride: int = 1,
    rng: jax.Array | None = None,
    stochastic_phases: tuple | None = None,
) -> tuple[jax.Array, list[jax.Array]]:
    """Multi-scale photometric L1 between target and inverse-warped refs.

    Args:
      tgt_img: (B, H, W, 3) target frame.
      ref_imgs: list of (B, H, W, 3) reference frames (len = seq_len - 1).
      intrinsics: (B, 3, 3) at full resolution.
      depths: per-scale target depths [(B, H/2^s, W/2^s)], finest first.
      explainability_masks: per-scale (B, h, w, num_refs) sigmoid masks or
        None.
      pose: (B, num_refs, 6) target->ref pose vectors.
      half_res: compute the whole photometric pyramid one octave down
        (images, depths, and masks 2x-downsampled before the loop). TPU
        warp gathers are index-count-bound, so this cuts warp cost ~4x; it
        is a documented DEVIATION from the reference loss (off by default).
      remat: jax.checkpoint each (scale, ref) photometric term — the warp
        grids / gathered patches / warped images are recomputed in the
        backward pass instead of held in HBM (the self-sup working set is
        dominated by these at large batch). Gradients identical
        (tests/test_losses.py); ``warped_results`` comes back empty (the
        finest warps would otherwise have to be stored, defeating the
        point; nothing in the train path consumes them).
      batch_refs: warp ALL reference frames of a scale as one batched
        ``inverse_warp`` of (R*B) images (one patch-pack + gather program
        per scale instead of R). Exact: sum_r mean_r == R * mean(concat)
        (tests/test_losses.py batched-parity) — but MEASURED SLOWER on
        TPU (B=32 dispnet: 180 vs 354 img/s, 0.51x — the concatenated
        ref/tgt/depth copies at every scale outweigh the per-op savings;
        gathers are index-count-bound and batching does not cut index
        count; BASELINE.md round-4 A/B, benchmarks/selfsup_warp_ab.py).
        Default False (the reference's per-ref loop); kept as the
        measured negative.
      stochastic_stride: > 1 enables the STOCHASTIC photometric term
        (documented DEVIATION, like half_res): each scale's photometric
        L1 is evaluated only at every stride-th target pixel per axis,
        at a per-step uniformly-random phase — an unbiased estimator of
        the full-pixel mean (averaging the estimate over all stride^2
        phases reproduces it exactly; tests/test_losses.py). TPU warp
        gathers are index-count-bound (~6.9 ns/index), so stride 2 cuts
        warp cost ~4x. The subsampled grid back-projects through
        phase-adjusted intrinsics (exact affine remap, no resampling of
        depth or target). Requires an ``rng`` (or explicit
        ``stochastic_phases`` for tests) and the per-ref arm
        (``batch_refs=False``).
      rng: PRNG key consumed when ``stochastic_stride > 1`` (per-scale
        phase draws).
      stochastic_phases: testing override — per-scale ((oy, ox), ...)
        integer phases instead of random draws.

    Returns:
      (loss, warped_results): scalar loss and the finest-scale warped images
      (for logging, reference: tensorboard warp images in ``train.py``).
    (reference: ``loss_functions.py::photometric_reconstruction_loss``)
    """
    if stochastic_stride > 1:
        if batch_refs:
            raise ValueError(
                "stochastic_stride > 1 is only supported with the per-ref "
                "arm (batch_refs=False, the measured-faster default)")
        if rng is None and stochastic_phases is None:
            raise ValueError("stochastic_stride > 1 needs an rng (or "
                             "explicit stochastic_phases)")

    total = jnp.float32(0.0)
    warped_log: list[jax.Array] = []
    tgt_s = tgt_img
    refs_s = list(ref_imgs)
    scale0 = 1.0
    if half_res:
        tgt_s = downsample2x_avg(tgt_s)
        refs_s = [downsample2x_avg(r) for r in refs_s]
        depths = [
            d.reshape(d.shape[0], d.shape[1] // 2, 2, d.shape[2] // 2, 2)
            .mean(axis=(2, 4))
            for d in depths
        ]
        if explainability_masks is not None:
            explainability_masks = [downsample2x_avg(m)
                                    for m in explainability_masks]
        scale0 = 0.5
    R = len(refs_s)
    B = tgt_img.shape[0]
    for s, depth in enumerate(depths):
        if s > 0:
            tgt_s = downsample2x_avg(tgt_s)
            refs_s = [downsample2x_avg(r) for r in refs_s]
        K_s = _scale_intrinsics(intrinsics, scale0 / (2**s))

        if not batch_refs:
            # per-reference-frame warps (the reference's loop shape) —
            # the measured-faster default (see batch_refs docstring)
            tgt_term, depth_term, K_term = tgt_s, depth, K_s
            Kt_term = None
            if stochastic_stride > 1:
                st = stochastic_stride
                if stochastic_phases is not None:
                    oy, ox = stochastic_phases[s]
                    oy = jnp.asarray(oy, jnp.int32)
                    ox = jnp.asarray(ox, jnp.int32)
                else:
                    oy, ox = jax.random.randint(
                        jax.random.fold_in(rng, s), (2,), 0, st)
                tgt_term = _phase_subsample(tgt_s, st, oy, ox)
                depth_term = _phase_subsample(depth, st, oy, ox)
                Kt_term = _subsample_intrinsics(
                    K_s, st, oy.astype(K_s.dtype), ox.astype(K_s.dtype))
            for r, ref in enumerate(refs_s):
                mask_sr = (explainability_masks[s][..., r : r + 1]
                           if explainability_masks is not None else None)
                if mask_sr is not None and stochastic_stride > 1:
                    mask_sr = _phase_subsample(
                        mask_sr, stochastic_stride, oy, ox)

                def _term_r(ref, depth, pose_r, K_s, tgt_s, mask_sr, Kt):
                    warped, valid = inverse_warp(
                        ref, depth, pose_r, K_s,
                        rotation_mode=rotation_mode,
                        padding_mode=padding_mode,
                        use_pallas=use_pallas_warp, diff_img=False,
                        tgt_intrinsics=Kt,
                    )
                    diff = ((tgt_s - warped)
                            * valid[..., None].astype(tgt_s.dtype))
                    if mask_sr is not None:
                        diff = diff * mask_sr
                    return jnp.abs(diff).mean(), warped

                if remat:
                    total = total + jax.checkpoint(
                        lambda *a: _term_r(*a)[0]
                    )(ref, depth_term, pose[:, r], K_term, tgt_term,
                      mask_sr, Kt_term)
                else:
                    term, warped = _term_r(ref, depth_term, pose[:, r],
                                           K_term, tgt_term, mask_sr,
                                           Kt_term)
                    total = total + term
                    if s == 0:
                        warped_log.append(warped)
            continue

        # ALL reference frames of this scale warp as ONE batched
        # inverse_warp — one patch-pack + one gather of (R*B, h, w)
        # indices instead of R. Measured 0.51x on TPU (see docstring):
        # kept as the A/B arm, not the default.
        # sum_r mean_r == R * mean(concat): exact, same normalization as
        # the reference's per-ref means
        # (reference: loss_functions.py::photometric_reconstruction_loss)
        refs_cat = jnp.concatenate(refs_s, axis=0)        # (R*B, h, w, 3)
        depth_cat = jnp.concatenate([depth] * R, axis=0)
        pose_cat = jnp.concatenate([pose[:, r] for r in range(R)], axis=0)
        K_cat = jnp.concatenate([K_s] * R, axis=0)
        tgt_cat = jnp.concatenate([tgt_s] * R, axis=0)
        mask_cat = None
        if explainability_masks is not None:
            m = explainability_masks[s]                   # (B, h, w, R)
            mask_cat = jnp.moveaxis(m, -1, 0).reshape(
                R * B, *m.shape[1:3], 1)

        def _term(refs_cat, depth_cat, pose_cat, K_cat, tgt_cat, mask_cat):
            warped, valid = inverse_warp(
                refs_cat, depth_cat, pose_cat, K_cat,
                rotation_mode=rotation_mode, padding_mode=padding_mode,
                use_pallas=use_pallas_warp,
                # the warped source is training DATA here — its
                # gradient is dead; skipping it selects the cheaper
                # coords-only VJP
                diff_img=False,
            )
            diff = (tgt_cat - warped) * valid[..., None].astype(tgt_cat.dtype)
            if mask_cat is not None:
                diff = diff * mask_cat
            return R * jnp.abs(diff).mean(), warped

        if remat:
            total = total + jax.checkpoint(
                lambda *a: _term(*a)[0]
            )(refs_cat, depth_cat, pose_cat, K_cat, tgt_cat, mask_cat)
        else:
            term, warped = _term(refs_cat, depth_cat, pose_cat, K_cat,
                                 tgt_cat, mask_cat)
            total = total + term
            if s == 0:
                warped_log.extend(
                    warped[r * B:(r + 1) * B] for r in range(R))
    return total, warped_log


def explainability_loss(masks: list[jax.Array]) -> jax.Array:
    """BCE of each mask toward 1 — regularizes masks from collapsing to 0.

    masks: per-scale (B, h, w, num_refs) sigmoid outputs.
    (reference: ``loss_functions.py::explainability_loss``)
    """
    total = jnp.float32(0.0)
    for m in masks:
        m32 = jnp.clip(m.astype(jnp.float32), 1e-6, 1.0)
        total = total + (-jnp.log(m32)).mean()
    return total


def _gradient(pred: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Forward-difference spatial gradients of (B, H, W) maps."""
    d_dx = pred[:, :, 1:] - pred[:, :, :-1]
    d_dy = pred[:, 1:, :] - pred[:, :-1, :]
    return d_dx, d_dy


def smooth_loss(pred_maps: list[jax.Array], scale_decay: float = 2.3) -> jax.Array:
    """Second-order gradient penalty over multi-scale disparity maps, with
    per-scale weight decaying by ``scale_decay``.

    (reference: ``loss_functions.py::smooth_loss``)
    """
    total = jnp.float32(0.0)
    weight = 1.0
    for pred in pred_maps:
        if pred.ndim == 4:
            pred = pred[..., 0]
        dx, dy = _gradient(pred)
        dx2, dxdy = _gradient(dx)
        dydx, dy2 = _gradient(dy)
        total = total + weight * (
            jnp.abs(dx2).mean()
            + jnp.abs(dxdy).mean()
            + jnp.abs(dydx).mean()
            + jnp.abs(dy2).mean()
        )
        weight /= scale_decay
    return total
