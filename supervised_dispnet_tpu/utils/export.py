"""Model export for serving: serialize the jitted forward pass as a
portable StableHLO artifact via ``jax.export``.

The reference has no serving story (checkpoints only); for production
deployment the exported artifact can be reloaded (``load_forward``) in any
process — including one without the model code — and executed on any
matching backend.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp


def export_forward(
    model,
    variables,
    path: str | Path,
    batch_size: int | str = 1,
    img_height: int = 128,
    img_width: int = 416,
    int8_ranges: dict | None = None,
) -> None:
    """Serialize model.apply(variables, x)[finest] as a serving artifact.

    ``batch_size`` is an int for a fixed-shape program, or ``"dynamic"``
    for a batch-polymorphic one (jax.export symbolic shapes): a single
    artifact then serves any batch size — the production contract, since
    request batching varies at runtime. H/W stay static (the CNN's
    resolution is a model property; XLA tiling wants them fixed).

    With ``int8_ranges`` (from ``ops.quant.calibrate_conv_ranges``), the
    exported program runs the int8 PTQ path with the weights PRE-quantized
    (``ops.quant.bake_int8_weights``): the artifact stores int8 kernel
    constants + fp scales — the fp32 kernels are never read by the trace,
    so the artifact is ~4x smaller on conv weights — and the serving
    process needs neither the model code nor the calibration data.
    """
    from jax import export as jax_export

    from supervised_dispnet_tpu.models.common import apply_model

    baked = None
    if int8_ranges is not None:
        from supervised_dispnet_tpu.ops.quant import bake_int8_weights

        baked = bake_int8_weights(model, variables, int8_ranges)

    def forward(x):
        if int8_ranges is not None:
            from supervised_dispnet_tpu.ops.quant import quantized_apply

            out = quantized_apply(model, variables, x, ranges=int8_ranges,
                                  baked=baked)
        else:
            out = apply_model(model, variables, x)
        if isinstance(out, (list, tuple)):
            return out[0]
        return out

    if batch_size == "dynamic":
        (batch_size,) = jax_export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct(
        (batch_size, img_height, img_width, 3), jnp.float32
    )
    exported = jax_export.export(jax.jit(forward))(x_spec)
    Path(path).write_bytes(exported.serialize())


def export_pose_forward(
    model,
    variables,
    path: str | Path,
    nb_ref_imgs: int = 2,
    batch_size: int | str = 1,
    img_height: int = 128,
    img_width: int = 416,
) -> None:
    """Serialize the pose net for odometry serving.

    The artifact takes ``(tgt (B, H, W, 3), refs (B, R, H, W, 3))`` and
    returns the ``(B, R, 6)`` target->ref 6-DoF poses (the convention
    ``test_pose.py`` consumes). ``batch_size`` works like
    :func:`export_forward` (int or ``"dynamic"``)."""
    from jax import export as jax_export

    def forward(tgt, refs):
        out = model.apply({"params": variables["params"]}, tgt,
                          [refs[:, i] for i in range(nb_ref_imgs)])
        # PoseExpNet returns (exp_masks, pose); PoseNet returns pose
        return out[1] if isinstance(out, tuple) else out

    if batch_size == "dynamic":
        (batch_size,) = jax_export.symbolic_shape("b")
    tgt_spec = jax.ShapeDtypeStruct(
        (batch_size, img_height, img_width, 3), jnp.float32)
    refs_spec = jax.ShapeDtypeStruct(
        (batch_size, nb_ref_imgs, img_height, img_width, 3), jnp.float32)
    exported = jax_export.export(jax.jit(forward))(tgt_spec, refs_spec)
    Path(path).write_bytes(exported.serialize())


def load_forward(path: str | Path):
    """Deserialize an exported forward; returns a callable reproducing the
    exported signature (disp: (x) -> disparity; pose: (tgt, refs) ->
    poses)."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return lambda *args: exported.call(*args)
