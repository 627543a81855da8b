"""Depth evaluation metrics — the Eigen-split error suite.

(reference: ``kitti_eval/depth_evaluation_utils.py::compute_errors`` and the
validation metrics in ``loss_functions.py``)

jit-safe masked implementation; also usable from numpy (the offline eval
harness calls it with boolean-indexed flat arrays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_errors(
    gt: jax.Array, pred: jax.Array, mask: jax.Array | None = None
) -> dict[str, jax.Array]:
    """abs_rel, sq_rel, rmse, rmse_log, a1 (δ<1.25), a2, a3, abs_diff.

    gt, pred: same-shape depth arrays; mask: optional validity mask.
    All reductions are masked means (static shapes under jit).
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if mask is None:
        m = jnp.ones_like(gt)
    else:
        m = mask.astype(jnp.float32)
    count = jnp.maximum(m.sum(), 1.0)

    def mmean(x):
        return (x * m).sum() / count

    safe_gt = jnp.maximum(gt, 1e-6)
    safe_pred = jnp.maximum(pred, 1e-6)
    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25**2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25**3).astype(jnp.float32))

    diff = gt - pred
    abs_diff = mmean(jnp.abs(diff))
    abs_rel = mmean(jnp.abs(diff) / safe_gt)
    sq_rel = mmean(diff * diff / safe_gt)
    rmse = jnp.sqrt(mmean(diff * diff))
    dlog = jnp.log(safe_gt) - jnp.log(safe_pred)
    rmse_log = jnp.sqrt(mmean(dlog * dlog))

    return {
        "abs_diff": abs_diff,
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }
