"""upconv2x_fused == resize_bilinear(2x) -> 3x3 zero-pad conv, exactly
(borders included), plus gradient parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from supervised_dispnet_tpu.ops.fused_upconv import (
    compose_upsample_kernel,
    lhs_dilated_conv_ps,
    upconv2x_fused,
)
from supervised_dispnet_tpu.ops.resize import resize_bilinear

HP = jax.lax.Precision.HIGHEST


def _reference(x, k):
    u = resize_bilinear(x, 2 * x.shape[1], 2 * x.shape[2])
    return lax.conv_general_dilated(
        u, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HP)


@pytest.mark.quick
@pytest.mark.parametrize("shape,cout", [
    ((2, 6, 8, 3), 4),
    ((1, 4, 13, 16), 16),   # odd width
    ((3, 5, 5, 2), 7),
])
def test_fused_upconv_exact(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(3, 3, shape[-1], cout)).astype(np.float32))
    ref = _reference(x, k)
    out = upconv2x_fused(x, k, precision=HP)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
@pytest.mark.parametrize("shape,cout", [
    ((2, 6, 8, 3), 4),
    ((1, 4, 13, 16), 16),   # odd width
])
def test_pixel_shuffle_form_matches_dilated(shape, cout):
    """lhs_dilated_conv_ps (4 dense 3x3 phase convs + depth-to-space) must
    equal the lhs_dilation=(2,2) 6x6 conv it re-expresses — same fp
    contractions, reordered (the MAC-count probe for the int8 decoder)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(3, 3, shape[-1], cout)).astype(np.float32))
    kc = compose_upsample_kernel(k)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dil = lax.conv_general_dilated(
        xp, kc, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HP)
    ps = lhs_dilated_conv_ps(xp, kc, precision=HP)
    assert ps.shape == dil.shape
    np.testing.assert_allclose(np.asarray(ps), np.asarray(dil),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_fused_upconv_grad_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))

    def loss_ref(x, k):
        return jnp.sum(jnp.tanh(_reference(x, k)))

    def loss_fused(x, k):
        return jnp.sum(jnp.tanh(upconv2x_fused(x, k, precision=HP)))

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-5)
