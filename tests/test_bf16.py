"""bf16 compute-dtype policy: outputs stay close to fp32, params stay fp32."""

import numpy as np
import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.models import DispNetS, DispResNet

H, W = 32, 64


def test_dispresnet_bf16_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32))
    m32 = DispResNet(encoder_depth=18)
    v = m32.init(jax.random.PRNGKey(0), x)
    m16 = DispResNet(encoder_depth=18, dtype=jnp.bfloat16)
    d32 = m32.apply(v, x, train=False)
    d16 = m16.apply(v, x, train=False)
    for a, b in zip(d32, d16):
        assert b.dtype == jnp.float32  # heads are fp32
        # disparity in (0.01, 10.01); bf16 trunk -> small relative error
        rel = np.abs(np.asarray(a) - np.asarray(b)) / np.abs(np.asarray(a))
        assert rel.mean() < 0.05, rel.mean()


def test_params_stay_fp32_with_bf16_compute():
    x = jnp.zeros((1, H, W, 3))
    m16 = DispNetS(dtype=jnp.bfloat16)
    params = m16.init(jax.random.PRNGKey(0), x)["params"]
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    disps = m16.apply({"params": params}, x)
    assert disps[0].dtype == jnp.float32
