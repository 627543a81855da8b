"""Model construction / shape / jit tests (tiny inputs, CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.models import (
    DispNetS, DispResNet, DispVggBN, FCRN, PoseExpNet, PoseNet, get_disp_net,
)

# KITTI dump aspect: H=128, W=416 — tests use /4 size, same 32-divisibility
H, W = 32, 104


def _img(B=1, h=H, w=W, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, h, w, c)).astype(np.float32))


@pytest.mark.quick
def test_dispnet_shapes():
    x = _img()
    model = DispNetS()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    disps = jax.jit(model.apply)(params, x)
    assert len(disps) == 4
    for s, d in enumerate(disps):
        assert d.shape == (1, H // 2**s, W // 2**s, 1)
        dn = np.asarray(d)
        assert (dn > 0).all() and (dn < 10.011).all()  # sigmoid*10 + 0.01


@pytest.mark.parametrize("depth", [18, 50])
def test_dispresnet_shapes(depth):
    x = _img()
    model = DispResNet(encoder_depth=depth)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    disps = model.apply(variables, x, train=False)
    assert len(disps) == 4
    for s, d in enumerate(disps):
        assert d.shape == (1, H // 2**s, W // 2**s, 1)


def test_dispresnet_classification_head():
    x = _img()
    model = DispResNet(encoder_depth=18, head="classification", num_bins=32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, H, W, 32)


def test_dispresnet_train_mode_updates_batch_stats():
    x = _img()
    model = DispResNet(encoder_depth=18)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["encoder"]["bn1"]["mean"]
    after = updates["batch_stats"]["encoder"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_disp_vgg_bn_shapes():
    x = _img()
    model = DispVggBN()
    variables = model.init(jax.random.PRNGKey(0), x)
    disps = model.apply(variables, x, train=False)
    assert len(disps) == 4
    assert disps[0].shape == (1, H, W, 1)
    assert disps[3].shape == (1, H // 8, W // 8, 1)


def test_fcrn_shapes():
    x = _img()
    model = FCRN(encoder_depth=50)
    variables = model.init(jax.random.PRNGKey(0), x)
    depth = model.apply(variables, x, train=False)
    assert depth.shape == (1, H, W, 1)
    assert (np.asarray(depth) >= 0).all()


def test_pose_exp_net():
    tgt = _img(seed=1)
    refs = [_img(seed=2), _img(seed=3)]
    model = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    params = model.init(jax.random.PRNGKey(0), tgt, refs)
    masks, pose = model.apply(params, tgt, refs)
    assert pose.shape == (1, 2, 6)
    assert np.abs(np.asarray(pose)).max() < 1.0  # 0.01-scaled
    assert len(masks) == 4
    for s, m in enumerate(masks):
        assert m.shape == (1, H // 2**s, W // 2**s, 2)
        mn = np.asarray(m)
        assert (mn >= 0).all() and (mn <= 1).all()


def test_pose_net_no_exp():
    tgt = _img(seed=1)
    refs = [_img(seed=2), _img(seed=3)]
    model = PoseNet(nb_ref_imgs=2)
    params = model.init(jax.random.PRNGKey(0), tgt, refs)
    pose = model.apply(params, tgt, refs)
    assert pose.shape == (1, 2, 6)


@pytest.mark.quick
def test_registry():
    assert isinstance(get_disp_net("dispnet"), DispNetS)
    assert get_disp_net("disp_res_50").encoder_depth == 50
    assert get_disp_net("disp_res", head="classification").head == "classification"
    with pytest.raises(ValueError):
        get_disp_net("nope")
    with pytest.raises(ValueError):
        get_disp_net("dispnet", head="classification")


def test_dispnet_jit_and_grad():
    x = _img()
    model = DispNetS()
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(p):
        disps = model.apply(p, x)
        return sum(jnp.mean(d) for d in disps)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_dispresnet_remat_grads_equal():
    """remat=True (activation checkpointing) must not change gradients."""
    x = _img(seed=11)
    m0 = DispResNet(encoder_depth=18)
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = DispResNet(encoder_depth=18, remat=True)

    def loss(m, p):
        return jnp.mean(m.apply({**v, "params": p}, x, train=False)[0])

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_disp_vgg_bn_remat_grads_equal():
    """DispVggBN remat (per-VGG-stage checkpointing): same param tree,
    identical gradients — --remat now covers every --network choice."""
    from supervised_dispnet_tpu.models import DispVggBN

    x = _img(seed=14)
    m0 = DispVggBN()
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = DispVggBN(remat=True)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v1["params"])
            == jax.tree_util.tree_structure(v["params"]))

    def loss(m, p):
        return sum(jnp.mean(d) for d in
                   m.apply({**v, "params": p}, x, train=False))

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fcrn_remat_grads_equal():
    """FCRN remat (encoder blocks + UpProjections): same param tree,
    identical gradients through the BN-bearing up-projection stack."""
    from supervised_dispnet_tpu.models import FCRN

    x = _img(seed=13)
    m0 = FCRN(encoder_depth=18)
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = FCRN(encoder_depth=18, remat=True)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v1["params"])
            == jax.tree_util.tree_structure(v["params"]))

    def loss(m, p):
        return jnp.mean(m.apply({**v, "params": p}, x, train=False))

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dispnet_remat_grads_equal():
    """DispNetS remat (late round 3, the --remat flag for the self-sup
    working-set cliff): same param tree, identical gradients."""
    from supervised_dispnet_tpu.models import DispNetS

    x = _img(seed=12)
    m0 = DispNetS()
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = DispNetS(remat=True)
    # the flag must not change the param tree (checkpoints toggle freely)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v1["params"])
            == jax.tree_util.tree_structure(v["params"]))

    def loss(m, p):
        return sum(jnp.mean(d) for d in m.apply({"params": p}, x))

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.quick
def test_dispresnet_fused_upsample_parity():
    """fused_upsample=True: identical param tree and identical outputs (to
    fp rounding) vs the unfused decoder — the fused path is a
    reparametrization of the same weights (ops/fused_upconv.py). Grad
    parity is the full-tier test below (its backward compile of two full
    decoder graphs costs ~80 s; quick's op-level grad representative is
    tests/test_fused_upconv.py::test_fused_upconv_grad_parity)."""
    x = _img(B=2, h=32, w=64, seed=13)
    m0 = DispResNet(encoder_depth=18)
    m1 = DispResNet(encoder_depth=18, fused_upsample=True)
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(3), x)
    # structure/shape check only — eval_shape skips the eager init cost
    v1 = jax.eval_shape(m1.init, jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape

    d0 = jax.jit(lambda v, x: m0.apply(v, x, train=False))(v0, x)
    d1 = jax.jit(lambda v, x: m1.apply(v, x, train=False))(v0, x)
    for a, b in zip(d0, d1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dispresnet_fused_upsample_grad_parity():
    """Gradients through the fused decoder equal the unfused decoder's —
    training works identically on either path."""
    x = _img(B=2, h=32, w=64, seed=13)
    m0 = DispResNet(encoder_depth=18)
    m1 = DispResNet(encoder_depth=18, fused_upsample=True)
    v0 = m0.init(jax.random.PRNGKey(3), x)

    def loss(m, p):
        return jnp.mean(m.apply({**v0, "params": p}, x, train=False)[0])

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v0["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v0["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_dispvgg_fused_upsample_parity():
    """DispVggBN fused_upsample: identical param tree and identical
    outputs (to fp rounding) vs the unfused decoder — same exact
    reparametrization as DispResNet's (shared _FusedUpConvParams
    module, ops/fused_upconv.py)."""
    x = _img(B=2, h=32, w=64, seed=15)
    m0 = DispVggBN()
    m1 = DispVggBN(fused_upsample=True)
    v0 = m0.init(jax.random.PRNGKey(4), x)
    v1 = m1.init(jax.random.PRNGKey(4), x)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape

    d0 = m0.apply(v0, x, train=False)
    d1 = m1.apply(v0, x, train=False)
    for a, b in zip(d0, d1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dispvgg_fused_upsample_grad_parity():
    """Gradients through the fused VGG decoder equal the unfused
    decoder's — the fused path trains identically."""
    x = _img(B=2, h=32, w=64, seed=15)
    m0 = DispVggBN()
    m1 = DispVggBN(fused_upsample=True)
    v0 = m0.init(jax.random.PRNGKey(4), x)

    def loss(m, p):
        return jnp.mean(m.apply({**v0, "params": p}, x, train=False)[0])

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v0["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v0["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_dispresnet_fused_upsample_classification_head():
    """fused decoder composes with the classification head."""
    x = _img(B=1, h=32, w=64, seed=14)
    m0 = DispResNet(encoder_depth=18, head="classification", num_bins=8)
    m1 = DispResNet(encoder_depth=18, head="classification", num_bins=8,
                    fused_upsample=True)
    v = m0.init(jax.random.PRNGKey(5), x)
    np.testing.assert_allclose(
        np.asarray(m0.apply(v, x, train=False)),
        np.asarray(m1.apply(v, x, train=False)), rtol=1e-4, atol=1e-5)


def test_remat_conv_policy_grads_equal():
    """remat='conv' (save conv outputs, recompute elementwise) must not
    change gradients either — it only changes WHICH residuals are saved.
    Measured NEGATIVE for throughput on TPU (BASELINE.md round-5 training
    closure); kept as a knob, so its numerics stay guarded here."""
    x = _img(seed=17)
    m0 = DispResNet(encoder_depth=18)
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = DispResNet(encoder_depth=18, remat="conv")
    assert jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x)["params"]
    ) == jax.tree_util.tree_structure(v["params"])

    def loss(m, p):
        return jnp.mean(m.apply({**v, "params": p}, x, train=False)[0])

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v["params"]))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v["params"]))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
