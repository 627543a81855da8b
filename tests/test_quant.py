"""int8 PTQ (ops/quant.py): calibration, interception scope, and
quantized-forward quality vs the fp32 forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.models import DispNetS, DispResNet
from supervised_dispnet_tpu.ops.quant import (
    calibrate_conv_ranges,
    quantized_apply,
)

H, W = 32, 64


@pytest.fixture(scope="module")
def dispnet_setup():
    model = DispNetS()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    return model, variables, x


def test_calibration_covers_convs_not_heads(dispnet_setup):
    model, variables, x = dispnet_setup
    ranges = calibrate_conv_ranges(model, variables, [x])
    assert len(ranges) > 10
    for p, a in ranges.items():
        assert np.isfinite(a) and a > 0
    # disparity heads (features==1) are never calibrated/quantized
    assert not any("disp" in p.lower() and p.endswith("Conv_0")
                   for p in ranges if "pred" in p.lower())


def test_multi_batch_calibration_takes_max(dispnet_setup):
    model, variables, x = dispnet_setup
    r1 = calibrate_conv_ranges(model, variables, [x])
    r2 = calibrate_conv_ranges(model, variables, [x, 3.0 * x])
    assert set(r1) == set(r2)
    assert all(r2[p] >= r1[p] for p in r1)


@pytest.mark.quick
def test_quantized_forward_close_to_fp32(dispnet_setup):
    model, variables, x = dispnet_setup
    ranges = calibrate_conv_ranges(model, variables, [x])
    fp = np.asarray(model.apply(variables, x)[0])
    q = np.asarray(jax.jit(
        lambda v, xx: quantized_apply(model, v, xx, ranges=ranges)
    )(variables, x)[0])
    rel = np.abs(q - fp) / np.abs(fp)
    assert np.median(rel) < 0.02
    assert rel.max() < 0.15


def test_empty_ranges_is_identity(dispnet_setup):
    model, variables, x = dispnet_setup
    fp = np.asarray(model.apply(variables, x)[0])
    q = np.asarray(quantized_apply(model, variables, x, ranges={})[0])
    np.testing.assert_array_equal(q, fp)


def test_exempt_predicate(dispnet_setup):
    model, variables, x = dispnet_setup
    stem = lambda m: tuple(m.kernel_size) == (7, 7)  # noqa: E731
    r_all = calibrate_conv_ranges(model, variables, [x])
    r_ex = calibrate_conv_ranges(model, variables, [x], exempt=stem)
    dropped = set(r_all) - set(r_ex)
    assert dropped and all("conv1" in p or "Conv_0" in p for p in dropped)


def test_percentile_calibration(dispnet_setup):
    """Percentile ranges are <= absmax ranges and still serve a close
    forward."""
    model, variables, x = dispnet_setup
    r_max = calibrate_conv_ranges(model, variables, [x])
    r_pct = calibrate_conv_ranges(model, variables, [x], percentile=99.0)
    assert set(r_max) == set(r_pct)
    assert all(r_pct[p] <= r_max[p] + 1e-6 for p in r_max)
    fp = np.asarray(model.apply(variables, x)[0])
    q = np.asarray(quantized_apply(model, variables, x, ranges=r_pct)[0])
    assert np.median(np.abs(q - fp) / np.abs(fp)) < 0.05


def test_degenerate_calibration_raises(dispnet_setup):
    model, variables, _ = dispnet_setup
    zero = jnp.zeros((1, H, W, 3), jnp.float32)
    with pytest.raises(ValueError, match="degenerate"):
        calibrate_conv_ranges(model, variables, [zero])


@pytest.mark.parametrize("name", ["disp_vgg_bn"])
def test_other_variants_quantize(name):
    """VGG-BN variant runs through the int8 path (ConvTranspose stages
    stay fp by design). FCRN is covered by its own trained-weights tests
    below (random-init fixtures mispredict its quant quality ~300x)."""
    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.models.common import apply_model

    model = get_disp_net(name)
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    ranges = calibrate_conv_ranges(model, variables, [x])
    assert len(ranges) > 5
    out_fp = apply_model(model, variables, x)
    out_q = jax.jit(lambda v, xx: quantized_apply(
        model, v, xx, ranges=ranges))(variables, x)
    fp = np.asarray(out_fp[0] if isinstance(out_fp, (list, tuple)) else out_fp)
    q = np.asarray(out_q[0] if isinstance(out_q, (list, tuple)) else out_q)
    rel = np.abs(q - fp) / np.maximum(np.abs(fp), 1e-6)
    assert np.median(rel) < 0.05


def test_dispresnet_bn_model_quantizes():
    model = DispResNet(encoder_depth=18)
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    ranges = calibrate_conv_ranges(model, variables, [x])
    assert len(ranges) > 20
    fp = np.asarray(model.apply(variables, x, train=False)[0])
    q = np.asarray(jax.jit(
        lambda v, xx: quantized_apply(model, v, xx, ranges=ranges)
    )(variables, x)[0])
    rel = np.abs(q - fp) / np.abs(fp)
    assert np.median(rel) < 0.05


def test_dilated_unpool_conv_quantizes_with_exact_geometry():
    """Round 3 makes FCRN's input-dilated unpool convs quantizable:
    _int8_conv forwards lhs/rhs dilation (the ADVICE r2 geometry hazard is
    now a parity property, not an exclusion). The quantized UpProjection
    must match the fp block in SHAPE (dilation preserved) and value
    (int8-noise-level error)."""
    from supervised_dispnet_tpu.models.fcrn import UpProjection

    block = UpProjection(features=16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, H // 4, W // 4, 32), jnp.float32)
    variables = block.init(rng, x)
    ranges = calibrate_conv_ranges(block, variables, [x])
    dilated = sorted(p for p in ranges
                     if p.split("/")[-1] in ("conv_a", "conv_b"))
    assert dilated == ["conv_a", "conv_b"], ranges
    fp = np.asarray(block.apply(variables, x, train=False))
    q = np.asarray(jax.jit(
        lambda v, xx: quantized_apply(block, v, xx, ranges=ranges)
    )(variables, x))
    assert q.shape == fp.shape  # (B, 2*Hin, 2*Win, 16): dilation upheld
    assert fp.shape[1] == 2 * x.shape[1] and fp.shape[2] == 2 * x.shape[2]
    # the block ends in a relu, so most entries are exact zeros on both
    # sides; measure relative error on the live activations only
    live = np.abs(fp) > 0.01 * float(np.abs(fp).mean())
    rel = np.abs(q - fp)[live] / np.abs(fp)[live]
    assert np.median(rel) < 0.05, np.median(rel)


def test_fcrn_full_model_quantizes():
    """The whole FCRN runs through the int8 path (encoder chain + dilated
    decoder convs); the metric-depth head (features==1) stays fp. Output
    geometry identical; values finite and int8-noise-close on the
    up-projection trunk."""
    from supervised_dispnet_tpu.models import FCRN

    model = FCRN(encoder_depth=50)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    ranges = calibrate_conv_ranges(model, variables, [x])
    assert any(p.split("/")[-1] in ("conv_a", "conv_b") for p in ranges)
    fp = np.asarray(model.apply(variables, x, train=False))
    q = np.asarray(jax.jit(
        lambda v, xx: quantized_apply(model, v, xx, ranges=ranges)
    )(variables, x))
    assert q.shape == fp.shape
    assert np.all(np.isfinite(q))


def test_encoder_chain_parity_resnet50():
    """Round-3 int8-through encoder chain (activations stay int8 in HBM
    between blocks): output must stay close to the fp32 forward, like the
    per-conv path it replaces."""
    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50)
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    ranges = calibrate_conv_ranges(model, variables, [x])
    # round-3 calibrations carry the block-output keys the chain needs
    assert any(k.endswith("::out") for k in ranges)

    fp = np.asarray(model.apply(variables, x, train=False)[0])
    q_chain = np.asarray(quantized_apply(
        model, variables, x, ranges=ranges)[0])
    rel = np.abs(q_chain - fp) / np.abs(fp)
    assert np.median(rel) < 0.05, np.median(rel)

    # the pre-round-3 per-conv path (no ::out keys) must still work and
    # agree with the chain at quality level
    v1_ranges = {k: v for k, v in ranges.items() if not k.endswith("::out")}
    q_v1 = np.asarray(quantized_apply(
        model, variables, x, ranges=v1_ranges)[0])
    rel_v1 = np.abs(q_v1 - fp) / np.abs(fp)
    assert np.median(rel_v1) < 0.05, np.median(rel_v1)


def test_encoder_chain_parity_resnet18():
    """BasicBlock variant of the chain."""
    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=18)
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    ranges = calibrate_conv_ranges(model, variables, [x])
    fp = np.asarray(model.apply(variables, x, train=False)[0])
    q = np.asarray(quantized_apply(model, variables, x, ranges=ranges)[0])
    rel = np.abs(q - fp) / np.abs(fp)
    assert np.median(rel) < 0.05, np.median(rel)


def test_vgg_stage_chain_parity():
    """int8-through VGG stage chain (intra-stage activations stay int8;
    BN folded into the quantized weights): close to fp32, and close to
    the forced per-conv path it fuses."""
    from supervised_dispnet_tpu.models import get_disp_net

    model = get_disp_net("disp_vgg_bn")
    rng = jax.random.PRNGKey(4)
    x = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    variables = model.init(rng, x)
    ranges = calibrate_conv_ranges(model, variables, [x])
    # VGG chains need no extra keys — no ::out entries exist
    assert not any(k.endswith("::out") for k in ranges)

    fp = np.asarray(model.apply(variables, x, train=False)[0])
    q_chain = np.asarray(quantized_apply(
        model, variables, x, ranges=ranges)[0])
    rel = np.abs(q_chain - fp) / np.abs(fp)
    assert np.median(rel) < 0.05, np.median(rel)

    # forced per-conv path (exempt predicate disables chains without
    # exempting anything) agrees at quality level
    q_pc = np.asarray(quantized_apply(
        model, variables, x, ranges=ranges, exempt=lambda m: False)[0])
    rel_pc = np.abs(q_pc - q_chain) / np.maximum(np.abs(q_chain), 1e-6)
    assert np.median(rel_pc) < 0.05, np.median(rel_pc)


def test_downsample_chain_parity_dispnet(dispnet_setup):
    """int8-through DownsampleConv chain (DispNetS encoder, conv+ELU, no
    BN): the chain computes the SAME quantization grids as the per-conv
    path (input ranges + per-channel weight scales are identical; only
    the epilogue dtype bookkeeping differs), so the two paths must agree
    tightly — and both must stay close to fp32."""
    model, variables, x = dispnet_setup
    ranges = calibrate_conv_ranges(model, variables, [x])

    fp = np.asarray(model.apply(variables, x)[0])
    q_chain = np.asarray(quantized_apply(
        model, variables, x, ranges=ranges)[0])
    rel = np.abs(q_chain - fp) / np.abs(fp)
    assert np.median(rel) < 0.02, np.median(rel)

    q_pc = np.asarray(quantized_apply(
        model, variables, x, ranges=ranges, exempt=lambda m: False)[0])
    rel_pc = np.abs(q_pc - q_chain) / np.maximum(np.abs(q_chain), 1e-6)
    assert np.median(rel_pc) < 5e-3, np.median(rel_pc)


def test_chain_baked_weights_match_live_quantization():
    """bake_int8_weights must cover the VGG/DownsampleConv chains: the
    baked forward (fp32 kernels never read) matches the live-quantized
    forward at the int8 noise floor for both model families."""
    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.ops.quant import bake_int8_weights

    for name, seed in (("disp_vgg_bn", 5), ("dispnet", 6)):
        model = get_disp_net(name)
        rng = jax.random.PRNGKey(seed)
        x = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
        variables = model.init(rng, x)
        ranges = calibrate_conv_ranges(model, variables, [x])
        baked = bake_int8_weights(model, variables, ranges)
        assert any(k.endswith("::eff") for k in baked), name
        q_live = np.asarray(quantized_apply(
            model, variables, x, ranges=ranges)[0])
        q_baked = np.asarray(quantized_apply(
            model, variables, x, ranges=ranges, baked=baked)[0])
        np.testing.assert_allclose(q_baked, q_live, rtol=0, atol=1e-5,
                                   err_msg=name)


# --- QAT (fake-quant training, round 3) ------------------------------------


def test_qdq_ste_gradient_is_identity_inside_range():
    from supervised_dispnet_tpu.ops.quant import _qdq_ste

    x = jnp.linspace(-1.0, 1.0, 31)
    scale = jnp.float32(1.0 / 127.0)
    g = jax.grad(lambda v: jnp.sum(_qdq_ste(v, scale)))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(31), atol=1e-6)
    # forward actually quantizes: values land on the int8 grid
    y = np.asarray(_qdq_ste(x, scale))
    np.testing.assert_allclose(y, np.round(y / float(scale)) * float(scale),
                               atol=1e-7)


def test_fake_quant_forward_close_to_fp(dispnet_setup):
    """QAT forward = fp forward + bounded int8 noise (same noise the
    serving path injects), not a different function."""
    from supervised_dispnet_tpu.models.common import apply_model
    from supervised_dispnet_tpu.ops.quant import fake_quant_methods

    model, variables, x = dispnet_setup
    d_fp = np.asarray(apply_model(model, variables, x)[0])
    with fake_quant_methods():
        d_fq = np.asarray(apply_model(model, variables, x)[0])
    rel = np.abs(d_fq - d_fp) / np.maximum(np.abs(d_fp), 1e-6)
    assert np.median(rel) < 0.05, np.median(rel)
    assert not np.allclose(d_fq, d_fp)  # the QDQ must actually bite


def test_supervised_step_fake_quant_trains():
    """QAT step: loss decreases and gradients stay finite through the
    straight-through estimator."""
    import optax

    from supervised_dispnet_tpu.data.augment import AugmentConfig
    from supervised_dispnet_tpu.training import (
        create_train_state, make_supervised_train_step,
    )

    model = DispNetS()
    state = create_train_state(
        model, (jnp.zeros((1, H, W, 3)),), optax.adam(1e-3), seed=0)
    no_aug = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
    step = make_supervised_train_step(model, "l1", aug=no_aug, donate=False,
                                      fake_quant=True)
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "tgt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "intrinsics": jnp.asarray(np.broadcast_to(
            np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                     np.float32), (B, 3, 3)).copy()),
        "depth": jnp.asarray(
            rng.uniform(1, 60, (B, H, W)).astype(np.float32)),
    }
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_fake_quant_composes_with_bf16_trunk():
    """--qat --bf16 (the headline training precision): fake-quant runs
    its QDQ+conv in fp32 and hands back the trunk dtype."""
    import optax

    from supervised_dispnet_tpu.data.augment import AugmentConfig
    from supervised_dispnet_tpu.training import (
        create_train_state, make_supervised_train_step,
    )

    model = DispResNet(encoder_depth=18, dtype=jnp.bfloat16)
    state = create_train_state(
        model, (jnp.zeros((1, H, W, 3)),), optax.adam(1e-3), seed=0)
    no_aug = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
    step = make_supervised_train_step(model, "berhu", aug=no_aug,
                                      donate=False, fake_quant=True)
    rng = np.random.default_rng(1)
    B = 2
    batch = {
        "tgt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "intrinsics": jnp.asarray(np.broadcast_to(
            np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                     np.float32), (B, 3, 3)).copy()),
        "depth": jnp.asarray(
            rng.uniform(1, 60, (B, H, W)).astype(np.float32)),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_selfsup_step_fake_quant_trains():
    """QAT on the selfsup disp net (the pose net stays fp): finite
    decreasing loss through warp + STE."""
    import optax

    from supervised_dispnet_tpu.data.augment import AugmentConfig
    from supervised_dispnet_tpu.models import PoseExpNet
    from supervised_dispnet_tpu.training import (
        create_train_state, make_selfsup_train_step,
    )

    disp = DispNetS()
    pose = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    tgt0 = jnp.zeros((1, H, W, 3))
    state = create_train_state(
        disp, (tgt0,), optax.adam(1e-4), seed=0,
        extra_models={"pose": (pose, (tgt0, [tgt0, tgt0]))},
    )
    no_aug = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
    step = make_selfsup_train_step(disp, pose, nb_ref_imgs=2, aug=no_aug,
                                   donate=False, fake_quant=True)
    rng = np.random.default_rng(2)
    B = 2
    batch = {
        "tgt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "ref_imgs": jnp.asarray(
            rng.uniform(0, 1, (B, 2, H, W, 3)).astype(np.float32)),
        "intrinsics": jnp.asarray(np.broadcast_to(
            np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                     np.float32), (B, 3, 3)).copy()),
    }
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_fused_upsample_int8_close_to_fp_and_unfused_int8():
    """fused_upsample int8: calibration records per-stage h (+ ::skip)
    ranges, the composed 6x6 lhs-dilated conv runs int8, and the output
    stays within the usual serving tolerance of BOTH the fp forward and
    the unfused int8 forward."""
    m_fp = DispResNet(encoder_depth=18)
    m_fu = DispResNet(encoder_depth=18, fused_upsample=True)
    rng = jax.random.PRNGKey(7)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    v = m_fp.init(rng, x)

    r_fu = calibrate_conv_ranges(m_fu, v, [x])
    assert any(k.endswith("::skip") for k in r_fu), "skip ranges recorded"
    r_un = calibrate_conv_ranges(m_fp, v, [x])

    fp = np.asarray(m_fp.apply(v, x, train=False)[0])
    q_fu = np.asarray(jax.jit(
        lambda vv, xx: quantized_apply(m_fu, vv, xx, ranges=r_fu)
    )(v, x)[0])
    q_un = np.asarray(jax.jit(
        lambda vv, xx: quantized_apply(m_fp, vv, xx, ranges=r_un)
    )(v, x)[0])

    rel = np.abs(q_fu - fp) / np.abs(fp)
    assert np.median(rel) < 0.02 and rel.max() < 0.2
    # fused int8 is as close to fp as the unfused int8 path is (same
    # noise floor; borders included)
    rel_un = np.abs(q_un - fp) / np.abs(fp)
    assert np.median(rel) < max(2.5 * np.median(rel_un), 0.02)


def test_decoder_chain_parity_dispresnet():
    """Round-5 s8-through decoder chain: with a fused DispResNet and a
    full calibration, decoder activations cross HBM as int8 (dequant +
    ELU + requant fused into each stage's epilogue). The chain must (a)
    engage (``_decoder_chain_ready``), (b) stay at the serving noise
    floor vs fp, and (c) agree with the forced per-stage path to within
    the bf16-handoff rounding it eliminates."""
    from supervised_dispnet_tpu.ops.quant import _decoder_chain_ready

    m_fp = DispResNet(encoder_depth=18)
    m_fu = DispResNet(encoder_depth=18, fused_upsample=True)
    rng = jax.random.PRNGKey(21)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    v = m_fp.init(rng, x)

    r_fu = calibrate_conv_ranges(m_fu, v, [x])
    assert _decoder_chain_ready(m_fu, r_fu)
    assert not _decoder_chain_ready(m_fp, calibrate_conv_ranges(
        m_fp, v, [x])), "unfused model must not engage the decoder chain"

    fp = np.asarray(m_fp.apply(v, x, train=False)[0])
    q_chain = np.asarray(jax.jit(
        lambda vv, xx: quantized_apply(m_fu, vv, xx, ranges=r_fu)
    )(v, x)[0])
    rel = np.abs(q_chain - fp) / np.abs(fp)
    assert np.median(rel) < 0.02 and rel.max() < 0.2

    # forced per-stage path (any exempt predicate disables chains but
    # keeps per-conv + per-stage fused int8): same grids, so the only
    # difference is the fp handoff rounding the chain removes
    q_ps = np.asarray(jax.jit(
        lambda vv, xx: quantized_apply(m_fu, vv, xx, ranges=r_fu,
                                       exempt=lambda m: False)
    )(v, x)[0])
    rel_ps = np.abs(q_ps - q_chain) / np.maximum(np.abs(q_chain), 1e-6)
    assert np.median(rel_ps) < 0.02


def test_decoder_chain_multiscale_heads_and_classification():
    """All four disp heads consume the chain's _QAct handoffs (scales
    1-3) or the final fp stage (scale 0); the classification variant's
    ``astype(float32)`` dequant also composes."""
    m_fu = DispResNet(encoder_depth=18, fused_upsample=True)
    rng = jax.random.PRNGKey(22)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    v = m_fu.init(rng, x)
    r = calibrate_conv_ranges(m_fu, v, [x])
    fp = m_fu.apply(v, x, train=False)
    q = quantized_apply(m_fu, v, x, ranges=r)
    for s in range(4):
        fps, qs = np.asarray(fp[s]), np.asarray(q[s])
        assert qs.shape == fps.shape
        rel = np.abs(qs - fps) / np.abs(fps)
        assert np.median(rel) < 0.03, f"scale {s}"

    m_cls = DispResNet(encoder_depth=18, fused_upsample=True,
                       head="classification", num_bins=8,
                       multiscale_classification=True)
    v_cls = m_cls.init(rng, x)
    r_cls = calibrate_conv_ranges(m_cls, v_cls, [x])
    fp_cls = m_cls.apply(v_cls, x, train=False)
    q_cls = quantized_apply(m_cls, v_cls, x, ranges=r_cls)
    for s in range(4):
        assert np.asarray(q_cls[s]).shape == np.asarray(fp_cls[s]).shape
        err = np.abs(np.asarray(q_cls[s]) - np.asarray(fp_cls[s]))
        scale = np.abs(np.asarray(fp_cls[s])).max()
        assert np.median(err) < 0.05 * scale, f"cls scale {s}"


def test_dispvgg_fused_upsample_int8_close_to_fp():
    """DispVggBN fused_upsample through the int8 path: the shared
    _FusedUpConvParams interception engages (per-stage h + ::skip
    ranges) and quality stays at the serving noise floor."""
    from supervised_dispnet_tpu.models import DispVggBN

    m_fp = DispVggBN()
    m_fu = DispVggBN(fused_upsample=True)
    rng = jax.random.PRNGKey(9)
    x = jax.random.uniform(rng, (2, H, W, 3), jnp.float32)
    v = m_fp.init(rng, x)

    r_fu = calibrate_conv_ranges(m_fu, v, [x])
    assert any(k.endswith("::skip") for k in r_fu), "skip ranges recorded"

    fp = np.asarray(m_fp.apply(v, x, train=False)[0])
    q_fu = np.asarray(jax.jit(
        lambda vv, xx: quantized_apply(m_fu, vv, xx, ranges=r_fu)
    )(v, x)[0])
    rel = np.abs(q_fu - fp) / np.abs(fp)
    assert np.median(rel) < 0.02 and rel.max() < 0.2


def test_fused_upconv_fake_quant_mirrors_int8_stage():
    """QAT on a fused decoder stage trains against the SERVING grid: the
    fake-quant mirror (_fake_quant_fused_upconv) and the int8 serving
    path (_int8_fused_upconv) agree to fp accumulation error when the
    int8 calibration equals the fake-quant dynamic absmax — same
    composed-kernel per-channel grid, same separate h/skip scales, same
    fp border corrections on the dequantized input."""
    from supervised_dispnet_tpu.models.dispresnet import _FusedUpConvParams
    from supervised_dispnet_tpu.ops.quant import (
        _fake_quant_fused_upconv, _int8_fused_upconv,
    )

    ch, cs, cout = 5, 7, 8
    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.normal(0, 1, (2, 8, 12, ch)).astype(np.float32))
    skip = jnp.asarray(rng.normal(0, 2, (2, 16, 24, cs)).astype(np.float32))
    m = _FusedUpConvParams(features=cout, in_features=ch + cs)
    v = m.init(jax.random.PRNGKey(0), h, skip)
    bound = m.bind(v)

    fq = np.asarray(_fake_quant_fused_upconv(bound, h, skip))
    ranges = {"": float(np.max(np.abs(h))),
              "::skip": float(np.max(np.abs(skip)))}
    q8 = np.asarray(_int8_fused_upconv(bound, h, skip, ranges))
    np.testing.assert_allclose(fq, q8, rtol=1e-4, atol=1e-4)
