"""grain loader + StableHLO export roundtrip tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

H, W = 32, 64


class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "img": rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
            "depth": rng.uniform(1, 60, (H, W)).astype(np.float32),
        }


def test_grain_loader_batches():
    pytest.importorskip("grain")
    from supervised_dispnet_tpu.data.grain_loader import make_grain_loader

    loader = make_grain_loader(_ToyDataset(), batch_size=4, shuffle=True,
                               num_workers=0, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, drop_remainder
    b = batches[0]
    assert b["img"].shape == (4, H, W, 3)
    assert b["depth"].shape == (4, H, W)


def test_grain_loader_endless_sampler():
    """num_epochs=None: one pool serves multiple epochs — the stream crosses
    the epoch boundary (leftover records roll into the next epoch's batch)
    instead of stopping at len(ds)//batch."""
    pytest.importorskip("grain")
    from supervised_dispnet_tpu.data.grain_loader import make_grain_loader

    loader = make_grain_loader(_ToyDataset(), batch_size=4, shuffle=True,
                               num_workers=0, seed=0, num_epochs=None)
    it = iter(loader)
    batches = [next(it) for _ in range(5)]  # 2 epochs' worth of 10//4
    assert all(b["img"].shape == (4, H, W, 3) for b in batches)


def test_grain_loader_drops_zero_size_leaves_multiprocess():
    """Multiprocess grain workers batch into shared memory, which cannot
    allocate zero-byte segments — a (0, H, W, 3) ref_imgs leaf (supervised
    SequenceFolder at sequence_length=1) must be dropped at the source, not
    crash the pool."""
    pytest.importorskip("grain")
    from supervised_dispnet_tpu.data.grain_loader import make_grain_loader

    class _EmptyLeafDataset(_ToyDataset):
        def __getitem__(self, i):
            sample = super().__getitem__(i)
            sample["ref_imgs"] = np.zeros((0, H, W, 3), dtype=np.float32)
            return sample

    loader = make_grain_loader(_EmptyLeafDataset(), batch_size=4,
                               shuffle=False, num_workers=2, seed=0)
    b = next(iter(loader))
    assert "ref_imgs" not in b
    assert b["img"].shape == (4, H, W, 3)


def test_export_roundtrip(tmp_path):
    from supervised_dispnet_tpu.models import DispNetS
    from supervised_dispnet_tpu.utils.export import export_forward, load_forward

    model = DispNetS()
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    path = tmp_path / "dispnet.stablehlo"
    export_forward(model, variables, path, batch_size=1,
                   img_height=H, img_width=W)
    assert path.stat().st_size > 1000

    fn = load_forward(path)
    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32))
    got = np.asarray(fn(xin))
    ref = np.asarray(model.apply(variables, xin)[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_export_int8_roundtrip(tmp_path):
    """int8 PTQ export: quantized weights/scales baked into the StableHLO
    artifact; reload matches quantized_apply exactly."""
    from supervised_dispnet_tpu.models import DispNetS
    from supervised_dispnet_tpu.ops.quant import (
        calibrate_conv_ranges, quantized_apply,
    )
    from supervised_dispnet_tpu.utils.export import export_forward, load_forward

    model = DispNetS()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ranges = calibrate_conv_ranges(model, variables, [x])

    path = tmp_path / "dispnet_int8.stablehlo"
    export_forward(model, variables, path, batch_size=1,
                   img_height=H, img_width=W, int8_ranges=ranges)
    fn = load_forward(path)
    got = np.asarray(fn(x))
    # reference = the JITTED quantized path (what serving runs; the export
    # wraps exactly this program, measured bit-exact). The eager path is
    # NOT a valid oracle here: fused-vs-eager fp rounding flips int8
    # levels right at round() boundaries, and round-3's bf16 DispHead
    # widens that to ~1% on downstream disparities.
    ref = np.asarray(jax.jit(
        lambda xx: quantized_apply(model, variables, xx, ranges=ranges)[0]
    )(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_export_int8_fcrn_roundtrip(tmp_path):
    """FCRN int8-baked export: the dilated unpool convs must keep their
    exact geometry through bake_int8_weights + quantized_apply(baked=)
    (dilation forwarded — late round 3), and the direct-depth single
    output must export like the multi-scale lists."""
    from supervised_dispnet_tpu.models import FCRN
    from supervised_dispnet_tpu.ops.quant import (
        calibrate_conv_ranges, quantized_apply,
    )
    from supervised_dispnet_tpu.utils.export import export_forward, load_forward

    model = FCRN()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ranges = calibrate_conv_ranges(model, variables, [x])

    path = tmp_path / "fcrn_int8.stablehlo"
    export_forward(model, variables, path, batch_size=1,
                   img_height=H, img_width=W, int8_ranges=ranges)
    fn = load_forward(path)
    got = np.asarray(fn(x))
    ref = np.asarray(jax.jit(
        lambda xx: quantized_apply(model, variables, xx, ranges=ranges)
    )(x))
    # unlike the DispNetS roundtrip, FCRN is not bit-exact vs the jitted
    # in-process path: its BN epilogues + bilinear resize fuse differently
    # in the exported program (~1e-6 relative on <1% of pixels). A dilated
    # unpool geometry bug would be O(1) errors everywhere — far above this
    # tolerance.
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
    assert got.shape == (1, H, W, 1) and np.isfinite(got).all()


def test_step_timer_and_steady_state():
    import time

    import jax

    from supervised_dispnet_tpu.utils.profiling import (
        StepTimer, steady_state_images_per_sec,
    )

    t = StepTimer()
    t.mark_data()
    time.sleep(0.01)
    t.mark_step()
    avg = t.averages()
    assert avg["batch_time"] > 0

    @jax.jit
    def fn(x, carry):
        return jnp.sum(x) + carry * 1e-30

    x = jnp.ones((8, 4))
    ips = steady_state_images_per_sec(fn, (x,), batch_size=8, iters=5, warmup=1)
    assert ips > 0


def test_tensor2array_and_png(tmp_path):
    from supervised_dispnet_tpu.utils.viz import save_depth_png, tensor2array

    rng = np.random.default_rng(0)
    depth = rng.uniform(0, 50, (16, 24)).astype(np.float32)
    rgb = tensor2array(depth, max_value=80.0)
    assert rgb.shape == (16, 24, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # image denormalization path
    img = rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    out = tensor2array(img)
    assert out.shape == (8, 8, 3) and out.min() >= 0 and out.max() <= 1

    save_depth_png(tmp_path / "d.png", depth, max_value=80.0)
    import imageio.v2 as imageio

    loaded = imageio.imread(tmp_path / "d.png")
    assert loaded.shape[:2] == (16, 24)


def test_export_int8_bakes_weights_smaller_artifact(tmp_path):
    """Round 3: the int8 artifact must store int8 kernel constants (the
    fp32 kernels are never read by the trace), so it is much smaller
    than the fp export — and the chain-encoder (DispResNet) baked path
    matches the non-baked quantized forward."""
    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.ops.quant import (
        calibrate_conv_ranges, quantized_apply,
    )
    from supervised_dispnet_tpu.utils.export import export_forward, load_forward

    model = DispResNet(encoder_depth=18)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ranges = calibrate_conv_ranges(model, variables, [x])

    fp_path = tmp_path / "res18.stablehlo"
    export_forward(model, variables, fp_path, batch_size=1,
                   img_height=H, img_width=W)
    q_path = tmp_path / "res18_int8.stablehlo"
    export_forward(model, variables, q_path, batch_size=1,
                   img_height=H, img_width=W, int8_ranges=ranges)
    # conv kernels dominate the artifact; int8 storage must shrink it a lot
    assert q_path.stat().st_size < 0.55 * fp_path.stat().st_size, (
        q_path.stat().st_size, fp_path.stat().st_size)

    got = np.asarray(load_forward(q_path)(x))
    ref = np.asarray(jax.jit(
        lambda xx: quantized_apply(model, variables, xx, ranges=ranges)[0]
    )(x))
    # baked BN-folded weights quantize from numpy fp32 exactly like the
    # traced path does from jnp; only fp associativity noise remains
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-4)
    med = np.median(np.abs(got / ref - 1.0))
    assert med < 2e-3, med


def test_export_dynamic_batch(tmp_path):
    """batch_size='dynamic' (jax.export symbolic shapes): one artifact
    serves any batch size, int8 baked path included."""
    from supervised_dispnet_tpu.models import DispNetS
    from supervised_dispnet_tpu.ops.quant import calibrate_conv_ranges
    from supervised_dispnet_tpu.utils.export import export_forward, load_forward

    model = DispNetS()
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x1)
    ranges = calibrate_conv_ranges(model, variables, [x1])

    path = tmp_path / "dyn_int8.stablehlo"
    export_forward(model, variables, path, batch_size="dynamic",
                   img_height=H, img_width=W, int8_ranges=ranges)
    fn = load_forward(path)
    for B in (1, 3):
        out = np.asarray(fn(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)))
        assert out.shape == (B, H, W, 1)
        assert np.isfinite(out).all() and (out > 0).all()


def test_export_pose_forward(tmp_path):
    """Pose-net serving artifact: (tgt, refs) -> (B, R, 6) poses, matching
    the in-process forward; dynamic batch supported."""
    from supervised_dispnet_tpu.models import PoseExpNet
    from supervised_dispnet_tpu.utils.export import (
        export_pose_forward, load_forward,
    )

    model = PoseExpNet(nb_ref_imgs=2, output_exp=False)
    rng = np.random.default_rng(4)
    tgt = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32))
    refs = jnp.asarray(rng.uniform(-1, 1, (1, 2, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), tgt, [refs[:, 0], refs[:, 1]])

    path = tmp_path / "pose.stablehlo"
    export_pose_forward(model, variables, path, nb_ref_imgs=2,
                        batch_size="dynamic", img_height=H, img_width=W)
    fn = load_forward(path)
    got = np.asarray(fn(tgt, refs))
    _, ref_pose = model.apply(variables, tgt, [refs[:, 0], refs[:, 1]])
    np.testing.assert_allclose(got, np.asarray(ref_pose), rtol=1e-4, atol=1e-6)
    # dynamic batch: B=3 works from the same artifact
    out3 = np.asarray(fn(
        rng.uniform(-1, 1, (3, H, W, 3)).astype(np.float32),
        rng.uniform(-1, 1, (3, 2, H, W, 3)).astype(np.float32)))
    assert out3.shape == (3, 2, 6)
