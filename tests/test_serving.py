"""Serving module: bucket padding parity, micro-batching, int8 path.

The serving answers must be bit-identical to the offline path
(``apply_model`` + 1/disp) regardless of how requests were bucketed,
padded, or micro-batched — padding rows must never leak into real rows
(convs are spatially local per-sample; batch entries are independent).
"""

from __future__ import annotations

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from supervised_dispnet_tpu.models import get_disp_net
from supervised_dispnet_tpu.models.common import apply_model
from supervised_dispnet_tpu.serving import (
    DepthService, ServingConfig, pick_bucket,
)

H, W = 32, 64


def _service(int8=False, buckets=(2, 4), **kw):
    import jax

    model = get_disp_net("dispnet")
    x0 = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    cfg = ServingConfig(img_height=H, img_width=W, buckets=buckets,
                        int8=int8, **kw)
    rng = np.random.default_rng(0)
    calib = rng.random((4, H, W, 3), np.float32) if int8 else None
    svc = DepthService(model, variables, cfg, calibration=calib)
    return svc, model, variables


def _expected(svc, model, variables, images_f32):
    from supervised_dispnet_tpu.data.augment import (
        HALF_MEAN, HALF_STD, normalize_images,
    )

    x = normalize_images(jnp.asarray(svc._prep(images_f32)),
                         HALF_MEAN, HALF_STD)
    out = apply_model(model, variables, x)
    disp = out[0][..., 0]
    return np.asarray(1.0 / jnp.maximum(disp, 1e-6))


@pytest.mark.quick
def test_pick_bucket():
    assert pick_bucket(1, (1, 8, 64)) == 1
    assert pick_bucket(2, (1, 8, 64)) == 8
    assert pick_bucket(8, (1, 8, 64)) == 8
    assert pick_bucket(65, (1, 8, 64)) == 64  # caller chunks
    with pytest.raises(ValueError):
        ServingConfig(buckets=(8, 1))  # unsorted rejected at service init
        DepthService(None, None, ServingConfig(buckets=(8, 1)))


@pytest.mark.quick
def test_predict_padding_parity():
    """N=3 pads to bucket 4; result equals the unpadded offline forward."""
    svc, model, variables = _service()
    rng = np.random.default_rng(1)
    imgs = rng.random((3, H, W, 3), np.float32)
    got = svc.predict(imgs)
    want = _expected(svc, model, variables, imgs)
    assert got.shape == (3, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_predict_chunks_beyond_largest_bucket():
    svc, model, variables = _service(buckets=(2,))
    rng = np.random.default_rng(2)
    imgs = rng.random((5, H, W, 3), np.float32)  # 2 + 2 + 1(padded)
    got = svc.predict(imgs)
    want = _expected(svc, model, variables, imgs)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_uint8_input_matches_scaled_float():
    svc, model, variables = _service()
    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, (1, H, W, 3)).astype(np.uint8)
    got = svc.predict(img_u8)
    want = _expected(svc, model, variables,
                     img_u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.quick
def test_submit_micro_batching_parity():
    """Concurrent submits resolve to exactly the per-image predict()."""
    svc, model, variables = _service()
    svc.warmup()
    rng = np.random.default_rng(4)
    imgs = [rng.random((H, W, 3), np.float32) for _ in range(6)]
    with svc:
        futs = [svc.submit(im) for im in imgs]
        results = [f.result(timeout=60.0) for f in futs]
    for im, got in zip(imgs, results):
        want = _expected(svc, model, variables, im[None])[0]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_submit_rejects_bad_shape_and_unstarted():
    svc, _, _ = _service()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros((H, W, 3), np.float32))
    with svc:
        with pytest.raises(ValueError):
            svc.submit(np.zeros((H + 1, W, 3), np.float32))


def test_submit_from_many_threads():
    svc, model, variables = _service()
    svc.warmup()
    rng = np.random.default_rng(5)
    imgs = [rng.random((H, W, 3), np.float32) for _ in range(8)]
    results: dict[int, np.ndarray] = {}

    def worker(i):
        results[i] = svc.submit(imgs[i]).result(timeout=60.0)

    with svc:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert len(results) == len(imgs)
    for i, im in enumerate(imgs):
        want = _expected(svc, model, variables, im[None])[0]
        np.testing.assert_allclose(results[i], want, rtol=1e-6, atol=1e-6)


def test_int8_service_runs_and_tracks_fp():
    """int8 serving path: runs end-to-end, stays within PTQ error of fp."""
    svc, model, variables = _service(int8=True)
    rng = np.random.default_rng(6)
    imgs = rng.random((2, H, W, 3), np.float32)
    got = svc.predict(imgs)
    want = _expected(svc, model, variables, imgs)
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    # random-weight nets quantize loosely; median tracks (quality bars for
    # trained weights live in BASELINE.md round-3 calibration table)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
    assert np.median(rel) < 0.15


def test_stop_mid_queue_resolves_current_batch():
    svc, _, _ = _service()
    svc.warmup()
    rng = np.random.default_rng(7)
    with svc:
        f = svc.submit(rng.random((H, W, 3), np.float32))
        assert f.result(timeout=60.0).shape == (H, W)
    # stop() is idempotent and restart works
    svc.stop()
    with svc:
        f = svc.submit(rng.random((H, W, 3), np.float32))
        assert f.result(timeout=60.0).shape == (H, W)


def test_backpressure_queue_full():
    """Overload surfaces as an immediate RuntimeError, not queue growth."""
    svc, _, _ = _service(max_queue=2)
    # started but the dispatcher is intentionally NOT running: start()
    # then immediately saturate from this thread before it can drain
    svc._thread = threading.Thread(target=lambda: None)  # mark "started"
    img = np.zeros((H, W, 3), np.float32)
    svc.submit(img)
    svc.submit(img)
    with pytest.raises(RuntimeError, match="queue full"):
        svc.submit(img)
