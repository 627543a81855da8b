"""Online serving: dynamic micro-batching over static XLA shape buckets.

The reference ships only offline batch CLIs (``run_inference.py``,
``test_disp.py`` — SURVEY.md §3.3/§3.5); production serving needs an
online path: individual requests arriving asynchronously, answered at low
latency, batched for throughput. This module is the TPU-native design for
that gap:

- **Static shape buckets.** XLA compiles one executable per input shape;
  serving ragged batch sizes naively would recompile per size. Requests
  are padded to the smallest configured bucket (default ``(1, 8, 64)``)
  so the executable set is fixed and ``warmup()`` can pre-compile all of
  it before traffic arrives.
- **Dynamic micro-batching.** A dispatcher thread drains the request
  queue, waiting at most ``max_wait_ms`` for co-arriving requests. The
  bf16/int8 crossover measured in BASELINE.md ("serving latency curve",
  round 5) is the sizing guide: int8 only beats bf16 above B≈16-64, so
  latency-critical deployments should configure ``int8=False`` with small
  buckets and throughput deployments ``int8=True`` with large ones.
- **One device dispatch per micro-batch.** The forward is jitted once per
  bucket; per-request work on the host is limited to normalize + enqueue.

Single-chip by design: one ``DepthService`` per chip, scale-out is
process-per-chip behind any load balancer (the model fits in HBM
thousands of times over; there is nothing to shard at serving time).

Usage::

    service = DepthService.from_checkpoint("ckpt.pth.tar", "disp_res_50")
    service.warmup()
    with service:
        depth = service.submit(image_hwc_uint8).result(timeout=5.0)
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np


@dataclass(frozen=True)
class ServingConfig:
    img_height: int = 128
    img_width: int = 416
    buckets: tuple[int, ...] = (1, 8, 64)
    max_wait_ms: float = 2.0
    max_queue: int = 1024  # backpressure: submit() raises when exceeded
    int8: bool = False
    percentile: float | None = 99.9
    imagenet_normalization: bool = False
    fused_upsample: bool = True
    direct_depth: bool = False  # FCRN emits metric depth, not disparity


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (largest bucket if n exceeds them all —
    the caller chunks)."""
    for b in buckets:
        if b >= n:
            return b
    return max(buckets)


@dataclass
class _Request:
    image: np.ndarray
    future: Future = field(default_factory=Future)


class DepthService:
    """Depth inference service with dynamic micro-batching.

    ``model``/``variables`` are any registry disparity network and its
    loaded variables (see :func:`DepthService.from_checkpoint`).
    """

    def __init__(self, model, variables, config: ServingConfig = ServingConfig(),
                 calibration: Sequence[np.ndarray] | None = None):
        import jax
        import jax.numpy as jnp

        from supervised_dispnet_tpu.data.augment import (
            HALF_MEAN, HALF_STD, IMAGENET_MEAN, IMAGENET_STD,
            normalize_images,
        )
        from supervised_dispnet_tpu.models.common import apply_model

        if not config.buckets or list(config.buckets) != sorted(
                set(config.buckets)):
            raise ValueError(f"buckets must be sorted unique: {config.buckets}")
        self.config = config
        self._model = model
        self._variables = variables
        self._queue: queue.Queue[_Request | None] = queue.Queue(
            maxsize=config.max_queue)
        self._thread: threading.Thread | None = None
        self._mean = (IMAGENET_MEAN if config.imagenet_normalization
                      else HALF_MEAN)
        self._std = (IMAGENET_STD if config.imagenet_normalization
                     else HALF_STD)
        self._normalize = normalize_images

        if config.int8:
            from supervised_dispnet_tpu.ops.quant import (
                calibrate_conv_ranges, quantized_apply,
            )

            if calibration is None:
                raise ValueError(
                    "int8 serving needs calibration images "
                    "(DepthService(..., calibration=[...]))")
            calib = [normalize_images(jnp.asarray(self._prep(np.asarray(c))),
                                      self._mean, self._std)
                     for c in calibration]
            ranges = calibrate_conv_ranges(model, variables, calib,
                                           percentile=config.percentile)

            def _raw(x):
                return quantized_apply(model, variables, x, ranges=ranges)
        else:
            def _raw(x):
                return apply_model(model, variables, x)

        mean, std = self._mean, self._std

        @jax.jit
        def _forward(x):
            # normalization lives INSIDE the jitted program: host-side
            # eager jnp ops each cost a relay/PCIe round trip per request,
            # fused on-device they are free (same philosophy as
            # data/augment.py's fused on-device augmentation)
            x = normalize_images(x, mean, std)
            out = _raw(x)
            if isinstance(out, (list, tuple)):
                out = out[0]
            disp = out[..., 0]
            if config.direct_depth:
                return disp  # already metric depth
            return 1.0 / jnp.maximum(disp, 1e-6)

        self._forward = _forward

    # -- model loading ------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, network: str = "disp_res_50",
                        config: ServingConfig = ServingConfig(),
                        calibration: Sequence[np.ndarray] | None = None,
                        ) -> "DepthService":
        """Build from a torch ``.pth.tar`` or an orbax run dir (same loader
        surface as the eval CLIs)."""
        from supervised_dispnet_tpu.cli.test_disp import load_params
        from supervised_dispnet_tpu.models import get_disp_net

        kwargs = {}
        if network.startswith(("disp_res", "disp_vgg")):
            kwargs["fused_upsample"] = config.fused_upsample
        model = get_disp_net(network, **kwargs)
        params, batch_stats = load_params(
            path, network, model, (config.img_height, config.img_width))
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if network == "fcrn" and not config.direct_depth:
            import dataclasses

            config = dataclasses.replace(config, direct_depth=True)
        return cls(model, variables, config, calibration=calibration)

    # -- host-side preprocessing -------------------------------------------

    def _prep(self, images: np.ndarray) -> np.ndarray:
        """HWC or NHWC uint8/float -> NHWC float32 in [0,1], still on host
        (normalization happens inside the jitted forward)."""
        if images.ndim == 3:
            images = images[None]
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        H, W = self.config.img_height, self.config.img_width
        if images.shape[1:3] != (H, W):
            raise ValueError(
                f"expected {(H, W)} images, got {images.shape[1:3]}; "
                "resize on the client or change ServingConfig")
        return np.ascontiguousarray(images, dtype=np.float32)

    # -- synchronous batch API ---------------------------------------------

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Synchronous: (N,H,W,3) or (H,W,3) -> (N,H,W) depth. Pads to the
        smallest shape bucket; chunks batches beyond the largest bucket."""
        x = self._prep(np.asarray(images))
        n = x.shape[0]
        outs = []
        top = max(self.config.buckets)
        for c0 in range(0, n, top):
            chunk = x[c0:c0 + top]
            b = pick_bucket(chunk.shape[0], self.config.buckets)
            if chunk.shape[0] < b:
                padded = np.zeros((b,) + chunk.shape[1:], chunk.dtype)
                padded[:chunk.shape[0]] = chunk
            else:
                padded = chunk
            outs.append(np.asarray(self._forward(padded))[:chunk.shape[0]])
        return np.concatenate(outs)

    def warmup(self) -> None:
        """Compile every bucket before traffic arrives (first compiles can
        take seconds to minutes; serving a cold bucket blows the latency
        SLO by 1000x). Warms the full path INCLUDING the device->host
        readback: the first transfer of a new output shape pays its own
        one-time cost (measured ~54 s through the axon relay for an
        already-computed array), so block_until_ready alone is not enough."""
        import jax.numpy as jnp

        H, W = self.config.img_height, self.config.img_width
        for b in self.config.buckets:
            out = self._forward(jnp.zeros((b, H, W, 3), jnp.float32))
            np.asarray(out)

    # -- async micro-batching API ------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one (H,W,3) image; the future resolves to (H,W) depth."""
        if self._thread is None:
            raise RuntimeError("service not started (use `with service:` "
                               "or service.start())")
        image = np.asarray(image)
        H, W = self.config.img_height, self.config.img_width
        if image.shape != (H, W, 3):
            # reject HERE so a malformed request cannot poison the
            # micro-batch it would have been grouped with
            raise ValueError(f"expected ({H}, {W}, 3) image, got "
                             f"{image.shape}")
        req = _Request(image)
        try:
            # non-blocking: overload surfaces as an immediate error the
            # caller can convert to HTTP 503 / load-shed, instead of
            # unbounded queue growth and silent SLO collapse
            self._queue.put_nowait(req)
        except queue.Full:
            raise RuntimeError(
                f"serving queue full ({self.config.max_queue} pending); "
                "shed load or raise ServingConfig.max_queue") from None
        return req.future

    def start(self) -> "DepthService":
        if self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._thread is None:
            return
        while True:
            try:
                self._queue.put(None, timeout=1.0)
                break
            except queue.Full:  # drain pressure; dispatcher is consuming
                continue
        self._thread.join()
        self._thread = None

    __enter__ = start

    def __exit__(self, *exc) -> None:
        self.stop()

    def _dispatch_loop(self) -> None:
        top = max(self.config.buckets)
        wait_s = self.config.max_wait_ms / 1e3
        while True:
            req = self._queue.get()
            if req is None:
                return
            batch = [req]
            # micro-batch: drain co-arriving requests up to the largest
            # bucket, waiting at most max_wait_ms past the first arrival
            deadline = time.monotonic() + wait_s
            while len(batch) < top:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._finish(batch)
                    return
                batch.append(nxt)
            self._finish(batch)

    def _finish(self, batch: list[_Request]) -> None:
        try:
            depths = self.predict(np.stack([r.image for r in batch]))
        except Exception as e:  # pragma: no cover - defensive
            for r in batch:
                r.future.set_exception(e)
            return
        for r, d in zip(batch, depths):
            r.future.set_result(d)
