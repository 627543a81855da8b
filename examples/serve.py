"""Minimal HTTP depth-serving example on top of DepthService.

Stdlib-only server (ThreadingHTTPServer) demonstrating the online serving
path: every request thread submits into one shared DepthService, whose
dispatcher micro-batches co-arriving requests onto the TPU (static shape
buckets, no recompiles — see supervised_dispnet_tpu/serving.py).

    python examples/serve.py --pretrained ckpt.pth.tar --network disp_res_50 \
        [--int8 --calib-dir imgs/] [--port 8502]

    curl -s -X POST --data-binary @kitti.png localhost:8502/depth -o depth.npy
    curl -s localhost:8502/healthz

POST /depth: request body is any cv2-decodable image (resized server-side
to the configured resolution); response is the (H, W) float32 depth map as
an .npy payload. GET /healthz: "ok" once warmup finished.
"""

from __future__ import annotations

import argparse
import io
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", required=True,
                    help="torch .pth.tar or orbax run dir")
    ap.add_argument("--network", default="disp_res_50")
    ap.add_argument("--img-height", type=int, default=128)
    ap.add_argument("--img-width", type=int, default=416)
    ap.add_argument("--buckets", default="1,8,64")
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--int8", action="store_true",
                    help="throughput mode: int8 PTQ path (wins above B~64 "
                         "— BASELINE.md serving latency curve); needs "
                         "--calib-dir")
    ap.add_argument("--calib-dir", default=None,
                    help="--int8: folder of images for range calibration")
    ap.add_argument("--imagenet-normalization", action="store_true")
    ap.add_argument("--port", type=int, default=8502)
    args = ap.parse_args()

    import cv2

    from supervised_dispnet_tpu.serving import DepthService, ServingConfig
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    H, W = args.img_height, args.img_width

    def decode(buf: bytes) -> np.ndarray:
        img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable image payload")
        img = cv2.resize(img[:, :, ::-1], (W, H),
                         interpolation=cv2.INTER_AREA)
        return np.ascontiguousarray(img)

    calibration = None
    if args.int8:
        if not args.calib_dir:
            ap.error("--int8 requires --calib-dir")
        files = sorted(Path(args.calib_dir).iterdir())[:8]
        calibration = [decode(f.read_bytes()) for f in files]
        print(f"calibrating int8 on {len(calibration)} images")

    cfg = ServingConfig(
        img_height=H, img_width=W,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        max_wait_ms=args.max_wait_ms, int8=args.int8,
        imagenet_normalization=args.imagenet_normalization,
    )
    service = DepthService.from_checkpoint(
        args.pretrained, args.network, cfg, calibration=calibration)
    print("compiling buckets", cfg.buckets, "...", flush=True)
    service.warmup()
    service.start()
    print(f"serving on :{args.port}", flush=True)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/depth":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                depth = service.submit(decode(self.rfile.read(n))).result(
                    timeout=30.0)
                buf = io.BytesIO()
                np.save(buf, depth.astype(np.float32))
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except ValueError as e:
                self.send_error(400, str(e))
            except RuntimeError as e:  # queue full -> shed load
                self.send_error(503, str(e))
            except Exception as e:  # noqa: BLE001
                self.send_error(500, repr(e))

        def log_message(self, fmt, *a):  # quiet per-request spam
            pass

    try:
        ThreadingHTTPServer(("", args.port), Handler).serve_forever()
    finally:
        service.stop()


if __name__ == "__main__":
    main()
