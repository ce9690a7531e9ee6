"""HTTP inference server — the production-serving surface.

The reference has no serving story (its evaluators are offline scripts); this
greenfield component turns a trained checkpoint into a long-lived denoising
service: the model is loaded and jitted ONCE, then every request is one
device dispatch.  Stdlib-only (``http.server``) — no framework dependencies.

Endpoints:
  GET  /healthz    -> JSON: devices, arch, warm per-shape compile cache keys
  POST /denoise    -> image bytes (PNG/JPEG) in, denoised PNG out.
                      Optional query: ?grayscale=1 (server must have been
                      started with --grayscale for channel agreement).

TPU-shaped serving decisions:
- XLA needs static shapes, so each distinct (padded) input geometry compiles
  once and is cached (the persistent XLA compile cache makes this survive
  restarts); inputs are reflect-padded to the U-Net stride like denoise_cli.
- Requests serialize through one lock: a single chip executes one program at
  a time anyway, and serialization keeps HBM bounded at one batch.  Scale-out
  is N processes x N chips behind any TCP load balancer, or --tensor-parallel
  to cut per-request latency across the chips of a slice.

Usage:
  python -m vub_image_denoising_tpu.eval.serve --checkpoint ck.pth \
      --arch rdunet --base-filters 32 --bf16 --port 8900
  curl -s -X POST --data-binary @noisy.png localhost:8900/denoise > clean.png
"""

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .denoise_cli import build_denoiser


class DenoiseService:
    """Holds the warm denoiser; thread-safe single-flight execution."""

    def __init__(self, denoise_fn, grayscale: bool = False):
        self.denoise_fn = denoise_fn
        self.grayscale = grayscale
        self._lock = threading.Lock()
        self.shapes_seen = set()

    def denoise_bytes(self, payload: bytes) -> bytes:
        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        img = img.convert("L") if self.grayscale else img.convert("RGB")
        arr = np.asarray(img, np.uint8)
        if arr.ndim == 2:
            arr = arr[..., None]
        x = arr.astype(np.float32) / 255.0 * 2.0 - 1.0  # Normalize(0.5, 0.5)
        with self._lock:
            self.shapes_seen.add(tuple(x.shape))
            y = np.asarray(self.denoise_fn(x))
        out = np.clip((y + 1.0) * 0.5 * 255.0 + 0.5, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(out[..., 0] if out.shape[-1] == 1 else out).save(
            buf, format="PNG"
        )
        return buf.getvalue()


def make_handler(service: DenoiseService, info: dict):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                payload = dict(info)
                payload["shapes_compiled"] = sorted(
                    map(list, service.shapes_seen)
                )
                self._send(200, json.dumps(payload).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.split("?")[0] != "/denoise":
                self._send(404, b"not found", "text/plain")
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._send(400, b"empty body", "text/plain")
                return
            payload = self.rfile.read(length)
            try:
                out = service.denoise_bytes(payload)
            except Exception as e:  # undecodable image, OOM-sized input, ...
                self._send(400, f"denoise failed: {e}".encode(), "text/plain")
                return
            self._send(200, out, "image/png")

    return Handler


def make_server(service: DenoiseService, info: dict, host: str = "127.0.0.1",
                port: int = 8900) -> ThreadingHTTPServer:
    """Bound server (port 0 picks a free port — used by tests)."""
    return ThreadingHTTPServer((host, port), make_handler(service, info))


def main(argv=None):
    import jax

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Serve a denoising checkpoint over HTTP")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--arch", default="rdunet", choices=["rdunet", "diffusion"])
    p.add_argument("--base-filters", type=int, default=32)
    p.add_argument("--timesteps", type=int, default=20)
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "flax", "xla", "pallas"])
    p.add_argument("--tensor-parallel", action="store_true",
                   help="shard layer channels over all visible devices "
                        "(parallel/tp.py) to cut per-request latency")
    p.add_argument("--trusted-checkpoint", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    args = p.parse_args(argv)

    channels = 1 if args.grayscale else 3
    denoise_fn = build_denoiser(
        args.checkpoint, args.arch, args.base_filters, args.timesteps,
        channels=channels, bf16=args.bf16, engine=args.engine,
        tensor_parallel=args.tensor_parallel, trusted=args.trusted_checkpoint,
    )
    service = DenoiseService(denoise_fn, grayscale=args.grayscale)
    info = {
        "arch": args.arch,
        "base_filters": args.base_filters,
        "engine": args.engine,
        "bf16": args.bf16,
        "tensor_parallel": args.tensor_parallel,
        "devices": [str(d) for d in jax.devices()],
    }
    server = make_server(service, info, args.host, args.port)
    print(f"serving {args.arch} on http://{args.host}:{server.server_address[1]} "
          f"({len(jax.devices())} device(s))", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
