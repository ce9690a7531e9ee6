"""HTTP serving surface (eval/serve.py): healthz + POST /denoise round-trip."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from vub_image_denoising_tpu.eval.denoise_cli import build_denoiser
from vub_image_denoising_tpu.eval.serve import DenoiseService, make_server
from vub_image_denoising_tpu.models.rdunet import RDUNet
from vub_image_denoising_tpu.utils import checkpoint as ckpt_io


def _start_server(tmp_path):
    ck = str(tmp_path / "m.pth")
    model = RDUNet(channels=3, base_filters=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    ckpt_io.save_pth(ck, params, epoch=1)
    denoise_fn = build_denoiser(ck, arch="rdunet", base_filters=4)
    service = DenoiseService(denoise_fn)
    server = make_server(service, {"arch": "rdunet"}, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    return server, f"http://127.0.0.1:{port}", denoise_fn


def test_serve_denoise_roundtrip(tmp_path):
    from PIL import Image

    server, base, denoise_fn = _start_server(tmp_path)
    try:
        # healthz before any request
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["arch"] == "rdunet"
        assert health["shapes_compiled"] == []

        # POST a PNG (odd size: exercises the reflect-pad path)
        arr = np.random.RandomState(0).randint(0, 256, (37, 29, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        req = urllib.request.Request(f"{base}/denoise", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "image/png"
            out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == arr.shape

        # the served result must equal the direct build_denoiser output
        x = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
        y = np.asarray(denoise_fn(x))
        want = np.clip((y + 1.0) * 0.5 * 255.0 + 0.5, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out, want)

        # healthz now records the compiled shape
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert [37, 29, 3] in health["shapes_compiled"]
    finally:
        server.shutdown()


def test_serve_rejects_garbage_and_unknown_paths(tmp_path):
    import urllib.error

    server, base, _ = _start_server(tmp_path)
    try:
        req = urllib.request.Request(f"{base}/denoise", data=b"not an image",
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        try:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
