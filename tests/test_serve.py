"""HTTP serving surface (eval/serve.py): healthz + POST /denoise round-trip."""

import io
import json
import threading
import urllib.error
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

        # healthz now records the compiled shape + the phase breakdown
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert [37, 29, 3] in health["shapes_compiled"]
        phases = health["phases"]
        assert set(phases) == {"decode", "queue", "device", "encode"}
        for k in ("decode", "queue", "device", "encode"):
            assert phases[k]["n"] == 1, (k, phases[k])
            assert phases[k]["total_s"] >= 0.0
        # phase walls must roughly reassemble the request wall
        total = sum(phases[k]["total_s"] for k in phases)
        assert total <= health["latency"]["total_s"] + 0.05
    finally:
        server.shutdown()


def test_serve_raw_octet_stream_matches_png_path(tmp_path):
    """The codec-free raw mode (octet-stream in / out) must produce byte-
    identical results to the PNG path, echo X-Shape, and reject malformed
    raw requests with 400."""
    from PIL import Image

    server, base, denoise_fn = _start_server(tmp_path)
    try:
        arr = np.random.RandomState(1).randint(0, 256, (32, 24, 3), np.uint8)

        # PNG in -> PNG out (the baseline)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        req = urllib.request.Request(f"{base}/denoise", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            want = np.asarray(Image.open(io.BytesIO(r.read())))

        # raw in -> raw out
        req = urllib.request.Request(
            f"{base}/denoise", data=arr.tobytes(), method="POST",
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "32,24,3",
                     "Accept": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "application/octet-stream"
            assert r.headers["X-Shape"] == "32,24,3"
            got = np.frombuffer(r.read(), np.uint8).reshape(32, 24, 3)
        np.testing.assert_array_equal(got, want)

        # raw in -> PNG out (modes mix freely)
        req = urllib.request.Request(
            f"{base}/denoise", data=arr.tobytes(), method="POST",
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "32,24,3"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "image/png"
            got_png = np.asarray(Image.open(io.BytesIO(r.read())))
        np.testing.assert_array_equal(got_png, want)

        # malformed: missing / bad X-Shape, wrong body size, wrong channels
        for headers, body in [
            ({"Content-Type": "application/octet-stream"}, arr.tobytes()),
            ({"Content-Type": "application/octet-stream",
              "X-Shape": "32,24"}, arr.tobytes()),
            ({"Content-Type": "application/octet-stream",
              "X-Shape": "32,24,3"}, arr.tobytes()[:-1]),
            ({"Content-Type": "application/octet-stream",
              "X-Shape": "32,24,1"}, arr.tobytes()[: 32 * 24]),
        ]:
            req = urllib.request.Request(f"{base}/denoise", data=body,
                                         method="POST", headers=headers)
            try:
                urllib.request.urlopen(req, timeout=120)
                raise AssertionError(f"expected 400 for {headers}")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (headers, e.code)
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

def _start_batching_server(tmp_path, max_batch=4, max_wait_ms=200.0):
    from vub_image_denoising_tpu.eval.serve import BatchingDenoiseService

    ck = str(tmp_path / "m.pth")
    model = RDUNet(channels=3, base_filters=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    ckpt_io.save_pth(ck, params, epoch=1)
    single_fn = build_denoiser(ck, arch="rdunet", base_filters=4)
    batch_fn = build_denoiser(ck, arch="rdunet", base_filters=4, batched=True)
    service = BatchingDenoiseService(batch_fn, max_batch=max_batch,
                                     max_wait_ms=max_wait_ms)
    server = make_server(service, {"arch": "rdunet"}, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    return server, service, f"http://127.0.0.1:{port}", single_fn


def test_serve_dynamic_batching_coalesces_and_matches_single(tmp_path):
    """Concurrent same-shape requests coalesce into fewer device dispatches,
    and every response equals the single-request denoiser bit-for-bit."""
    from PIL import Image

    server, service, base, single_fn = _start_batching_server(tmp_path)
    try:
        rng = np.random.RandomState(1)
        arrs = [rng.randint(0, 256, (24, 24, 3), np.uint8) for _ in range(6)]
        bufs = []
        for a in arrs:
            b = io.BytesIO()
            Image.fromarray(a).save(b, format="PNG")
            bufs.append(b.getvalue())

        # warmup (compiles the batch-1 bucket) so the burst below coalesces
        req = urllib.request.Request(f"{base}/denoise", data=bufs[0],
                                     method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            r.read()

        results = [None] * len(arrs)

        def fire(i):
            rq = urllib.request.Request(f"{base}/denoise", data=bufs[i],
                                        method="POST")
            with urllib.request.urlopen(rq, timeout=300) as r:
                results[i] = np.asarray(Image.open(io.BytesIO(r.read())))

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(arrs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for a, out in zip(arrs, results):
            x = a.astype(np.float32) / 255.0 * 2.0 - 1.0
            y = np.asarray(single_fn(x))
            want = np.clip((y + 1.0) * 0.5 * 255.0 + 0.5, 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(out, want)

        # 6 concurrent requests (after warmup) must NOT take 6 dispatches
        assert service.stats["requests"] == 7
        assert service.stats["batches"] < 7, (
            f"no coalescing happened: {service.stats}"
        )

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["batching"]["requests"] == 7
    finally:
        server.shutdown()
        service.close()


def test_batching_service_propagates_errors(tmp_path):
    """A failing batch fn must surface as HTTP 500 (an internal fault, NOT a
    client error) on every coalesced request, not hang the waiters."""
    import urllib.error

    from vub_image_denoising_tpu.eval.serve import BatchingDenoiseService

    def bad_fn(xs):
        raise RuntimeError("boom")

    service = BatchingDenoiseService(bad_fn, max_batch=4, max_wait_ms=1.0)
    server = make_server(service, {"arch": "rdunet"}, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        from PIL import Image

        b = io.BytesIO()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(b, format="PNG")
        req = urllib.request.Request(f"{base}/denoise", data=b.getvalue(),
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert b"boom" in e.read()
    finally:
        server.shutdown()
        service.close()


def test_close_drains_waiters_and_rejects_new_requests():
    """close() must fail queued waiters (503-mapped QueueFullError) instead of
    abandoning them, and reject requests enqueued afterward."""
    import time as _time

    import pytest

    from vub_image_denoising_tpu.eval.serve import (
        BatchingDenoiseService, QueueFullError,
    )

    release = threading.Event()

    def slow_fn(xs):
        release.wait(timeout=30)
        return xs

    # max_batch=1: the dispatcher picks up the first request and blocks in
    # slow_fn; the second stays queued and must be drained by close()
    service = BatchingDenoiseService(slow_fn, max_batch=1, max_wait_ms=0.0)
    x = np.zeros((4, 4, 3), np.float32)
    outcomes = {}

    def fire(name):
        try:
            outcomes[name] = ("ok", service._denoise_array(x))
        except Exception as e:  # noqa: BLE001
            outcomes[name] = ("err", e)

    t1 = threading.Thread(target=fire, args=("inflight",))
    t1.start()
    _time.sleep(0.2)  # dispatcher now blocked inside slow_fn on request 1
    t2 = threading.Thread(target=fire, args=("queued",))
    t2.start()
    _time.sleep(0.2)  # request 2 sits in the queue

    closer = threading.Thread(target=service.close)
    closer.start()
    _time.sleep(0.2)
    release.set()  # let the in-flight batch finish so close() can join
    for t in (t1, t2, closer):
        t.join(timeout=30)
        assert not t.is_alive(), "close() left a thread hanging"

    kind, val = outcomes["queued"]
    assert kind == "err" and isinstance(val, QueueFullError)
    # the batch already on the device completes normally
    kind, val = outcomes["inflight"]
    assert kind == "ok" and val.shape == x.shape

    with pytest.raises(QueueFullError):
        service._denoise_array(x)  # post-close requests must not hang


def test_backpressure_rejects_with_503_and_latency_percentiles(tmp_path):
    """max_queue=1 + a slow batch fn: a burst must see HTTP 503 with
    Retry-After on the overflow requests; healthz reports latency
    percentiles and the rejected count."""
    import time as _time
    import urllib.error

    from vub_image_denoising_tpu.eval.serve import BatchingDenoiseService

    def slow_fn(xs):
        _time.sleep(0.5)
        return xs

    service = BatchingDenoiseService(slow_fn, max_batch=1, max_wait_ms=0.0,
                                     max_queue=1)
    server = make_server(service, {"arch": "rdunet"}, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        from PIL import Image

        b = io.BytesIO()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(b, format="PNG")
        payload = b.getvalue()

        codes = [None] * 6

        def fire(i):
            rq = urllib.request.Request(f"{base}/denoise", data=payload,
                                        method="POST")
            try:
                with urllib.request.urlopen(rq, timeout=120) as r:
                    codes[i] = r.status
            except urllib.error.HTTPError as e:
                codes[i] = e.code
                if e.code == 503:
                    assert e.headers["Retry-After"] == "1"

        ts = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # with a 0.5 s/batch fn, batch 1, and queue depth 1, a 6-burst cannot
        # all be accepted — at least one 503, at least one success
        assert 200 in codes and 503 in codes, codes

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["batching"]["rejected"] >= 1
        lat = health["latency"]
        assert lat["n"] >= 1 and lat["p50_ms"] >= 500  # slow fn dominates
        assert lat["p50_ms"] <= lat["p90_ms"] <= lat["p99_ms"]
        # phase attribution: the slow fn lands in the device window, and the
        # device window counts DISPATCHES (once per batch), not requests
        ph = health["phases"]
        assert ph["device"]["n"] == health["batching"]["batches"]
        assert ph["device"]["p50_ms"] >= 500
        assert ph["queue"]["n"] >= 1  # every accepted request waited measurably
    finally:
        server.shutdown()
        service.close()


def test_prewarm_compiles_all_buckets_and_reset_stats_zeroes_windows(tmp_path):
    """prewarm() must touch every power-of-two batch bucket (the complete
    executable set for one shape — benchmarks rely on this so no compile can
    land inside a timed window), and reset_stats() must zero the latency,
    phase, and batching counters without losing the warm executables."""
    from vub_image_denoising_tpu.eval.serve import BatchingDenoiseService

    sizes = []

    def fake_batch_fn(x):
        sizes.append(x.shape[0])
        return x

    service = BatchingDenoiseService(fake_batch_fn, max_batch=8,
                                     max_wait_ms=0.0)
    try:
        service.prewarm((6, 6, 3))
        assert sizes == [1, 2, 4, 8]

        # run one real request through, then reset
        y = service._denoise_array(np.zeros((6, 6, 3), np.float32))
        assert y.shape == (6, 6, 3)
        snap = service.snapshot()
        assert snap["batching"]["requests"] == 1
        assert snap["phases"]["device"]["n"] == 1

        service.reset_stats()
        snap = service.snapshot()
        assert snap["batching"] == {"requests": 0, "batches": 0,
                                    "batched_requests": 0, "rejected": 0}
        assert snap["latency"] == {"n": 0}
        assert snap["phases"]["device"] == {"n": 0}

        # the single-dispatch service prewarm: exactly one call, HWC-shaped
        single_calls = []
        plain = DenoiseService(lambda x: (single_calls.append(x.shape), x)[1])
        plain.prewarm((6, 6, 3))
        assert single_calls == [(6, 6, 3)]
        plain.reset_stats()  # must not require batching counters
    finally:
        service.close()


def test_raw_nonpositive_shape_is_400_not_500(tmp_path):
    """X-Shape with negative dims can pass the byte-length check
    ((-h)*(-w)*c == len) and would crash reshape as a retriable 500 —
    it must map to 400 (permanently-bad request) instead."""
    server, base, _ = _start_server(tmp_path)
    try:
        body = bytes(32 * 24 * 3)
        req = urllib.request.Request(
            f"{base}/denoise", data=body, method="POST",
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "-32,-24,3"})
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
