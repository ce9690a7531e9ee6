"""Measure HTTP serving throughput with and without dynamic batching.

Starts the denoising service in-process twice — request-at-a-time
(``DenoiseService``) and dynamically batched (``BatchingDenoiseService``) —
fires ``--clients`` concurrent request loops at each for ``--seconds``, and
reports requests/sec plus the coalescing stats.  Greenfield serving surface
(the reference has no server); run on the real chip:

  python scripts/bench_serve.py --checkpoint ck.pth --base-filters 32 \
      --bf16 --clients 16 --seconds 20
"""

import argparse
import io
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_load(base: str, payload: bytes, clients: int, seconds: float):
    stop = time.monotonic() + seconds
    counts = [0] * clients
    errors = [0] * clients

    def loop(i):
        while time.monotonic() < stop:
            req = urllib.request.Request(f"{base}/denoise", data=payload,
                                         method="POST")
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    r.read()
                counts[i] += 1
            except Exception:
                errors[i] += 1

    threads = [threading.Thread(target=loop, args=(i,)) for i in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    return sum(counts) / dt, sum(errors)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--arch", default="rdunet", choices=["rdunet", "diffusion"])
    p.add_argument("--base-filters", type=int, default=32)
    p.add_argument("--timesteps", type=int, default=20)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--engine", default="auto")
    p.add_argument("--size", type=int, default=256, help="square request size")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--batch-wait-ms", type=float, default=5.0)
    p.add_argument("--trusted-checkpoint", action="store_true")
    args = p.parse_args()

    from PIL import Image

    from vub_image_denoising_tpu.eval.denoise_cli import build_denoiser
    from vub_image_denoising_tpu.eval.serve import (
        BatchingDenoiseService,
        DenoiseService,
        make_server,
    )
    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    arr = np.random.RandomState(0).randint(
        0, 256, (args.size, args.size, 3), np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    payload = buf.getvalue()

    results = {}
    for mode in ("single", "batched"):
        fn = build_denoiser(
            args.checkpoint, args.arch, args.base_filters, args.timesteps,
            bf16=args.bf16, engine=args.engine, trusted=args.trusted_checkpoint,
            batched=(mode == "batched"),
        )
        if mode == "batched":
            service = BatchingDenoiseService(
                fn, max_batch=args.max_batch, max_wait_ms=args.batch_wait_ms
            )
        else:
            service = DenoiseService(fn)
        server = make_server(service, {"arch": args.arch}, port=0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{server.server_address[1]}"

        # warm every batch bucket outside the timed window
        req = urllib.request.Request(f"{base}/denoise", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
        if mode == "batched":
            warm_rps, _ = run_load(base, payload, args.max_batch, 10.0)
            print(f"  (bucket warmup pass: {warm_rps:.2f} req/s)")

        rps, errs = run_load(base, payload, args.clients, args.seconds)
        stats = dict(getattr(service, "stats", {}))
        results[mode] = rps
        print(f"{mode:8s}: {rps:7.2f} req/s  errors={errs}  {stats}")
        server.shutdown()
        if hasattr(service, "close"):
            service.close()

    if results["single"] > 0:
        print(f"batching speedup: {results['batched'] / results['single']:.2f}x "
              f"({args.clients} clients, {args.size}px, max_batch {args.max_batch})")


if __name__ == "__main__":
    main()
