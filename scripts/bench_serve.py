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
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_load(base: str, payload: bytes, clients: int, seconds: float,
             headers=None):
    stop = time.monotonic() + seconds
    counts = [0] * clients
    errors = [0] * clients

    def loop(i):
        while time.monotonic() < stop:
            req = urllib.request.Request(f"{base}/denoise", data=payload,
                                         method="POST",
                                         headers=dict(headers or {}))
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
    p.add_argument("--max-batch-sweep", default="",
                   help="comma list (e.g. '16,32,64'): run each max_batch "
                        "(plus the max_batch=1 baseline) instead of just one")
    p.add_argument("--clients-sweep", default="",
                   help="comma list of concurrent-client counts per server config")
    p.add_argument("--batch-wait-ms", type=float, default=5.0)
    p.add_argument("--trusted-checkpoint", action="store_true")
    p.add_argument("--out", default="", help="write the sweep table as JSON")
    p.add_argument("--raw", action="store_true",
                   help="also measure the codec-free octet-stream mode "
                        "(raw uint8 in/out — no PNG codec on either side)")
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

    def phase_summary(service):
        """Aggregate per-phase wall shares from the instrumented windows."""
        snap = service.snapshot()
        out = {}
        for k, v in snap.get("phases", {}).items():
            out[k] = {"total_s": v.get("total_s", 0.0),
                      "mean_ms": v.get("mean_ms", 0.0), "n": v.get("n", 0)}
        return out

    # sweep grid: max_batch=1 is the single-dispatch baseline (deduped —
    # "--max-batch 1" must not build and measure the same config twice)
    batch_grid = list(dict.fromkeys(
        [1] + [int(b) for b in args.max_batch_sweep.split(",")]
        if args.max_batch_sweep else [1, args.max_batch]))
    client_grid = ([int(c) for c in args.clients_sweep.split(",")]
                   if args.clients_sweep else [args.clients])

    results = []
    for mb in batch_grid:
        fn = build_denoiser(
            args.checkpoint, args.arch, args.base_filters, args.timesteps,
            bf16=args.bf16, engine=args.engine, trusted=args.trusted_checkpoint,
            batched=(mb > 1),
        )
        if mb > 1:
            service = BatchingDenoiseService(
                fn, max_batch=mb, max_wait_ms=args.batch_wait_ms
            )
        else:
            service = DenoiseService(fn)
        server = make_server(service, {"arch": args.arch}, port=0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{server.server_address[1]}"

        # deterministically compile EVERY executable this config can hit
        # (all power-of-two batch buckets), then zero the stats: without
        # this, bucket compiles land inside the timed window and the first
        # request's ~100 s cold compile dominates the phase totals
        t_warm = time.monotonic()
        service.prewarm((args.size, args.size, 3))
        print(f"  (max_batch {mb}: prewarmed all buckets in "
              f"{time.monotonic() - t_warm:.1f}s)")
        req = urllib.request.Request(f"{base}/denoise", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()

        raw_headers = {"Content-Type": "application/octet-stream",
                       "X-Shape": f"{args.size},{args.size},3",
                       "Accept": "application/octet-stream"}
        modes = [("png", payload, None)]
        if args.raw:
            modes.append(("raw", arr.tobytes(), raw_headers))
        for clients in client_grid:
            for mode, body, hdrs in modes:
                service.reset_stats()  # each row's phases are its own window
                rps, errs = run_load(base, body, clients, args.seconds,
                                     headers=hdrs)
                stats = dict(getattr(service, "stats", {}))
                phases = phase_summary(service)
                row = {"max_batch": mb, "clients": clients, "mode": mode,
                       "req_per_s": round(rps, 2), "errors": errs,
                       "batching": stats, "phases": phases}
                results.append(row)
                ph = "  ".join(f"{k} {v['mean_ms']:.1f}ms"
                               for k, v in phases.items())
                print(f"max_batch {mb:3d} clients {clients:3d} {mode}: "
                      f"{rps:7.2f} req/s errors={errs}  [{ph}]", flush=True)
        server.shutdown()
        if hasattr(service, "close"):
            service.close()

    best = max(results, key=lambda r: r["req_per_s"])
    # fair baseline: the BEST single-dispatch figure in the same codec mode
    base_rps = max((r["req_per_s"] for r in results
                    if r["max_batch"] == 1 and r.get("mode") == best.get("mode")),
                   default=0)
    if base_rps:
        print(f"best: {best['req_per_s']:.2f} req/s at max_batch "
              f"{best['max_batch']} / {best['clients']} clients "
              f"= {best['req_per_s'] / base_rps:.2f}x over single-dispatch")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"size": args.size, "results": results}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
