"""Benchmark: RDUNet denoise throughput (megapixels/sec/chip) on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.
Baseline: the driver-set north star of 500 MP/s/chip (BASELINE.md) — note that
number exceeds this chip's physics: the PRACTICAL bf16 matmul peak measured on this
v5e via the axon runtime is ~127 TFLOP/s (scripts/profile_xla_opts.py), putting the
100%-MXU ceiling for this architecture (~1.45 MFLOP/px) at ~87 MP/s/chip.

Measures the steady-state inference throughput of the supervised RDUNet denoiser
(reference flagship, UNet/RDUNet_model.py:117-186) at the reference's working size:
256x256 patches (custom_dataset.py:49), bf16 activations, batched.  Two engines are
timed and the best wins: the flax/XLA forward and the optimized XLA engine
(models/fused_apply.py: VALID-stride downsamples, split-concat upsample convs).
Set BENCH_FUSED=1 to also time the Pallas fused-block engine (the small-batch
latency path; loses at the saturating batch).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

# persistent XLA compile cache: first run ~14 min over the remote-compile
# tunnel, subsequent runs ~1 min (measured; VUB_JAX_CACHE_DIR overrides)
enable_compilation_cache()

NOMINAL_PEAK = 197e12  # v5e bf16 spec sheet
PRACTICAL_PEAK = 127e12  # measured 8192^3 bf16 matmul on this chip/runtime


def bench_rdunet(base_filters=32, batch=16, size=256, iters=20, warmup=3, fused=None):
    """Steady-state RDUNet denoise throughput.

    Timing forces completion with a device_get of one output element (on this
    runtime block_until_ready alone does not guarantee execution finished).
    Returns (mp_per_s, flops_per_px, best_engine).
    """
    from vub_image_denoising_tpu.models import RDUNet, rdunet_apply_fused

    model = RDUNet(channels=3, base_filters=base_filters)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.bfloat16) * 2 - 1
    params = jax.jit(model.init)(key, jnp.zeros((1, size, size, 3)))

    n_chips = 1
    if os.environ.get("BENCH_DP", "0") == "1" and len(jax.devices()) > 1:
        # data-parallel: batch sharded over the mesh, params replicated — the
        # multi-chip path; aggregate MP/s is divided by n_chips below so the
        # reported unit stays honestly per-chip
        from vub_image_denoising_tpu.parallel.mesh import (
            make_mesh, put_replicated, shard_batch,
        )

        mesh = make_mesh()
        n_chips = len(jax.devices())
        x = jax.device_put(x, shard_batch(mesh))
        params = put_replicated(params, mesh)

    if fused is None:
        fused = os.environ.get("BENCH_FUSED", "0") == "1"
    # AOT-compile the flax forward ONCE: the same executable serves both the
    # timing candidate and the FLOPs cost model (a second jax.jit wrapper would
    # recompile — minutes over this runtime's remote-compile tunnel)
    flax_compiled = jax.jit(model.apply).lower(params, x).compile()
    candidates = [
        ("xla-opt", jax.jit(lambda v, xx: rdunet_apply_fused(v, xx, engine="xla"))),
        ("flax", flax_compiled),
    ]
    if fused:
        candidates.insert(
            0, ("pallas", jax.jit(lambda v, xx: rdunet_apply_fused(v, xx, engine="pallas")))
        )

    # analytic-ish FLOPs from XLA's own cost model of the flax forward
    try:
        cost = flax_compiled.cost_analysis()
        flops_per_px = float(cost["flops"]) / (batch * size * size)
    except Exception:
        flops_per_px = 1.45e6  # analytic estimate for base 32

    best, best_engine = 0.0, "none"
    for kind, fwd in candidates:
        try:
            for _ in range(warmup):
                _ = jax.device_get(fwd(params, x)[0, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fwd(params, x)
            _ = jax.device_get(y[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            mp = batch * size * size * iters / 1e6 / dt / n_chips
            if mp > best:
                best, best_engine = mp, kind
        except Exception as e:
            print(f"# {kind} path failed: {type(e).__name__}", flush=True)
    return best, flops_per_px, best_engine


def check_fused_parity():
    """On-hardware numerical parity of the Pallas engines vs the XLA path.

    CI covers the kernels in interpret mode only (remote Mosaic compiles are
    minutes-slow); this mode gives the driver/user a quick real-TPU check.
    Prints one JSON line with the max relative errors; exit code 1 on failure.
    """
    from vub_image_denoising_tpu.models import RDUNet, rdunet_apply_fused

    model = RDUNet(channels=3, base_filters=32)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 64, 64, 3), jnp.bfloat16) * 2 - 1
    params = jax.jit(model.init)(key, jnp.zeros((1, 64, 64, 3)))

    ref = jax.device_get(jax.jit(model.apply)(params, x)).astype("float32")
    scale = float(abs(ref).max()) + 1e-9
    errs, outs = {}, {}
    for engine in ("xla", "pallas"):
        out = jax.device_get(
            jax.jit(lambda v, xx, e=engine: rdunet_apply_fused(v, xx, engine=e))(params, x)
        ).astype("float32")
        outs[engine] = out
        errs[engine] = float(abs(out - ref).max()) / scale
    # bitwise-identical engines would mean the Pallas kernels silently fell back
    # to the XLA path — flag it (measured bf16 divergence is ~8e-3)
    kernel_ran = bool((outs["pallas"] != outs["xla"]).any())
    ok = errs["xla"] < 1e-2 and errs["pallas"] < 2e-2 and kernel_ran
    print(json.dumps({"metric": "fused_parity_check", "rel_err": errs,
                      "pallas_kernel_ran": kernel_ran, "ok": ok}))
    return 0 if ok else 1


def _exec_path_gate():
    """Fail fast (instead of hanging forever) when the device exec path is dead.

    The axon runtime has a death mode where ``jax.devices()`` still answers but
    every client's first *executed* op blocks indefinitely in a futex wait
    (BASELINE.md round-5 postmortem).  A hung C call cannot be interrupted
    in-process, so probe from a child interpreter under a hard timeout; wait up
    to BENCH_HEALTH_WAIT_S (default 1800) for recovery, then emit a diagnostic
    JSON line and exit non-zero rather than wedging the caller.
    """
    if os.environ.get("BENCH_HEALTH", "1") == "0" or jax.default_backend() != "axon":
        return
    from vub_image_denoising_tpu.utils.health import probe_device_exec

    deadline = time.time() + float(os.environ.get("BENCH_HEALTH_WAIT_S", "1800"))
    while True:
        ok, _, detail = probe_device_exec(timeout_s=240)
        if ok:
            return
        if time.time() >= deadline:
            print(json.dumps({"metric": "rdunet_denoise_throughput",
                              "error": "device exec path dead", "detail": detail}))
            raise SystemExit(1)
        time.sleep(60)


def main():
    import sys

    _exec_path_gate()
    if "--check" in sys.argv:
        raise SystemExit(check_fused_parity())
    value, flops_per_px, engine = bench_rdunet(
        base_filters=int(os.environ.get("BENCH_BASE_FILTERS", 32)),
        # batch 128 amortizes this runtime's fixed per-op dispatch overhead
        # (throughput saturates at ~batch 128 on v5e; 192 regresses)
        batch=int(os.environ.get("BENCH_BATCH", 128)),
    )
    baseline = 500.0
    achieved_flops = value * 1e6 * flops_per_px
    print(
        json.dumps(
            {
                "metric": "rdunet_denoise_throughput",
                "value": round(value, 2),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(value / baseline, 4),
                "mfu": round(achieved_flops / NOMINAL_PEAK, 4),
                "mfu_practical": round(achieved_flops / PRACTICAL_PEAK, 4),
                "engine": engine,
            }
        )
    )


if __name__ == "__main__":
    main()
