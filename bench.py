"""Benchmark: RDUNet denoise throughput (megapixels/sec/chip) on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver-set north star of 500 MP/s/chip (BASELINE.md; the reference
publishes no numbers — it is a single-GPU PyTorch research repo with no benchmarks).

Measures the steady-state inference throughput of the supervised RDUNet denoiser
(reference flagship, UNet/RDUNet_model.py:117-186) at the reference's working size:
256x256 patches (custom_dataset.py:49), bf16 activations, batched.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def bench_rdunet(base_filters=32, batch=16, size=256, iters=20, warmup=3, fused=None):
    """Steady-state RDUNet denoise throughput.

    ``fused`` selects the Pallas fused-block inference engine
    (models/fused_apply.py); default tries fused and falls back to the XLA path.
    Timing forces completion with a device_get of one output element (on this
    runtime block_until_ready alone does not guarantee execution finished).
    """
    from vub_image_denoising_tpu.models import RDUNet

    model = RDUNet(channels=3, base_filters=base_filters)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.bfloat16) * 2 - 1
    params = jax.jit(model.init)(key, jnp.zeros((1, size, size, 3)))

    def build_fused():
        from vub_image_denoising_tpu.models.fused_apply import (
            prepare_fused_params,
            rdunet_apply_fused,
        )

        padded = prepare_fused_params(params)
        return jax.jit(lambda v, x: rdunet_apply_fused(v, x)), padded

    # XLA wins at the saturating batch (the Pallas engine wins small-batch
    # latency — see BASELINE.md); default to XLA only so the bench isn't
    # dominated by multi-minute remote Mosaic compiles.
    if fused is None:
        fused = os.environ.get("BENCH_FUSED", "0") == "1"
    candidates = ["fused", "xla"] if fused else ["xla"]

    best = 0.0
    for kind in candidates:
        try:
            if kind == "fused":
                fwd, p = build_fused()
            else:
                fwd, p = jax.jit(model.apply), params
            for _ in range(warmup):
                _ = jax.device_get(fwd(p, x)[0, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fwd(p, x)
            _ = jax.device_get(y[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best = max(best, batch * size * size * iters / 1e6 / dt)
        except Exception as e:
            print(f"# {kind} path failed: {type(e).__name__}", flush=True)
    return best


def main():
    value = bench_rdunet(
        base_filters=int(os.environ.get("BENCH_BASE_FILTERS", 32)),
        # batch 128 amortizes this runtime's fixed per-op dispatch overhead
        # (throughput saturates at ~batch 128 on v5e)
        batch=int(os.environ.get("BENCH_BATCH", 128)),
    )
    baseline = 500.0
    print(
        json.dumps(
            {
                "metric": "rdunet_denoise_throughput",
                "value": round(value, 2),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(value / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
