"""Model-info / profiling utilities — port of diffusion_denoising/info.py.

The reference prints ``torchinfo.summary`` for RDUNet(128) and the DiffusionModel
(RDUNet_T(32)) and measures 10-iteration average CUDA peak memory + wall-clock
inference (info.py:18-48).  TPU equivalents:
- ``model_summary``: parameter count/bytes + XLA cost analysis (FLOPs, bytes accessed)
  of the jitted forward;
- ``measure_inference_metrics``: compiled-executable memory analysis (the XLA analog of
  peak device memory) + averaged wall-clock latency with block_until_ready.
"""

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def model_summary(apply_fn: Callable, params, *example_args) -> dict:
    """Params + FLOPs + memory summary of apply_fn(params, *example_args)."""
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    param_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize for p in jax.tree_util.tree_leaves(params)
    )
    lowered = jax.jit(apply_fn).lower(params, *example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    summary = {
        "params": n_params,
        "param_bytes": param_bytes,
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
    }
    try:
        mem = compiled.memory_analysis()
        summary["temp_bytes"] = getattr(mem, "temp_size_in_bytes", None)
        summary["argument_bytes"] = getattr(mem, "argument_size_in_bytes", None)
        summary["output_bytes"] = getattr(mem, "output_size_in_bytes", None)
    except Exception:
        pass
    return summary


def measure_inference_metrics(apply_fn: Callable, params, *example_args,
                              num_iterations: int = 10,
                              peak_flops: float = 127e12) -> dict:
    """Average wall-clock latency over ``num_iterations`` (info.py:31-48), plus MFU
    against ``peak_flops`` (default: the v5e PRACTICAL bf16 matmul peak measured in
    BASELINE.md round 2; pass 197e12 for nominal)."""
    # AOT compile once; the same executable serves timing AND the MFU cost model
    # (a second jax.jit wrapper would recompile — minutes on remote-compile runtimes)
    fwd = jax.jit(apply_fn).lower(params, *example_args).compile()
    out = fwd(params, *example_args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # force completion
    times = []
    for _ in range(num_iterations):
        t0 = time.perf_counter()
        out = fwd(params, *example_args)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    result = {
        "avg_inference_sec": float(np.mean(times)),
        "std_inference_sec": float(np.std(times)),
        "num_iterations": num_iterations,
    }
    try:
        cost = fwd.cost_analysis()
        flops = float(cost.get("flops", 0.0))
        if flops:
            result["mfu"] = flops / result["avg_inference_sec"] / peak_flops
    except Exception:
        pass
    return result


def print_info():
    """Reference info.py __main__ behavior: summarize RDUNet(128) and the diffusion
    model (RDUNet_T(32)) and print averaged inference metrics."""
    from ..diffusion.interpolation import InterpolationDiffusion
    from ..models.rdunet import RDUNet, RDUNetT

    x = jnp.zeros((1, 256, 256, 3))
    rdunet = RDUNet(channels=3, base_filters=128)
    params = jax.jit(rdunet.init)(jax.random.PRNGKey(0), x)
    print("RDUNet(128):", model_summary(rdunet.apply, params, x))

    unet_t = RDUNetT(base_filters=32)
    t = jnp.zeros((1,))
    tparams = jax.jit(unet_t.init)(jax.random.PRNGKey(0), x, t)
    diff = InterpolationDiffusion(timesteps=20)

    def sample(p, noisy):
        return diff.improved_sampling(unet_t.apply, p, noisy)

    print("DiffusionModel(RDUNet_T(32)):", model_summary(sample, tparams, x))
    print("RDUNet(128) latency:", measure_inference_metrics(rdunet.apply, params, x))
    print("Diffusion sampling latency:", measure_inference_metrics(sample, tparams, x))


if __name__ == "__main__":
    print_info()
