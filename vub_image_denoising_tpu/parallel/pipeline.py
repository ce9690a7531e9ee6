"""Pipeline parallelism for the T-step diffusion sampler over a ``stage`` axis.

Greenfield TPU-scaling component (SURVEY.md §2.0 — the reference is strictly
single-device; its sampler is a Python loop in diffusion_RDUnet.py:38-50).
The reverse sampler is a chain of T sequential U-Net steps, so neither data
parallelism (needs large batches) nor tensor parallelism (pays model-axis
collectives inside EVERY conv) is free for *streaming* sampling workloads.
Pipeline parallelism splits the chain itself: stage ``s`` of ``S`` owns the
contiguous timestep chunk ``ts[s*k:(s+1)*k]`` (k = T/S) and microbatches
stream through the stages, handed stage→stage with ``lax.ppermute`` over ICI.

GPipe schedule, expressed as ONE jitted ``lax.scan`` over M + S - 1 ticks
inside ``jax.shard_map`` (SPMD: every stage runs the same program):

  tick t:  stage 0 ingests microbatch t (while t < M); every stage applies its
           k sampler steps to the microbatch it holds; the last stage writes
           finished microbatch t-(S-1) to the output buffer; ppermute shifts
           every in-flight microbatch one stage to the right.

Efficiency M·S / (M+S-1) → S for a deep stream: with M ≫ S microbatches the
chip-seconds per image approach 1/S of the sequential sampler's, and — unlike
data parallelism — the LATENCY of each individual microbatch stays T·step
(it's never split), so the pipeline composes with small per-stage batches.
The bubbles (S-1 warmup + S-1 drain ticks) run the U-Net on zeros; their
output is masked off, never written.

The per-step math is bit-compatible with ``InterpolationDiffusion.
improved_sampling`` (f32 schedule state, activation-dtype U-Net inputs, the
2N-stacked two-timestep forward): each microbatch sees the identical op
sequence, so pipelined == sequential output (asserted in tests/test_pipeline.py
and the driver dryrun).

When this pays: bulk/offline denoising of image streams on a pod slice —
e.g. the SIDD benchmark's 1280 blocks (eval/sidd.py) or the HTTP server's
request queue — where throughput, not single-image latency, is the metric.
Params are REPLICATED per stage (every stage runs the full U-Net, on
different timesteps), so HBM cost equals data parallelism's; what pipelining
buys over DP here is full utilization at per-device batches below the
batch-efficiency knee (BASELINE.md: RDUNet throughput saturates only near
batch 128 — S stages at microbatch b utilize like batch b·S).
"""

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_pp_mesh(devices=None) -> Mesh:
    """A 1-D ("stage",) mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), ("stage",))


def make_ppdp_mesh(n_stages: int, devices=None) -> Mesh:
    """A ("stage", "data") mesh: ``n_stages``-deep pipeline, each stage
    data-parallel over the remaining devices (microbatch samples shard over
    "data" inside every stage — `pipelined_sampling` detects the axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_stages:
        raise ValueError(
            f"{len(devices)} devices not divisible by n_stages={n_stages}"
        )
    arr = np.asarray(devices).reshape(n_stages, len(devices) // n_stages)
    return Mesh(arr, ("stage", "data"))


def best_pipeline_depth(timesteps: int, n_devices: Optional[int] = None) -> int:
    """Largest pipeline depth ≤ ``n_devices`` that divides ``timesteps``.

    The stage chunking needs T % S == 0; the reference default T=20 admits
    S ∈ {1, 2, 4, 5, 10, 20}, so on an 8-device slice the best depth is 5."""
    n = len(jax.devices()) if n_devices is None else int(n_devices)
    for s in range(min(n, timesteps), 0, -1):
        if timesteps % s == 0:
            return s
    return 1


def pipelined_sampling(
    diffusion,
    unet_apply,
    params,
    noisy,
    mesh: Mesh,
    *,
    microbatch: int,
    axis: str = "stage",
    unroll: int = 1,
):
    """Run ``diffusion.improved_sampling`` pipelined over ``mesh[axis]``.

    Args:
      diffusion: an ``InterpolationDiffusion`` (supplies ``timesteps``).
      unet_apply: ``(params, x, t_normalized) -> prediction`` — same contract
        as ``improved_sampling``.
      params: U-Net params, replicated to every stage.
      noisy: ``(B, H, W, C)`` batch to denoise.  Split into ceil(B/microbatch)
        microbatches; a short tail microbatch is zero-padded in and sliced off.
      mesh: mesh whose ``axis`` dimension is the pipeline depth S.
        ``diffusion.timesteps`` must be divisible by S (each stage owns T/S
        steps).  A 2-D ("stage", "data") mesh (make_ppdp_mesh) additionally
        shards every microbatch's samples over "data" (microbatch must divide
        by the data-axis size).
      microbatch: images per in-flight microbatch (the per-stage U-Net batch
        is 2·microbatch — the two-timestep stack).

    Returns:
      ``(B, H, W, C)`` denoised batch, equal to
      ``diffusion.improved_sampling(unet_apply, params, noisy)``.
    """
    n_stages = int(mesh.shape[axis])
    timesteps = int(diffusion.timesteps)
    if timesteps % n_stages:
        raise ValueError(
            f"timesteps={timesteps} not divisible by {n_stages} pipeline stages"
        )
    steps_per_stage = timesteps // n_stages

    # pp x dp composition: on a ("stage", "data") mesh each in-flight
    # microbatch's samples shard over "data" — ppermute pairs devices with the
    # same data-index across adjacent stages, so shards stream without ever
    # gathering (make_ppdp_mesh)
    data_axis = None
    if "data" in mesh.axis_names and int(mesh.shape["data"]) > 1:
        data_axis = "data"
        if microbatch % int(mesh.shape["data"]):
            raise ValueError(
                f"microbatch={microbatch} not divisible by the "
                f"{int(mesh.shape['data'])}-way data axis"
            )

    batch = noisy.shape[0]
    if microbatch <= 0:
        raise ValueError(f"microbatch must be positive, got {microbatch}")
    n_micro = -(-batch // microbatch)
    pad = n_micro * microbatch - batch
    if pad:
        noisy = jnp.concatenate(
            [noisy, jnp.zeros((pad,) + noisy.shape[1:], noisy.dtype)], axis=0
        )
    in_dtype = noisy.dtype
    xs = noisy.reshape((n_micro, microbatch) + noisy.shape[1:])

    # T..1 schedule, f32 like improved_sampling (bf16 t-arithmetic collapses
    # whole steps at large T — see diffusion/interpolation.py:49-54)
    ts_all = jnp.arange(timesteps, 0, -1, dtype=jnp.float32)

    def stage_fn(params, xs):
        s_idx = jax.lax.axis_index(axis)
        my_ts = jax.lax.dynamic_slice(
            ts_all, (s_idx * steps_per_stage,), (steps_per_stage,)
        )

        lm = xs.shape[1]  # local microbatch size (microbatch / data-axis size)

        def sampler_chunk(x_t0, anchor32):
            # identical body to improved_sampling's scan step, anchored at the
            # microbatch's own starting image (which travels with it)
            def step(x_t, t):
                alpha_t = t / timesteps
                alpha_prev = (t - 1) / timesteps
                x2 = jnp.concatenate([x_t, x_t], axis=0).astype(in_dtype)
                t2 = jnp.concatenate(
                    [jnp.full((lm,), alpha_t), jnp.full((lm,), alpha_prev)]
                ).astype(in_dtype)
                pred2 = unet_apply(params, x2, t2).astype(jnp.float32)
                pred_t, pred_prev = pred2[:lm], pred2[lm:]
                x_tilde = (1 - alpha_t) * pred_t + alpha_t * anchor32
                x_tilde_prev = (1 - alpha_prev) * pred_prev + alpha_prev * anchor32
                return x_t - x_tilde + x_tilde_prev, None

            x_out, _ = jax.lax.scan(step, x_t0, my_ts, unroll=unroll)
            return x_out

        mb_shape = (lm,) + xs.shape[2:]
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            x, anchor, buf = carry
            # stage 0 ingests microbatch t while the stream lasts
            incoming = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            ).astype(jnp.float32)
            ingest = jnp.logical_and(s_idx == 0, t < n_micro)
            x = jnp.where(ingest, incoming, x)
            anchor = jnp.where(ingest, incoming, anchor)

            y = sampler_chunk(x, anchor)

            # last stage retires microbatch t-(S-1); bubbles are masked off
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(
                s_idx == n_stages - 1,
                jnp.logical_and(out_idx >= 0, out_idx < n_micro),
            )
            w_idx = jnp.clip(out_idx, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(buf, w_idx, 0, keepdims=False)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, y, cur), w_idx, 0
            )

            # shift every in-flight microbatch one stage rightward (non-circular:
            # stage 0's inbox is refilled by ingest, not by wraparound)
            if perm:
                y = jax.lax.ppermute(y, axis, perm)
                anchor = jax.lax.ppermute(anchor, axis, perm)
            return (y, anchor, buf), None

        init = (
            jnp.zeros(mb_shape, jnp.float32),
            jnp.zeros(mb_shape, jnp.float32),
            jnp.zeros((n_micro,) + mb_shape, jnp.float32),
        )
        (_, _, buf), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_stages - 1)
        )
        # out_spec stacks the per-stage buffers on a leading S axis; only the
        # last stage's is real — the caller slices it off its device
        return buf[None]

    stacked = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(), P(None, data_axis)),
        out_specs=P(axis, None, data_axis),
        check_vma=False,
    )(params, xs)
    out = stacked[-1].reshape((n_micro * microbatch,) + noisy.shape[1:])
    return out[:batch].astype(in_dtype)


def pipeline_sample_fn(
    diffusion,
    unet_apply,
    mesh: Mesh,
    *,
    microbatch: int,
    axis: str = "stage",
    unroll: int = 1,
    donate: bool = False,
):
    """A jitted ``(params, noisy) -> denoised`` closure over a fixed pipeline
    config — the serving-path entry (compile once, stream batches through)."""

    def fn(params, noisy):
        return pipelined_sampling(
            diffusion, unet_apply, params, noisy, mesh,
            microbatch=microbatch, axis=axis, unroll=unroll,
        )

    return jax.jit(fn, donate_argnums=(1,) if donate else ())
