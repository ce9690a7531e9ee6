"""Backward-pass profile for the RDUNet-128 flagship train step (VERDICT r2 #2).

Round 2 measured the flagship training at ~23.3 TFLOP-model/s (~55% of the
wide-conv rate) with "bwd glue" the suspected gap but no backward-specific
measurements.  This script separates forward from backward cost per component
on the real TPU:

  1. full supervised train step (engine=xla, remat on/off) vs forward-only
  2. dense pairs per scale (c=128..1024 at the flagship's pixel sizes):
     fwd vs value_and_grad, with/without remat
  3. glue blocks (downs / matmul-ups): fwd vs fwd+bwd
  4. dtype audit: f32-param casts inside bwd vs all-bf16 params

Run from repo root (TPU):  python scripts/profile_bwd.py [--quick]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BATCH = 8
SIZE = 256
BASE = 128
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        y = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def row(name, sec, flops=None):
    rate = f"  {flops / sec / 1e12:6.1f} TF/s" if flops else ""
    print(f"  {name:52s} {sec * 1e3:9.2f} ms{rate}", flush=True)
    return sec


def dense_pair_flops(c, px):
    """FLOPs of two dense blocks at channel c over px pixels (fwd only)."""
    g = c // 2
    ktots = [c, c + g, c + 2 * g, c + 3 * g]
    per_block = sum(2 * 9 * kt * (g if i < 3 else c) for i, kt in enumerate(ktots))
    return 2 * per_block * px


def step_only(batch, remat):
    """Time just the full train step at one config (for env-knob sweeps: the
    VUB_BWD_* knobs are read at fused_apply import, so each config runs in its
    own process — see the sweep loop in this file's __main__ docs)."""
    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import os

    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.train import SupervisedTrainer

    key = jax.random.PRNGKey(0)
    model = RDUNet(channels=3, base_filters=BASE)
    x = jax.random.uniform(key, (batch, SIZE, SIZE, 3), DTYPE) * 2 - 1
    yc = jax.random.uniform(jax.random.PRNGKey(2), (batch, SIZE, SIZE, 3), DTYPE) * 2 - 1
    tr = SupervisedTrainer(model, engine="xla", remat=remat,
                           accumulation_steps=1, compute_dtype=DTYPE)
    state = tr.init(key, jnp.zeros((batch, SIZE, SIZE, 3), DTYPE), steps_per_epoch=10)
    s = state
    for _ in range(2):
        s, l = tr._jit_step(s, x, yc)
        jax.device_get(l)
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        s, l = tr._jit_step(s, x, yc)
    jax.device_get(l)
    sec = (time.perf_counter() - t0) / iters
    mp = batch * SIZE * SIZE / 1e6 / sec
    knobs = {k: v for k, v in os.environ.items() if k.startswith("VUB_BWD")
             or k == "VUB_DOWN_MATMUL_BWD"}
    print(f"step batch={batch} remat={remat} knobs={knobs}: "
          f"{sec * 1e3:7.1f} ms  {mp:5.2f} MP/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--step-only", action="store_true")
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--remat", type=int, default=0)
    args = ap.parse_args()
    if args.step_only:
        step_only(args.batch, bool(args.remat))
        return

    from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)

    from vub_image_denoising_tpu.models import RDUNet, fused_apply as fa

    key = jax.random.PRNGKey(0)

    # ---------- 2. dense pairs per scale ----------
    print(f"\ndense pairs (batch {BATCH}, bf16): fwd vs fwd+bwd", flush=True)
    scales = [(BASE, SIZE), (2 * BASE, SIZE // 2), (4 * BASE, SIZE // 4),
              (8 * BASE, SIZE // 8)]
    from vub_image_denoising_tpu.nn.blocks import DenoisingBlock
    import flax.linen as nn

    for c, s in scales:
        x = jax.random.uniform(key, (BATCH, s, s, c), DTYPE)
        blk = DenoisingBlock(c, c // 2, c)
        p_a = jax.jit(blk.init)(key, jnp.zeros((1, s, s, c)))["params"]
        p_b = jax.jit(blk.init)(jax.random.PRNGKey(1), jnp.zeros((1, s, s, c)))["params"]
        px = BATCH * s * s
        fl = dense_pair_flops(c, px)

        def pair(pa, pb, v):
            return fa._dense_block_xla(pb, fa._dense_block_xla(pa, v))

        def pair_remat(pa, pb, v):
            f = jax.checkpoint(fa._dense_block_xla)
            return f(pb, f(pa, v))

        fwd = timeit(jax.jit(pair), p_a, p_b, x)
        row(f"c={c:4d} {s}^2  fwd", fwd, fl)

        def loss(pa, pb, v):
            return jnp.sum(pair(pa, pb, v).astype(jnp.float32))

        def loss_remat(pa, pb, v):
            return jnp.sum(pair_remat(pa, pb, v).astype(jnp.float32))

        g = timeit(jax.jit(jax.grad(loss, argnums=(0, 1, 2))), p_a, p_b, x)
        row(f"c={c:4d} {s}^2  fwd+bwd", g, 3 * fl)
        row(f"c={c:4d} {s}^2  bwd-only (derived)", g - fwd, 2 * fl)
        if not args.quick:
            gr = timeit(jax.jit(jax.grad(loss_remat, argnums=(0, 1, 2))), p_a, p_b, x)
            row(f"c={c:4d} {s}^2  fwd+bwd remat", gr, 3 * fl)

    # ---------- 3. glue blocks ----------
    print(f"\nglue (batch {BATCH}, bf16): fwd vs fwd+bwd", flush=True)
    model = RDUNet(channels=3, base_filters=BASE)
    params = jax.jit(model.init)(key, jnp.zeros((1, SIZE, SIZE, 3)))
    core = params["params"]["core"]
    for i, (cin, s) in enumerate([(BASE, SIZE), (2 * BASE, SIZE // 2),
                                  (4 * BASE, SIZE // 4)]):
        x = jax.random.uniform(key, (BATCH, s, s, cin), DTYPE)
        p = core[f"down_{i}"]
        fl = 2 * 4 * cin * 2 * cin * (BATCH * s * s // 4)
        fwd = timeit(jax.jit(fa._down), p, x)
        row(f"down_{i} ({cin}->{2*cin} @{s}^2) fwd", fwd, fl)
        gt = timeit(jax.jit(jax.grad(
            lambda pp, v: jnp.sum(fa._down(pp, v).astype(jnp.float32)),
            argnums=(0, 1))), p, x)
        row(f"down_{i} fwd+bwd", gt, 3 * fl)
    for i, (cin, s) in enumerate([(2 * BASE, SIZE), (4 * BASE, SIZE // 2),
                                  (8 * BASE, SIZE // 4)]):
        # up_j consumes (cin @ s/2) -> upsample to s, concat skip (cin/2 @ s)
        up = core[f"up_{i}"]
        xs = jax.random.uniform(key, (BATCH, s // 2, s // 2, cin), DTYPE)
        skip = jax.random.uniform(key, (BATCH, s, s, cin // 2), DTYPE)
        px = BATCH * s * s
        fl = 2 * 4 * cin * cin * (px // 4) + 2 * 9 * (cin + cin // 2) * (cin // 2) * px
        fwd = timeit(jax.jit(fa._up), up, xs, skip)
        row(f"up_{i} ({cin}@{s//2}^2 -> {cin//2}@{s}^2) fwd", fwd, fl)
        gt = timeit(jax.jit(jax.grad(
            lambda pp, a, b: jnp.sum(fa._up(pp, a, b).astype(jnp.float32)),
            argnums=(0, 1, 2))), up, xs, skip)
        row(f"up_{i} fwd+bwd", gt, 3 * fl)

    # ---------- 1. full train step ----------
    print(f"\nfull supervised train step (RDUNet-{BASE}, batch {BATCH}, "
          f"{SIZE}^2, engine=xla):", flush=True)
    from vub_image_denoising_tpu.train import SupervisedTrainer

    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), DTYPE) * 2 - 1
    yc = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3), DTYPE) * 2 - 1

    fwd_fn = jax.jit(lambda v, xx: fa.rdunet_apply_fused(v, xx, engine="xla"))
    fwd = timeit(fwd_fn, params, x)
    row("forward only", fwd)
    for remat in (True, False) if not args.quick else (True,):
        tr = SupervisedTrainer(model, engine="xla", remat=remat,
                               accumulation_steps=1, compute_dtype=DTYPE)
        state = tr.init(key, jnp.zeros((BATCH, SIZE, SIZE, 3), DTYPE),
                        steps_per_epoch=10)
        try:
            # the step donates its state: thread the new state through each call
            def step_timeit(st0, iters=6, warmup=2):
                s = st0
                for _ in range(warmup):
                    s, l = tr._jit_step(s, x, yc)
                    jax.device_get(l)
                t0 = time.perf_counter()
                for _ in range(iters):
                    s, l = tr._jit_step(s, x, yc)
                jax.device_get(l)
                return (time.perf_counter() - t0) / iters

            st = step_timeit(state)
            row(f"train step (remat={remat})", st)
            row("  bwd+update-only (derived)", st - fwd)
        except Exception as e:
            print(f"  remat={remat} failed: {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()
