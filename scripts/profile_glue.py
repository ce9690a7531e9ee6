"""Glue-block strategy shootout on real TPU: the non-dense ops cost ~63ms of the
215ms RDUNet-32 forward (profile_scales.py).  Times the flax formulations the model
uses today against alternates, at the bench config (batch 128, 256^2, bf16, base 32).

Run from repo root: python scripts/profile_glue.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BATCH = 128
SIZE = 256
BASE = 32
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        y = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def row(name, sec, ref=None):
    extra = f"  ({ref / sec:.2f}x vs flax)" if ref else ""
    print(f"  {name:44s} {sec * 1e3:8.2f} ms{extra}", flush=True)
    return sec


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from vub_image_denoising_tpu.models import RDUNet
    from vub_image_denoising_tpu.models import fused_apply as fa
    from vub_image_denoising_tpu.nn.blocks import (
        DownsampleBlock, InputBlock, OutputBlock, UpsampleBlock,
    )

    model = RDUNet(channels=3, base_filters=BASE)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, SIZE, SIZE, 3)))
    core = params["params"]["core"]

    x3 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), DTYPE) * 2 - 1
    x0 = jax.random.uniform(key, (BATCH, SIZE, SIZE, BASE), DTYPE)
    x1 = jax.random.uniform(key, (BATCH, SIZE // 2, SIZE // 2, 2 * BASE), DTYPE)

    # ---------- input block ----------
    print("\ninput block (3->32, 32->32 @256^2):", flush=True)
    ib = InputBlock(BASE)
    ref = row("flax (lax.conv)", timeit(
        jax.jit(lambda p, v: ib.apply({"params": p}, v)), core["input_block"], x3))
    row("fused_apply (lax.conv fns)", timeit(
        jax.jit(fa._input_block), core["input_block"], x3), ref)

    # ---------- output block ----------
    print("\noutput block (32->32, 32->3 @256^2):", flush=True)
    ob = OutputBlock(BASE, 3)
    ref = row("flax", timeit(
        jax.jit(lambda p, v: ob.apply({"params": p}, v)), core["output_block"], x0))
    row("fused_apply", timeit(
        jax.jit(fa._output_block), core["output_block"], x0), ref)

    # ---------- down ----------
    print("\ndown_0 (32->64 k2s2 @256^2):", flush=True)
    db = DownsampleBlock(2 * BASE)
    ref = row("flax (lax.conv s2)", timeit(
        jax.jit(lambda p, v: db.apply({"params": p}, v)), core["down_0"], x0))
    row("reshape+matmul (_down)", timeit(jax.jit(fa._down), core["down_0"], x0), ref)

    def down_convdot(p, v):
        # strided conv via lax.conv but with 1x1 on a space-to-depth view done by XLA
        n, h, w, c = v.shape
        k = p["conv"]["kernel"]
        y = jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + p["conv"]["bias"].astype(v.dtype)
        return fa._prelu(y, p["actv"]["alpha"])

    row("lax.conv VALID s2", timeit(jax.jit(down_convdot), core["down_0"], x0), ref)

    # ---------- up ----------
    print("\nup_0 (convT 64->64 k2s2 @128^2, concat 96->32 conv @256^2):", flush=True)
    ub = UpsampleBlock(2 * BASE, BASE)
    ref = row("flax (conv_transpose)", timeit(
        jax.jit(lambda p, a, b: ub.apply({"params": p}, a, b)), core["up_0"], x1, x0))
    row("matmul+shuffle (_up)", timeit(jax.jit(fa._up), core["up_0"], x1, x0), ref)

    def up_splitconv(p, upsample, concat):
        # split the concat conv: conv(cat[a,b]) == conv_a(a) + conv_b(b)
        n, h, w, cin = upsample.shape
        k = p["conv_t"]["kernel"]
        cout = k.shape[-1]
        wk = k.transpose(2, 0, 1, 3).reshape(cin, 4 * cout).astype(upsample.dtype)
        y = (upsample @ wk).reshape(n, h, w, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)
        y = y + p["conv_t"]["bias"].astype(upsample.dtype)
        y = fa._prelu(y, p["actv_t"]["alpha"])
        wc = p["conv"]["kernel"].astype(y.dtype)
        c_skip = concat.shape[-1]
        ya = jax.lax.conv_general_dilated(
            concat, wc[:, :, :c_skip], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        yb = jax.lax.conv_general_dilated(
            y, wc[:, :, c_skip:], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = ya + yb + p["conv"]["bias"].astype(y.dtype)
        return fa._prelu(out, p["actv"]["alpha"])

    y_ref = jax.jit(lambda p, a, b: ub.apply({"params": p}, a, b))(core["up_0"], x1, x0)
    y_alt = jax.jit(up_splitconv)(core["up_0"], x1, x0)
    err = float(jnp.max(jnp.abs(y_alt.astype(jnp.float32) - y_ref.astype(jnp.float32))))
    row(f"split-concat conv (err={err:.1e})",
        timeit(jax.jit(up_splitconv), core["up_0"], x1, x0), ref)

    # ---------- all glue in the model ----------
    print("\nfull glue inventory (model-used flax blocks):", flush=True)
    tot = 0.0
    for name, mod, args in [
        ("input_block", InputBlock(BASE), (x3,)),
        ("down_0", DownsampleBlock(2 * BASE), (x0,)),
        ("down_1", DownsampleBlock(4 * BASE),
         (jax.random.uniform(key, (BATCH, 128, 128, 64), DTYPE),)),
        ("down_2", DownsampleBlock(8 * BASE),
         (jax.random.uniform(key, (BATCH, 64, 64, 128), DTYPE),)),
        ("up_2", UpsampleBlock(8 * BASE, 4 * BASE),
         (jax.random.uniform(key, (BATCH, 32, 32, 256), DTYPE),
          jax.random.uniform(key, (BATCH, 64, 64, 128), DTYPE))),
        ("up_1", UpsampleBlock(4 * BASE, 2 * BASE),
         (jax.random.uniform(key, (BATCH, 64, 64, 128), DTYPE),
          jax.random.uniform(key, (BATCH, 128, 128, 64), DTYPE))),
        ("up_0", UpsampleBlock(2 * BASE, BASE), (x1, x0)),
        ("output_block", OutputBlock(BASE, 3), (x0,)),
    ]:
        sec = timeit(jax.jit(lambda p, *v, m=mod: m.apply({"params": p}, *v)),
                     core[name], *args)
        tot += sec
        row(name, sec)
    print(f"  {'TOTAL glue':44s} {tot * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
