"""Dispatch-overhead census of the bench inference path.

The axon runtime charges a fixed ~0.25 ms per EXECUTED top-level HLO op
(CLAUDE.md / BASELINE.md).  bench.py's best engine runs 130 ms/iter at
batch 128 — if the compiled executable holds K top-level ops, K x 0.25 ms
of that is pure dispatch, and kernel-COUNT reduction (not FLOP-rate work)
would be the remaining inference lever.  This probe compiles the flax and
xla-opt forwards at the bench config, counts entry-computation instructions
post-optimization, and (on the real chip) times one iter to put the estimate
next to reality.

Run from repo root: python scripts/profile_opcount.py  [--batch 128]
"""

import argparse
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OVERHEAD_MS = 0.25  # measured fixed per-executed-op cost of this runtime


def entry_census(compiled) -> Counter:
    """Count instructions in the ENTRY computation of optimized HLO only —
    nested fusion bodies execute as part of their fusion kernel, so entry
    instructions are the closest text-level proxy for executed ops."""
    ops = Counter()
    in_entry = False
    for line in compiled.as_text().splitlines():
        s = line.strip()
        if s.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if s.startswith("}"):
                break
            if "=" in s:
                rhs = s.split("=", 1)[1].strip()
                # "f32[...] opname(...)" — opname is the 2nd token
                parts = rhs.split(" ", 1)
                if len(parts) == 2:
                    name = parts[1].split("(", 1)[0].strip()
                    ops[name.split(".")[0]] += 1
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--base-filters", type=int, default=32)
    ap.add_argument("--time", action="store_true", help="also time 5 iters")
    args = ap.parse_args()

    from vub_image_denoising_tpu.models import RDUNet, rdunet_apply_fused

    model = RDUNet(channels=3, base_filters=args.base_filters)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        key, (args.batch, args.size, args.size, 3), jnp.bfloat16) * 2 - 1
    params = jax.jit(model.init)(key, jnp.zeros((1, args.size, args.size, 3)))

    fns = {
        "flax": jax.jit(model.apply),
        "xla-opt": jax.jit(lambda v, xx: rdunet_apply_fused(v, xx, engine="xla")),
    }
    for name, fn in fns.items():
        compiled = fn.lower(params, x).compile()
        ops = entry_census(compiled)
        # parameters/constants/tuple plumbing are not executed kernels
        non_kernel = ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast", "after-all")
        total = sum(c for op, c in ops.items() if op not in non_kernel)
        print(f"\n{name}: {total} entry-computation ops "
              f"=> est dispatch floor {total * OVERHEAD_MS:.1f} ms/iter "
              f"at {OVERHEAD_MS} ms/op", flush=True)
        for op, cnt in ops.most_common(12):
            print(f"  {op:28s} {cnt}", flush=True)
        if args.time:
            for _ in range(2):
                jax.device_get(fn(params, x)[0, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(5):
                y = fn(params, x)
            jax.device_get(y[0, 0, 0, 0])
            ms = (time.perf_counter() - t0) / 5 * 1e3
            print(f"  measured {ms:.1f} ms/iter "
                  f"({args.batch * args.size**2 / 1e6 / (ms / 1e3):.1f} MP/s)",
                  flush=True)


if __name__ == "__main__":
    main()
