"""Host data-pipeline microbench: decode cache + native gather vs the naive path.

Builds a synthetic DIV2K-like folder (large random PNGs), then times one epoch of
host-side batch fetches (no device work) three ways:
  naive        — per-item decode every patch (the reference CustomDataset cost model,
                 custom_dataset.py:74-81)
  cache        — decode LRU + per-item crop
  cache+native — decode LRU + one C++ batched gather per batch (native/patchio)

Run: python scripts/bench_host_pipeline.py [n_images] [batch]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")  # run from the repo root (cwd import; no PYTHONPATH on axon)


def main(n_images=6, batch=32):
    from PIL import Image

    from vub_image_denoising_tpu.data import FolderPatchDataset
    from vub_image_denoising_tpu.data import datasets as ds_mod
    from vub_image_denoising_tpu.native import _gather_numpy, native_available

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="host_pipe_bench_")
    for i in range(n_images):
        arr = rng.randint(0, 256, (1368, 2040, 3), dtype=np.uint8)  # DIV2K-ish
        Image.fromarray(arr).save(os.path.join(tmp, f"img_{i}.png"))

    ds = FolderPatchDataset(tmp, noise_levels=[15, 25, 50], use_rgb=True)
    order = np.random.RandomState(1).permutation(len(ds))
    batches = [order[b * batch : (b + 1) * batch] for b in range(len(ds) // batch)]
    print(f"# {n_images} images, {len(ds)} samples, {len(batches)} batches of {batch}")

    def run(label, fn):
        t0 = time.perf_counter()
        n = 0
        for idx in batches:
            out = fn(idx)
            n += out[0].shape[0] if isinstance(out, tuple) else len(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "path": label,
            "samples_per_s": round(n / dt, 1),
            "ms_per_batch": round(1e3 * dt / len(batches), 1),
        }))
        return dt

    def itemwise(idx):
        items = [ds[int(i)] for i in idx]
        return np.stack([c for c, _ in items]), np.asarray([s for _, s in items])

    # naive: kill the cache so every patch re-decodes its image
    cache = ds_mod._decode_cache
    saved_budget = cache.budget
    cache.budget = 0
    t_naive = run("naive", itemwise)

    cache.budget = saved_budget
    run("cache_warmup", itemwise)  # populate
    t_cache = run("cache", itemwise)
    t_native = run("cache+native", ds.gather_batch)
    if not native_available():
        print("# WARNING: native lib unavailable, cache+native ran the numpy fallback")
    print(json.dumps({
        "metric": "host_pipeline_speedup",
        "cache_vs_naive": round(t_naive / t_cache, 2),
        "native_vs_naive": round(t_naive / t_native, 2),
        "native_vs_cache": round(t_cache / t_native, 2),
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:3]])
