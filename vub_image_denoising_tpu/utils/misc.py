"""Misc utilities mirroring the reference's small scripts (SURVEY.md C25).

- ``clear_runs``       — clear_runs.py:1-11 (rm -rf the TensorBoard runs dir).
- ``probe_devices``    — test_cuda.py:3-13 equivalent: print the JAX backend and
  devices (TPU instead of CUDA).
- ``summarize_dataset``— dataset_creation/test.py:6-40: image/patch/sample counts for a
  folder dataset.
- ``probe_mat``        — evaluate_SIDD/test.py:1-8: load a ``.mat`` file and print its
  keys (the format probe used before wiring a new SIDD blocks file into the
  evaluator).
"""

import os
import shutil

import jax


def clear_runs(runs_dir: str = "runs"):
    if os.path.isdir(runs_dir):
        shutil.rmtree(runs_dir)
        print(f"Removed '{runs_dir}'")
    else:
        print(f"No '{runs_dir}' directory found")


def probe_devices():
    print(f"backend: {jax.default_backend()}")
    devices = jax.devices()
    print(f"device count: {len(devices)}")
    for d in devices:
        print(f"  {d}")
    return devices


def probe_mat(mat_file: str):
    """Print (and return) a ``.mat`` file's keys — evaluate_SIDD/test.py:1-8."""
    import scipy.io

    keys = list(scipy.io.loadmat(mat_file).keys())
    print(keys)
    return keys


def summarize_dataset(image_folder: str, noise_levels=None, use_rgb: bool = True):
    from ..data.datasets import FolderPatchDataset

    ds = FolderPatchDataset(image_folder, noise_levels=noise_levels, use_rgb=use_rgb)
    info = {
        "images": len(ds.image_paths),
        "patches": len(ds.patches),
        "noise_levels": ds.noise_levels,
        "samples": len(ds),
    }
    for k, v in info.items():
        print(f"{k}: {v}")
    return info
