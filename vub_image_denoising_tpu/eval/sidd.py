"""SIDD validation evaluation + Kaggle benchmark submission.

- ``SIDDMatBlocks`` / ``evaluate_sidd`` — port of evaluate_SIDD/evaluate_SIDD.py: load
  ValidationNoisyBlocksSrgb.mat / ValidationGtBlocksSrgb.mat (keys of the same names),
  flatten the (image, patch) grid, normalize to [-1,1], run the diffusion
  ``improved_sampling`` per block, and report skimage-convention PSNR/SSIM with
  data_range=2 plus wall-clock ms per block (:43-78,134-136); results go to
  ``benchmark_results.csv`` (:139-148).
- ``make_kaggle_submission`` — port of evaluate_SIDD/benchmark.py: denoise the 40x32
  benchmark blocks, base64-encode each uint8 output block, write ``SubmitSrgb.csv``
  (:77-103) for kaggle.com/competitions/sidd-benchmark-srgb-psnr.

TPU-first deviation: blocks are processed in batches (the reference runs batch 1), and
metrics are computed on-device; per-block timing is reported as batch time / batch size.
"""

import base64
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import psnr_per_image, ssim_ref_per_image


class SIDDMatBlocks:
    """256x256 uint8 sRGB blocks from SIDD .mat files (evaluate_SIDD.py:18-41)."""

    def __init__(self, noisy_mat_file: str, gt_mat_file: Optional[str] = None,
                 noisy_key: str = "ValidationNoisyBlocksSrgb",
                 gt_key: str = "ValidationGtBlocksSrgb"):
        import scipy.io

        self.noisy = scipy.io.loadmat(noisy_mat_file)[noisy_key]  # (I, P, H, W, C) uint8
        self.gt = scipy.io.loadmat(gt_mat_file)[gt_key] if gt_mat_file else None

    @property
    def n_images(self):
        return self.noisy.shape[0]

    @property
    def n_patches(self):
        return self.noisy.shape[1]

    def __len__(self):
        return self.n_images * self.n_patches

    def __getitem__(self, idx):
        i, p = idx // self.n_patches, idx % self.n_patches
        if self.gt is None:
            return self.noisy[i, p]
        return self.noisy[i, p], self.gt[i, p]


def _normalize_blocks(blocks_u8):
    # NOTE: measured on the axon tunnel, a device_put(uint8) + jitted normalize is
    # SLOWER than this one-shot f32 path — the tunnel is roundtrip-latency-bound,
    # so fewer dispatches beat 4x fewer bytes
    return (jnp.asarray(blocks_u8, jnp.float32) / 255.0 - 0.5) / 0.5


def evaluate_sidd(
    sampler: Callable,
    blocks: SIDDMatBlocks,
    evaluation_percentage: float = 0.1,
    batch_size: int = 8,
    seed: int = 0,
    csv_path: Optional[str] = "benchmark_results.csv",
    method_name: str = "tpu-diffusion-rdunet",
    sample_plot_path: Optional[str] = None,
    n_samples: int = 4,
):
    """Run ``sampler(noisy_normalized) -> denoised`` over a random subset of blocks.

    Returns dict with avg_psnr / avg_ssim / avg_inference_time_ms (per block).
    With ``sample_plot_path``, saves debug triptychs of the first ``n_samples`` blocks
    (evaluate_SIDD.py:70-72, 84-100 collected samples 11..14; we take the first few).
    """
    assert blocks.gt is not None, "evaluation needs GT blocks"
    n = len(blocks)
    idx = np.random.RandomState(seed).choice(n, int(n * evaluation_percentage), replace=False)

    # metrics for a whole batch in ONE jitted call — per-image metric dispatches are
    # round-trip-bound on remote runtimes (evaluate_SIDD.py computes per block; the
    # values are identical)
    @jax.jit
    def batch_metrics(gt_b, out_b):
        return (
            psnr_per_image(gt_b, out_b, data_range=2.0),
            ssim_ref_per_image(gt_b, out_b, data_range=2.0),
        )

    batches = [idx[s : s + batch_size] for s in range(0, len(idx), batch_size)]

    def make_inputs(sel):
        noisy_u8 = np.stack([blocks[int(i)][0] for i in sel])
        gt_u8 = np.stack([blocks[int(i)][1] for i in sel])
        return _normalize_blocks(noisy_u8), _normalize_blocks(gt_u8)

    # Pipelined loop: batch k+1's host fetch + H2D transfer is dispatched before
    # blocking on batch k's compute (dispatch is async), overlapping the tunnel
    # transfer with the sampler — the per-block wall time the reference measures
    # (evaluate_SIDD.py:55-57) is otherwise transfer-dominated on this runtime.
    # Backpressure: at most MAX_IN_FLIGHT batches are un-synced at any moment
    # (syncing batch k-2's scalar metrics forces completion of its whole chain,
    # releasing its device buffers), so device memory stays O(1) in eval size.
    MAX_IN_FLIGHT = 2
    psnrs, ssims = [], []
    pending = []  # (psnr_vec, ssim_vec, count) — scalars only, big arrays released
    samples = []  # (noisy, gt, out) host triples for the debug plot
    first_inputs = None
    inputs = make_inputs(batches[0]) if batches else None
    # Warm up sampler + metrics on the first batch BEFORE the wall timer: with a
    # cold XLA cache the remote compile takes minutes and would swamp the
    # per-block number (the reference's timer also measures executed kernels
    # only — CUDA caches compiled kernels process-wide).  Reported separately.
    warmup_compile_ms = 0.0
    if inputs is not None:
        t_c0 = time.perf_counter()
        w_p, _ = batch_metrics(inputs[1], sampler(inputs[0]))
        jax.device_get(w_p)
        warmup_compile_ms = (time.perf_counter() - t_c0) * 1000.0
    t_loop0 = time.perf_counter()

    def sync(entry):
        p_vec, s_vec, cnt = entry
        return jax.device_get(p_vec), jax.device_get(s_vec), cnt

    for k, sel in enumerate(batches):
        if k == 0:
            first_inputs = inputs
        nxt = make_inputs(batches[k + 1]) if k + 1 < len(batches) else None
        noisy, gt = inputs
        out = sampler(noisy)
        p_vec, s_vec = batch_metrics(gt, out)
        pending.append((p_vec, s_vec, len(sel)))
        if sample_plot_path and len(samples) < n_samples:
            # collected across batches (evaluate_SIDD.py:70-72 gathers n_samples
            # blocks); device_get syncs these early batches, which is fine
            for j in range(min(noisy.shape[0], n_samples - len(samples))):
                samples.append((np.asarray(noisy[j]), np.asarray(gt[j]),
                                np.asarray(jax.device_get(out[j]))))
        if len(pending) > MAX_IN_FLIGHT:
            pending[-MAX_IN_FLIGHT - 1] = sync(pending[-MAX_IN_FLIGHT - 1])
        inputs = nxt
    # force completion of the tail (block_until_ready can return early on this
    # runtime; device_get is authoritative)
    pending = [e if isinstance(e[0], np.ndarray) else sync(e) for e in pending]
    wall_ms = (time.perf_counter() - t_loop0) * 1000.0

    n_eval = 0
    for p_vec, s_vec, cnt in pending:
        psnrs.extend(np.asarray(p_vec, np.float64).tolist())
        ssims.extend(np.asarray(s_vec, np.float64).tolist())
        n_eval += cnt

    # steady-state on-device latency, transfers excluded (device-resident input,
    # completion forced via device_get)
    device_ms = float("nan")
    if first_inputs is not None:
        noisy0 = first_inputs[0]
        _ = jax.device_get(sampler(noisy0)[0, 0, 0, 0])
        t0 = time.perf_counter()
        _ = jax.device_get(sampler(noisy0)[0, 0, 0, 0])
        device_ms = (time.perf_counter() - t0) * 1000.0 / noisy0.shape[0]

    results = {
        "avg_psnr": float(np.mean(psnrs)),
        "avg_ssim": float(np.mean(ssims)),
        "avg_inference_time_ms": wall_ms / max(1, n_eval),
        "device_inference_time_ms": device_ms,
        "warmup_compile_ms": warmup_compile_ms,  # first-call compile, excluded above
        "n_blocks": len(psnrs),
    }
    if csv_path:
        import pandas as pd

        pd.DataFrame(
            {
                "Method": [method_name],
                "MACs (G)": ["-"],
                "Inference Time (ms)": [results["avg_inference_time_ms"]],
                "PSNR": [results["avg_psnr"]],
                "SSIM": [results["avg_ssim"]],
            }
        ).to_csv(csv_path, index=False)
    if sample_plot_path and samples:
        plot_sample_images(samples, sample_plot_path)
    return results


def plot_sample_images(sample_images, path: str = "sidd_samples.png"):
    """Debug triptychs (noisy / GT / denoised) — evaluate_SIDD.py:84-100.

    ``sample_images``: list of (noisy, gt, output) HWC arrays in [-1, 1].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def denorm(img):
        return np.clip((np.asarray(img) + 1.0) / 2.0, 0, 1)

    n = len(sample_images)
    if n == 0:
        return None
    fig, axs = plt.subplots(n, 3, figsize=(15, 5 * n), squeeze=False)
    for i, (noisy, gt, output) in enumerate(sample_images):
        for j, (img, title) in enumerate(
            [(noisy, "Noisy"), (gt, "Ground Truth"), (output, "Denoised")]
        ):
            axs[i, j].imshow(denorm(img))
            axs[i, j].set_title(title)
            axs[i, j].axis("off")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
    return path


def array_to_base64string(x: np.ndarray) -> str:
    return base64.b64encode(x.tobytes()).decode("utf-8")


def base64string_to_array(s: str, array_dtype, array_shape) -> np.ndarray:
    return np.frombuffer(base64.b64decode(s), dtype=array_dtype).reshape(array_shape)


def make_kaggle_submission(
    sampler: Callable,
    benchmark_mat_file: str,
    output_file: str = "SubmitSrgb.csv",
    batch_size: int = 8,
):
    """Denoise BenchmarkNoisyBlocksSrgb blocks and emit the Kaggle CSV.

    ``sampler`` maps normalized [-1,1] blocks to denoised [-1,1]; outputs are
    denormalized and uint8-quantized exactly like the reference (benchmark.py:42-44:
    (x+1)/2 then clip(x*255, 0, 255).astype(uint8)).
    """
    import pandas as pd

    blocks = SIDDMatBlocks(benchmark_mat_file, None, noisy_key="BenchmarkNoisyBlocksSrgb")
    n = len(blocks)
    out_strings = []
    for start in range(0, n, batch_size):
        sel = range(start, min(start + batch_size, n))
        noisy_u8 = np.stack([blocks[i] for i in sel])
        out = sampler(_normalize_blocks(noisy_u8))
        out = np.asarray(jax.device_get(out), np.float32)
        out = (out + 1.0) / 2.0
        out_u8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)
        assert out_u8.shape == noisy_u8.shape and out_u8.dtype == noisy_u8.dtype
        out_strings.extend(array_to_base64string(out_u8[k]) for k in range(len(out_u8)))

    df = pd.DataFrame({"ID": np.arange(len(out_strings)), "BLOCK": out_strings})
    df.to_csv(output_file, index=False)
    return output_file
