"""Tracing / telemetry (SURVEY.md §5 'tracing/profiling').

The reference's profiling is ad-hoc wall-clock + CUDA sync
(evaluate_Unet_diffusion/evaluate_model.py:126-143, evaluate_SIDD.py:55-57, info.py).
TPU-native equivalents:

- ``trace``            — context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory (xplane) for the wrapped region.
- ``StepTimer``        — per-step telemetry: wall-clock, throughput in megapixels/sec
  (the north-star unit, BASELINE.md) and moving averages; call ``tick`` once per step
  after forcing completion.
- ``force_completion`` — fetches one element of a pytree's first leaf; on this runtime
  ``block_until_ready`` can return before remote execution finishes, so timing must
  force a device->host read.
"""

import contextlib
import time
from collections import deque
from typing import Optional

import jax


def force_completion(tree):
    """Force execution to finish by fetching one element to the host."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Profile a region: ``with trace('runs/profile'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step telemetry with MP/s accounting."""

    def __init__(self, pixels_per_step: float, window: int = 50, writer=None,
                 tag: str = "throughput/mp_per_s"):
        self.pixels_per_step = pixels_per_step
        self.times = deque(maxlen=window)
        self.writer = writer
        self.tag = tag
        self._t0: Optional[float] = None
        self.steps = 0

    def start(self):
        self._t0 = time.perf_counter()

    def tick(self, result=None):
        """Call after each step (optionally passing the step output to force)."""
        if result is not None:
            force_completion(result)
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
            self.steps += 1
            if self.writer is not None:
                self.writer.add_scalar(self.tag, self.mp_per_s, self.steps)
        self._t0 = now

    @property
    def avg_step_sec(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def mp_per_s(self) -> float:
        s = self.avg_step_sec
        return self.pixels_per_step / s / 1e6 if s and s > 0 else float("nan")
