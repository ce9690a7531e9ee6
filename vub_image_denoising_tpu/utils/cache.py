"""Persistent XLA compilation cache.

First compiles of the 256² RDUNet graphs take minutes over this runtime's
remote-compile tunnel; with `jax_compilation_cache_dir` set they are written to
disk and subsequent processes reuse them (measured: bench.py 836 s -> 60 s).
Enabled by the benchmark, the driver entry points, and the CLIs.  Override the
location with ``VUB_JAX_CACHE_DIR`` (empty string disables).
"""

import os


def enable_compilation_cache() -> str:
    """Point JAX's persistent compilation cache at a writable directory.

    Uses jax.config.update (NOT the env var) because this environment's
    sitecustomize imports jax before user code runs, freezing env-derived
    config defaults.  Returns the directory used ('' if disabled).
    """
    path = os.environ.get("VUB_JAX_CACHE_DIR")
    if path == "":
        return ""
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "vub_jax_cache")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        return path
    except Exception:
        return ""
