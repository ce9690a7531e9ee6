"""Native host-runtime core: C++ batched patch gather with a numpy fallback.

Builds ``patchio.cpp`` once (g++ -O3 -shared, cached under ``~/.cache/vub_patchio``
keyed by source hash) and binds it via ctypes — no pybind11 dependency.  If the
toolchain is missing or ``VUB_NATIVE=0``, everything transparently falls back to
the pure-numpy path; callers never need to care.

API:
  gather_patches(frames, tops, lefts, patch) -> (n, patch, patch, C) uint8 batch
      frames: list of C-contiguous HWC uint8 arrays (one per patch; duplicates fine)
  native_available() -> bool
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "patchio.cpp")
_ABI = 1
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "VUB_NATIVE_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "vub_patchio")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"patchio_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".build{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)  # atomic: concurrent builders race benignly
    lib = ctypes.CDLL(so_path)
    lib.pio_abi_version.restype = ctypes.c_int64
    if lib.pio_abi_version() != _ABI:
        raise RuntimeError(f"patchio ABI mismatch: {lib.pio_abi_version()} != {_ABI}")
    lib.pio_gather_u8.restype = None
    lib.pio_gather_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),   # srcs
        ctypes.POINTER(ctypes.c_int64),    # src_row_bytes
        ctypes.POINTER(ctypes.c_int64),    # tops
        ctypes.POINTER(ctypes.c_int64),    # lefts
        ctypes.c_int64,                    # n
        ctypes.c_int64,                    # patch_h
        ctypes.c_int64,                    # patch_w
        ctypes.c_int64,                    # channels
        ctypes.c_void_p,                   # out
        ctypes.c_int64,                    # n_threads
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("VUB_NATIVE", "1") == "0":
            return None
        try:
            _lib = _build_and_load()
        except Exception:
            _lib = None  # no toolchain / sandbox: numpy fallback
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _gather_numpy(frames, tops, lefts, patch: int) -> np.ndarray:
    n = len(frames)
    c = frames[0].shape[-1]
    out = np.empty((n, patch, patch, c), np.uint8)
    for i in range(n):
        t, l = tops[i], lefts[i]
        out[i] = frames[i][t : t + patch, l : l + patch]
    return out


def gather_patches(
    frames: Sequence[np.ndarray],
    tops: Sequence[int],
    lefts: Sequence[int],
    patch: int,
    n_threads: Optional[int] = None,
) -> np.ndarray:
    """Copy ``len(frames)`` HWC uint8 patches into one contiguous batch.

    ``frames[i]`` must be uint8 with C-contiguous rows (contiguous last two dims);
    duplicates (many patches of one cached frame) are the common case.
    """
    n = len(frames)
    if n == 0:
        raise ValueError("gather_patches: empty batch")
    c = frames[0].shape[-1]
    lib = _get_lib()
    if lib is None:
        return _gather_numpy(frames, tops, lefts, patch)

    srcs = (ctypes.c_void_p * n)()
    row_bytes = (ctypes.c_int64 * n)()
    tops_c = (ctypes.c_int64 * n)()
    lefts_c = (ctypes.c_int64 * n)()
    for i, f in enumerate(frames):
        if (f.dtype != np.uint8 or f.ndim != 3 or f.shape[2] != c
                or f.strides[1] != f.shape[2] or f.strides[2] != 1):
            return _gather_numpy(frames, tops, lefts, patch)  # exotic layout: fallback
        # bounds check BEFORE handing raw pointers to C: a patch window past the
        # frame edge (e.g. SIDD origins indexed from a larger NOISY frame against
        # a smaller GT frame) must raise like the numpy path, not read OOB memory
        t, l = int(tops[i]), int(lefts[i])
        if t < 0 or l < 0 or t + patch > f.shape[0] or l + patch > f.shape[1]:
            raise ValueError(
                f"gather_patches: patch window [{t}:{t + patch}, {l}:{l + patch}] "
                f"exceeds frame {i} of shape {f.shape[:2]}"
            )
        srcs[i] = f.ctypes.data
        row_bytes[i] = f.strides[0]
        tops_c[i] = int(tops[i])
        lefts_c[i] = int(lefts[i])
    out = np.empty((n, patch, patch, c), np.uint8)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    lib.pio_gather_u8(
        srcs, row_bytes, tops_c, lefts_c, n, patch, patch, c,
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out
