"""C++/OpenMP MAS backend: build, ctypes binding, pure_callback bridge.

The shared library is compiled on first use with g++ -O3 -fopenmp (no
pybind11 in the image; plain C ABI + ctypes).  ``maximum_path_cpp`` wraps
it as a ``jax.pure_callback`` so it can sit inside a jitted training step —
this reproduces the reference's host-side MAS architecture
(monotonic_align/__init__.py:7-22) for CPU-rich hosts; the default backend
remains the on-device wavefront scan in ops/mas.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC = Path(__file__).parent / "cpp" / "mas.cc"
_BUILD_DIR = Path(__file__).parent / "cpp" / "build"


def _build_library() -> Path:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    so_path = _BUILD_DIR / "libmas.so"
    if so_path.exists() and so_path.stat().st_mtime >= _SRC.stat().st_mtime:
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           str(_SRC), "-o", str(so_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # -march=native can fail in emulated environments; retry generic
        cmd.remove("-march=native")
        subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def get_library():
    global _LIB
    with _LOCK:
        if _LIB is None:
            so_path = _build_library()
            lib = ctypes.CDLL(str(so_path))
            lib.maximum_path_c.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
            ]
            lib.maximum_path_c.restype = None
            _LIB = lib
    return _LIB


def maximum_path_host(value: np.ndarray, mask: np.ndarray, max_neg_val: float = -1e9) -> np.ndarray:
    """Host-side batched MAS (numpy in/out)."""
    lib = get_library()
    value = np.ascontiguousarray(np.asarray(value, np.float32) * np.asarray(mask, np.float32))
    b, t_x_max, t_y_max = value.shape
    paths = np.zeros((b, t_x_max, t_y_max), np.int32)
    t_xs = np.ascontiguousarray(mask[:, :, 0].sum(axis=1).astype(np.int32))
    t_ys = np.ascontiguousarray(mask[:, 0, :].sum(axis=1).astype(np.int32))
    lib.maximum_path_c(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_x_max, t_y_max, np.float32(max_neg_val),
    )
    return paths.astype(np.float32)


def maximum_path_cpp(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """jit-compatible wrapper: device→host callback→device.

    This is the reference's architecture (GPU→CPU→GPU each step); prefer the
    on-device backend unless the host has many cores and the batch is large.
    """
    get_library()  # build eagerly so trace-time failures surface clearly

    def cb(v, m):
        return maximum_path_host(np.asarray(v), np.asarray(m)).astype(np.float32)

    out_shape = jax.ShapeDtypeStruct(value.shape, jnp.float32)
    path = jax.pure_callback(cb, out_shape, value, mask, vmap_method="sequential")
    return path.astype(value.dtype) * mask
