"""ctypes bindings for the native host-resampling library (native/resample.cpp).

The .so is built on demand with g++ (cached by source hash under
``~/.cache/nextou_tpu/``) — no pybind11/pip machinery. Every entry point has
the scipy call it replaces as its contract; callers fall back to scipy when
the toolchain or library is unavailable (``available()`` is False) or when
``NEXTOU_NATIVE=0``.

Threading: ops take the line/slice loop across ``os.cpu_count()`` threads
(ctypes releases the GIL during the call).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "resample.cpp",
)

_lib = None
_tried = False


def _build() -> str | None:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser(os.environ.get("NEXTOU_CACHE", "~/.cache/nextou_tpu"))
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"libnextou_native_{tag}.so")
    if os.path.exists(so):
        return so
    # build into the cache dir itself: os.replace across filesystems
    # (tmpfs /tmp -> cache) raises EXDEV, which must not escape available()
    tmp = so + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, so)
    except Exception as e:  # compiler missing / failed: scipy fallback
        print(f"[nextou_tpu.native] build failed: {e}", file=sys.stderr)
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return so


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("NEXTOU_NATIVE", "1") == "0":
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.nxt_zoom_f32.argtypes = [
        f32p, i64p, f32p, i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.nxt_zoom_f32.restype = ctypes.c_int
    lib.nxt_affine_f32.argtypes = [
        f32p, i64p, ctypes.c_int, f64p, f64p, f32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    lib.nxt_affine_f32.restype = ctypes.c_int
    lib.nxt_gaussian_f32.argtypes = [
        f32p, i64p, ctypes.c_int, ctypes.c_double, f32p, ctypes.c_int
    ]
    lib.nxt_gaussian_f32.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    return max(1, os.cpu_count() or 1)


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64(shape):
    a = np.asarray(shape, dtype=np.int64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def zoom_to_shape(x: np.ndarray, out_shape, order: int) -> np.ndarray:
    """`scipy.ndimage.zoom` to an explicit output shape (orders 0/1/3)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(tuple(out_shape), np.float32)
    ishape, ip = _i64(x.shape)
    oshape, op = _i64(out.shape)
    rc = lib.nxt_zoom_f32(
        _f32p(x), ip, _f32p(out), op, x.ndim, int(order), _threads()
    )
    if rc != 0:
        raise RuntimeError(f"nxt_zoom_f32 failed (rc={rc})")
    return out


def affine_transform(
    x: np.ndarray, mat: np.ndarray, offset: np.ndarray, order: int,
    mode: str, cval: float = 0.0,
) -> np.ndarray:
    """`scipy.ndimage.affine_transform` (orders 0/1; reflect/constant)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, dtype=np.float32)
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    off = np.ascontiguousarray(offset, dtype=np.float64)
    out = np.empty_like(x)
    shape, sp = _i64(x.shape)
    rc = lib.nxt_affine_f32(
        _f32p(x), sp, x.ndim,
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _f32p(out), int(order), {"reflect": 0, "constant": 1}[mode],
        float(cval), _threads(),
    )
    if rc != 0:
        raise RuntimeError(f"nxt_affine_f32 failed (rc={rc})")
    return out


def gaussian_filter(x: np.ndarray, sigma: float) -> np.ndarray:
    """`scipy.ndimage.gaussian_filter` ('reflect', truncate=4)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty_like(x)
    shape, sp = _i64(x.shape)
    rc = lib.nxt_gaussian_f32(
        _f32p(x), sp, x.ndim, float(sigma), _f32p(out), _threads()
    )
    if rc != 0:
        raise RuntimeError(f"nxt_gaussian_f32 failed (rc={rc})")
    return out
