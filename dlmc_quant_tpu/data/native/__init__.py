"""ctypes binding for the native (C++) data-pipeline kernels.

Builds ``_libdlmcq_data.so`` from ``augment.cpp`` with g++ on first use
(cached next to the source; rebuilt when the source is newer).  Falls
back silently when no compiler is available — callers check
:func:`available` and use the numpy path otherwise.

The native batch assembly fuses gather + pad-crop + flip + normalize in
one threaded pass (see augment.cpp).  Crop/flip randomness is drawn by
the caller from its numpy Generator, so native and numpy paths are
bit-exact for the same seed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "augment.cpp"
_LIB = _HERE / "_libdlmcq_data.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB), str(_SRC), "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DLMCQ_NO_NATIVE") == "1":
            return None
        try:
            if (not _LIB.exists()
                    or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
                if not _build():
                    return None
            lib = ctypes.CDLL(str(_LIB))
            lib.dlmcq_abi_version.restype = ctypes.c_int
            if lib.dlmcq_abi_version() != 1:
                return None
            lib.dlmcq_augment.restype = ctypes.c_int
            lib.dlmcq_augment.argtypes = [
                ctypes.c_void_p, ctypes.c_int,                  # images, is_u8
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # h w c
                ctypes.c_void_p, ctypes.c_int64,                 # idx, n
                ctypes.c_int,                                    # pad
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # oy ox flip
                ctypes.c_void_p, ctypes.c_void_p,                # mean std
                ctypes.c_int, ctypes.c_int,                      # scale255, threads
                ctypes.c_void_p,                                 # out
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: Optional[np.ndarray]):
    return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None


def augment_gather(images: np.ndarray, idx: np.ndarray, *,
                   pad: int = 0,
                   oy: Optional[np.ndarray] = None,
                   ox: Optional[np.ndarray] = None,
                   flip: Optional[np.ndarray] = None,
                   mean: Optional[np.ndarray] = None,
                   std: Optional[np.ndarray] = None,
                   scale255: bool = False,
                   n_threads: int = 0) -> np.ndarray:
    """Fused gather[idx] + zero-pad crop + hflip + normalize → f32 NHWC.

    ``oy``/``ox`` are crop offsets in [0, 2*pad] (padded coords),
    ``flip`` a bool/uint8 mask — all length len(idx); required iff
    ``pad > 0`` / flipping is wanted.  Raises RuntimeError when the
    native library is unavailable (callers guard with available()).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native data pipeline unavailable")
    images = np.ascontiguousarray(images)
    is_u8 = images.dtype == np.uint8
    if not is_u8:
        images = images.astype(np.float32, copy=False)
    n_total, h, w, c = images.shape
    idx = np.ascontiguousarray(idx, np.int64)
    n = len(idx)
    out = np.empty((n, h, w, c), np.float32)
    oy32 = np.ascontiguousarray(oy, np.int32) if oy is not None else None
    ox32 = np.ascontiguousarray(ox, np.int32) if ox is not None else None
    fl8 = np.ascontiguousarray(flip, np.uint8) if flip is not None else None
    mean32 = (np.ascontiguousarray(np.broadcast_to(mean, (c,)), np.float32)
              if mean is not None else None)
    std32 = (np.ascontiguousarray(np.broadcast_to(std, (c,)), np.float32)
             if mean is not None else None)
    if pad > 0 and (oy32 is None or ox32 is None):
        raise ValueError("pad > 0 requires oy/ox offsets")
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    rc = lib.dlmcq_augment(
        _ptr(images), int(is_u8), h, w, c, _ptr(idx), n, pad,
        _ptr(oy32), _ptr(ox32), _ptr(fl8), _ptr(mean32), _ptr(std32),
        int(scale255), n_threads, _ptr(out))
    if rc != 0:
        raise RuntimeError(f"dlmcq_augment failed with rc={rc}")
    return out


# ---------------------------------------------------------------------------
# native JPEG decode (separate .so: needs -ljpeg, which may be absent)
# ---------------------------------------------------------------------------

_JPEG_SRC = _HERE / "jpegdec.cpp"
_JPEG_LIB = _HERE / "_libdlmcq_jpeg.so"
_jpeg_lock = threading.Lock()
_jpeg_lib = None
_jpeg_tried = False


def _jpeg_build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_JPEG_LIB), str(_JPEG_SRC), "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _jpeg_load():
    global _jpeg_lib, _jpeg_tried
    with _jpeg_lock:
        if _jpeg_lib is not None or _jpeg_tried:
            return _jpeg_lib
        _jpeg_tried = True
        if os.environ.get("DLMCQ_NO_NATIVE") == "1":
            return None
        try:
            if (not _JPEG_LIB.exists()
                    or _JPEG_LIB.stat().st_mtime < _JPEG_SRC.stat().st_mtime):
                if not _jpeg_build():
                    return None
            lib = ctypes.CDLL(str(_JPEG_LIB))
            lib.dlmcq_jpeg_abi_version.restype = ctypes.c_int
            if lib.dlmcq_jpeg_abi_version() != 1:
                return None
            lib.dlmcq_jpeg_dims.restype = ctypes.c_int
            lib.dlmcq_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dlmcq_decode_resize.restype = ctypes.c_int
            lib.dlmcq_decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            _jpeg_lib = lib
        except OSError:
            _jpeg_lib = None
        return _jpeg_lib


def jpeg_available() -> bool:
    return _jpeg_load() is not None


def jpeg_dims(data: bytes):
    """(width, height) from a JPEG byte buffer, or None on failure."""
    lib = _jpeg_load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.dlmcq_jpeg_dims(data, len(data), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def jpeg_decode_resize(data: bytes, crop, out_size, flip: bool = False):
    """Decode + crop + bilinear resize a JPEG buffer natively.

    ``crop`` is (left, top, w, h) in original image coordinates or None
    for the full frame; ``out_size`` is (out_h, out_w).  Uses libjpeg
    DCT scaling (1/2..1/8 decode) when the target is much smaller.
    Returns u8 RGB (out_h, out_w, 3), or None on failure (caller falls
    back to PIL).  The ctypes call releases the GIL, so the Python
    decode pool parallelizes across cores.
    """
    lib = _jpeg_load()
    if lib is None:
        return None
    oh, ow = out_size
    cl, ct, cw, ch = crop if crop is not None else (0, 0, -1, -1)
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.dlmcq_decode_resize(data, len(data), int(cl), int(ct),
                                 int(cw), int(ch), int(ow), int(oh),
                                 int(bool(flip)), _ptr(out))
    return out if rc == 0 else None
