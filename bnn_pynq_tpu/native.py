"""ctypes bindings for the native host runtime (native/src/bnn_host.cpp).

The reference exposes its C++ host runtime to Python via cffi
(SURVEY.md C11 «main_python.cpp» extern-C ABI); this module is the
equivalent bridge. Every function has a numpy fallback so the package
works before `make -C native` has run; `available()` reports which path
is active and tests assert native ≡ numpy bit-exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbnn_host.so")

_lib: Optional[ctypes.CDLL] = None


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c_i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bnn_binarize_pack_u8.argtypes = [u8p, u32p, c_i64, c_i64,
                                         ctypes.c_uint8]
    lib.bnn_center_int8.argtypes = [u8p, i8p, c_i64]
    lib.bnn_pack_bits_i8.argtypes = [i8p, u32p, c_i64, c_i64]
    lib.bnn_pack_codes2_i8.argtypes = [i8p, u32p, c_i64, c_i64]
    lib.bnn_argmax_f32.argtypes = [f32p, c_i64, c_i64, i32p]
    lib.bnn_resize_nn_u8.argtypes = [u8p, u8p] + [c_i64] * 6
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Build the native library in-tree; returns success."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def binarize_pack(imgs: np.ndarray, thresh: int = 128) -> np.ndarray:
    """uint8 [N, len] → packed bipolar uint32 [N, ceil(len/32)]."""
    imgs = np.ascontiguousarray(imgs.reshape(imgs.shape[0], -1),
                                dtype=np.uint8)
    n, length = imgs.shape
    words = -(-length // 32)
    lib = _try_load()
    if lib is None:
        bits = (imgs >= thresh)
        pad = words * 32 - length
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        return (bits.reshape(n, words, 32).astype(np.uint32)
                << np.arange(32, dtype=np.uint32)).sum(-1).astype(np.uint32)
    out = np.empty((n, words), dtype=np.uint32)
    lib.bnn_binarize_pack_u8(imgs, out, n, length, thresh)
    return out


def center_int8(imgs: np.ndarray) -> np.ndarray:
    """uint8 → int8 (x - 128), shape-preserving."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    lib = _try_load()
    if lib is None:
        return (imgs.astype(np.int32) - 128).astype(np.int8)
    out = np.empty(imgs.shape, dtype=np.int8)
    lib.bnn_center_int8(imgs.reshape(-1), out.reshape(-1), imgs.size)
    return out


def pack_bits(vals: np.ndarray) -> np.ndarray:
    """±1 int8 [R, K] → uint32 [R, ceil(K/32)] (bit = v > 0)."""
    vals = np.ascontiguousarray(vals, dtype=np.int8)
    r, k = vals.shape
    words = -(-k // 32)
    lib = _try_load()
    if lib is None:
        from bnn_pynq_tpu.ops.packing import np_pack_bits
        return np_pack_bits(vals, axis=-1)
    out = np.empty((r, words), dtype=np.uint32)
    lib.bnn_pack_bits_i8(vals, out, r, k)
    return out


def pack_codes2(codes: np.ndarray) -> np.ndarray:
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    r, k = codes.shape
    words = -(-k // 16)
    lib = _try_load()
    if lib is None:
        from bnn_pynq_tpu.ops.packing import np_pack_codes2
        return np_pack_codes2(codes, axis=-1)
    out = np.empty((r, words), dtype=np.uint32)
    lib.bnn_pack_codes2_i8(codes, out, r, k)
    return out


def argmax(logits: np.ndarray) -> np.ndarray:
    logits = np.ascontiguousarray(logits, dtype=np.float32)
    n, ncls = logits.shape
    lib = _try_load()
    if lib is None:
        return logits.argmax(-1).astype(np.int32)
    out = np.empty(n, dtype=np.int32)
    lib.bnn_argmax_f32(logits, n, ncls, out)
    return out


def resize_nn(imgs: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Nearest-neighbour resize uint8 [N,H,W,C] → [N,oh,ow,C]."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = imgs.shape
    lib = _try_load()
    if lib is None:
        ys = np.minimum(h - 1, np.arange(oh) * h // oh)
        xs = np.minimum(w - 1, np.arange(ow) * w // ow)
        return imgs[:, ys][:, :, xs]
    out = np.empty((n, oh, ow, c), dtype=np.uint8)
    lib.bnn_resize_nn_u8(imgs.reshape(-1), out.reshape(-1), n, h, w, c,
                         oh, ow)
    return out
