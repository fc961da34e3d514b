"""ctypes binding for the native image pipeline (csrc/zsg_image.cpp).

Builds ``libzsgimage.so`` on first use (cached beside the source; plain
``make`` — no pybind11 needed, the ABI is 5 C functions). Every entry
point degrades gracefully: if the compiler or zlib is missing, or a file
is not a decodable PNG (JPEG, 16-bit, interlaced), callers fall back to
PIL via the return value — the two paths produce byte-comparable output
(Pillow-algorithm resampling; tests/test_native.py pins ≤2/255 max
difference).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libzsgimage.so"
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime < (_CSRC / "zsg_image.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["make", "-s", "-C", str(_CSRC)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.zsg_png_load.restype = ctypes.c_int
        lib.zsg_png_load.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.zsg_resize_normalize_rgb.restype = ctypes.c_int
        lib.zsg_resize_normalize_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.zsg_image_load.restype = ctypes.c_int
        lib.zsg_image_load.argtypes = lib.zsg_png_load.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.zsg_image_load_u8.restype = ctypes.c_int
        lib.zsg_image_load_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.zsg_has_jpeg.restype = ctypes.c_int
        lib.zsg_has_jpeg.argtypes = []
        lib.zsg_png_load_u8.restype = ctypes.c_int
        lib.zsg_png_load_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.zsg_resize_u8.restype = ctypes.c_int
        lib.zsg_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def has_jpeg() -> bool:
    """True when the compiled library carries libjpeg decode."""
    lib = _load()
    return bool(lib is not None and lib.zsg_has_jpeg())


def image_load(
    img_bytes: bytes, out_hw: tuple[int, int], mean: np.ndarray, std: np.ndarray
) -> tuple[np.ndarray, tuple[int, int]] | None:
    """PNG/JPEG bytes (format sniffed) → (normalized float32 (H, W, 3),
    original (h, w)), or None if the native path can't handle this file
    (caller → PIL). JPEG decode rides the same libjpeg PIL links, so the
    two paths are byte-identical (tests/test_native.py)."""
    lib = _load()
    if lib is None:
        return None
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, 3), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    orig_h = ctypes.c_int(0)
    orig_w = ctypes.c_int(0)
    rc = lib.zsg_image_load(
        img_bytes, len(img_bytes), oh, ow,
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(orig_h), ctypes.byref(orig_w),
    )
    if rc != 0:
        return None
    return out, (orig_h.value, orig_w.value)


def image_load_u8(
    img_bytes: bytes, out_hw: tuple[int, int]
) -> tuple[np.ndarray, tuple[int, int]] | None:
    """PNG/JPEG bytes (format sniffed) → (resized uint8 (H, W, 3),
    original (h, w)), or None (caller → PIL)."""
    lib = _load()
    if lib is None:
        return None
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, 3), np.uint8)
    orig_h = ctypes.c_int(0)
    orig_w = ctypes.c_int(0)
    rc = lib.zsg_image_load_u8(
        img_bytes, len(img_bytes), oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(orig_h), ctypes.byref(orig_w),
    )
    if rc != 0:
        return None
    return out, (orig_h.value, orig_w.value)


def png_load(
    png_bytes: bytes, out_hw: tuple[int, int], mean: np.ndarray, std: np.ndarray
) -> tuple[np.ndarray, tuple[int, int]] | None:
    """PNG bytes → (normalized float32 (H, W, 3), original (h, w)), or
    None if the native path can't handle this file (caller → PIL)."""
    lib = _load()
    if lib is None:
        return None
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, 3), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    orig_h = ctypes.c_int(0)
    orig_w = ctypes.c_int(0)
    rc = lib.zsg_png_load(
        png_bytes, len(png_bytes), oh, ow,
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(orig_h), ctypes.byref(orig_w),
    )
    if rc != 0:
        return None
    return out, (orig_h.value, orig_w.value)


def png_load_u8(
    png_bytes: bytes, out_hw: tuple[int, int]
) -> tuple[np.ndarray, tuple[int, int]] | None:
    """PNG bytes → (resized uint8 (H, W, 3), original (h, w)), or None."""
    lib = _load()
    if lib is None:
        return None
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, 3), np.uint8)
    orig_h = ctypes.c_int(0)
    orig_w = ctypes.c_int(0)
    rc = lib.zsg_png_load_u8(
        png_bytes, len(png_bytes), oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(orig_h), ctypes.byref(orig_w),
    )
    if rc != 0:
        return None
    return out, (orig_h.value, orig_w.value)


def resize_u8(rgb: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray | None:
    """(h, w, 3) uint8 → resized uint8 (H, W, 3) (Pillow bilinear), or None."""
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.zsg_resize_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def resize_normalize_rgb(
    rgb: np.ndarray, out_hw: tuple[int, int], mean: np.ndarray, std: np.ndarray
) -> np.ndarray | None:
    """(h, w, 3) uint8 → normalized float32 (H, W, 3), or None.

    Used for non-PNG formats: PIL decodes, native code does the (hotter)
    resample+normalize stage.
    """
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, 3), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    rc = lib.zsg_resize_normalize_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, oh, ow,
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None
