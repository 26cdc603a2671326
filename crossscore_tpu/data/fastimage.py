"""ctypes bindings for the native image-decode core (native/fastimage.cpp).

Auto-builds ``libfastimage.so`` on first use (g++ + libpng are part of the
image); every loader falls back to the PIL/numpy path if the native library is
unavailable, so the framework never hard-depends on the toolchain.

The C calls release the GIL, so the loader's thread pool gets true decode
parallelism — the reference pays multiprocessing (worker pickling) for the
same effect (reference ``config/data/combined_training.yaml:4``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libfastimage.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "fastimage.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CROSSSCORE_NO_NATIVE"):
            return None
        try:
            if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < (
                _NATIVE_DIR / "fastimage.cpp"
            ).stat().st_mtime:
                if not _build():
                    return None
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.fi_image_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
            lib.fi_image_info.restype = ctypes.c_int
            lib.fi_load_rgb.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.fi_load_rgb.restype = ctypes.c_int
            lib.fi_load_metric.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.fi_load_metric.restype = ctypes.c_int
            # in-memory (record-shard payload) variants
            lib.fi_image_info_mem.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t
            ] + [ctypes.POINTER(ctypes.c_int)] * 4
            lib.fi_image_info_mem.restype = ctypes.c_int
            lib.fi_load_rgb_mem.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.fi_load_rgb_mem.restype = ctypes.c_int
            lib.fi_load_metric_mem.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.fi_load_metric_mem.restype = ctypes.c_int
            # pre-decoded raw-tensor payload variants (decoded record shards)
            lib.fi_raw_info.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t
            ] + [ctypes.POINTER(ctypes.c_int)] * 4
            lib.fi_raw_info.restype = ctypes.c_int
            lib.fi_load_rgb_raw.argtypes = list(lib.fi_load_rgb_mem.argtypes)
            lib.fi_load_rgb_raw.restype = ctypes.c_int
            lib.fi_load_metric_raw.argtypes = list(lib.fi_load_metric_mem.argtypes)
            lib.fi_load_metric_raw.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


# Pre-decoded raw-tensor payload magic (data/records.py decoded shards):
# "CSRT" + u8 version + u8 dtype(0=u8,1=u16) + u8 channels + u8 pad +
# u32le h + u32le w + C-order tensor bytes. The *_bytes loaders below sniff
# this and skip PNG inflate entirely — a decoded-shard sample costs a pread
# plus one fused crop/normalise pass in C.
RAW_MAGIC = b"CSRT"


def payload_is_raw(data: bytes) -> bool:
    return data[:4] == RAW_MAGIC


def image_info(path: str) -> tuple[int, int, int, int]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int(); b = ctypes.c_int()
    rc = lib.fi_image_info(str(path).encode(), h, w, c, b)
    if rc:
        raise IOError(f"fi_image_info({path}) failed rc={rc}")
    return h.value, w.value, c.value, b.value


def image_info_bytes(data: bytes) -> tuple[int, int, int, int]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int(); b = ctypes.c_int()
    fn = lib.fi_raw_info if payload_is_raw(data) else lib.fi_image_info_mem
    rc = fn(data, len(data), h, w, c, b)
    if rc:
        raise IOError(f"image_info_bytes failed rc={rc}")
    return h.value, w.value, c.value, b.value


def load_rgb_bytes(
    data: bytes,
    resize_hw: Optional[tuple[int, int]] = None,
    crop: Optional[tuple[int, int, int, int]] = None,
    normalize: bool = True,
    out: Optional[np.ndarray] = None,
    as_uint8: bool = False,
) -> np.ndarray:
    """``load_rgb`` decoding from an in-memory PNG payload (record shards)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    rh, rw = resize_hw if resize_hw else (0, 0)
    if crop:
        ci, cj, ch, cw = crop
        ch_arg, cw_arg = ch, cw
    else:
        ci = cj = ch_arg = cw_arg = 0
        if resize_hw:
            ch, cw = rh, rw
        else:
            h, w, _, _ = image_info_bytes(data)
            ch, cw = h, w
    mode = 2 if as_uint8 else int(normalize)
    if out is None:
        out = np.empty((ch, cw, 3), np.uint8 if as_uint8 else np.float32)
    fn = lib.fi_load_rgb_raw if payload_is_raw(data) else lib.fi_load_rgb_mem
    rc = fn(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rh, rw, ci, cj, ch_arg, cw_arg, mode,
    )
    if rc:
        raise IOError(f"load_rgb_bytes failed rc={rc}")
    return out


def load_metric_bytes(
    data: bytes,
    vrange: list,
    clamp01: bool = False,
    square: bool = False,
    resize_hw: Optional[tuple[int, int]] = None,
    crop: Optional[tuple[int, int, int, int]] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """``load_metric`` decoding from an in-memory PNG payload (record shards)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    mode = 0 if list(vrange) == [0, 1] else 1
    rh, rw = resize_hw if resize_hw else (0, 0)
    if crop:
        ci, cj, ch, cw = crop
        ch_arg, cw_arg = ch, cw
    else:
        ci = cj = ch_arg = cw_arg = 0
        if resize_hw:
            ch, cw = rh, rw
        else:
            h, w, _, _ = image_info_bytes(data)
            ch, cw = h, w
    if out is None:
        out = np.empty((ch, cw), np.float32)
    fn = lib.fi_load_metric_raw if payload_is_raw(data) else lib.fi_load_metric_mem
    rc = fn(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mode, int(clamp01), int(square), rh, rw, ci, cj, ch_arg, cw_arg,
    )
    if rc:
        raise IOError(f"load_metric_bytes failed rc={rc}")
    return out


def load_rgb(
    path: str,
    resize_hw: Optional[tuple[int, int]] = None,
    crop: Optional[tuple[int, int, int, int]] = None,
    normalize: bool = True,
    out: Optional[np.ndarray] = None,
    as_uint8: bool = False,
) -> np.ndarray:
    """Fused decode(+resize)(+crop)(+ImageNet-normalise) -> float32 HWC(3).

    ``as_uint8=True`` (overrides ``normalize``) returns raw uint8 pixels —
    the wire-compact loader path: normalisation happens on DEVICE
    (models/crossscore.py), so the batch ships at 1/4 the bytes. Without a
    resize the crop is byte-exact; with one, the bilinear output is
    re-quantised to 8 bits (<=0.5/255 per channel).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    rh, rw = resize_hw if resize_hw else (0, 0)
    if crop:
        ci, cj, ch, cw = crop
        ch_arg, cw_arg = ch, cw
    else:
        ci = cj = ch_arg = cw_arg = 0
        if resize_hw:
            ch, cw = rh, rw
        else:
            h, w, _, _ = image_info(path)
            ch, cw = h, w

    mode = 2 if as_uint8 else int(normalize)
    if out is None:
        out = np.empty((ch, cw, 3), np.uint8 if as_uint8 else np.float32)
    rc = lib.fi_load_rgb(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rh, rw, ci, cj, ch_arg, cw_arg, mode,
    )
    if rc:
        raise IOError(f"fi_load_rgb({path}) failed rc={rc}")
    return out


def load_metric(
    path: str,
    vrange: list,
    clamp01: bool = False,
    square: bool = False,
    resize_hw: Optional[tuple[int, int]] = None,
    crop: Optional[tuple[int, int, int, int]] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fused 16-bit metric-map decode(+transforms) -> float32 HW."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    mode = 0 if list(vrange) == [0, 1] else 1
    rh, rw = resize_hw if resize_hw else (0, 0)
    if crop:
        ci, cj, ch, cw = crop
        ch_arg, cw_arg = ch, cw
    else:
        ci = cj = ch_arg = cw_arg = 0
        if resize_hw:
            ch, cw = rh, rw
        else:
            h, w, _, _ = image_info(path)
            ch, cw = h, w
    if out is None:
        out = np.empty((ch, cw), np.float32)
    rc = lib.fi_load_metric(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mode, int(clamp01), int(square), rh, rw, ci, cj, ch_arg, cw_arg,
    )
    if rc:
        raise IOError(f"fi_load_metric({path}) failed rc={rc}")
    return out
