"""ctypes binding for the native C++ data-loading runtime.

Reference parity (SURVEY.md §2b(ii)): Caffe's prefetching data pipeline is
C++ (base_data_layer/internal_thread/data_transformer); so is ours
(native/dataloader.cpp): PNG decode, bilinear resize, and a
multi-threaded prefetch ring — Python only moves ready buffers to the
device. Two output modes: [-1,1] float32 (normalized on host) and raw
uint8 (4x smaller host->device uplink; normalized on-device) — the
production path composes C++ decode WITH the small uplink.

The shared library builds on demand with make (g++, zlib); if the
toolchain is unavailable the callers fall back to the PIL path in
``depthvo_tpu.data.kitti``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libdvfdata.so")

_lib = None


def _build_lib() -> str:
    # Installed-package escape hatch: the pip package ships Python only;
    # point DEPTHVO_NATIVE_LIB at a prebuilt libdvfdata.so when the
    # checkout's native/ tree is not next to the package.
    env_lib = os.environ.get("DEPTHVO_NATIVE_LIB")
    if env_lib:
        if not os.path.isfile(env_lib):
            raise FileNotFoundError(
                f"DEPTHVO_NATIVE_LIB={env_lib!r} does not exist"
            )
        return env_lib
    src = os.path.join(_NATIVE_DIR, "dataloader.cpp")
    if os.path.isfile(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return _LIB_PATH
    subprocess.run(
        ["make", "-C", os.path.abspath(_NATIVE_DIR)],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    """Build (if stale) and load the native library; raises on failure."""
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build_lib())
    lib.dvf_decode_png.restype = ctypes.c_int
    lib.dvf_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.dvf_load_resized.restype = ctypes.c_int
    lib.dvf_load_resized.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dvf_load_resized_u8.restype = ctypes.c_int
    lib.dvf_load_resized_u8.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dvf_loader_create.restype = ctypes.c_void_p
    lib.dvf_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dvf_loader_next.restype = ctypes.c_int
    lib.dvf_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dvf_loader_next_u8.restype = ctypes.c_int
    lib.dvf_loader_next_u8.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dvf_loader_destroy.restype = None
    lib.dvf_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError):
        # An EXPLICIT DEPTHVO_NATIVE_LIB must fail loudly — silently
        # falling back to the Python pipeline would hide a typo'd path
        # behind degraded throughput.
        if os.environ.get("DEPTHVO_NATIVE_LIB"):
            raise
        return False


def decode_png(path: str) -> np.ndarray:
    """Decode a PNG to a uint8 HWC array via the native decoder."""
    lib = load_library()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.dvf_decode_png(path.encode(), w, h, c, None, 0)
    if rc != 0:
        raise ValueError(f"native PNG decode failed ({rc}) for {path}")
    buf = np.empty(h.value * w.value * c.value, np.uint8)
    rc = lib.dvf_decode_png(
        path.encode(), w, h, c,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
    )
    if rc != 0:
        raise ValueError(f"native PNG decode failed ({rc}) for {path}")
    return buf.reshape(h.value, w.value, c.value)


def load_resized(path: str, height: int, width: int) -> np.ndarray:
    """Decode + resize + normalize one image -> (H, W, 3) float32 [-1,1]."""
    lib = load_library()
    out = np.empty((height, width, 3), np.float32)
    rc = lib.dvf_load_resized(
        path.encode(), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native load failed ({rc}) for {path}")
    return out


def load_resized_u8(path: str, height: int, width: int) -> np.ndarray:
    """Decode + resize one image -> (H, W, 3) uint8 (no normalization —
    4x fewer host->device bytes; normalization runs on-device)."""
    lib = load_library()
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.dvf_load_resized_u8(
        path.encode(), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"native load failed ({rc}) for {path}")
    return out


class NativeBatchLoader:
    """Threaded prefetching batch loader over a list of image paths.

    Yields (batch_images, batch_indices): images (B, H, W, 3) — float32
    in [-1, 1] by default, raw uint8 with ``u8=True`` (C++ decode AND the
    4x smaller uplink; normalization runs on-device). Indices say which
    source sample each row came from (callers use them to join
    stereo/temporal companions and per-sample intrinsics/baselines).
    """

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        height: int,
        width: int,
        num_threads: int = 4,
        seed: int = 0,
        shuffle: bool = True,
        queue_cap: int = 4,
        u8: bool = False,
    ):
        self._lib = load_library()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = self._lib.dvf_loader_create(
            arr, len(self._paths), batch_size, height, width,
            num_threads, seed, int(shuffle), queue_cap, int(u8),
        )
        if not self._handle:
            raise RuntimeError("dvf_loader_create failed")
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.u8 = u8

    def next(self):
        idx = np.empty((self.batch_size,), np.int64)
        if self.u8:
            out = np.empty(
                (self.batch_size, self.height, self.width, 3), np.uint8
            )
            rc = self._lib.dvf_loader_next_u8(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
        else:
            out = np.empty(
                (self.batch_size, self.height, self.width, 3), np.float32
            )
            rc = self._lib.dvf_loader_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
        if rc != 0:
            raise ValueError(f"native loader batch had decode error {rc}")
        return out, idx

    def __iter__(self) -> Iterator:
        while True:
            yield self.next()

    def close(self) -> None:
        if self._handle:
            self._lib.dvf_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
