"""ctypes bindings for the native batch image loader (native/sift_io.cpp).

Decodes PNG/PGM/PPM/BMP and converts to [0,1] float32 grayscale with the
exact reference weights across a pthread pool — the host-side frame
ingest path for sequence processing. Compiles the shared library on
first use (cached under ``native/build/``); anything it cannot decode
(or any build failure) falls back to the PIL path in
:mod:`.image` via :func:`load_batch_gray`'s ``fallback`` flag.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsift_io.so")
_lib = None


class NativeIOError(RuntimeError):
    pass


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "sift_io.cpp")
        os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
        # Link to a process-unique temp path and rename into place:
        # rename is atomic on the same filesystem, so a concurrent
        # process (this repo deliberately spawns multi-process fake
        # clusters) can never dlopen a partially written library.
        tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-pthread",
                "-o", tmp, src, "-lz",
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sift_io_probe.restype = ctypes.c_int
    lib.sift_io_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sift_io_load_batch_gray.restype = ctypes.c_int
    lib.sift_io_load_batch_gray.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


def probe(path: str) -> tuple[int, int]:
    """(width, height) of a PNG/PGM/PPM/BMP image."""
    lib = _load_library()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.sift_io_probe(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise NativeIOError(f"probe({path}) failed with code {rc}")
    return w.value, h.value


def load_batch_gray(
    paths: list[str], threads: int = 8, fallback: bool = True
) -> np.ndarray:
    """Load same-sized images → ``(N, H, W)`` float32 grayscale in [0,1].

    Uses the native multithreaded decoder for PNG/PGM/PPM/BMP; with
    ``fallback=True`` any failure (unsupported format, no compiler)
    routes through the PIL loader instead.
    """
    if not paths:
        return np.zeros((0, 0, 0), np.float32)
    try:
        lib = _load_library()
        w, h = probe(paths[0])
        out = np.empty((len(paths), h, w), np.float32)
        statuses = np.zeros(len(paths), np.int32)
        c_paths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        rc = lib.sift_io_load_batch_gray(
            c_paths,
            len(paths),
            w,
            h,
            threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if rc != 0:
            raise NativeIOError(
                f"native batch load failed: per-image codes {statuses.tolist()}"
            )
        return out
    except Exception:
        if not fallback:
            raise
        from .image import load_image_gray

        return np.stack(
            [load_image_gray(p, dtype=np.float32) for p in paths]
        )
