"""ctypes bindings for the native (C++/OpenMP) data components.

Builds ``native/apx_native.cpp`` on first use (cached as
``native/libapx_native.so``) and exposes the parallel floor-map bank
generators. Falls back cleanly when no compiler is available — callers use
``native_available()`` or the ``backend="auto"`` plumbing in
apx.data.floor_map.

The native generators are deterministic per index but use their own
pcg32 stream, NOT the reference's NumPy PCG64 chain — bitwise reference
parity always goes through the Python generators (floor_map.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "native_available",
    "generate_maze_bank_native",
    "generate_rooms_bank_native",
]

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "apx_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "libapx_native.so")


def _build() -> bool:
    # Compile to a private temp name, then atomically rename: concurrent
    # builders (e.g. pytest-xdist workers racing on first use) each publish
    # a complete .so instead of interleaving writes into one path.
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-pthread", "-shared", "-fPIC", "-std=c++17",
        "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.apx_generate_maze_bank.argtypes = [
            u64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p
        ]
        lib.apx_generate_rooms_bank.argtypes = [
            u64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p,
        ]
        lib.apx_native_version.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _lib() is not None


def generate_maze_bank_native(
    indices, width: int = 21, height: int = 21, branching_prob: float = 1.0
) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.uint64))
    out = np.empty((len(idx), height, width), dtype=np.uint8)
    lib.apx_generate_maze_bank(
        idx, len(idx), width, height, int(round(branching_prob * 1000)), out
    )
    return out.astype(bool)


def generate_rooms_bank_native(
    indices, width: int = 32, height: int = 32, max_rooms: int = 10,
    door_width: int = 3,
) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.uint64))
    out = np.empty((len(idx), height, width), dtype=np.uint8)
    lib.apx_generate_rooms_bank(
        idx, len(idx), width, height, max_rooms, door_width, out
    )
    return out.astype(bool)
