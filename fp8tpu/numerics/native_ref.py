"""ctypes bindings for the native C++ reference cast library.

The host-side native analog of the reference's pytquant extension
(pybind11 `fpemu_cpp.forward`, pytquant/cpp/fpemu_impl.cpp:2047-2050) —
bound with ctypes instead of pybind11 (not available in this image), and
built on demand with the system compiler.  Used as an independent third
implementation for cross-checking, and for fast host-side batch
quantization without a device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "fpemu_ref.cpp")
_LIB_DIR = os.path.join(os.path.dirname(_SRC), "_build")
_LIB = os.path.join(_LIB_DIR, "libfpemu_ref.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library (g++ -O2; OpenMP not required).
    Keyed on a source hash so a stale/foreign binary is never loaded."""
    import hashlib
    src_hash = hashlib.sha256(open(_SRC, "rb").read()).hexdigest()
    stamp = _LIB + ".hash"
    if (os.path.exists(_LIB) and not force and os.path.exists(stamp)
            and open(stamp).read() == src_hash):
        return _LIB
    os.makedirs(_LIB_DIR, exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True)
    with open(stamp, "w") as f:
        f.write(src_hash)
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.fpemu_cast.restype = ctypes.c_int
        lib.fpemu_cast.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_float, ctypes.c_int,
            ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.fpemu_version.restype = ctypes.c_char_p
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def cast(x: np.ndarray, mode: str, scale: float = 1.0,
         block_norm: bool = False, block_size: int = 1,
         seed: int = 0) -> np.ndarray:
    """Reference-ABI cast on the host (mode strings like ``E4M3_RNE``)."""
    lib = load()
    xf = np.ascontiguousarray(x, np.float32)
    # ABI guard (fpemu_forward, fpemu_impl.cpp:2013-2028): block_norm is
    # SILENTLY disabled when size is not a multiple of block_size —
    # mirrored by golden.cast_mode_string.
    if block_norm and block_size != xf.size and xf.size % block_size:
        block_norm, block_size = False, 1
    out = np.empty_like(xf)
    rc = lib.fpemu_cast(
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xf.size, mode.upper().encode(), ctypes.c_float(scale),
        int(block_norm), int(block_size), seed)
    if rc != 0:
        raise ValueError(f"unknown mode {mode!r}")
    return out.reshape(x.shape)


def version() -> str:
    return load().fpemu_version().decode()
