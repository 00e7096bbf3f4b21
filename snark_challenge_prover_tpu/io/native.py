"""ctypes binding for the native runtime (native/sc_runtime.cpp).

The native library plays the role of the reference's C++ harness layer:
raw-stream loaders (libsnark/main.cpp:50-83) and the C-ABI facade
pattern of prover_reference_functions.cpp.  Missing library -> callers
fall back to the pure-numpy path (io.serialization) transparently.

Set SNARK_TPU_NATIVE=0 to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "build" / "libscruntime.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SNARK_TPU_NATIVE", "1") == "0":
        return None
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.sc_repack_fq.argtypes = [u8p, ctypes.c_size_t, u32p]
    lib.sc_repack_fq_strided.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t, u32p]
    lib.sc_pack_fq.argtypes = [u32p, ctypes.c_size_t, u8p]
    lib.sc_params_header.argtypes = [ctypes.c_char_p, u64p, u64p]
    lib.sc_params_header.restype = ctypes.c_int
    lib.sc_read_params_file.argtypes = [ctypes.c_char_p, ctypes.c_int] + [u32p] * 10
    lib.sc_read_params_file.restype = ctypes.c_int
    lib.sc_read_input_file.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
    ] + [u32p] * 5
    lib.sc_read_input_file.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def read_params(path: str, g2_deg: int):
    """Native params loader; returns the same tuple layout as
    io.serialization.read_params or None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    d = ctypes.c_uint64()
    m = ctypes.c_uint64()
    if lib.sc_params_header(path.encode(), ctypes.byref(d), ctypes.byref(m)):
        raise IOError(f"cannot read params header: {path}")
    d, m = d.value, m.value
    n1 = m + 1

    def planes(n):
        return np.empty((48, n), dtype=np.uint32)

    A = (planes(n1), planes(n1))
    B1 = (planes(n1), planes(n1))
    B2 = (
        np.empty((g2_deg, 48, n1), dtype=np.uint32),
        np.empty((g2_deg, 48, n1), dtype=np.uint32),
    )
    L = (planes(m - 1), planes(m - 1))
    H = (planes(d), planes(d))
    rc = lib.sc_read_params_file(
        path.encode(), g2_deg,
        _u32p(A[0]), _u32p(A[1]), _u32p(B1[0]), _u32p(B1[1]),
        _u32p(B2[0]), _u32p(B2[1]), _u32p(L[0]), _u32p(L[1]),
        _u32p(H[0]), _u32p(H[1]),
    )
    if rc:
        raise IOError(f"native params load failed rc={rc}: {path}")
    return d, m, A, B1, B2, L, H


def read_input(path: str, d: int, m: int):
    lib = _load()
    if lib is None:
        return None
    w = np.empty((48, m + 1), dtype=np.uint32)
    ca = np.empty((48, d + 1), dtype=np.uint32)
    cb = np.empty((48, d + 1), dtype=np.uint32)
    cc = np.empty((48, d + 1), dtype=np.uint32)
    r = np.empty((48, 1), dtype=np.uint32)
    rc = lib.sc_read_input_file(
        path.encode(), d, m, _u32p(w), _u32p(ca), _u32p(cb), _u32p(cc), _u32p(r)
    )
    if rc:
        raise IOError(f"native input load failed rc={rc}: {path}")
    return w, ca, cb, cc, r


def pack_fq(planes: np.ndarray) -> bytes | None:
    """(48, N) planes -> N * 96 LE bytes via the native packer."""
    lib = _load()
    if lib is None:
        return None
    planes = np.ascontiguousarray(planes, dtype=np.uint32)
    n = planes.shape[1]
    out = np.empty(n * 96, dtype=np.uint8)
    lib.sc_pack_fq(_u32p(planes), n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()
