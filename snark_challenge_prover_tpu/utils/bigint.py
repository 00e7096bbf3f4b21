"""Host-side big-integer <-> limb-plane conversions.

The on-device representation of an N-element vector of b-bit integers is a
uint32 array of shape (L, *batch) holding 16-bit limbs, least-significant
limb first ("limb-plane" layout: the limb index is the leading axis so the
batch axis lands on TPU vector lanes).  753-bit field elements use L=48
(768 bits), mirroring the reference's 12x64-bit limbs
(depends/libff/libff/algebra/curves/mnt753/mnt46753_common.hpp:22) rotated
onto the 8x128 VPU.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
FQ_LIMBS = 48  # 48 * 16 = 768 bits >= 753


def int_to_limbs(x: int, n_limbs: int = FQ_LIMBS) -> np.ndarray:
    """Little-endian 16-bit limbs of a non-negative int, shape (n_limbs,)."""
    if x < 0:
        raise ValueError("negative")
    if x >> (LIMB_BITS * n_limbs):
        raise ValueError(f"{x.bit_length()} bits does not fit in {n_limbs} limbs")
    out = np.empty(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs: np.ndarray) -> int:
    """Inverse of int_to_limbs for a single element, shape (L,)."""
    x = 0
    arr = np.asarray(limbs, dtype=np.uint64)
    for i in range(arr.shape[0] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[i])
    return x


def ints_to_limbs(xs, n_limbs: int = FQ_LIMBS) -> np.ndarray:
    """Vector of ints -> (n_limbs, N) uint32 limb planes."""
    xs = list(xs)
    out = np.empty((n_limbs, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        out[:, j] = int_to_limbs(x, n_limbs)
    return out


def limbs_to_ints(limbs: np.ndarray) -> list:
    """(n_limbs, N) -> list of N ints."""
    arr = np.asarray(limbs)
    flat = arr.reshape(arr.shape[0], -1)
    return [limbs_to_int(flat[:, j]) for j in range(flat.shape[1])]


def bytes_to_limbs_le(buf: bytes, n_limbs: int = FQ_LIMBS) -> np.ndarray:
    """Little-endian byte strings (96 bytes each for 753-bit fields) ->
    (n_limbs, N).  Matches the challenge wire format: 12 little-endian
    uint64 limbs per element (libsnark/serialization.hpp:22-32)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    elem_bytes = 2 * n_limbs
    if raw.size % elem_bytes:
        raise ValueError("buffer not a multiple of element size")
    n = raw.size // elem_bytes
    u16 = raw.reshape(n, n_limbs, 2).astype(np.uint32)
    limbs = u16[:, :, 0] | (u16[:, :, 1] << 8)
    return np.ascontiguousarray(limbs.T)


def limbs_to_bytes_le(limbs: np.ndarray) -> bytes:
    """(n_limbs, N) -> concatenated little-endian byte strings."""
    arr = np.asarray(limbs, dtype=np.uint32)
    L = arr.shape[0]
    flat = arr.reshape(L, -1).T  # (N, L)
    lo = (flat & 0xFF).astype(np.uint8)
    hi = ((flat >> 8) & 0xFF).astype(np.uint8)
    out = np.empty((flat.shape[0], L, 2), dtype=np.uint8)
    out[:, :, 0] = lo
    out[:, :, 1] = hi
    return out.tobytes()
