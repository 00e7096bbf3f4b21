"""Challenge wire format: raw little-endian Montgomery bytes.

Layouts (libsnark/serialization.hpp):
  * field element  = 96 bytes LE Montgomery (12x64-bit limbs; our 48x16-bit
    limbs concatenate to the identical byte string since R = 2^768 both ways)
  * G1             = affine (x, y); zero encoded as (0, 0); readers treat
    y == 0 as the identity and set Z = 1 otherwise (hpp:84-92)
  * G2             = (x, y) with extension-degree base-field components each
  * size_t         = 8 bytes LE

File layouts (libsnark/main.cpp:50-83):
  params: d, m, A[m+1] G1, B1[m+1] G1, B2[m+1] G2, L[m-1] G1, H[d] G1
  input:  w[m+1] Fr, ca[d+1] Fr, cb[d+1] Fr, cc[d+1] Fr, r Fr
  output: A G1, B G2, C G1

Parsing is zero-copy numpy on the host; limb planes upload to device once.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..utils.bigint import bytes_to_limbs_le, limbs_to_bytes_le

FQ_BYTES = 96


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def size_t(self) -> int:
        (v,) = struct.unpack_from("<Q", self.data, self.off)
        self.off += 8
        return v

    def fq_block(self, count: int) -> np.ndarray:
        """count field elements -> (48, count) uint32 Montgomery limbs."""
        nbytes = count * FQ_BYTES
        out = bytes_to_limbs_le(self.data[self.off : self.off + nbytes])
        self.off += nbytes
        return out

    def g1_block(self, count: int):
        """count G1 points -> (x, y) each (48, count).  Interleaved x,y."""
        raw = self.fq_block(2 * count)  # (48, 2*count): x0,y0,x1,y1,...
        x = raw[:, 0::2]
        y = raw[:, 1::2]
        return np.ascontiguousarray(x), np.ascontiguousarray(y)

    def g2_block(self, count: int, deg: int):
        """count G2 points -> (x, y) each (deg, 48, count)."""
        raw = self.fq_block(2 * deg * count)  # per point: x_c0..x_cd, y_c0..
        per = raw.reshape(48, count, 2, deg)
        x = np.ascontiguousarray(np.moveaxis(per[:, :, 0, :], -1, 0))
        y = np.ascontiguousarray(np.moveaxis(per[:, :, 1, :], -1, 0))
        return x, y


class Writer:
    def __init__(self):
        self.chunks = []

    def size_t(self, v: int):
        self.chunks.append(struct.pack("<Q", v))

    def fq_block(self, limbs: np.ndarray):
        self.chunks.append(limbs_to_bytes_le(limbs))

    def g1(self, x, y, z):
        """One affine G1 point (z==0 -> (0,0)).  Arrays (48,) or (48,1)."""
        x = np.asarray(x).reshape(48, -1)[:, :1]
        y = np.asarray(y).reshape(48, -1)[:, :1]
        z = np.asarray(z).reshape(48, -1)[:, :1]
        if not z.any():
            self.chunks.append(b"\x00" * (2 * FQ_BYTES))
            return
        self.fq_block(np.concatenate([x, y], axis=1))

    def g2(self, x, y, z):
        """One affine G2 point; components (deg, 48) or (deg, 48, 1)."""
        x = np.asarray(x).reshape(x.shape[0], 48, -1)[:, :, 0]
        y = np.asarray(y).reshape(y.shape[0], 48, -1)[:, :, 0]
        z = np.asarray(z).reshape(z.shape[0], 48, -1)[:, :, 0]
        deg = x.shape[0]
        if not z.any():
            self.chunks.append(b"\x00" * (2 * deg * FQ_BYTES))
            return
        self.fq_block(np.ascontiguousarray(x.T))  # (48, deg): col j = comp j
        self.fq_block(np.ascontiguousarray(y.T))

    def bytes(self) -> bytes:
        return b"".join(self.chunks)


@dataclass
class Groth16Params:
    """Device-ready challenge proving parameters (main.cpp:42-61)."""

    d: int
    m: int
    A: tuple  # (x, y) limb planes, (48, m+1)
    B1: tuple
    B2: tuple  # (deg, 48, m+1)
    L: tuple
    H: tuple


@dataclass
class Groth16Input:
    """Witness + precomputed domain evaluations + blinding r
    (main.cpp:63-83)."""

    w: np.ndarray  # (48, m+1) Montgomery limbs
    ca: np.ndarray  # (48, d+1)
    cb: np.ndarray
    cc: np.ndarray
    r: np.ndarray  # (48, 1)


def read_params(path: str, g2_deg: int) -> Groth16Params:
    from . import native

    res = native.read_params(path, g2_deg) if native.available() else None
    if res is not None:
        d, m, A, B1, B2, L, H = res
        return Groth16Params(d, m, A, B1, B2, L, H)
    return read_params_bytes(open(path, "rb").read(), g2_deg)


def read_params_bytes(data: bytes, g2_deg: int) -> Groth16Params:
    r = Reader(data)
    d = r.size_t()
    m = r.size_t()
    A = r.g1_block(m + 1)
    B1 = r.g1_block(m + 1)
    B2 = r.g2_block(m + 1, g2_deg)
    L = r.g1_block(m - 1)
    H = r.g1_block(d)
    assert r.off == len(data), f"params trailing bytes: {len(data) - r.off}"
    return Groth16Params(d, m, A, B1, B2, L, H)


def read_input(path: str, d: int, m: int) -> Groth16Input:
    from . import native

    res = native.read_input(path, d, m) if native.available() else None
    if res is not None:
        return Groth16Input(*res)
    return read_input_bytes(open(path, "rb").read(), d, m)


def read_input_bytes(data: bytes, d: int, m: int) -> Groth16Input:
    r = Reader(data)
    w = r.fq_block(m + 1)
    ca = r.fq_block(d + 1)
    cb = r.fq_block(d + 1)
    cc = r.fq_block(d + 1)
    rr = r.fq_block(1)
    assert r.off == len(data), f"input trailing bytes: {len(data) - r.off}"
    return Groth16Input(w, ca, cb, cc, rr)


def write_proof(path_or_buf, A, B, C, g2_deg: int):
    """A, C: affine G1 (x,y,z limb planes); B: affine G2."""
    w = Writer()
    w.g1(*A)
    w.g2(*B)
    w.g1(*C)
    data = w.bytes()
    if isinstance(path_or_buf, (str,)):
        with open(path_or_buf, "wb") as f:
            f.write(data)
    else:
        path_or_buf.write(data)
    return data
