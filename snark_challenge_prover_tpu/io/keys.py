"""Proving/verification key + proof (de)serialization.

The reference serializes keys with libsnark's iostream operators
(r1cs_gg_ppzksnark.hpp:70-356); the byte format there is
libsnark-internal and not part of the challenge's byte-exactness
contract (only proof files are sha256-compared, README.md:46-58).  This
module defines the framework's own stable binary format built from the
same primitives as the wire format: 96-byte little-endian field
elements, 8-byte little-endian counts.

Layout (versioned magic headers):
  pk:  SCPK1 | curve | 5 single points | 5 query plane blocks | R1CS
  vk:  SCVK1 | curve | GT element | delta_g2 | ABC points
  proof: raw challenge wire format (io.serialization.write_proof)
"""

from __future__ import annotations

import struct

import numpy as np

from ..relations.r1cs import (
    LinearCombination as LC,
    R1CSConstraint,
    R1CSConstraintSystem,
)
from ..utils.bigint import bytes_to_limbs_le, limbs_to_bytes_le

_PK_MAGIC = b"SCPK1\x00"
_VK_MAGIC = b"SCVK1\x00"


class _W:
    def __init__(self):
        self.parts = []

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def raw(self, b: bytes):
        self.parts.append(b)

    def fq(self, v: int):
        self.parts.append(int(v).to_bytes(96, "little"))

    def text(self, s: str):
        b = s.encode()
        self.u64(len(b))
        self.raw(b)

    def planes(self, arr: np.ndarray):
        """(..., 48, N) uint32 planes, component blocks in order."""
        arr = np.asarray(arr, dtype=np.uint32)
        shape = arr.shape
        self.u64(len(shape))
        for s in shape:
            self.u64(s)
        flat = arr.reshape(-1, shape[-2], shape[-1])
        for comp in flat:
            self.raw(limbs_to_bytes_le(comp))

    def bytes(self):
        return b"".join(self.parts)


class _R:
    def __init__(self, data: bytes):
        self.d = data
        self.off = 0

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.d, self.off)
        self.off += 8
        return v

    def raw(self, n: int) -> bytes:
        b = self.d[self.off : self.off + n]
        self.off += n
        return b

    def fq(self) -> int:
        return int.from_bytes(self.raw(96), "little")

    def text(self) -> str:
        return self.raw(self.u64()).decode()

    def planes(self) -> np.ndarray:
        ndim = self.u64()
        shape = tuple(self.u64() for _ in range(ndim))
        n_comp = int(np.prod(shape[:-2], dtype=np.int64)) if ndim > 2 else 1
        comps = [
            bytes_to_limbs_le(self.raw(shape[-1] * 96), shape[-2])
            for _ in range(n_comp)
        ]
        return np.stack(comps).reshape(shape)


# ---------------------------------------------------------------------------
# host affine points (exact-int tuples, None = identity)
# ---------------------------------------------------------------------------

def _w_g1(w: _W, P):
    if P is None:
        w.fq(0), w.fq(0)
    else:
        w.fq(P[0]), w.fq(P[1])


def _r_g1(r: _R):
    x, y = r.fq(), r.fq()
    return None if y == 0 else (x, y)


def _w_g2(w: _W, P, deg: int):
    if P is None:
        for _ in range(2 * deg):
            w.fq(0)
    else:
        for c in P[0]:
            w.fq(c)
        for c in P[1]:
            w.fq(c)


def _r_g2(r: _R, deg: int):
    x = tuple(r.fq() for _ in range(deg))
    y = tuple(r.fq() for _ in range(deg))
    return None if all(c == 0 for c in y) else (x, y)


# ---------------------------------------------------------------------------
# R1CS
# ---------------------------------------------------------------------------

def _w_cs(w: _W, cs: R1CSConstraintSystem):
    w.u64(cs.primary_input_size)
    w.u64(cs.auxiliary_input_size)
    w.u64(len(cs.constraints))
    p = cs.p
    for cons in cs.constraints:
        for lc in (cons.a, cons.b, cons.c):
            terms = lc.collate(p)
            w.u64(len(terms))
            for idx, coeff in sorted(terms.items()):
                w.u64(idx)
                w.fq(coeff % p)


def _r_cs(r: _R, p: int) -> R1CSConstraintSystem:
    cs = R1CSConstraintSystem(p)
    cs.primary_input_size = r.u64()
    cs.auxiliary_input_size = r.u64()
    ncons = r.u64()
    for _ in range(ncons):
        lcs = []
        for _ in range(3):
            nt = r.u64()
            lcs.append(LC([(r.u64(), r.fq()) for _ in range(nt)]))
        cs.add_constraint(R1CSConstraint(*lcs))
    return cs


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def write_proving_key(pk) -> bytes:
    deg = 2 if pk.curve == "MNT4753" else 3
    w = _W()
    w.raw(_PK_MAGIC)
    w.text(pk.curve)
    _w_g1(w, pk.alpha_g1)
    _w_g1(w, pk.beta_g1)
    _w_g2(w, pk.beta_g2, deg)
    _w_g1(w, pk.delta_g1)
    _w_g2(w, pk.delta_g2, deg)
    for pair in (pk.A_query, pk.B_query_g2, pk.B_query_g1, pk.H_query, pk.L_query):
        w.planes(np.asarray(pair[0]))
        w.planes(np.asarray(pair[1]))
    _w_cs(w, pk.constraint_system)
    return w.bytes()


def read_proving_key(data: bytes):
    from ..models import mnt4753, mnt6753
    from ..proof_systems.groth16_full import ProvingKey

    r = _R(data)
    assert r.raw(len(_PK_MAGIC)) == _PK_MAGIC, "bad proving-key magic"
    curve = r.text()
    model = mnt4753.get() if curve == "MNT4753" else mnt6753.get()
    deg = 2 if curve == "MNT4753" else 3
    alpha_g1 = _r_g1(r)
    beta_g1 = _r_g1(r)
    beta_g2 = _r_g2(r, deg)
    delta_g1 = _r_g1(r)
    delta_g2 = _r_g2(r, deg)
    blocks = [(r.planes(), r.planes()) for _ in range(5)]
    cs = _r_cs(r, model.Fr.p)
    assert r.off == len(data), "trailing pk bytes"
    return ProvingKey(
        curve=curve,
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        beta_g2=beta_g2,
        delta_g1=delta_g1,
        delta_g2=delta_g2,
        A_query=blocks[0],
        B_query_g2=blocks[1],
        B_query_g1=blocks[2],
        H_query=blocks[3],
        L_query=blocks[4],
        constraint_system=cs,
    )


def write_verification_key(vk) -> bytes:
    deg = 2 if vk.curve == "MNT4753" else 3
    w = _W()
    w.raw(_VK_MAGIC)
    w.text(vk.curve)
    c0, c1 = vk.alpha_g1_beta_g2  # GT = pair of Fq^e elements
    for comp in (list(c0) if deg > 1 else [c0]):
        w.fq(comp)
    for comp in (list(c1) if deg > 1 else [c1]):
        w.fq(comp)
    _w_g2(w, vk.delta_g2, deg)
    w.u64(len(vk.ABC_g1))
    for P in vk.ABC_g1:
        _w_g1(w, P)
    return w.bytes()


def read_verification_key(data: bytes):
    from ..proof_systems.groth16_full import VerificationKey

    r = _R(data)
    assert r.raw(len(_VK_MAGIC)) == _VK_MAGIC, "bad verification-key magic"
    curve = r.text()
    deg = 2 if curve == "MNT4753" else 3
    c0 = tuple(r.fq() for _ in range(deg))
    c1 = tuple(r.fq() for _ in range(deg))
    delta_g2 = _r_g2(r, deg)
    n = r.u64()
    ABC = [_r_g1(r) for _ in range(n)]
    assert r.off == len(data), "trailing vk bytes"
    return VerificationKey(
        curve=curve, alpha_g1_beta_g2=(c0, c1), delta_g2=delta_g2, ABC_g1=ABC
    )


def read_proof(data: bytes, curve: str):
    from ..proof_systems.groth16_full import Proof

    deg = 2 if curve == "MNT4753" else 3
    r = _R(data)
    gA = _r_g1_mont(r, curve)
    gB = _r_g2_mont(r, curve, deg)
    gC = _r_g1_mont(r, curve)
    assert r.off == len(data), "trailing proof bytes"
    return Proof(g_A=gA, g_B=gB, g_C=gC)


def _fq_spec(curve: str):
    from ..models import mnt4753, mnt6753

    return (mnt4753.get() if curve == "MNT4753" else mnt6753.get()).Fq.spec


def _r_g1_mont(r: _R, curve: str):
    spec = _fq_spec(curve)
    x, y = r.fq(), r.fq()
    return None if y == 0 else (spec.from_mont(x), spec.from_mont(y))


def _r_g2_mont(r: _R, curve: str, deg: int):
    spec = _fq_spec(curve)
    x = tuple(r.fq() for _ in range(deg))
    y = tuple(r.fq() for _ in range(deg))
    if all(c == 0 for c in y):
        return None
    return (tuple(spec.from_mont(c) for c in x), tuple(spec.from_mont(c) for c in y))
