"""Exact-integer golden oracle for the Groth16 challenge pipeline.

A deliberately simple, independent Python implementation of the same
mathematics as the reference prover (libsnark/main.cpp) — used to
generate fixture files and expected outputs for the TPU framework's
tests, since the C++ reference cannot be compiled in this image (no GMP
headers).  Everything here is exact big-integer arithmetic; no JAX.

The wire formats match libsnark/serialization.hpp exactly: every field
element is 96 bytes of little-endian Montgomery representation
(R = 2^768), G1 = affine (x, y) with zero encoded as (0, 0), G2 = (x, y)
with extension-degree components each, size_t headers are 8-byte LE.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from snark_challenge_prover_tpu.models import mnt4753 as m4
from snark_challenge_prover_tpu.models import mnt6753 as m6
from snark_challenge_prover_tpu.models.primes import (
    FIELD_A,
    FIELD_B,
    FIELD_B_SMALL,
    PrimeSpec,
)

R_BITS = 768
R = 1 << R_BITS


# --------------------------------------------------------------------------
# field / extension helpers (elements: int, or tuple of ints for towers)
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class ExtSpec:
    p: int
    deg: int
    nr: int  # non-residue

    def mul(self, a, b):
        p, nr = self.p, self.nr
        if self.deg == 1:
            return a * b % p
        if self.deg == 2:
            return (
                (a[0] * b[0] + nr * a[1] * b[1]) % p,
                (a[0] * b[1] + a[1] * b[0]) % p,
            )
        if self.deg == 3:
            return (
                (a[0] * b[0] + nr * (a[1] * b[2] + a[2] * b[1])) % p,
                (a[0] * b[1] + a[1] * b[0] + nr * a[2] * b[2]) % p,
                (a[0] * b[2] + a[1] * b[1] + a[2] * b[0]) % p,
            )
        raise ValueError(self.deg)

    def add(self, a, b):
        if self.deg == 1:
            return (a + b) % self.p
        return tuple((x + y) % self.p for x, y in zip(a, b))

    def sub(self, a, b):
        if self.deg == 1:
            return (a - b) % self.p
        return tuple((x - y) % self.p for x, y in zip(a, b))

    def smul(self, k, a):
        if self.deg == 1:
            return k * a % self.p
        return tuple(k * x % self.p for x in a)

    def inv(self, a):
        p, nr = self.p, self.nr
        if self.deg == 1:
            return pow(a, -1, p)
        if self.deg == 2:
            norm = (a[0] * a[0] - nr * a[1] * a[1]) % p
            ni = pow(norm, -1, p)
            return (a[0] * ni % p, (-a[1]) * ni % p)
        if self.deg == 3:
            t0, t1, t2 = (x * x % p for x in a)
            t3, t4, t5 = a[0] * a[1] % p, a[0] * a[2] % p, a[1] * a[2] % p
            c0 = (t0 - nr * t5) % p
            c1 = (nr * t2 - t3) % p
            c2 = (t1 - t4) % p
            norm = (a[0] * c0 + nr * (a[2] * c1 + a[1] * c2)) % p
            ni = pow(norm, -1, p)
            return (c0 * ni % p, c1 * ni % p, c2 * ni % p)
        raise ValueError(self.deg)

    @property
    def zero(self):
        return 0 if self.deg == 1 else (0,) * self.deg

    @property
    def one(self):
        return 1 if self.deg == 1 else (1,) + (0,) * (self.deg - 1)

    def is_zero(self, a):
        return a == self.zero

    def components(self, a):
        return [a] if self.deg == 1 else list(a)

    def from_components(self, comps):
        return comps[0] if self.deg == 1 else tuple(comps)


# --------------------------------------------------------------------------
# short-Weierstrass group over an ExtSpec (affine tuples; None == identity)
# --------------------------------------------------------------------------
class OracleGroup:
    def __init__(self, F: ExtSpec, a, b):
        self.F = F
        self.a = a
        self.b = b

    def is_on_curve(self, P):
        if P is None:
            return True
        F = self.F
        x, y = P
        lhs = F.mul(y, y)
        rhs = F.add(F.add(F.mul(F.mul(x, x), x), F.mul(self.a, x)), self.b)
        return lhs == rhs

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        F = self.F
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if F.add(y1, y2) == F.zero:
                return None
            # doubling: lambda = (3x^2 + a) / 2y
            num = F.add(F.smul(3, F.mul(x1, x1)), self.a)
            den = F.smul(2, y1)
        else:
            num = F.sub(y2, y1)
            den = F.sub(x2, x1)
        lam = F.mul(num, F.inv(den))
        x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)

    def neg(self, P):
        if P is None:
            return None
        x, y = P
        return (x, self.F.sub(self.F.zero, y))

    def mul(self, k: int, P):
        acc = None
        add = self.add
        while k:
            if k & 1:
                acc = add(acc, P)
            P = add(P, P)
            k >>= 1
        return acc

    def msm(self, scalars, points):
        """Pippenger over exact ints (fast enough for fixtures)."""
        n = len(points)
        if n == 0:
            return None
        c = max(2, n.bit_length() - 1)
        acc = None
        windows = (753 + c - 1) // c
        for w in reversed(range(windows)):
            if acc is not None:
                for _ in range(c):
                    acc = self.add(acc, acc)
            buckets = [None] * (1 << c)
            shift = w * c
            mask = (1 << c) - 1
            for s, P in zip(scalars, points):
                d = (s >> shift) & mask
                if d:
                    buckets[d] = self.add(buckets[d], P)
            run = None
            tot = None
            for b in range(len(buckets) - 1, 0, -1):
                run = self.add(run, buckets[b])
                tot = self.add(tot, run)
            acc = self.add(acc, tot)
        return acc


# --------------------------------------------------------------------------
# curve bundles
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class OracleCurve:
    name: str
    fr_spec: PrimeSpec
    fq_spec: PrimeSpec
    ext_deg: int
    g1: OracleGroup
    g2: OracleGroup
    g1_gen: tuple
    g2_gen: tuple


def mnt4753_oracle() -> OracleCurve:
    q = FIELD_B.p
    F1 = ExtSpec(q, 1, 0)
    F2 = ExtSpec(q, 2, m4.FQ2_NON_RESIDUE)
    g1 = OracleGroup(F1, m4.G1_COEFF_A, m4.G1_COEFF_B)
    g2 = OracleGroup(
        F2,
        (m4.G1_COEFF_A * m4.FQ2_NON_RESIDUE % q, 0),
        (0, m4.G1_COEFF_B * m4.FQ2_NON_RESIDUE % q),
    )
    return OracleCurve(
        "MNT4753",
        FIELD_A,
        FIELD_B,
        2,
        g1,
        g2,
        (m4.G1_ONE_X, m4.G1_ONE_Y),
        ((m4.G2_ONE_X0, m4.G2_ONE_X1), (m4.G2_ONE_Y0, m4.G2_ONE_Y1)),
    )


def mnt6753_oracle() -> OracleCurve:
    q = FIELD_A.p
    F1 = ExtSpec(q, 1, 0)
    F3 = ExtSpec(q, 3, m6.FQ3_NON_RESIDUE)
    g1 = OracleGroup(F1, m6.G1_COEFF_A, m6.G1_COEFF_B)
    g2 = OracleGroup(
        F3,
        (0, 0, m6.G1_COEFF_A),
        (m6.G1_COEFF_B * m6.FQ3_NON_RESIDUE % q, 0, 0),
    )
    return OracleCurve(
        "MNT6753",
        FIELD_B_SMALL,
        FIELD_A,
        3,
        g1,
        g2,
        (m6.G1_ONE_X, m6.G1_ONE_Y),
        (
            (m6.G2_ONE_X0, m6.G2_ONE_X1, m6.G2_ONE_X2),
            (m6.G2_ONE_Y0, m6.G2_ONE_Y1, m6.G2_ONE_Y2),
        ),
    )


ORACLES = {"MNT4753": mnt4753_oracle, "MNT6753": mnt6753_oracle}


# --------------------------------------------------------------------------
# FFT over ints
# --------------------------------------------------------------------------
def fft(values, omega, p):
    """In-order radix-2 DIT FFT: returns [P(omega^i)]_i for coefficient
    input.  Exact semantics of libfqfft _basic_serial_radix2_FFT."""
    n = len(values)
    a = list(values)
    logn = n.bit_length() - 1
    assert 1 << logn == n
    # bit reversal
    for k in range(n):
        rk = int(format(k, f"0{logn}b")[::-1], 2) if logn else 0
        if k < rk:
            a[k], a[rk] = a[rk], a[k]
    m = 1
    for _ in range(logn):
        w_m = pow(omega, n // (2 * m), p)
        for k in range(0, n, 2 * m):
            w = 1
            for j in range(m):
                t = w * a[k + j + m] % p
                a[k + j + m] = (a[k + j] - t) % p
                a[k + j] = (a[k + j] + t) % p
                w = w * w_m % p
        m *= 2
    return a


def ifft(values, omega, p):
    n = len(values)
    a = fft(values, pow(omega, -1, p), p)
    ninv = pow(n, -1, p)
    return [x * ninv % p for x in a]


def fft_mixed(values, omega, p, q=5):
    """Mixed-radix 2^a * q^b FFT (matches _basic_serial_mixed_radix_FFT's
    results; implemented recursively for clarity)."""
    n = len(values)
    if n == 1:
        return list(values)
    if n % 2 == 0:
        split = 2
    elif n % q == 0:
        split = q
    else:
        raise ValueError(f"size {n} not 2^a*{q}^b")
    subs = [fft_mixed(values[i::split], pow(omega, split, p), p, q) for i in range(split)]
    m = n // split
    out = [0] * n
    for r in range(n):
        acc = 0
        wr = pow(omega, r, p)
        wri = 1
        for i in range(split):
            acc += wri * subs[i][r % m]
            wri = wri * wr % p
        out[r] = acc % p
    return out


def ifft_mixed(values, omega, p, q=5):
    n = len(values)
    a = fft_mixed(values, pow(omega, -1, p), p, q)
    ninv = pow(n, -1, p)
    return [x * ninv % p for x in a]


# --------------------------------------------------------------------------
# serialization (libsnark/serialization.hpp wire format)
# --------------------------------------------------------------------------
def write_mont(buf, spec_p, value):
    """value (canonical int) -> 96 bytes of little-endian Montgomery form."""
    buf.write(((value * R) % spec_p).to_bytes(96, "little"))


def read_mont(buf, spec_p) -> int:
    m = int.from_bytes(buf.read(96), "little")
    return m * pow(R, -1, spec_p) % spec_p


def write_g1(buf, cur: OracleCurve, P):
    p = cur.fq_spec.p
    if P is None:
        buf.write(b"\x00" * 192)
        return
    write_mont(buf, p, P[0])
    write_mont(buf, p, P[1])


def read_g1(buf, cur: OracleCurve):
    p = cur.fq_spec.p
    x = read_mont(buf, p)
    y = read_mont(buf, p)
    if y == 0:
        return None
    return (x, y)


def write_g2(buf, cur: OracleCurve, P):
    p = cur.fq_spec.p
    if P is None:
        buf.write(b"\x00" * 192 * cur.ext_deg)
        return
    for comp in P[0]:
        write_mont(buf, p, comp)
    for comp in P[1]:
        write_mont(buf, p, comp)


def read_g2(buf, cur: OracleCurve):
    p = cur.fq_spec.p
    x = tuple(read_mont(buf, p) for _ in range(cur.ext_deg))
    y = tuple(read_mont(buf, p) for _ in range(cur.ext_deg))
    if all(c == 0 for c in y):
        return None
    return (x, y)


# --------------------------------------------------------------------------
# challenge pipeline (libsnark/main.cpp semantics)
# --------------------------------------------------------------------------
def compute_h(d, ca, cb, cc, fr: PrimeSpec):
    """QAP quotient evaluation: the FFT dance of compute_H
    (libsnark/main.cpp:105-163)."""
    p = fr.p
    n = d + 1
    omega = fr.get_root_of_unity(n)
    g = fr.multiplicative_generator

    # any correct DFT yields identical values; the mixed-radix path is only
    # needed for non-power-of-two 2^a*5^b sizes (aux.tcc:46-166)
    use_mixed = (n & (n - 1)) != 0
    _fft = (lambda v: fft_mixed(v, omega, p)) if use_mixed else (lambda v: fft(v, omega, p))
    _ifft = (lambda v: ifft_mixed(v, omega, p)) if use_mixed else (lambda v: ifft(v, omega, p))

    def coset_fft(v):
        gi = 1
        out = []
        for x in v:
            out.append(x * gi % p)
            gi = gi * g % p
        return _fft(out)

    def icoset_fft(v):
        out = _ifft(v)
        ginv = pow(g, -1, p)
        gi = 1
        res = []
        for x in out:
            res.append(x * gi % p)
            gi = gi * ginv % p
        return res

    A = coset_fft(_ifft(ca))
    B = coset_fft(_ifft(cb))
    C = coset_fft(_ifft(cc))
    zinv = pow(pow(g, n, p) - 1, -1, p)
    H = [(a * b - c) % p * zinv % p for a, b, c in zip(A, B, C)]
    Hc = icoset_fft(H)
    return Hc + [0]  # coefficients_for_H has m+1 entries (main.cpp:151)


def prove(cur: OracleCurve, params: dict, inputs: dict) -> bytes:
    """The challenge prover: H + 5 MSMs + C assembly
    (libsnark/main.cpp:188-272)."""
    d, m = params["d"], params["m"]
    w = inputs["w"]
    h = compute_h(d, inputs["ca"], inputs["cb"], inputs["cc"], cur.fr_spec)

    At = cur.g1.msm(w, params["A"])
    Bt1 = cur.g1.msm(w, params["B1"])
    Bt2 = cur.g2.msm(w, params["B2"])
    Ht = cur.g1.msm(h[:d], params["H"])
    Lt = cur.g1.msm(w[2:], params["L"])  # primary_input_size == 1
    C = cur.g1.add(cur.g1.add(Ht, Lt), cur.g1.mul(inputs["r"], Bt1))

    out = io.BytesIO()
    write_g1(out, cur, At)
    write_g2(out, cur, Bt2)
    write_g1(out, cur, C)
    return out.getvalue()


# --------------------------------------------------------------------------
# fixture generation (structure of generate_parameters.cpp:60-108, with
# random points instead of a real proving key — the prover exercises the
# identical code path; semantic keygen lives in proof_systems/groth16.py)
# --------------------------------------------------------------------------
def generate_fixture(curve_name: str, log2_d: int, seed: int = 7):
    import random

    cur = ORACLES[curve_name]()
    rng = random.Random(seed)
    r_p = cur.fr_spec.p

    d_plus_1 = 1 << log2_d
    d = d_plus_1 - 1
    m = d_plus_1 + 2  # num_variables; != d on purpose to catch d/m mixups

    def rand_fr():
        return rng.randrange(r_p)

    # short scalars: point distribution is irrelevant for arithmetic tests,
    # and 64-bit ladders are ~12x faster to generate than 753-bit ones.
    def rand_g1():
        return cur.g1.mul(rng.getrandbits(64) | 1, cur.g1_gen)

    def rand_g2():
        return cur.g2.mul(rng.getrandbits(64) | 1, cur.g2_gen)

    params = {
        "d": d,
        "m": m,
        "A": [rand_g1() for _ in range(m + 1)],
        "B1": [rand_g1() for _ in range(m + 1)],
        "B2": [rand_g2() for _ in range(m + 1)],
        "L": [rand_g1() for _ in range(m - 1)],
        "H": [rand_g1() for _ in range(d)],
    }
    # satisfied instance: real QAP witnesses always have ca_i*cb_i == cc_i
    # pointwise on the domain (constraint rows satisfy a*b=c; the input
    # consistency rows of generate_parameters.cpp:44-57 have cb == 0), so H
    # is a genuine polynomial quotient.
    ca = [rand_fr() for _ in range(d + 1)]
    cb = [rand_fr() for _ in range(d + 1)]
    inputs = {
        "w": [1] + [rand_fr() for _ in range(m)],
        "ca": ca,
        "cb": cb,
        "cc": [a * b % r_p for a, b in zip(ca, cb)],
        "r": rand_fr(),
    }
    return cur, params, inputs


def write_params_file(path, cur: OracleCurve, params: dict):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", params["d"]))
        f.write(struct.pack("<Q", params["m"]))
        for P in params["A"]:
            write_g1(f, cur, P)
        for P in params["B1"]:
            write_g1(f, cur, P)
        for P in params["B2"]:
            write_g2(f, cur, P)
        for P in params["L"]:
            write_g1(f, cur, P)
        for P in params["H"]:
            write_g1(f, cur, P)


def write_input_file(path, cur: OracleCurve, inputs: dict):
    p = cur.fr_spec.p
    with open(path, "wb") as f:
        for v in inputs["w"]:
            write_mont(f, p, v)
        for key in ("ca", "cb", "cc"):
            for v in inputs[key]:
                write_mont(f, p, v)
        write_mont(f, p, inputs["r"])


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("curve", choices=["MNT4753", "MNT6753"])
    ap.add_argument("log2_d", type=int)
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    cur, params, inputs = generate_fixture(args.curve, args.log2_d, args.seed)
    base = Path(args.outdir)
    base.mkdir(parents=True, exist_ok=True)
    write_params_file(base / f"{args.curve}-parameters", cur, params)
    write_input_file(base / f"{args.curve}-input", cur, inputs)
    proof = prove(cur, params, inputs)
    (base / f"{args.curve}-output").write_bytes(proof)
    import hashlib

    print(args.curve, "d+1=2^%d" % args.log2_d, "sha256:", hashlib.sha256(proof).hexdigest())
