"""Exact-integer host arithmetic for the MNT4753/MNT6753 curves.

The off-hot-path pieces of the framework — verifier pairing checks,
single-point key elements, fixture plumbing — run on host Python ints
(the same role libff's generic C++ templates play for the reference's
verifier, SURVEY §2.1: pairings are O(1) per proof and never on the
prover hot path).  The device (Pallas/XLA) path owns everything batched.

Group elements are affine tuples; None is the identity:
  G1: (x, y) ints;  G2: (x, y) with x, y tuples of e ints (twist coords).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..models.primes import FIELD_A, FIELD_B, FIELD_B_SMALL, PrimeSpec
from ..models import mnt4753 as m4
from ..models import mnt6753 as m6


class HostExt:
    """Fq[u]/(u^deg - nr) with exact int tuples (deg==1 degenerates to Fq).
    Interface-compatible with tools.oracle.ExtSpec (used by PairingEngine)."""

    def __init__(self, p: int, deg: int, nr: int):
        self.p = p
        self.deg = deg
        self.nr = nr
        self.zero = (0,) * deg if deg > 1 else 0
        self.one = ((1,) + (0,) * (deg - 1)) if deg > 1 else 1

    # ---- representation ---------------------------------------------------
    def components(self, a):
        return list(a) if self.deg > 1 else [a]

    def from_components(self, comps):
        comps = [c % self.p for c in comps]
        return tuple(comps) if self.deg > 1 else comps[0]

    # ---- ring -----------------------------------------------------------
    def add(self, a, b):
        if self.deg == 1:
            return (a + b) % self.p
        return tuple((x + y) % self.p for x, y in zip(a, b))

    def sub(self, a, b):
        if self.deg == 1:
            return (a - b) % self.p
        return tuple((x - y) % self.p for x, y in zip(a, b))

    def smul(self, k: int, a):
        if self.deg == 1:
            return k * a % self.p
        return tuple(k * x % self.p for x in a)

    def mul(self, a, b):
        p, d = self.p, self.deg
        if d == 1:
            return a * b % p
        # schoolbook with u^d = nr reduction
        acc = [0] * (2 * d - 1)
        for i in range(d):
            if not a[i]:
                continue
            for j in range(d):
                acc[i + j] += a[i] * b[j]
        for k in range(2 * d - 2, d - 1, -1):
            acc[k - d] += self.nr * acc[k]
        return tuple(v % p for v in acc[:d])

    def sqr(self, a):
        return self.mul(a, a)

    def inv(self, a):
        if self.deg == 1:
            return pow(a, -1, self.p)
        # generic: a^(q^d - 2) is overkill; use resultant-free route via
        # extended Euclid over the polynomial ring would be more code —
        # exponentiation is fine off the hot path.
        q = self.p
        e = q ** self.deg - 2
        r = self.one
        base = a
        while e:
            if e & 1:
                r = self.mul(r, base)
            base = self.sqr(base)
            e >>= 1
        return r

    def is_zero(self, a):
        return a == self.zero

    def pow(self, a, e: int):
        r = self.one
        while e:
            if e & 1:
                r = self.mul(r, a)
            a = self.sqr(a)
            e >>= 1
        return r


class HostGroup:
    """Affine short-Weierstrass group law over a HostExt field."""

    def __init__(self, F: HostExt, a, b):
        self.F = F
        self.a = a
        self.b = b

    def is_on_curve(self, P) -> bool:
        if P is None:
            return True
        F = self.F
        x, y = P
        lhs = F.sqr(y)
        rhs = F.add(F.add(F.mul(F.sqr(x), x), F.mul(self.a, x)), self.b)
        return lhs == rhs

    def neg(self, P):
        if P is None:
            return None
        x, y = P
        return (x, self.F.sub(self.F.zero, y))

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
            # doubling
            num = F.add(F.smul(3, F.sqr(x1)), self.a)
            lam = F.mul(num, F.inv(F.smul(2, y1)))
        else:
            lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
        x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, k: int, P):
        if P is None or k == 0:
            return None
        if k < 0:
            return self.mul(-k, self.neg(P))
        R = None
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R

    def msm(self, scalars, points):
        acc = None
        for s, P in zip(scalars, points):
            acc = self.add(acc, self.mul(s, P))
        return acc


@dataclass
class HostCurve:
    """One curve cycle member's host-side algebra + generators."""

    name: str
    fr_spec: PrimeSpec
    fq_spec: PrimeSpec
    g1: HostGroup
    g2: HostGroup
    g1_gen: tuple
    g2_gen: tuple


def mnt4753_host() -> HostCurve:
    q = FIELD_B.p
    fq = HostExt(q, 1, 0)
    fq2 = HostExt(q, 2, m4.FQ2_NON_RESIDUE)
    g1 = HostGroup(fq, m4.G1_COEFF_A, m4.G1_COEFF_B % q)
    # twist coefficients (mnt4753_init.cpp:122-126)
    a2 = (m4.G1_COEFF_A * m4.FQ2_NON_RESIDUE % q, 0)
    b2 = (0, m4.G1_COEFF_B * m4.FQ2_NON_RESIDUE % q)
    g2 = HostGroup(fq2, a2, b2)
    return HostCurve(
        "MNT4753",
        FIELD_A,
        FIELD_B,
        g1,
        g2,
        (m4.G1_ONE_X % q, m4.G1_ONE_Y % q),
        ((m4.G2_ONE_X0 % q, m4.G2_ONE_X1 % q), (m4.G2_ONE_Y0 % q, m4.G2_ONE_Y1 % q)),
    )


def mnt6753_host() -> HostCurve:
    q = FIELD_A.p  # q(MNT6753) == r(MNT4753)
    fq = HostExt(q, 1, 0)
    fq3 = HostExt(q, 3, m6.FQ3_NON_RESIDUE)
    g1 = HostGroup(fq, m6.G1_COEFF_A, m6.G1_COEFF_B % q)
    # twist coefficients (mnt6753_init.cpp:133-137): a3 = (0,0,a), b3 = (b*nr,0,0)
    a3 = (0, 0, m6.G1_COEFF_A % q)
    b3 = (m6.G1_COEFF_B * m6.FQ3_NON_RESIDUE % q, 0, 0)
    g2 = HostGroup(fq3, a3, b3)
    return HostCurve(
        "MNT6753",
        FIELD_B_SMALL,
        FIELD_A,
        g1,
        g2,
        (m6.G1_ONE_X % q, m6.G1_ONE_Y % q),
        (
            (m6.G2_ONE_X0 % q, m6.G2_ONE_X1 % q, m6.G2_ONE_X2 % q),
            (m6.G2_ONE_Y0 % q, m6.G2_ONE_Y1 % q, m6.G2_ONE_Y2 % q),
        ),
    )


def host_curve(name: str) -> HostCurve:
    return mnt4753_host() if name == "MNT4753" else mnt6753_host()
