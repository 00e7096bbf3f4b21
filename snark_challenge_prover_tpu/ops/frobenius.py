"""Frobenius-map constants for the MNT4753/MNT6753 extension towers.

The reference publishes these as decimal strings (mnt4753_init.cpp:
104-118, mnt6753_init.cpp:108-124, twist multipliers at
mnt4753_init.cpp:131-132 / mnt6753_init.cpp:146-147); here they are
*derived* from the tower structure with exact host integers —
x -> x^q acts on the component u^m of Fq[u]/(u^k - nr) as
multiplication by nr^(m*(q-1)/k) — and pinned against the reference's
strings in tests/test_models.py.
"""

from __future__ import annotations

from functools import lru_cache

from ..models.primes import P_MNT4_Q, P_MNT4_R


@lru_cache(maxsize=None)
def ext_frobenius_coeffs(q: int, nr: int, k: int, mult: int = 1):
    """(nr^(mult*m*(q-1)/k) mod q for m < k): the per-component scalars
    of x -> x^q on Fq[u]/(u^k - nr).  mult=2 gives Fp3's coeffs_c2."""
    assert (q - 1) % k == 0
    e = mult * (q - 1) // k
    return tuple(pow(nr, m * e, q) for m in range(k))


def fq2_frobenius_coeffs_c1(q: int, nr: int):
    """fp2.tcc Frobenius_coeffs_c1 == (1, nr^((q-1)/2)) == (1, -1)."""
    return ext_frobenius_coeffs(q, nr, 2)


def fq3_frobenius_coeffs_c1(q: int, nr: int):
    return ext_frobenius_coeffs(q, nr, 3)


def fq3_frobenius_coeffs_c2(q: int, nr: int):
    return ext_frobenius_coeffs(q, nr, 3, mult=2)


def fq4_frobenius_coeffs_c1(q: int, nr: int):
    """fp4.tcc coeffs: x -> x^q scales the Fq2-coefficient v of
    Fq4 = Fq2[v]/(v^2 - u) by nr^((q-1)/4)."""
    return ext_frobenius_coeffs(q, nr, 4)


def fq6_frobenius_coeffs_c1(q: int, nr: int):
    """fp6_2over3.tcc coeffs for Fq6 = Fq3[v]/(v^2 - u)."""
    return ext_frobenius_coeffs(q, nr, 6)


def mnt4753_twist_mul_by_q():
    """(X, Y) multipliers of mnt4753_G2::mul_by_q (mnt4753_g2.cpp:364-369,
    constants mnt4753_init.cpp:131-132): X = nr^((q-1)/2) = -1,
    Y = nr^((q-1)/4) (the Fq4 Frobenius coefficient)."""
    q, nr = P_MNT4_Q, 13
    return (pow(nr, (q - 1) // 2, q), pow(nr, (q - 1) // 4, q))


def mnt6753_twist_mul_by_q():
    """(X, Y) multipliers of mnt6753_G2::mul_by_q (mnt6753_init.cpp:
    146-147): X = nr^(2(q-1)/3) (Fq3 coeff c1[2]), Y = nr^((q-1)/2) = -1."""
    q, nr = P_MNT4_R, 11
    return (pow(nr, 2 * (q - 1) // 3, q), pow(nr, (q - 1) // 2, q))
