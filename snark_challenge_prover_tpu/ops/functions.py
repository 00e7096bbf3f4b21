"""Batched modular-arithmetic functions over limb planes.

Capability parity with cuda-fixnum's `functions/` kernels (SURVEY §2.2:
modexp / multi_modexp, modinv, quorem(+preinv), divexact, chinese CRT,
Paillier demo).  cuda-fixnum runs one big number per warp slot; here a
batch of big numbers is uint32[48, N] limb planes and every primitive is
one vectorized VPU program over the batch.

All device functions are jit-safe.  Variable exponents/divisors are data
(not trace constants) — control flow is fixed-trip masked loops, exactly
the constant-time shape the warp code has (modexp.cu:9-63's
constant-width window walk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limbs as lb
from .field import Fp

R_BITS = 768


def modexp(F: Fp, base, exp_canonical, bits: int = R_BITS):
    """base^exp mod p for Montgomery-form base and canonical limb-plane
    exponents (functions/modexp.cu): MSB-first square-and-multiply with
    masked multiplies — fixed 768 iterations, batch-vectorized."""

    def body(carry, i):
        acc = F.sqr(carry)
        limb = exp_canonical[(bits - 1 - i) // 16]
        bit = (limb >> ((bits - 1 - i) % 16).astype(limb.dtype)) & 1
        acc = F.select(bit.astype(jnp.bool_), F.mul(acc, base), acc)
        return acc, None

    init = F.ones(base.shape[1:])
    out, _ = jax.lax.scan(body, init, jnp.arange(bits))
    return out


def multi_modexp(F: Fp, base, exps_canonical, bits: int = R_BITS):
    """One base, many exponents (functions/multi_modexp.cu) — the batch
    axis already carries the parallelism; alias kept for API parity."""
    return modexp(F, base, exps_canonical, bits)


def modinv(F: Fp, a):
    """Modular inverse batch (functions/modinv.cu).  The modulus is
    prime in every use here, so Fermat replaces binary xgcd; 0 -> 0."""
    return F.inv(a)


def _shift_left_1bit(x):
    """Canonical limb planes << 1 (within fixed width; top bit drops)."""
    hi = x >> jnp.uint32(15)  # carry bit per limb
    shifted = (x << jnp.uint32(1)) & lb.LIMB_MASK
    return shifted + lb.shift_up(hi, 1)


def quorem(num, den):
    """Batched integer (quotient, remainder): restoring shift-subtract
    long division, 768 fixed iterations (functions/quorem.cu /
    quorem_preinv.cu).  num, den canonical uint32[48, *batch]; den must
    be nonzero."""
    batch = num.shape[1:]
    q0 = jnp.zeros_like(num)
    r0 = jnp.zeros_like(num)

    def body(carry, i):
        q, r = carry
        r = _shift_left_1bit(r)
        limb = num[(R_BITS - 1 - i) // 16]
        bit = (limb >> ((R_BITS - 1 - i) % 16).astype(limb.dtype)) & 1
        r = r.at[0].add(bit)
        d, lt = lb.sub_borrow(r, jnp.broadcast_to(den, r.shape))
        take = jnp.logical_not(lt)
        r = lb.select(take, d, r)
        q = _shift_left_1bit(q)
        q = q.at[0].add(take.astype(jnp.uint32))
        return (q, r), None

    (q, r), _ = jax.lax.scan(body, (q0, r0), jnp.arange(R_BITS))
    return q, r


def divexact(num, den):
    """Exact division (functions/divexact.cu): when den | num the
    remainder is zero and quorem's quotient is exact."""
    q, _ = quorem(num, den)
    return q


def chinese(F1: Fp, F2: Fp, a, b):
    """CRT combine (functions/chinese.cu): the unique x mod p1*p2 with
    x = a (p1), x = b (p2), for canonical residue planes.  Our moduli
    are 753-bit, so the result is double-width: (96, *batch) planes.

    Host precomputes c = p1^{-1} mod p2; device computes
    x = a + p1 * ((b - a) * c mod p2) exactly (Garner's form — the same
    recombination chinese.cu uses)."""
    p1, p2 = F1.p, F2.p
    from ..utils.bigint import int_to_limbs

    c_mont = F2.const(pow(p1, -1, p2))
    # (b - a) mod p2: a < p1 < 2*p2 for our prime pair, one cond-sub
    a2 = lb.cond_sub(a, F2.p_limbs)
    diff = F2.sub(F2.from_canonical(b), F2.from_canonical(a2))
    t = F2.to_canonical(F2.mul_const(diff, c_mont))  # canonical, < p2
    prod = lb.mul_wide(t, lb.bcast_const(jnp.asarray(int_to_limbs(p1)), t))  # (96,...)
    pad = jnp.zeros((prod.shape[0] - a.shape[0],) + a.shape[1:], a.dtype)
    s = lb.normalize(prod + jnp.concatenate([a, pad], axis=0))
    return s


# ---------------------------------------------------------------------------
# Paillier demo (host): capability mirror of cuda-fixnum's
# functions/paillier_*.cu example — not part of the prover.
# ---------------------------------------------------------------------------

def paillier_encrypt(n: int, g: int, m: int, r: int) -> int:
    """c = g^m * r^n mod n^2."""
    n2 = n * n
    return pow(g, m, n2) * pow(r, n, n2) % n2


def paillier_decrypt(n: int, lam: int, c: int) -> int:
    """m = L(c^lam mod n^2) / L(g^lam mod n^2) with g = n+1:
    simplifies to L(c^lam) * lam^{-1}... standard textbook form."""
    n2 = n * n
    u = pow(c, lam, n2)
    L = (u - 1) // n
    # with g = n+1, the denominator is lam mod n
    return L * pow(lam, -1, n) % n
