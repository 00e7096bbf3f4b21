"""Fixed-base (windowed) exponentiation and wNAF scalar multiplication.

Capability parity with libff's scalar_multiplication layer off the MSM
path:

  * `get_window_table` / `windowed_exp` / `batch_exp` /
    `batch_exp_with_coeff` (multiexp.tcc:552-682): the keygen workhorse.
    The reference builds a host table of size W x 2^c and walks it per
    scalar; here the table is device arrays and `batch_exp` is one
    jitted program — per window a vectorized gather of table rows by
    digit followed by one N-wide group add, so the whole batch costs
    W sequential adds regardless of N (VPU-parallel across elements).

  * `find_wnaf` / `fixed_window_wnaf_exp` / `opt_window_wnaf_exp`
    (wnaf.tcc:25-125): single-point windowed-NAF multiplication.  Digit
    decomposition is host-side (scalars are host ints in every caller);
    the add/double walk is a device scan.

  * `get_exp_window_size` (multiexp.tcc:507-550): the reference's
    empirical table depends on CPU cache behaviour; on TPU the trade-off
    is table VMEM footprint vs scan length, so we use a simple
    log-based rule with the same asymptotics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .group import Curve
from .msm import window_digits

SCALAR_BITS = 753


def get_exp_window_size(num_scalars: int) -> int:
    """Window size for batch_exp over `num_scalars` elements."""
    if num_scalars <= 4:
        return 2
    return max(2, min(10, int(math.log2(num_scalars))))


def get_window_table(curve: Curve, window: int, base,
                     scalar_bits: int = SCALAR_BITS):
    """Device window table: points T[w, j] = j * 2^(w*window) * base for
    w < ceil(scalar_bits/window), j < 2^window (multiexp.tcc:552-583
    get_window_table semantics).  `base` is a projective point with
    scalar batch shape ().  Returns a projective triple with batch
    (W, 2^window)."""
    W = (scalar_bits + window - 1) // window
    B = 1 << window

    @jax.jit
    def build(base):
        def row(carry, _):
            # carry = row base point 2^(w*window) * base
            def entries(e_carry, __):
                nxt = curve.add(e_carry, carry)
                return nxt, e_carry

            _, ent = jax.lax.scan(entries, curve.zero(()), None, length=B)

            def dbl(i, P):
                return curve.double(P)

            next_base = jax.lax.fori_loop(0, window, dbl, carry)
            return next_base, ent

        _, table = jax.lax.scan(row, base, None, length=W)
        return table

    table = build(base)
    # table leaves have shape (W, B, ...) with point batch at the end;
    # move the scan axes into the point batch: (..., W, B)
    def fix(t):
        # t: (W, B) + elem_shape; want elem_shape + (W, B)
        return jnp.moveaxis(jnp.moveaxis(t, 0, -1), 0, -1)

    return tuple(fix(t) for t in table)


def windowed_exp(curve: Curve, window: int, table, scalars_canonical,
                 scalar_bits: int = SCALAR_BITS):
    """pow = sum_w digit_w(s) * 2^(w*window) * base for a batch of
    scalars (48, *batch) -> projective points with that batch shape
    (multiexp.tcc:585-613 windowed_exp)."""
    digits = window_digits(scalars_canonical, window, scalar_bits)  # (W, *batch)
    W = digits.shape[0]

    def body(acc, wd):
        w, dig = wd
        # gather table row w at the digit indices: table leaf (..., W, B)
        def pick(t):
            rowt = jax.lax.dynamic_index_in_dim(t, w, axis=t.ndim - 2,
                                                keepdims=False)  # (..., B)
            return jnp.take(rowt, dig, axis=-1)  # (..., *batch)

        P = tuple(pick(t) for t in table)
        return curve.add(acc, P), None

    init = curve.zero(digits.shape[1:])
    out, _ = jax.lax.scan(body, init, (jnp.arange(W), digits))
    return out


def batch_exp(curve: Curve, window: int, table, scalars_canonical,
              scalar_bits: int = SCALAR_BITS):
    """[s_i * base] for scalars (48, N) -> projective batch (N,)
    (multiexp.tcc:615-647 batch_exp; one jitted program, no per-element
    loop)."""
    return windowed_exp(curve, window, table, scalars_canonical, scalar_bits)


def batch_exp_with_coeff(curve: Curve, window: int, table, coeff_mont,
                         scalars_mont, F, scalar_bits: int = SCALAR_BITS):
    """[(coeff * s_i) * base] (multiexp.tcc:649-682): the H-query's
    Z(t)/delta factor.  coeff/scalars in Montgomery form; the product is
    converted to canonical digits on device."""
    prod = F.mul(scalars_mont, jnp.broadcast_to(
        coeff_mont.reshape(coeff_mont.shape + (1,) * (scalars_mont.ndim - coeff_mont.ndim)),
        scalars_mont.shape))
    return windowed_exp(curve, window, table, F.to_canonical(prod), scalar_bits)


# ---------------------------------------------------------------------------
# wNAF
# ---------------------------------------------------------------------------

def find_wnaf(window_size: int, scalar: int) -> list[int]:
    """Width-(window_size+1) non-adjacent form digits, LSB first
    (wnaf.tcc:25-60): each nonzero digit is odd, |digit| < 2^window_size,
    and any two nonzero digits are at least window_size+1 apart."""
    res = []
    c = scalar
    mod = 1 << (window_size + 1)
    while c > 0:
        if c & 1:
            u = c % mod
            if u > mod // 2:
                u -= mod
            c -= u
        else:
            u = 0
        res.append(u)
        c >>= 1
    return res


def fixed_window_wnaf_exp(curve: Curve, window_size: int, P, scalar: int):
    """scalar * P via wNAF digits (wnaf.tcc:62-99).  P projective with
    batch shape (); host digit decomposition, one jitted device scan
    (never eager: op-by-op dispatch of 753-bit arithmetic is ~1000x
    slower than a compiled scan)."""
    naf = find_wnaf(window_size, scalar)
    if not naf:
        return curve.zero(())
    # pad to a fixed length so one compiled walk serves every scalar
    # (leading zero digits are masked no-ops)
    pad = (SCALAR_BITS + 2) - len(naf)
    naf = naf + [0] * max(0, pad)
    digits = jnp.asarray(np.array(naf[::-1], dtype=np.int32))  # MSB first

    @jax.jit
    def walk(P, digits):
        dblP = curve.double(P)

        def oddmul(carry, _):
            nxt = curve.add(carry, dblP)
            return nxt, carry

        n_odd = 1 << (window_size - 1)
        _, odd = jax.lax.scan(oddmul, P, None, length=n_odd)

        def step(acc, d):
            acc = curve.double(acc)
            idx = (jnp.abs(d) - 1) // 2
            Q = tuple(jnp.take(t, jnp.maximum(idx, 0), axis=0) for t in odd)
            Q = curve.select(d < 0, curve.neg(Q), Q)
            return curve.select(d == 0, acc, curve.add(acc, Q)), None

        acc, _ = jax.lax.scan(step, curve.zero(()), digits)
        return acc

    return walk(P, digits)


def opt_window_wnaf_exp(curve: Curve, P, scalar: int,
                        scalar_bits: int | None = None):
    """wNAF with a size-scaled window (wnaf.tcc:101-125)."""
    bits = scalar_bits if scalar_bits is not None else max(1, scalar.bit_length())
    window = max(2, min(8, int(math.log2(max(2, bits))) - 2))
    return fixed_window_wnaf_exp(curve, window, P, scalar)
