"""Pallas TPU kernel for 753-bit Montgomery multiplication.

The XLA fallback (ops.field.Fp.mul) expresses the three REDC
convolutions as fori_loops over dynamic-update-slices — correct, but
each loop step round-trips the (96, N) accumulator through HBM.  This
kernel fuses the whole product (t = a*b; m = t*n' mod R; u = (t+m*p)/R;
conditional subtract) into one VMEM-resident program: one HBM read per
operand tile, one write per result tile.

Layout matches the framework: uint32[48, N] planes of 16-bit limbs.
Each grid step owns a (48, TN) tile of elements; the limb axis sits on
sublanes, elements on lanes (8x128 VPU tiles).  The modulus planes ride
in as (48, 1) operands (Pallas kernels may not capture array constants).

Correctness scheme (identical to ops.limbs):
  * 16x16->32-bit lane products are exact in uint32;
  * accumulators hold sums of <= 96 16-bit halves: < 96*2^16 < 2^23;
  * two local carry passes bound limbs to 2^16+1, then an unrolled
    sequential ripple canonicalizes — registers make the ripple cheap
    in-kernel, unlike the XLA path which needs log-depth scans to avoid
    HBM round-trips.

Reference anchors: the CIOS splice this replaces is
cuda-fixnum/src/modnum/modnum_monty_cios.cu:85-127 and libff
fp.tcc:159-188 (the mpn path for 12x64 limbs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.primes import PrimeSpec
from ..utils.bigint import int_to_limbs

L = 48  # 16-bit limbs per element


def _add_at(acc, start, upd):
    """acc[start:start+len(upd)] += upd via static concatenation (the
    .at[].add scatter path materializes constant index arrays, which
    Pallas kernels reject)."""
    n = upd.shape[0]
    parts = []
    if start:
        parts.append(acc[:start])
    parts.append(acc[start : start + n] + upd)
    if start + n < acc.shape[0]:
        parts.append(acc[start + n :])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _conv_accumulate(a, b, L_out):
    """Schoolbook convolution of canonical (L, TN) operands into a
    redundant (L_out, TN) accumulator, unrolled at trace time."""
    TN = b.shape[1]
    acc = jnp.zeros((L_out, TN), jnp.uint32)
    for i in range(L):
        ai = a[i][None, :]                             # (1, TN)
        hi_lim = min(L, L_out - i)
        if hi_lim <= 0:
            break
        p = ai * b[:hi_lim]                            # exact u32
        lo = p & 0xFFFF
        hi = p >> 16
        acc = _add_at(acc, i, lo)
        hi_take = min(hi_lim, L_out - i - 1)
        if hi_take > 0:
            acc = _add_at(acc, i + 1, hi[:hi_take])
    return acc


def _carry_pass(x):
    lo = x & 0xFFFF
    hi = x >> 16
    return lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)


def _ripple(x):
    """Canonicalize limbs < 2^17: sequential carry ripple, unrolled."""
    outs = []
    carry = jnp.zeros_like(x[0])
    for l in range(x.shape[0]):
        v = x[l] + carry
        outs.append(v & 0xFFFF)
        carry = v >> 16
    return jnp.stack(outs)


def _geq(a, b_arr):
    """a >= b for canonical (L, TN) vs (L, 1), branch-free lexicographic."""
    gt = jnp.zeros(a.shape[1:], jnp.bool_)
    eq = jnp.ones(a.shape[1:], jnp.bool_)
    for l in range(a.shape[0] - 1, -1, -1):
        gt = gt | (eq & (a[l] > b_arr[l]))
        eq = eq & (a[l] == b_arr[l])
    return gt | eq


def _sub_const(a, b_arr):
    """a - b (canonical, used only where a >= b), unrolled borrow chain."""
    outs = []
    borrow = jnp.zeros_like(a[0])
    for l in range(a.shape[0]):
        d = a[l] - b_arr[l] - borrow
        outs.append(d & 0xFFFF)
        borrow = (d >> 31) & 1  # u32 wraparound sign bit
    return jnp.stack(outs)


def _mont_mul_kernel(a_ref, b_ref, p_ref, np_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    TN = a.shape[1]
    p_arr = p_ref[:]     # (L, 1)
    np_arr = np_ref[:]   # (L, 1)

    # t = a * b  (96-limb redundant)
    t = _conv_accumulate(a, b, 2 * L)
    t = _ripple(_carry_pass(_carry_pass(t)))

    # m = (t mod R) * n' mod R
    m = _conv_accumulate(t[:L], jnp.broadcast_to(np_arr, (L, TN)), L)
    m = _ripple(_carry_pass(_carry_pass(m)))

    # u = (t + m * p) / R
    mp = _conv_accumulate(m, jnp.broadcast_to(p_arr, (L, TN)), 2 * L)
    u = mp + t  # limbs < 2^23 + 2^16 < 2^24
    u = _ripple(_carry_pass(_carry_pass(u)))[L:]

    # conditional subtract p
    ge = _geq(u, p_arr)
    u_sub = _sub_const(u, p_arr)
    out_ref[:] = jnp.where(ge[None, :], u_sub, u)


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(spec: PrimeSpec, a, b, tile_n: int = 256):
    """Montgomery product of (48, N) planes via the fused Pallas kernel.
    N must be a multiple of tile_n (pad at call sites)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = a.shape[1]
    assert N % tile_n == 0, (N, tile_n)
    p_planes = jnp.asarray(int_to_limbs(spec.p)).reshape(L, 1)
    np_planes = jnp.asarray(int_to_limbs(spec.n_prime)).reshape(L, 1)

    grid = (N // tile_n,)
    return pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )(a, b, p_planes, np_planes)


def mont_mul_reference(spec: PrimeSpec, a, b):
    """Exactness oracle: same math via the XLA field core."""
    from .field import Fp

    return Fp(spec).mul(a, b)
