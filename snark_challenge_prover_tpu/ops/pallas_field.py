"""Pallas TPU kernel for 753-bit Montgomery multiplication.

The XLA fallback (ops.field.Fp.mul) expresses the three REDC
convolutions as fori_loops over dynamic-update-slices — correct, but
each loop step round-trips the (96, N) accumulator through HBM.  This
kernel fuses the whole product (t = a*b; m = t*n' mod R; u = (t+m*p)/R;
conditional subtract) into one VMEM-resident program: one HBM read per
operand tile, one write per result tile.

Layout matches the framework: uint32[48, N] planes of 16-bit limbs.
Each grid step owns a (48, TN) tile of elements; the limb axis sits on
sublanes, elements on lanes (8x128 VPU tiles).

Correctness scheme (identical to ops.limbs):
  * 16x16->32-bit lane products are exact in uint32;
  * accumulators hold sums of <= 96 16-bit halves: < 96*2^16 < 2^23;
  * one local carry pass bounds limbs to 2^16+2^7, a second to 2^16+1,
    then a sequential (unrolled, 48-step) carry ripple canonicalizes —
    in-kernel registers make the ripple cheap, unlike the XLA version
    which needs the log-depth associative_scan to avoid HBM round-trips.

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

L = 48          # 16-bit limbs per element
MASK = jnp.uint32(0xFFFF)


def _conv_accumulate(a_ref_like, b, L_out):
    """Schoolbook convolution of two canonical (L, TN) operands into a
    redundant (L_out, TN) accumulator, unrolled at trace time."""
    TN = b.shape[1]
    acc = jnp.zeros((L_out, TN), jnp.uint32)
    for i in range(L):
        ai = a_ref_like[i][None, :]                    # (1, TN)
        hi_lim = min(L, L_out - i)
        p = ai * b[:hi_lim]                            # exact u32
        lo = p & MASK
        hi = p >> 16
        acc = acc.at[i : i + hi_lim].add(lo)
        if i + 1 < L_out:
            acc = acc.at[i + 1 : i + 1 + min(hi_lim, L_out - i - 1)].add(
                hi[: L_out - i - 1]
            )
    return acc


def _carry_pass(x):
    lo = x & MASK
    hi = x >> 16
    return lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)


def _ripple(x):
    """Canonicalize limbs < 2^17: sequential carry ripple, unrolled."""
    outs = []
    carry = jnp.zeros_like(x[0])
    for l in range(x.shape[0]):
        v = x[l] + carry
        outs.append(v & MASK)
        carry = v >> 16
    return jnp.stack(outs)


def _geq(a, b_arr):
    """a >= b for canonical (L, TN) vs (L, 1) constant, branch-free."""
    # lexicographic from the top limb down
    gt = jnp.zeros(a.shape[1:], jnp.bool_)
    eq = jnp.ones(a.shape[1:], jnp.bool_)
    for l in range(a.shape[0] - 1, -1, -1):
        gt = gt | (eq & (a[l] > b_arr[l]))
        eq = eq & (a[l] == b_arr[l])
    return gt | eq


def _sub_const(a, b_arr):
    """a - b (canonical, a >= b assumed where used), unrolled borrow."""
    outs = []
    borrow = jnp.zeros_like(a[0])
    for l in range(a.shape[0]):
        d = a[l] - b_arr[l] - borrow
        outs.append(d & MASK)
        borrow = (d >> 31) & 1  # u32 wraparound sign
    return jnp.stack(outs)


def _mont_mul_kernel(a_ref, b_ref, out_ref, *, p_planes, np_planes):
    from jax.experimental import pallas as pl  # noqa: F401

    a = a_ref[:]
    b = b_ref[:]
    TN = a.shape[1]
    p_arr = jnp.asarray(p_planes, jnp.uint32)[:, None]
    np_arr = jnp.asarray(np_planes, jnp.uint32)[:, None]

    # t = a * b  (96-limb redundant)
    t = _conv_accumulate(a, b, 2 * L)
    t = _carry_pass(_carry_pass(t))
    t = _ripple(t)

    # m = (t mod R) * n' mod R (48-limb redundant -> canonical)
    m = _conv_accumulate(t[:L], jnp.broadcast_to(np_arr, (L, TN)), L)
    m = _carry_pass(_carry_pass(m))
    m = _ripple(m)

    # u = (t + m * p) / R
    mp = _conv_accumulate(m, jnp.broadcast_to(p_arr, (L, TN)), 2 * L)
    u = mp + t  # limbs < 2^23 + 2^16 < 2^24
    u = _carry_pass(_carry_pass(u))
    u = _ripple(u)[L:]

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
    p_planes = tuple(int(x) for x in int_to_limbs(spec.p))
    np_planes = tuple(int(x) for x in int_to_limbs(spec.n_prime))

    kernel = functools.partial(
        _mont_mul_kernel, p_planes=p_planes, np_planes=np_planes
    )
    grid = (N // tile_n,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a, b)


def mont_mul_reference(spec: PrimeSpec, a, b):
    """Interpreter-friendly exactness oracle: same math via ops.field."""
    from .field import Fp

    return Fp(spec).mul(a, b)
