"""Vectorized multi-limb integer arithmetic on 16-bit limb planes.

Arrays are uint32 of shape (L, *batch): limb index leading (so the batch
axis maps onto TPU vector lanes), 16 significant bits per limb, least
significant limb first.  This is the TPU-native analogue of cuda-fixnum's
one-limb-per-lane warp_fixnum (cuda-fixnum/src/fixnum/warp_fixnum.cu:16),
rotated so that SIMD runs across independent field elements instead of
across limbs.

Key primitives:
  * mul_wide / mul_low   — schoolbook convolution with lazy (redundant)
                           carries: every partial product is split into
                           16-bit halves before accumulation so sums of up
                           to ~2^7 terms stay below 2^23 < 2^32.
  * normalize            — redundant -> canonical limbs; two local
                           reduction passes followed by a Kogge-Stone
                           (log-depth) carry resolution via
                           jax.lax.associative_scan.
  * sub_borrow / cond_sub — canonical subtraction with log-depth borrow
                           resolution; powers modular compare/reduce.

All functions are jit-safe, shape-polymorphic over trailing batch dims,
and exact (tested bit-for-bit against Python ints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

LIMB_BITS = 16
# numpy scalar, NOT jnp: a module-level jnp constant would initialize
# the JAX backend at import time, before entry points can force the
# platform (this exact pattern sent round-2's dryrun_multichip onto the
# tunneled TPU instead of the 8-device CPU mesh - MULTICHIP_r02 rc=124)
LIMB_MASK = np.uint32(0xFFFF)

_u32 = jnp.uint32
_i32 = jnp.int32


def _zeros_like_row(x, k):
    """k zero limb-rows matching x's batch shape."""
    return jnp.zeros((k,) + x.shape[1:], x.dtype)


def shift_up(x, k):
    """Multiply by 2^(16k): drop top k rows, insert k zero rows at bottom."""
    if k == 0:
        return x
    return jnp.concatenate([_zeros_like_row(x, k), x[:-k]], axis=0)


def _carry_pass(x):
    """One local carry-reduction pass: x -> (x & 0xffff) + (x >> 16) << 16·1.
    Carries out of the top limb are dropped (callers guarantee headroom)."""
    lo = x & LIMB_MASK
    hi = x >> LIMB_BITS
    return lo + shift_up(hi, 1)


def _hs_scan(g, p):
    """Inclusive Kogge-Stone carry scan along axis 0, hand-rolled as
    Hillis-Steele rounds of whole-array shifts: ~4 HLO ops per round vs
    the slicing recursion jax.lax.associative_scan emits — the group-law
    graphs are built from thousands of these, so graph size is compile
    time (PLAN.md compile-time notes)."""
    L = g.shape[0]
    d = 1
    while d < L:
        gs = jnp.concatenate([jnp.zeros((d,) + g.shape[1:], g.dtype), g[:-d]], 0)
        ps = jnp.concatenate([jnp.zeros((d,) + p.shape[1:], p.dtype), p[:-d]], 0)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    return g


def resolve_carries(x):
    """Exact carry resolution for limbs with values <= 2^17-1 (i.e. after
    _carry_pass reductions).  Carry out of the top limb is dropped."""
    s = x & LIMB_MASK
    g = (x >> LIMB_BITS).astype(jnp.bool_)  # in {0,1} by precondition
    p = s == LIMB_MASK
    gs = _hs_scan(g, p)
    # carry INTO limb k is the aggregate of limbs [0, k)
    c = jnp.concatenate([_zeros_like_row(gs.astype(_u32), 1), gs[:-1].astype(_u32)], 0)
    return (s + c) & LIMB_MASK


def normalize(x):
    """Redundant (each limb < 2^23) -> canonical (each limb < 2^16).
    Value is preserved modulo 2^(16L) (top carries must be structurally
    impossible, which holds for all our fixed-width uses)."""
    x = _carry_pass(x)  # limbs <= 0xffff + 0x7f
    x = _carry_pass(x)  # limbs <= 0xffff + 1
    return resolve_carries(x)


def mul_wide(a, b):
    """Full product of canonical a (La limbs) and b (Lb limbs):
    (La+Lb, *batch) redundant limbs, each < 96 * 2^16 < 2^23.

    Schoolbook convolution as a fori_loop so the graph stays ~15 XLA ops
    regardless of width (an unrolled version is ~100x larger to compile;
    the TPU Pallas/MXU kernel replaces this on the hot path)."""
    La = a.shape[0]
    Lb = b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    acc = jnp.zeros((La + Lb,) + batch, _u32)
    b_b = jnp.broadcast_to(b, (Lb,) + batch)

    def step(i, acc):
        ai = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=True)  # (1, *batch)
        p = ai * b_b  # (Lb, *batch), exact in u32
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        win = jax.lax.dynamic_slice_in_dim(acc, i, Lb + 1, 0)
        upd = win.at[:Lb].add(lo).at[1:].add(hi)
        return jax.lax.dynamic_update_slice_in_dim(acc, upd, i, 0)

    return jax.lax.fori_loop(0, La, step, acc)


def mul_low(a, b, L):
    """Low L limbs of a*b (i.e. a*b mod 2^(16L)), redundant output."""
    full = mul_wide(a, b)
    return full[:L]


def mul_small(a, k: int):
    """Multiply canonical limbs by a small Python int (k < 2^16).
    Redundant output with limbs < 2^32/2 — normalize() safe for k <= 2^7-ish;
    for larger k the product limbs a_i*k < 2^16 * k must stay < 2^32 and the
    lo/hi split keeps accumulations < 2^17."""
    p = a * _u32(k)
    return (p & LIMB_MASK) + shift_up(p >> LIMB_BITS, 1)


def add(a, b):
    """Limb-wise add (redundant ok as long as headroom remains)."""
    return a + b


def sub_borrow(a, b):
    """Canonical a - b.  Returns (diff mod 2^(16L) canonical, borrow_out)
    where borrow_out (bool, batch-shaped) says a < b."""
    s = a.astype(_i32) - b.astype(_i32)  # in (-2^16, 2^16)
    g = s < 0
    p = s == 0
    gs = _hs_scan(g, p)
    c = jnp.concatenate([jnp.zeros((1,) + gs.shape[1:], _i32), gs[:-1].astype(_i32)], 0)
    d = s - c
    borrow_out = gs[-1]
    return (d & _i32(0xFFFF)).astype(_u32), borrow_out


def geq(a, b):
    """Canonical limb compare: a >= b (batch-shaped bool)."""
    _, lt = sub_borrow(a, b)
    return jnp.logical_not(lt)


def bcast_const(c, like):
    """Reshape a (L,) constant so it broadcasts under like's batch dims."""
    if c.ndim == like.ndim:
        return c
    return c.reshape(c.shape + (1,) * (like.ndim - c.ndim))


def cond_sub(a, m):
    """a - m if a >= m else a (canonical inputs; m of shape (L,) or (L,*batch))."""
    d, lt = sub_borrow(a, bcast_const(m, a))
    return jnp.where(lt, a, d)


def is_zero(a):
    """Batch-shaped bool: all limbs zero."""
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """Batch-shaped mask broadcast under the limb axis: mask ? a : b."""
    return jnp.where(mask[None], a, b)
