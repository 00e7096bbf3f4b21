"""Fused Pallas TPU kernels for the elliptic-curve group law.

The Fp.mul-only Pallas kernel (ops.pallas_field) still leaves every EC
add as ~dozens of separate XLA ops — 12 Montgomery muls plus ~23 field
add/subs with an HBM round-trip between each.  These kernels fuse the
ENTIRE group-law formula (complete projective RCB add, dbl-2007-bl)
into one VMEM-resident program per point tile: one HBM read per input
coordinate tile, one write per output.

Beyond fusion, in-kernel arithmetic is *lazy Montgomery*: intermediate
values are representatives bounded by k·p (k tracked at Python trace
time, kept <= 8) instead of canonical residues.  Montgomery REDC of
a*b with a < A·p, b < B·p is exact whenever A·B·p < R (here A·B <=
64 << R/p = 2^15) and its output is < 2p — so the per-mul conditional
subtraction and the per-add canonicalization disappear; only the three
kernel outputs pay the full reduction to [0, p).  Outputs are therefore
bit-identical to the XLA path (ops.group.Curve formulas): same field
values, same canonical limbs.

Layout: one element = uint32[48, N] planes of 16-bit limbs (towers
stack components: [deg*48, N]).  Tiles of TN lanes; limb axis on
sublanes.  All needed constants (p, n', k·p multiples, curve a / 3b)
ride in as one (48, C) operand — Pallas kernels may not capture array
constants.

Reference anchors: add is the same complete-formula replacement of
add-1998-cmo-2 (mnt4753_g1.cpp:220-264) as ops.group.Curve.add; double
is dbl-2007-bl (mnt4753_g1.cpp:315-347); the lazy-reduction scheme is
the TPU answer to the reference's asm carry chains (fp.tcc:159-188).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bigint import int_to_limbs
from .pallas_field import (
    L,
    _add_at,
    _carry_pass,
    _conv_accumulate,
    _geq,
    _ripple,
    _sub_const,
)

# bound policy: every LazyVal keeps value < bound*p with bound <= MAXB
MAXB = 8
# k·p palette for sub/reduce.  It MUST reach >= half the largest bound
# reduce() ever sees (mul_small by the Fq3 non-residue 11 on a bound-8
# value -> 88): a conditional subtract of c*p lowers a <b*p value to
# < max(c, b-c)*p, so with the palette capped at 8 a bound-66 value
# "reduced" only to 58p while CLAIMING 8 — downstream sub() headroom
# underflowed and corrupted the MNT6753 (Fq3) kernels on chip
# (round-5 bench byte-mismatch; MNT4753 survived because its inflated
# values only ever feed muls, which stay exact far beyond the claim).
_K_COLS = (1, 2, 4, 8, 16, 32, 64)


class _Ctx:
    """Constant palette: name -> (48, 1) value.  Each constant rides in
    as its OWN (48, 1) kernel operand — the proven mont_mul_pallas
    pattern; slicing a column out of one (48, C) matrix made Mosaic
    emit a both-axes vector.broadcast it does not implement.

    `mats` holds the byte-Toeplitz REDC matrices (f32) for the MXU path
    (see LazyFp.mul): m-even/odd/lo/hi (48x48) and p-even/odd/lo/hi
    (96x48)."""

    def __init__(self, by_name: dict, mats: dict | None = None):
        self.by_name = by_name
        self.mats = mats or {}

    def colv(self, name):
        return self.by_name[name]  # (48, 1)


class LazyVal:
    """(48, TN) canonical-16-bit-limb planes + a trace-time p-bound.

    is_bcast marks values that are lane-broadcasts of a (48, 1) const
    operand: Mosaic cannot ROW-index those (extracting a[i] of a lane
    broadcast forms a both-axes vector.broadcast it does not
    implement), so they may only appear where the limb axis is sliced
    whole — mul()'s second convolution operand, elementwise adds."""

    __slots__ = ("v", "bound", "is_bcast")

    def __init__(self, v, bound: int, is_bcast: bool = False):
        assert bound * 1 < (1 << 14), bound  # value < 2^767: limb-safe
        self.v = v
        self.bound = bound
        self.is_bcast = is_bcast


def _next_pow2(x: int) -> int:
    k = 1
    while k < x:
        k *= 2
    return k


def _rip(x):
    """Exact sequential ripple, or (measurement only) two wide carry
    passes + mask — see _unsafe_fast_ripple."""
    if _unsafe_fast_ripple():
        return _carry_pass(_carry_pass(x)) & jnp.uint32(0xFFFF)
    return _ripple(x)


class LazyFp:
    """Lazy Montgomery field ops inside a Pallas kernel."""

    elem_deg = 1

    def __init__(self, ctx: _Ctx, tn: int):
        self.ctx = ctx
        self.tn = tn

    # -- helpers --------------------------------------------------------
    def _bcast(self, name):
        return jnp.broadcast_to(self.ctx.colv(name), (L, self.tn))

    def _cond_sub(self, v, k: int):
        kp = self.ctx.colv(f"p{k}")
        ge = _geq(v, kp)
        return jnp.where(ge[None, :], _sub_const(v, kp), v)

    def reduce(self, a: LazyVal, target: int = MAXB) -> LazyVal:
        """Shrink the p-bound via conditional subtractions of 2^j·p.
        One conditional subtract of c*p takes a value < b*p to
        < max(c, b-c)*p — the TRUE bound, not c (see _K_COLS note)."""
        b = a.bound
        v = a.v
        assert b <= 2 * _K_COLS[-1], b  # palette must cover b/2
        while b > target:
            c = min(_next_pow2(b) // 2, _K_COLS[-1])
            v = self._cond_sub(v, c)
            b = max(c, b - c)
        return LazyVal(v, b)

    # -- constructors ---------------------------------------------------
    def const(self, name) -> LazyVal:
        """A canonical Montgomery constant column (bound 1)."""
        return LazyVal(self._bcast(name), 1, is_bcast=True)

    def load(self, v) -> LazyVal:
        """Kernel input: canonical residue."""
        return LazyVal(v, 1)

    def store(self, a: LazyVal):
        """Fully reduce to the canonical representative in [0, p)."""
        v = self.reduce(a, 2).v
        return self._cond_sub(v, 1)

    # -- ring ops -------------------------------------------------------
    def add(self, a: LazyVal, b: LazyVal) -> LazyVal:
        v = _rip(a.v + b.v)  # limbs < 2^17: one ripple canonicalizes
        out = LazyVal(v, a.bound + b.bound)
        return self.reduce(out) if out.bound > MAXB else out

    def double(self, a: LazyVal) -> LazyVal:
        return self.add(a, a)

    def sub(self, a: LazyVal, b: LazyVal) -> LazyVal:
        assert not (a.is_bcast or b.is_bcast)  # ripple/borrow row-index
        k = _next_pow2(b.bound)
        t = _rip(a.v + self._bcast(f"p{k}"))  # a + k·p >= b
        # borrow chain: t, b canonical 16-bit; t's value >= b's
        outs = []
        borrow = jnp.zeros_like(t[0])
        for l in range(L):
            d = t[l] - b.v[l] - borrow
            outs.append(d & 0xFFFF)
            borrow = (d >> 31) & 1
        out = LazyVal(jnp.stack(outs), a.bound + k)
        return self.reduce(out) if out.bound > MAXB else out

    def _mxu_conv(self, x, prefix: str):
        """Constant-operand byte convolution on the MXU: canonical
        16-bit limbs x (48, TN) -> redundant u32 limbs (rows, TN) of
        const * x, truncated at `rows` 16-bit positions.

        Exactness: byte operands <= 255 are exact in bf16; each output
        byte sums <= 192 byte-products < 2^24, exact in f32.  The
        even/odd output-byte split keeps every matmul coefficient a
        single byte — recombining (even + (odd << 8)) stays < 2^31."""
        # Mosaic has no direct uint32<->bf16 casts; route via int32/f32
        lo = (x & jnp.uint32(0xFF)).astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)
        hi = (x >> jnp.uint32(8)).astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)

        def mm(mat, v):
            return jax.lax.dot_general(
                mat.astype(jnp.bfloat16), v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def to_u32(f):
            return f.astype(jnp.int32).astype(jnp.uint32)

        # coefficient byte of output byte k from input byte j is
        # const_byte(k - j); with k = 2i(+1), j = 2j'(+1) only three
        # distinct Toeplitz banded matrices occur (odd-hi == even-lo)
        M = self.ctx.mats
        even = mm(M[f"{prefix}_ee"], lo) + mm(M[f"{prefix}_eh"], hi)
        odd = mm(M[f"{prefix}_oe"], lo) + mm(M[f"{prefix}_ee"], hi)
        return to_u32(even) + (to_u32(odd) << 8)

    def mul(self, a: LazyVal, b: LazyVal) -> LazyVal:
        if a.bound * b.bound > 64:  # stay far below the 2^15 REDC bound
            a = self.reduce(a, 2)
            b = self.reduce(b, 2)
        assert a.bound * b.bound <= 64
        if a.is_bcast:
            # the first conv operand gets row-indexed (a[i]); a const
            # broadcast must be the second.  a*b == b*a, so t (and the
            # whole REDC) is bit-identical.
            a, b = b, a
        assert not a.is_bcast, "const*const products are not expected"
        t = _conv_accumulate(a.v, b.v, 2 * L)
        t = _rip(_carry_pass(_carry_pass(t)))
        if self.ctx.mats:
            # REDC's two constant convolutions ride the MXU (t*n' mod R
            # and m*p); only the variable a*b conv stays on the VPU —
            # the in-kernel form of Fp._redc_mxu's Toeplitz idea.
            m = self._mxu_conv(t[:L], "np")
            m = _rip(_carry_pass(_carry_pass(m)))
            u = self._mxu_conv(m, "p") + t
        else:
            m = _conv_accumulate(t[:L], self._bcast("np"), L)
            m = _rip(_carry_pass(_carry_pass(m)))
            u = _conv_accumulate(m, self._bcast("p1"), 2 * L) + t
        u = _rip(_carry_pass(_carry_pass(u)))[L:]
        return LazyVal(u, 2)

    def sqr(self, a: LazyVal) -> LazyVal:
        return self.mul(a, a)

    def mul_small(self, a: LazyVal, k: int) -> LazyVal:
        """a * k for a small plain integer k (non-residue scaling)."""
        assert not a.is_bcast  # the ripple row-indexes its input
        v = _rip(a.v * jnp.uint32(k))  # limbs < k*2^16 < 2^21
        out = LazyVal(v, a.bound * k)
        return self.reduce(out) if out.bound > MAXB else out

    # -- point plumbing -------------------------------------------------
    def load_point(self, refs):
        return tuple(self.load(r) for r in refs)

    def store_point(self, P):
        return tuple(self.store(t) for t in P)

    def curve_const(self, name) -> LazyVal:
        return self.const(name)

    def is_zero_input(self, a: LazyVal):
        """Exact zero test — valid only on canonical (bound-1) inputs."""
        assert a.bound == 1
        return jnp.all(a.v == 0, axis=0)  # (TN,)


class _LazyExt:
    """Lazy tower field: components are tuples of base elements."""

    def __init__(self, base: LazyFp, deg: int, nr: int):
        self.base = base
        self.deg = deg
        self.nr = nr
        self.elem_deg = deg

    def load_point(self, refs):
        # refs: per coordinate, a (deg*48, TN) value; split into components
        def split(r):
            return tuple(
                self.base.load(r[i * L : (i + 1) * L]) for i in range(self.deg)
            )

        return tuple(split(r) for r in refs)

    def store_point(self, P):
        return tuple(
            jnp.concatenate([self.base.store(c) for c in t], axis=0) for t in P
        )

    def curve_const(self, name):
        return tuple(
            self.base.const(f"{name}{i}") for i in range(self.deg)
        )

    def add(self, a, b):
        F = self.base
        return tuple(F.add(x, y) for x, y in zip(a, b))

    def sub(self, a, b):
        F = self.base
        return tuple(F.sub(x, y) for x, y in zip(a, b))

    def double(self, a):
        return self.add(a, a)

    def mul_nr(self, x):
        return self.base.mul_small(x, self.nr)

    def is_zero_input(self, a):
        z = self.base.is_zero_input(a[0])
        for c in a[1:]:
            z = jnp.logical_and(z, self.base.is_zero_input(c))
        return z


class LazyFp2(_LazyExt):
    """Karatsuba Fq2 mul / complex squaring (fp2.tcc:81-135), lazy."""

    def mul(self, a, b):
        F = self.base
        v0 = F.mul(a[0], b[0])
        v1 = F.mul(a[1], b[1])
        t = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        c0 = F.add(v0, self.mul_nr(v1))
        c1 = F.sub(F.sub(t, v0), v1)
        return (c0, c1)

    def sqr(self, a):
        F = self.base
        t0 = F.add(a[0], a[1])
        t1 = F.add(a[0], self.mul_nr(a[1]))
        v = F.mul(a[0], a[1])
        w = F.mul(t0, t1)
        c0 = F.sub(F.sub(w, v), self.mul_nr(v))
        c1 = F.double(v)
        return (c0, c1)


class LazyFp3(_LazyExt):
    """6-mul Karatsuba-style Fq3 schedule (fp3.tcc), lazy."""

    def mul(self, a, b):
        F = self.base
        v0 = F.mul(a[0], b[0])
        v1 = F.mul(a[1], b[1])
        v2 = F.mul(a[2], b[2])
        t01 = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        t02 = F.mul(F.add(a[0], a[2]), F.add(b[0], b[2]))
        t12 = F.mul(F.add(a[1], a[2]), F.add(b[1], b[2]))
        c0 = F.add(v0, self.mul_nr(F.sub(F.sub(t12, v1), v2)))
        c1 = F.add(F.sub(F.sub(t01, v0), v1), self.mul_nr(v2))
        c2 = F.add(F.sub(F.sub(t02, v0), v2), v1)
        return (c0, c1, c2)

    def sqr(self, a):
        return self.mul(a, a)


# ---------------------------------------------------------------------------
# Curve formulas over a lazy field — mirror ops.group.Curve exactly.
# ---------------------------------------------------------------------------


def _rcb_add(LF, P, Q):
    """Complete projective RCB addition (ops.group.Curve._add_flat)."""
    F = LF
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    a = LF.curve_const("a")
    b3 = LF.curve_const("b3")

    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    t4 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
    t5 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.sub(t4, F.add(t0, t2))
    t5 = F.sub(t5, F.add(t1, t2))
    b3t2 = F.mul(b3, t2)
    at4 = F.mul(a, t4)
    t2a = F.mul(a, t2)
    t4b = F.mul(b3, t4)
    Z3 = F.add(b3t2, at4)
    X3 = F.sub(t1, Z3)
    Z3 = F.add(t1, Z3)
    t1 = F.add(F.add(t0, t0), t0)
    t1 = F.add(t1, t2a)
    Y3 = F.mul(X3, Z3)
    t2 = F.mul(a, F.sub(t0, t2a))
    t4 = F.add(t4b, t2)
    m0 = F.mul(t1, t4)
    m1 = F.mul(t3, X3)
    m2 = F.mul(t5, t4)
    m3 = F.mul(t5, Z3)
    m4 = F.mul(t3, t1)
    Y3 = F.add(Y3, m0)
    X3 = F.sub(m1, m2)
    Z3 = F.add(m3, m4)
    return (X3, Y3, Z3)


def _dbl_2007_bl(LF, P):
    """dbl-2007-bl (ops.group.Curve._double_flat), sans identity select —
    the kernel wrapper applies the mask on canonical inputs."""
    F = LF
    X1, Y1, Z1 = P
    a = LF.curve_const("a")
    XX = F.mul(X1, X1)
    ZZ = F.mul(Z1, Z1)
    Y1Z1 = F.mul(Y1, Z1)
    s = F.double(Y1Z1)
    aZZ = F.mul(a, ZZ)
    ss = F.mul(s, s)
    R = F.mul(Y1, s)
    w = F.add(aZZ, F.add(XX, F.add(XX, XX)))
    XR = F.add(X1, R)
    sss = F.mul(s, ss)
    RR = F.mul(R, R)
    XR2 = F.mul(XR, XR)
    B = F.sub(F.sub(XR2, XX), RR)
    h = F.sub(F.mul(w, w), F.double(B))
    X3 = F.mul(h, s)
    Y3w = F.mul(w, F.sub(B, h))
    Y3 = F.sub(Y3w, F.double(RR))
    Z3 = sss
    return (X3, Y3, Z3)


# ---------------------------------------------------------------------------
# Kernel construction + dispatch
# ---------------------------------------------------------------------------

_KERNEL_CACHE: dict = {}


def _curve_key(curve) -> tuple:
    return (id(curve),)


def kernel_mxu_enabled() -> bool:
    """MXU path for REDC's constant convolutions inside the EC kernels
    (default on; SNARK_TPU_KERNEL_MXU=0 falls back to all-VPU)."""
    return os.environ.get("SNARK_TPU_KERNEL_MXU", "1") == "1"


def _toeplitz_mats(cint: int, out_limbs: int, prefix: str):
    """The three banded byte matrices of `cint`'s convolution:
    out_byte(k) = sum_j cbyte(k - j) * in_byte(j), split by parity."""
    nb = 2 * L  # const byte count (values < 2^768)

    def cb(k):
        k = int(k)  # np.vectorize hands in np.int64; cint is a bigint
        return (cint >> (8 * k)) & 0xFF if 0 <= k < nb else 0

    i = np.arange(out_limbs)[:, None]
    j = np.arange(L)[None, :]
    cbv = np.vectorize(cb)
    ee = cbv(2 * i - 2 * j).astype(np.float32)       # even<-lo, odd<-hi
    eh = cbv(2 * i - 2 * j - 1).astype(np.float32)   # even<-hi
    oe = cbv(2 * i + 1 - 2 * j).astype(np.float32)   # odd<-lo
    return [(f"{prefix}_ee", ee), (f"{prefix}_eh", eh), (f"{prefix}_oe", oe)]


def _const_palette(curve):
    """Ordered [(name, (48,) uint32)] palette + MXU matrix palette for
    `curve`'s base prime."""
    F = curve.F
    deg = getattr(F, "deg", 1)
    spec = F.spec if deg == 1 else F._prime_field.spec
    cols = []

    def put(name, arr):
        cols.append((name, np.asarray(arr, np.uint32)))

    for k in _K_COLS:
        put(f"p{k}", int_to_limbs(k * spec.p))
    put("np", int_to_limbs(spec.n_prime))
    a = np.asarray(curve.a).reshape(-1, L)
    b3 = np.asarray(curve.b3).reshape(-1, L)
    if deg == 1:
        put("a", a[0])
        put("b3", b3[0])
    else:
        for i in range(deg):
            put(f"a{i}", a[i])
            put(f"b3{i}", b3[i])
    mats = _toeplitz_mats(spec.n_prime, L, "np") + _toeplitz_mats(
        spec.p, 2 * L, "p"
    )
    return cols, mats, deg, spec


def _lazy_field(ctx, tn, deg, nr):
    base = LazyFp(ctx, tn)
    if deg == 1:
        return base
    if deg == 2:
        return LazyFp2(base, 2, nr)
    return LazyFp3(base, 3, nr)


def _apply_formula(op: str, const_vals: dict, mat_vals: dict, deg, nr,
                   tn, in_vals):
    """The shared kernel math: (deg*48, tn) coordinate values -> output
    values.  Called from the Pallas kernel body (on VMEM reads) AND as a
    plain traced jax function (tests: bit-exact oracle for the kernel
    without interpret-mode's per-op dispatch)."""
    ctx = _Ctx(const_vals, mat_vals)
    LF = _lazy_field(ctx, tn, deg, nr)
    if op == "add":
        P = LF.load_point(in_vals[:3])
        Q = LF.load_point(in_vals[3:])
        return LF.store_point(_rcb_add(LF, P, Q))
    P = LF.load_point(in_vals)
    R = _dbl_2007_bl(LF, P)
    outs = LF.store_point(R)
    # identity doubles to identity (canonical inputs: exact test)
    zmask = jnp.logical_and(
        LF.is_zero_input(P[0]), LF.is_zero_input(P[2])
    )[None, :]
    return tuple(jnp.where(zmask, i, o) for i, o in zip(in_vals, outs))


def _build_pallas(curve, op: str, tile_n: int):
    key = ("ec", id(curve), op, tile_n, kernel_mxu_enabled())
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    palette, mats, deg, spec = _const_palette(curve)
    use_mxu = kernel_mxu_enabled()
    if not use_mxu:
        mats = []
    names = [n for n, _ in palette]
    mat_names = [n for n, _ in mats]
    nr = getattr(curve.F, "nr", 0)
    rows = deg * L
    n_in = 6 if op == "add" else 3

    def kernel(*refs):
        in_vals = [r[:] for r in refs[:n_in]]
        const_vals = {
            n: refs[n_in + i][:] for i, n in enumerate(names)
        }
        mat_vals = {
            n: refs[n_in + len(names) + i][:]
            for i, n in enumerate(mat_names)
        }
        outs = _apply_formula(op, const_vals, mat_vals, deg, nr,
                              tile_n, in_vals)
        for r, o in zip(refs[n_in + len(names) + len(mat_names) :], outs):
            r[:] = o

    tile_spec = pl.BlockSpec(
        (rows, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    const_spec = pl.BlockSpec(
        (L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    mat_specs = [
        pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _, m in mats
    ]
    # HOST numpy, never jnp: _build_pallas runs inside the caller's
    # trace the first time, and a device constant created there would
    # leak that trace's tracer into the cached `call` closure
    # (UnexpectedTracerError when the next program reuses it).
    const_arrays = [arr.reshape(L, 1).copy() for _, arr in palette]
    mat_arrays = [m.copy() for _, m in mats]

    @jax.jit
    def call(*coords):
        N = coords[0].shape[1]
        grid = (N // tile_n,)
        out = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((rows, N), jnp.uint32)] * 3,
            grid=grid,
            in_specs=[tile_spec] * n_in + [const_spec] * len(names)
            + mat_specs,
            out_specs=[tile_spec] * 3,
        )(*coords, *const_arrays, *mat_arrays)
        return tuple(out)

    _KERNEL_CACHE[key] = call
    return call


def default_tile_n(deg: int) -> int:
    env = os.environ.get("SNARK_TPU_EC_TILE")
    if env:
        return int(env)
    return 256 if deg == 1 else 128


# measurement-only knob: replace the exact 48-step carry ripple with two
# wide carry passes (INEXACT on adversarial carry chains — never enable
# for real proofs; used to attribute kernel time to the ripple)
def _unsafe_fast_ripple() -> bool:
    return os.environ.get("SNARK_TPU_UNSAFE_FASTRIPPLE", "0") == "1"


def ec_op_jax_reference(curve, op: str, *points):
    """The kernel math as a plain jitted XLA function — the test oracle
    for bit-exactness (same trace as the kernel body, minus the Pallas
    plumbing, which the tiny interpret smoke covers)."""
    F = curve.F
    k = F.elem_ndim
    deg = getattr(F, "deg", 1)
    palette, mats, _, _ = _const_palette(curve)
    const_vals = {n: arr.reshape(L, 1) for n, arr in palette}
    mat_vals = {n: m for n, m in mats} if kernel_mxu_enabled() else {}
    nr = getattr(F, "nr", 0)
    batch = jnp.broadcast_shapes(*(t.shape[k:] for P in points for t in P))
    total = int(np.prod(batch)) if batch else 1
    coords = []
    for P in points:
        for t in P:
            tb = jnp.broadcast_to(t, t.shape[:k] + batch)
            coords.append(tb.reshape(-1, total))
    outs = jax.jit(
        lambda cv, mv, *ins: _apply_formula(op, cv, mv, deg, nr, total,
                                            list(ins))
    )(const_vals, mat_vals, *coords)
    res = []
    for t in outs:
        shape = ((deg,) if deg > 1 else ()) + (L,) + batch
        res.append(t.reshape(shape))
    return tuple(res)


def ec_op_pallas(curve, op: str, *points):
    """Apply the fused `op` kernel; points are projective triples with
    arbitrary (broadcastable) batch shapes.  Returns the same layout as
    Curve.add/double — canonical limbs, bit-identical to the XLA path."""
    F = curve.F
    k = F.elem_ndim
    deg = getattr(F, "deg", 1)
    batch = jnp.broadcast_shapes(
        *(t.shape[k:] for P in points for t in P)
    )
    total = int(np.prod(batch)) if batch else 1
    coords = []
    for P in points:
        for t in P:
            tb = jnp.broadcast_to(t, t.shape[:k] + batch)
            coords.append(tb.reshape(-1, total))
    tile = default_tile_n(deg)
    pad = (total + tile - 1) // tile * tile - total
    if pad:
        coords = [jnp.pad(t, [(0, 0), (0, pad)]) for t in coords]
    call = _build_pallas(curve, op, tile)
    out = call(*coords)
    res = []
    for t in out:
        t = t[:, :total]
        shape = ((deg,) if deg > 1 else ()) + (L,) + batch
        res.append(t.reshape(shape))
    return tuple(res)


# ---------------------------------------------------------------------------
# Eligibility — mirrors ops.field.Fp._pallas_eligible
# ---------------------------------------------------------------------------


def ec_pallas_eligible(curve, batch_shape) -> bool:
    env = os.environ.get("SNARK_TPU_PALLAS_EC")
    if env == "0":
        return False
    from .field import pallas_scope_active

    if env != "1" and not pallas_scope_active():
        return False
    deg = getattr(curve.F, "deg", 1)
    if deg not in (1, 2, 3):
        return False
    # nested towers (Fq4/Fq6 GT) are not kernelized
    if deg > 1 and getattr(curve.F.base, "elem_ndim", 1) != 1:
        return False
    import math

    total = math.prod(batch_shape) if batch_shape else 1
    if total < int(os.environ.get("SNARK_TPU_EC_MIN_BATCH", "256")):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    return True
