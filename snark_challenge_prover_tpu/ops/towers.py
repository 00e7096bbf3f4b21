"""Extension-field towers over the 753-bit base fields.

Element layout: one leading component axis on top of the base-field limb
planes — an Fq2 vector of N elements is uint32[2, 48, N], Fq3 is
uint32[3, 48, N].  All ops are branch-free and vectorized.

Multiplication schedules follow the reference's operation counts:
  * Fq2: 3-mul Karatsuba (libff fp2.tcc:81-104) and complex squaring
    (fp2.tcc:106-135).
  * Fq3: 6-mul Toom/Karatsuba variant (libff fp3.tcc) with the
    non-residue folded in via cheap small-int scaling.
  * Fq4 / Fq6(2 over 3): quadratic towers over Fq2/Fq3 (fp4.tcc,
    fp6_2over3.tcc), elements uint32[2, 2, 48, N] / [2, 3, 48, N] —
    the pairing targets (GT), with Frobenius maps and unitary inverse.
    Frobenius coefficients are derived in ops.frobenius and pinned
    against the reference's decimal strings in tests/test_models.py.

The non-residues are small (13 for MNT4753's Fq2/Fq4, 11 for MNT6753's
Fq3/Fq6, mnt4753_init.cpp:105, mnt6753_init.cpp:109) so mul-by-nonresidue
is a small-scalar limb multiply + conditional subtracts instead of a full
Montgomery multiply.
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import Fp


class _ExtBase:
    """Shared helpers; components stacked on axis 0.  `base` may itself
    be an extension (Fq4 = Fp4 over Fp2, Fq6 = Fp6_2over3 over Fp3), in
    which case elem_ndim grows by one per tower level."""

    elem_ndim = 2  # (deg, 48) planes per element (one tower level)

    def __init__(self, base, non_residue: int, name: str):
        self.base = base
        self.nr = non_residue
        self.name = name
        self.elem_ndim = getattr(base, "elem_ndim", 1) + 1

    # component helpers -----------------------------------------------
    def _stack(self, comps):
        return jnp.stack(comps, axis=0)

    def zeros(self, batch_shape):
        return jnp.zeros((self.deg,) + self.base.zeros(batch_shape).shape, jnp.uint32)

    def ones(self, batch_shape):
        one = self.base.ones(batch_shape)
        zero = self.base.zeros(batch_shape)
        return self._stack([one] + [zero] * (self.deg - 1))

    def add(self, a, b):
        return self._stack([self.base.add(a[i], b[i]) for i in range(self.deg)])

    def sub(self, a, b):
        return self._stack([self.base.sub(a[i], b[i]) for i in range(self.deg)])

    def neg(self, a):
        return self._stack([self.base.neg(a[i]) for i in range(self.deg)])

    def double(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        z = self.base.is_zero(a[0])
        for i in range(1, self.deg):
            z = jnp.logical_and(z, self.base.is_zero(a[i]))
        return z

    def eq(self, a, b):
        e = self.base.eq(a[0], b[0])
        for i in range(1, self.deg):
            e = jnp.logical_and(e, self.base.eq(a[i], b[i]))
        return e

    def select(self, mask, a, b):
        return jnp.where(mask[(None,) * self.elem_ndim], a, b)

    def mul_nr(self, x):
        """Multiply a base-field element by the non-residue."""
        return self.base.mul_small(x, self.nr)

    def scale_prime_const(self, a, c):
        """Multiply every (nested) component by a prime-field Montgomery
        constant c of shape (48,) — used by Frobenius/twist endomorphisms."""
        F = self.base
        if hasattr(F, "scale_prime_const"):
            return self._stack([F.scale_prime_const(a[i], c) for i in range(self.deg)])
        return self._stack([F.mul_const(a[i], c) for i in range(self.deg)])

    def inv(self, a):
        """Generic inverse via the norm map (used off the hot path)."""
        raise NotImplementedError

    def pow_int(self, a, e: int):
        import numpy as np
        import jax

        bits = [(e >> i) & 1 for i in range(e.bit_length())][::-1]
        bits_arr = jnp.asarray(np.array(bits, dtype=np.bool_))

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(bit, self.mul(acc, a), acc)
            return acc, None

        out, _ = jax.lax.scan(body, self.ones(a.shape[self.elem_ndim :]), bits_arr)
        return out

    # ---- Frobenius -----------------------------------------------------
    @property
    def _prime_field(self):
        """The bottom Fp of the tower."""
        f = self.base
        while hasattr(f, "base"):
            f = f.base
        return f

    def _frob_const(self, c_int: int):
        """Fq Montgomery constant planes for a Frobenius coefficient."""
        return self._prime_field.const(c_int)


class Fp2(_ExtBase):
    """Fq[u] / (u^2 - nr).

    Multiplications STACK their independent base-field products into one
    batched F.mul along a fresh batch axis (the limb-plane REDC graph is
    applied lane-wise, so values are bit-identical to separate calls):
    one traced multiply instead of three — ~3x smaller XLA graphs (the
    G2 compile-time bottleneck) and wider VPU lanes at runtime."""

    deg = 2

    def _stacked_mul(self, xs, ys):
        """[(x_i * y_i)] via one batched base mul; inputs (48, *batch)."""
        F = self.base
        A = jnp.stack(xs, axis=F.elem_ndim)
        B = jnp.stack(ys, axis=F.elem_ndim)
        V = F.mul(A, B)
        k = F.elem_ndim
        return [jnp.take(V, i, axis=k) for i in range(len(xs))]

    def mul(self, a, b):
        F = self.base
        # Karatsuba (fp2.tcc:81-104): v0, v1, (a0+a1)(b0+b1) in one mul
        v0, v1, t = self._stacked_mul(
            [a[0], a[1], F.add(a[0], a[1])],
            [b[0], b[1], F.add(b[0], b[1])],
        )
        c0 = F.add(v0, self.mul_nr(v1))
        c1 = F.sub(F.sub(t, v0), v1)
        return self._stack([c0, c1])

    def sqr(self, a):
        # complex squaring (fp2.tcc:106-135)
        F = self.base
        t0 = F.add(a[0], a[1])
        t1 = F.add(a[0], self.mul_nr(a[1]))
        v, w = self._stacked_mul([a[0], t0], [a[1], t1])
        c0 = F.sub(F.sub(w, v), self.mul_nr(v))
        c1 = F.double(v)
        return self._stack([c0, c1])

    def mul_base(self, a, s):
        """Multiply by a base-field element (broadcast over components)."""
        F = self.base
        return self._stack([F.mul(a[0], s), F.mul(a[1], s)])

    def inv(self, a):
        # (a0 - a1 u) / (a0^2 - nr a1^2)
        F = self.base
        norm = F.sub(F.sqr(a[0]), self.mul_nr(F.sqr(a[1])))
        ninv = F.inv(norm)
        return self._stack([F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv))])

    def batch_inv(self, a):
        F = self.base
        norm = F.sub(F.sqr(a[0]), self.mul_nr(F.sqr(a[1])))
        ninv = F.batch_inv(norm)
        return self._stack([F.mul(a[0], ninv), F.neg(F.mul(a[1], ninv))])

    def frobenius_map(self, a, power: int):
        """x -> x^(q^power) (fp2.tcc Frobenius_map): c1 scales by
        nr^((q-1)/2) when power is odd — derived, pinned vs
        mnt4753_init.cpp:117-118 in tests/test_models.py."""
        from .frobenius import fq2_frobenius_coeffs_c1

        F = self.base
        c = fq2_frobenius_coeffs_c1(F.p, self.nr)[power % 2]
        if c == 1:
            return a
        return self._stack([a[0], F.mul_const(a[1], self._frob_const(c))])


class Fp3(_ExtBase):
    """Fq[u] / (u^3 - nr).  Like Fp2, independent base products stack
    into one batched multiply (6 -> 1 traced mul)."""

    deg = 3

    _stacked_mul = Fp2._stacked_mul

    def mul(self, a, b):
        # 6-mul Karatsuba-style schedule (fp3.tcc), one batched multiply
        F = self.base
        v0, v1, v2, t01, t02, t12 = self._stacked_mul(
            [
                a[0], a[1], a[2],
                F.add(a[0], a[1]), F.add(a[0], a[2]), F.add(a[1], a[2]),
            ],
            [
                b[0], b[1], b[2],
                F.add(b[0], b[1]), F.add(b[0], b[2]), F.add(b[1], b[2]),
            ],
        )
        c0 = F.add(v0, self.mul_nr(F.sub(F.sub(t12, v1), v2)))
        c1 = F.add(F.sub(F.sub(t01, v0), v1), self.mul_nr(v2))
        c2 = F.add(F.sub(F.sub(t02, v0), v2), v1)
        return self._stack([c0, c1, c2])

    def sqr(self, a):
        return self.mul(a, a)

    def mul_base(self, a, s):
        F = self.base
        return self._stack([F.mul(a[i], s) for i in range(3)])

    def _norm_parts(self, a):
        # inverse by the classical cubic formula (fp3.tcc invert):
        # t0=a0^2, t1=a1^2, t2=a2^2, t3=a0a1, t4=a0a2, t5=a1a2
        # c0 = t0 - nr*t5 ; c1 = nr*t2 - t3 ; c2 = t1 - t4
        # norm = a0*c0 + nr*(a2*c1 + a1*c2)
        F = self.base
        t0, t1, t2, t3, t4, t5 = self._stacked_mul(
            [a[0], a[1], a[2], a[0], a[0], a[1]],
            [a[0], a[1], a[2], a[1], a[2], a[2]],
        )
        c0 = F.sub(t0, self.mul_nr(t5))
        c1 = F.sub(self.mul_nr(t2), t3)
        c2 = F.sub(t1, t4)
        n0, n1, n2 = self._stacked_mul([a[0], a[2], a[1]], [c0, c1, c2])
        norm = F.add(n0, self.mul_nr(F.add(n1, n2)))
        return c0, c1, c2, norm

    def inv(self, a):
        F = self.base
        c0, c1, c2, norm = self._norm_parts(a)
        ninv = F.inv(norm)
        return self._stack([F.mul(c0, ninv), F.mul(c1, ninv), F.mul(c2, ninv)])

    def batch_inv(self, a):
        F = self.base
        c0, c1, c2, norm = self._norm_parts(a)
        ninv = F.batch_inv(norm)
        return self._stack([F.mul(c0, ninv), F.mul(c1, ninv), F.mul(c2, ninv)])

    def frobenius_map(self, a, power: int):
        """x -> x^(q^power) (fp3.tcc Frobenius_map): component m scales
        by coeffs_c{m}[power % 3]; derived, pinned vs
        mnt6753_init.cpp:110-116 in tests/test_models.py."""
        from .frobenius import fq3_frobenius_coeffs_c1, fq3_frobenius_coeffs_c2

        F = self.base
        c1 = fq3_frobenius_coeffs_c1(F.p, self.nr)[power % 3]
        c2 = fq3_frobenius_coeffs_c2(F.p, self.nr)[power % 3]
        if c1 == 1 and c2 == 1:
            return a
        return self._stack(
            [
                a[0],
                F.mul_const(a[1], self._frob_const(c1)),
                F.mul_const(a[2], self._frob_const(c2)),
            ]
        )


class Fp4(Fp2):
    """Fq4 = Fq2[v] / (v^2 - u): the MNT4753 pairing target GT
    (fp4.tcc).  Quadratic-extension formulas are inherited from Fp2
    (they are generic over the base field); only the non-residue action
    differs: multiplying an Fq2 element (c0 + c1 u) by v^2 = u gives
    (nr*c1 + c0 u)."""

    deg = 2

    def mul_nr(self, x):
        F2 = self.base  # Fp2
        Fq = F2.base
        return F2._stack([Fq.mul_small(x[1], self.nr), x[0]])

    def frobenius_map(self, a, power: int):
        """fp4.tcc Frobenius_map: (c0.frob, coeff * c1.frob) with
        coeff = nr^(power*(q-1)/4) in Fq (mnt4753_init.cpp:113-118)."""
        from .frobenius import fq4_frobenius_coeffs_c1

        F2 = self.base
        Fq = F2.base
        c = fq4_frobenius_coeffs_c1(Fq.p, self.nr)[power % 4]
        a0 = F2.frobenius_map(a[0], power)
        a1 = F2.frobenius_map(a[1], power)
        if c != 1:
            cc = self._frob_const(c)
            a1 = F2._stack([Fq.mul_const(a1[0], cc), Fq.mul_const(a1[1], cc)])
        return self._stack([a0, a1])

    def unitary_inverse(self, a):
        """Conjugation v -> -v: the inverse on the norm-1 cyclotomic
        subgroup (where pairing values live) — one negation instead of a
        full inversion (fp4.hpp unitary_inverse)."""
        return self._stack([a[0], self.base.neg(a[1])])


class Fp6_2over3(Fp2):
    """Fq6 = Fq3[v] / (v^2 - u): the MNT6753 pairing target GT
    (fp6_2over3.tcc).  Same quadratic structure as Fp4 but over Fp3:
    u * (c0 + c1 u + c2 u^2) = nr*c2 + c0 u + c1 u^2."""

    deg = 2

    def mul_nr(self, x):
        F3 = self.base  # Fp3
        Fq = F3.base
        return F3._stack([Fq.mul_small(x[2], self.nr), x[0], x[1]])

    def frobenius_map(self, a, power: int):
        """fp6_2over3.tcc Frobenius_map with coeff nr^(power*(q-1)/6)
        (mnt6753_init.cpp:119-124)."""
        from .frobenius import fq6_frobenius_coeffs_c1

        F3 = self.base
        Fq = F3.base
        c = fq6_frobenius_coeffs_c1(Fq.p, self.nr)[power % 6]
        a0 = F3.frobenius_map(a[0], power)
        a1 = F3.frobenius_map(a[1], power)
        if c != 1:
            cc = self._frob_const(c)
            a1 = F3._stack([Fq.mul_const(a1[i], cc) for i in range(3)])
        return self._stack([a0, a1])

    def unitary_inverse(self, a):
        return self._stack([a[0], self.base.neg(a[1])])
