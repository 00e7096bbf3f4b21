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
    fp6_2over3.tcc) — used only for pairing targets (verifier side).

The non-residues are small (13 for MNT4753's Fq2/Fq4, 11 for MNT6753's
Fq3/Fq6, mnt4753_init.cpp:105, mnt6753_init.cpp:109) so mul-by-nonresidue
is a small-scalar limb multiply + conditional subtracts instead of a full
Montgomery multiply.
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import Fp


class _ExtBase:
    """Shared helpers; components stacked on axis 0."""

    elem_ndim = 2  # (deg, 48) planes per element

    def __init__(self, base, non_residue: int, name: str):
        self.base = base
        self.nr = non_residue
        self.name = name

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
        return jnp.where(mask[None, None], a, b)

    def mul_nr(self, x):
        """Multiply a base-field element by the non-residue."""
        return self.base.mul_small(x, self.nr)

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

        out, _ = jax.lax.scan(body, self.ones(a.shape[2:]), bits_arr)
        return out


class Fp2(_ExtBase):
    """Fq[u] / (u^2 - nr)."""

    deg = 2

    def mul(self, a, b):
        F = self.base
        v0 = F.mul(a[0], b[0])
        v1 = F.mul(a[1], b[1])
        c0 = F.add(v0, self.mul_nr(v1))
        t = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        c1 = F.sub(F.sub(t, v0), v1)
        return self._stack([c0, c1])

    def sqr(self, a):
        # complex squaring (fp2.tcc:106-135)
        F = self.base
        v = F.mul(a[0], a[1])
        t0 = F.add(a[0], a[1])
        t1 = F.add(a[0], self.mul_nr(a[1]))
        c0 = F.sub(F.sub(F.mul(t0, t1), v), self.mul_nr(v))
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


class Fp3(_ExtBase):
    """Fq[u] / (u^3 - nr)."""

    deg = 3

    def mul(self, a, b):
        # 6-mul Karatsuba-style schedule (fp3.tcc)
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
        t0 = F.sqr(a[0])
        t1 = F.sqr(a[1])
        t2 = F.sqr(a[2])
        t3 = F.mul(a[0], a[1])
        t4 = F.mul(a[0], a[2])
        t5 = F.mul(a[1], a[2])
        c0 = F.sub(t0, self.mul_nr(t5))
        c1 = F.sub(self.mul_nr(t2), t3)
        c2 = F.sub(t1, t4)
        norm = F.add(F.mul(a[0], c0), self.mul_nr(F.add(F.mul(a[2], c1), F.mul(a[1], c2))))
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
