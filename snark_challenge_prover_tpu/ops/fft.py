"""Evaluation domains: vectorized radix-2 (and mixed-radix 2^a·5^b) FFTs
over the scalar fields.

Capability parity with libfqfft's evaluation_domain interface
(evaluation_domain.hpp:37-98): FFT, iFFT, cosetFFT, icosetFFT,
divide_by_Z_on_coset, evaluate_all_lagrange_polynomials, plus the domain
selection rule of get_evaluation_domain (basic radix-2 for power-of-two
sizes; mixed 2^a·5^b for MNT6753-Fr sizes divisible by 5).

TPU design: one jitted program per (field, size).  Data is a limb plane
uint32[48, n]; each butterfly stage is a reshape + one full-width
Montgomery multiply + add/sub — no gathers except the initial bit-reversal
permutation, which is a single static take().  Twiddle tables are
precomputed host-side in Montgomery form and closed over as constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..models.primes import PrimeSpec
from ..utils.bigint import ints_to_limbs
from .field import Fp


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


class Radix2Domain:
    """Size-n multiplicative subgroup domain, n = 2^k.

    Matches basic_radix2_domain semantics (basic_radix2_domain.tcc): the
    FFT maps coefficients -> evaluations at [omega^i], with omega chosen
    by the field's 2-adic root tower (field_utils.tcc:71-89)."""

    def __init__(self, F: Fp, n: int):
        if n & (n - 1) or n < 2:
            raise ValueError("Radix2Domain needs n == 2^k >= 2")
        self.F = F
        self.n = n
        spec = F.spec
        p = spec.p
        self.omega = spec.get_root_of_unity(n)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv_mont = F.const(pow(n, -1, p))
        g = spec.multiplicative_generator
        self.g = g
        # coset scale vectors g^i / g^-i in Montgomery form
        self._perm = jnp.asarray(_bit_reverse_perm(n))

    # ---- host-side table builders (cached) -------------------------------
    @lru_cache(maxsize=None)
    def _stage_twiddles(self, inverse: bool):
        """Per-stage twiddle tables w_m^j, j < m for m = 1,2,4,...,n/2,
        Montgomery form, as a list of (48, m) arrays."""
        p = self.F.p
        omega = self.omega_inv if inverse else self.omega
        tables = []
        m = 1
        while m < self.n:
            w_m = pow(omega, self.n // (2 * m), p)
            tw = [1] * m
            for j in range(1, m):
                tw[j] = tw[j - 1] * w_m % p
            # numpy (not jnp): these build lazily inside traces and must
            # stay host constants, not leaked tracers
            tables.append(ints_to_limbs([self.F.spec.to_mont(t) for t in tw]))
            m *= 2
        return tables

    @lru_cache(maxsize=None)
    def _coset_powers(self, inverse: bool):
        """[g^i] (or [g^-i]) for i < n, Montgomery form (48, n)."""
        p = self.F.p
        g = pow(self.g, -1, p) if inverse else self.g
        vals = [1] * self.n
        for i in range(1, self.n):
            vals[i] = vals[i - 1] * g % p
        return ints_to_limbs([self.F.spec.to_mont(v) for v in vals])

    # ---- transforms --------------------------------------------------------
    def _fft_core(self, a, inverse: bool):
        """In-place-style iterative DIT butterflies on (48, n) planes."""
        F = self.F
        n = self.n
        a = jnp.take(a, self._perm, axis=1)
        tables = self._stage_twiddles(inverse)
        for s, tw in enumerate(tables):
            m = 1 << s
            # groups of 2m: [48, n/(2m), 2, m]
            x = a.reshape(48, n // (2 * m), 2, m)
            even = x[:, :, 0, :]
            odd = x[:, :, 1, :]
            t = F.mul(odd, tw[:, None, :])
            x = jnp.stack([F.add(even, t), F.sub(even, t)], axis=2)
            a = x.reshape(48, n)
        return a

    def fft(self, a):
        """coefficients -> evaluations (basic_radix2_domain.tcc FFT)."""
        return self._fft_core(a, inverse=False)

    def ifft(self, a):
        """evaluations -> coefficients; scales by 1/n (tcc iFFT)."""
        out = self._fft_core(a, inverse=True)
        return self.F.mul_const(out, self.n_inv_mont)

    def coset_fft(self, a):
        """evaluate on the coset g*<omega> (tcc cosetFFT with
        g = multiplicative_generator, the prover's choice main.cpp:119)."""
        a = self.F.mul(a, self._coset_powers(False))
        return self.fft(a)

    def icoset_fft(self, a):
        """inverse of coset_fft (tcc icosetFFT)."""
        out = self.ifft(a)
        return self.F.mul(out, self._coset_powers(True))

    def divide_by_z_on_coset(self, a):
        """Z(g*omega^i) == g^n - 1 is constant on the coset; multiply by
        its inverse (basic_radix2_domain.tcc divide_by_Z_on_coset)."""
        p = self.F.p
        zinv = pow(pow(self.g, self.n, p) - 1, -1, p)
        return self.F.mul_const(a, self.F.const(zinv))

    def compute_vanishing_polynomial(self, t: int) -> int:
        return (pow(t, self.n, self.F.p) - 1) % self.F.p

    def get_domain_element(self, i: int) -> int:
        return pow(self.omega, i, self.F.p)

    def evaluate_all_lagrange_polynomials(self, t: int) -> np.ndarray:
        """Host-side exact evaluation of all Lagrange basis polynomials at
        t (keygen path, aux.tcc:333): L_i(t) = (t^n - 1) * omega^i /
        (n * (t - omega^i)), with the special case t in the domain."""
        p = self.F.p
        n = self.n
        tn = pow(t, n, p)
        if tn == 1:
            # t is a domain element: indicator vector
            out = [0] * n
            om = 1
            for i in range(n):
                if om == t:
                    out[i] = 1
                om = om * self.omega % p
            return np.array(out, dtype=object)
        Z = (tn - 1) % p
        ninv = pow(n, -1, p)
        out = []
        om = 1
        for i in range(n):
            out.append(Z * om % p * pow((t - om) % p, -1, p) % p * ninv % p)
            om = om * self.omega % p
        return np.array(out, dtype=object)


class MixedRadixDomain:
    """Size-n domain with n = 2^a * 5^b (b>0): MNT6753-Fr's small-subgroup
    capability (mnt6753_init.cpp:73-76, aux.tcc:46-166).

    Implemented as a Cooley-Tukey split n = 5^b * 2^a: first radix-5
    stages, then radix-2 stages — vectorized the same way as Radix2Domain.
    Results equal any correct DFT of the same omega (exact arithmetic)."""

    def __init__(self, F: Fp, n: int):
        self.F = F
        self.n = n
        two_part = n & (-n)
        rest = n // two_part
        q_adicity = 0
        r = rest
        while r % 5 == 0:
            r //= 5
            q_adicity += 1
        if r != 1:
            raise ValueError(f"size {n} is not 2^a*5^b")
        self.two_part = two_part
        self.q_part = rest
        spec = F.spec
        self.omega = spec.get_root_of_unity(n)
        self.omega_inv = pow(self.omega, -1, spec.p)
        self.n_inv_mont = F.const(pow(n, -1, spec.p))
        self.g = spec.multiplicative_generator

    @lru_cache(maxsize=None)
    def _dft_matrix(self, size: int, inverse: bool):
        """Montgomery DFT matrix for the radix-5 (or leftover) butterflies:
        (48, size, size) with entry [.,r,c] = w^(r*c)."""
        p = self.F.p
        omega_n = self.omega_inv if inverse else self.omega
        w = pow(omega_n, self.n // size, p)
        mat = [pow(w, r * c, p) for r in range(size) for c in range(size)]
        arr = ints_to_limbs([self.F.spec.to_mont(v) for v in mat])
        return arr.reshape(48, size, size)

    @lru_cache(maxsize=None)
    def _twiddle(self, n1: int, n2: int, inverse: bool):
        """(48, n1, n2) twiddles w^(r1*r2) for the CT recombination of
        n = n1*n2."""
        p = self.F.p
        omega_n = self.omega_inv if inverse else self.omega
        w = pow(omega_n, self.n // (n1 * n2), p)
        mat = [pow(w, r1 * r2, p) for r1 in range(n1) for r2 in range(n2)]
        arr = ints_to_limbs([self.F.spec.to_mont(v) for v in mat])
        return arr.reshape(48, n1, n2)

    @lru_cache(maxsize=None)
    def _coset_powers(self, inverse: bool):
        p = self.F.p
        g = pow(self.g, -1, p) if inverse else self.g
        vals = [1] * self.n
        for i in range(1, self.n):
            vals[i] = vals[i - 1] * g % p
        return ints_to_limbs([self.F.spec.to_mont(v) for v in vals])

    @lru_cache(maxsize=None)
    def _combine_table(self, size: int, split: int, inverse: bool):
        """W[., q, i, s] = omega_size^((q*m+s)*i), Montgomery form, where
        omega_size = omega^(n/size) and m = size//split."""
        p = self.F.p
        omega_n = self.omega_inv if inverse else self.omega
        w = pow(omega_n, self.n // size, p)
        m = size // split
        tab = [
            pow(w, ((q * m + s) * i) % size, p)
            for q in range(split)
            for i in range(split)
            for s in range(m)
        ]
        arr = ints_to_limbs([self.F.spec.to_mont(v) for v in tab])
        return arr.reshape(48, split, split, m)

    def _rec(self, a, size: int, inverse: bool):
        """Recursive decimation-in-time DFT on (48, size, B) planes:
        DFT_size(a)[k] = sum_i omega_size^(k*i) DFT_m(a[i::split])[k mod m]."""
        F = self.F
        if size == 1:
            return a
        split = 2 if size % 2 == 0 else 5
        m = size // split
        B = a.shape[2]
        # substream i holds a[j*split + i]; row-major reshape gives (j, i)
        sub_in = a.reshape(48, m, split * B)
        sub_out = self._rec(sub_in, m, inverse).reshape(48, m, split, B)
        W = self._combine_table(size, split, inverse)
        out = None
        for i in range(split):
            # (48, 1, m, B) * (48, split_q, 1->m broadcast? ...)
            term = F.mul(sub_out[:, :, i, :][:, None, :, :], W[:, :, i, :, None])
            out = term if out is None else F.add(out, term)
        # out: (48, split_q, m, B) -> index k = q*m + s
        return out.reshape(48, size, B)

    def _dft(self, a, inverse: bool):
        """Full-length mixed-radix DFT on (48, n) planes."""
        return self._rec(a.reshape(48, self.n, 1), self.n, inverse).reshape(
            48, self.n
        )

    def fft(self, a):
        return self._dft(a, inverse=False)

    def ifft(self, a):
        out = self._dft(a, inverse=True)
        return self.F.mul_const(out, self.n_inv_mont)

    def coset_fft(self, a):
        return self.fft(self.F.mul(a, self._coset_powers(False)))

    def icoset_fft(self, a):
        return self.F.mul(self.ifft(a), self._coset_powers(True))

    def divide_by_z_on_coset(self, a):
        p = self.F.p
        zinv = pow(pow(self.g, self.n, p) - 1, -1, p)
        return self.F.mul_const(a, self.F.const(zinv))

    def get_domain_element(self, i: int) -> int:
        return pow(self.omega, i, self.F.p)


def get_evaluation_domain(F: Fp, n: int):
    """Domain selection: basic radix-2 for powers of two; mixed 2^a*5^b
    when the field supports it (get_evaluation_domain.tcc:60-90 picks the
    best-fit domain; both challenge configs are exact powers of two)."""
    if n >= 2 and (n & (n - 1)) == 0:
        return Radix2Domain(F, n)
    if F.spec.small_subgroup_base:
        return MixedRadixDomain(F, n)
    raise ValueError(f"no evaluation domain of size {n} for this field")
