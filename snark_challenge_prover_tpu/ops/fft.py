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


@lru_cache(maxsize=None)
def _stage_twiddle_tables(F: "Fp", n: int, omega: int):
    """Per-stage twiddle tables w_m^j for the iterative radix-2 core,
    Montgomery form, keyed by (field, size, root)."""
    p = F.p
    tables = []
    m = 1
    while m < n:
        w_m = pow(omega, n // (2 * m), p)
        tw = [1] * m
        for j in range(1, m):
            tw[j] = tw[j - 1] * w_m % p
        tables.append(ints_to_limbs([F.spec.to_mont(t) for t in tw]))
        m *= 2
    return tables


@lru_cache(maxsize=None)
def _bit_rev(n: int) -> np.ndarray:
    # numpy, NOT jnp: a jnp constant materialized during a trace is a
    # tracer, and caching it would leak it into later traces
    return _bit_reverse_perm(n)


def basic_radix2_fft(F: "Fp", a, omega: int):
    """Unnormalized in-order radix-2 DIT FFT on (48, n) limb planes with
    an arbitrary n-th root of unity omega (the _basic_radix2_FFT core,
    basic_radix2_domain_aux.tcc:168-205, vectorized: per stage one
    full-width Montgomery mul + add/sub)."""
    n = a.shape[1]
    a = jnp.take(a, _bit_rev(n), axis=1)
    for s, tw in enumerate(_stage_twiddle_tables(F, n, omega)):
        m = 1 << s
        x = a.reshape(48, n // (2 * m), 2, m)
        even = x[:, :, 0, :]
        odd = x[:, :, 1, :]
        t = F.mul(odd, tw[:, None, :])
        x = jnp.stack([F.add(even, t), F.sub(even, t)], axis=2)
        a = x.reshape(48, n)
    return a


def basic_radix2_fft_batched(F: "Fp", a, omega: int):
    """Same core with a trailing batch axis: a is (48, n, B); the FFT
    runs along axis 1 independently for every batch column (the local
    transform of the distributed 4-step method)."""
    n = a.shape[1]
    B = a.shape[2]
    a = jnp.take(a, _bit_rev(n), axis=1)
    for s, tw in enumerate(_stage_twiddle_tables(F, n, omega)):
        m = 1 << s
        x = a.reshape(48, n // (2 * m), 2, m, B)
        even = x[:, :, 0, :, :]
        odd = x[:, :, 1, :, :]
        t = F.mul(odd, tw[:, None, :, None])
        x = jnp.stack([F.add(even, t), F.sub(even, t)], axis=2)
        a = x.reshape(48, n, B)
    return a


@lru_cache(maxsize=None)
def _power_vector(F: "Fp", g: int, n: int):
    """[g^i for i < n] in Montgomery form (48, n)."""
    p = F.p
    vals = [1] * n
    for i in range(1, n):
        vals[i] = vals[i - 1] * g % p
    return ints_to_limbs([F.spec.to_mont(v) for v in vals])


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

    def _coset_powers(self, inverse: bool):
        """[g^i] (or [g^-i]) for i < n, Montgomery form (48, n)."""
        g = pow(self.g, -1, self.F.p) if inverse else self.g
        return _power_vector(self.F, g, self.n)

    # ---- transforms --------------------------------------------------------
    def _fft_core(self, a, inverse: bool):
        """In-place-style iterative DIT butterflies on (48, n) planes."""
        return basic_radix2_fft(self.F, a, self.omega_inv if inverse else self.omega)

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

    def add_poly_Z(self, coeff: int, H: list):
        """H += coeff * Z with Z(x) = x^n - 1 (basic_radix2_domain.tcc
        add_poly_Z)."""
        p = self.F.p
        H[self.n] = (H[self.n] + coeff) % p
        H[0] = (H[0] - coeff) % p

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

    def compute_vanishing_polynomial(self, t: int) -> int:
        return (pow(t, self.n, self.F.p) - 1) % self.F.p

    def add_poly_Z(self, coeff: int, H: list):
        """Z(x) = x^n - 1 (multiplicative subgroup domain)."""
        p = self.F.p
        H[self.n] = (H[self.n] + coeff) % p
        H[0] = (H[0] - coeff) % p

    def evaluate_all_lagrange_polynomials(self, t: int) -> np.ndarray:
        """Same closed form as the radix-2 subgroup case — the domain is
        still the full cyclic group generated by omega."""
        p = self.F.p
        n = self.n
        tn = pow(t, n, p)
        if tn == 1:
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


class ExtendedRadix2Domain:
    """Size-m domain, m = 2^(s+1): the union S ∪ shift·S of two maximal
    2-adic subgroups, shift = g^2 (extended_radix2_domain.tcc:21-199,
    coset_shift at field_utils.tcc:20-25).  Lets a field with 2-adicity s
    host domains one power of two larger than its root tower."""

    def __init__(self, F: Fp, m: int):
        if m <= 1 or m & (m - 1) or (m.bit_length() - 1) != F.spec.s + 1:
            raise ValueError("ExtendedRadix2Domain needs m == 2^(s+1)")
        self.F = F
        self.n = self.m = m
        self.small_m = m // 2
        p = F.p
        self.omega = F.spec.get_root_of_unity(self.small_m)
        self.omega_inv = pow(self.omega, -1, p)
        self.g = F.spec.multiplicative_generator
        self.shift = self.g * self.g % p
        self.shift_inv = pow(self.shift, -1, p)
        self.shift_to_small_m = pow(self.shift, self.small_m, p)

    # ---- transforms ------------------------------------------------------
    def fft(self, a):
        """tcc:48-75: fold into two half-size coefficient vectors, FFT
        each on S and shift*S."""
        F = self.F
        sm = self.small_m
        lo, hi = a[:, :sm], a[:, sm:]
        a0 = F.add(lo, hi)
        shifted = F.add(lo, F.mul_const(hi, F.const(self.shift_to_small_m)))
        a1 = F.mul(shifted, _power_vector(F, self.shift, sm))
        a0 = basic_radix2_fft(F, a0, self.omega)
        a1 = basic_radix2_fft(F, a1, self.omega)
        return jnp.concatenate([a0, a1], axis=1)

    def ifft(self, a):
        """tcc:77-103 (the 1/small_m scale is folded into sconst)."""
        F = self.F
        p = F.p
        sm = self.small_m
        a0 = basic_radix2_fft(F, a[:, :sm], self.omega_inv)
        a1 = basic_radix2_fft(F, a[:, sm:], self.omega_inv)
        sconst = pow(sm * (1 - self.shift_to_small_m) % p, -1, p)
        a1s = F.mul(a1, _power_vector(F, self.shift_inv, sm))
        t0 = F.mul_const(a0, F.const(self.shift_to_small_m))
        lo = F.mul_const(F.sub(a1s, t0), F.const(sconst))
        hi = F.mul_const(F.sub(a0, a1s), F.const(sconst))
        return jnp.concatenate([lo, hi], axis=1)

    def coset_fft(self, a):
        return self.fft(self.F.mul(a, _power_vector(self.F, self.g, self.m)))

    def icoset_fft(self, a):
        out = self.ifft(a)
        return self.F.mul(out, _power_vector(self.F, pow(self.g, -1, self.F.p), self.m))

    def divide_by_z_on_coset(self, a):
        """tcc:173-195: Z is constant on each half of the coset."""
        F = self.F
        p = F.p
        sm = self.small_m
        c_sm = pow(self.g, sm, p)
        s_sm = self.shift_to_small_m
        Z0 = (c_sm - 1) * (c_sm - s_sm) % p
        Z1 = (c_sm * s_sm - 1) * (c_sm * s_sm - s_sm) % p
        lo = F.mul_const(a[:, :sm], F.const(pow(Z0, -1, p)))
        hi = F.mul_const(a[:, sm:], F.const(pow(Z1, -1, p)))
        return jnp.concatenate([lo, hi], axis=1)

    # ---- host-side scalar helpers -----------------------------------------
    def get_domain_element(self, i: int) -> int:
        p = self.F.p
        if i < self.small_m:
            return pow(self.omega, i, p)
        return self.shift * pow(self.omega, i - self.small_m, p) % p

    def compute_vanishing_polynomial(self, t: int) -> int:
        p = self.F.p
        tm = pow(t, self.small_m, p)
        return (tm - 1) * (tm - self.shift_to_small_m) % p

    def add_poly_Z(self, coeff: int, H: list):
        """tcc:160-171: Z(x) = (x^sm - 1)(x^sm - shift^sm)."""
        p = self.F.p
        H[self.m] = (H[self.m] + coeff) % p
        H[self.small_m] = (H[self.small_m] - coeff * (self.shift_to_small_m + 1)) % p
        H[0] = (H[0] + coeff * self.shift_to_small_m) % p

    def evaluate_all_lagrange_polynomials(self, t: int) -> np.ndarray:
        """tcc:119-140."""
        p = self.F.p
        sm = self.small_m
        base = Radix2Domain(self.F, sm)
        T0 = base.evaluate_all_lagrange_polynomials(t)
        T1 = base.evaluate_all_lagrange_polynomials(t * self.shift_inv % p)
        t_sm = pow(t, sm, p)
        s_sm = self.shift_to_small_m
        inv_den = pow((s_sm - 1) % p, -1, p)
        c0 = (t_sm - s_sm) * (-inv_den) % p
        c1 = (t_sm - 1) * inv_den % p
        out = [int(v) * c0 % p for v in T0] + [int(v) * c1 % p for v in T1]
        return np.array(out, dtype=object)


class StepRadix2Domain:
    """Size-m domain, m = 2^k + 2^r (r < k): a size-2^k subgroup plus a
    shifted size-2^r subgroup (step_radix2_domain.tcc:20-276) — the
    tightest fit for sizes just over a power of two."""

    def __init__(self, F: Fp, m: int):
        if m <= 1:
            raise ValueError("StepRadix2Domain needs m > 1")
        big_m = 1 << (m.bit_length() - 1)
        small_m = m - big_m
        if small_m == 0 or small_m & (small_m - 1):
            raise ValueError(f"size {m} is not 2^k + 2^r")
        self.F = F
        self.n = self.m = m
        self.big_m = big_m
        self.small_m = small_m
        p = F.p
        self.omega = F.spec.get_root_of_unity(2 * big_m)  # 2^ceil(log2 m)
        self.big_omega = self.omega * self.omega % p
        self.small_omega = F.spec.get_root_of_unity(small_m)
        self.g = F.spec.multiplicative_generator

    def fft(self, a):
        """tcc:56-100."""
        F = self.F
        p = F.p
        bm, sm = self.big_m, self.small_m
        omega_pow = _power_vector(F, self.omega, bm)
        lo, hi = a[:, :bm], a[:, bm:]
        # c = lo + [hi, 0...]; d = omega^i * (lo - [hi, 0...])
        hi_pad = jnp.concatenate([hi, F.zeros((bm - sm,))], axis=1)
        mask = (jnp.arange(bm) < sm)[None, :]
        c = jnp.where(mask, F.add(lo, hi_pad), lo)
        d = F.mul(jnp.where(mask, F.sub(lo, hi_pad), lo), omega_pow)
        # e[i] = sum_j d[i + j*small_m]
        e = d.reshape(48, bm // sm, sm)
        acc = e[:, 0, :]
        for j in range(1, bm // sm):
            acc = F.add(acc, e[:, j, :])
        c = basic_radix2_fft(F, c, self.big_omega)
        ef = basic_radix2_fft(F, acc, self.small_omega)
        return jnp.concatenate([c, ef], axis=1)

    def ifft(self, a):
        """tcc:102-171."""
        F = self.F
        p = F.p
        bm, sm = self.big_m, self.small_m
        U0 = basic_radix2_fft(F, a[:, :bm], pow(self.big_omega, -1, p))
        U1 = basic_radix2_fft(F, a[:, bm:], pow(self.small_omega, -1, p))
        U0 = F.mul_const(U0, F.const(pow(bm, -1, p)))
        U1 = F.mul_const(U1, F.const(pow(sm, -1, p)))
        tmp = F.mul(U0, _power_vector(F, self.omega, bm))
        # U1[i] -= sum_{j>=1} tmp[i + j*small_m]
        t = tmp.reshape(48, bm // sm, sm)
        acc = t[:, 1, :] if bm // sm > 1 else F.zeros((sm,))
        for j in range(2, bm // sm):
            acc = F.add(acc, t[:, j, :])
        U1 = F.sub(U1, acc)
        U1 = F.mul(U1, _power_vector(F, pow(self.omega, -1, p), sm))
        half = F.const(pow(2, -1, p))
        prefix = F.mul_const(F.add(U0[:, :sm], U1), half)
        B2 = F.mul_const(F.sub(U0[:, :sm], U1), half)
        return jnp.concatenate([prefix, U0[:, sm:], B2], axis=1)

    def coset_fft(self, a):
        return self.fft(self.F.mul(a, _power_vector(self.F, self.g, self.m)))

    def icoset_fft(self, a):
        out = self.ifft(a)
        return self.F.mul(out, _power_vector(self.F, pow(self.g, -1, self.F.p), self.m))

    def divide_by_z_on_coset(self, a):
        """tcc:238-276: per-element constants on the big part, one
        constant on the small part — all precomputed host-side."""
        F = self.F
        p = F.p
        bm, sm = self.big_m, self.small_m
        c = self.g
        Z0 = (pow(c, bm, p) - 1) % p
        c_sm_Z0 = pow(c, sm, p) * Z0 % p
        w_sm_Z0 = pow(self.omega, sm, p) * Z0 % p
        w_2sm = pow(self.omega, 2 * sm, p)
        inv0 = []
        elt = 1
        for _ in range(bm):
            inv0.append(pow((c_sm_Z0 * elt - w_sm_Z0) % p, -1, p))
            elt = elt * w_2sm % p
        cw = c * self.omega % p
        Z1 = (pow(cw, bm, p) - 1) * (pow(cw, sm, p) - pow(self.omega, sm, p)) % p
        lo = F.mul(a[:, :bm], jnp.asarray(
            ints_to_limbs([F.spec.to_mont(v) for v in inv0])))
        hi = F.mul_const(a[:, bm:], F.const(pow(Z1, -1, p)))
        return jnp.concatenate([lo, hi], axis=1)

    # ---- host-side scalar helpers -----------------------------------------
    def get_domain_element(self, i: int) -> int:
        p = self.F.p
        if i < self.big_m:
            return pow(self.big_omega, i, p)
        return self.omega * pow(self.small_omega, i - self.big_m, p) % p

    def compute_vanishing_polynomial(self, t: int) -> int:
        p = self.F.p
        return (pow(t, self.big_m, p) - 1) * (
            pow(t, self.small_m, p) - pow(self.omega, self.small_m, p)
        ) % p

    def add_poly_Z(self, coeff: int, H: list):
        """tcc:225-236."""
        p = self.F.p
        w_sm = pow(self.omega, self.small_m, p)
        H[self.m] = (H[self.m] + coeff) % p
        H[self.big_m] = (H[self.big_m] - coeff * w_sm) % p
        H[self.small_m] = (H[self.small_m] - coeff) % p
        H[0] = (H[0] + coeff * w_sm) % p

    def evaluate_all_lagrange_polynomials(self, t: int) -> np.ndarray:
        """tcc:189-214."""
        p = self.F.p
        bm, sm = self.big_m, self.small_m
        inner_big = Radix2Domain(self.F, bm).evaluate_all_lagrange_polynomials(t)
        inner_small = Radix2Domain(self.F, sm).evaluate_all_lagrange_polynomials(
            t * pow(self.omega, -1, p) % p
        )
        L0 = (pow(t, sm, p) - pow(self.omega, sm, p)) % p
        w_sm = pow(self.omega, sm, p)
        bw_sm = pow(self.big_omega, sm, p)
        out = [0] * self.m
        elt = 1
        for i in range(bm):
            out[i] = int(inner_big[i]) * L0 % p * pow((elt - w_sm) % p, -1, p) % p
            elt = elt * bw_sm % p
        L1 = (pow(t, bm, p) - 1) * pow((pow(self.omega, bm, p) - 1) % p, -1, p) % p
        for i in range(sm):
            out[bm + i] = L1 * int(inner_small[i]) % p
        return np.array(out, dtype=object)


def get_evaluation_domain(F: Fp, n: int):
    """Domain selection, mirroring get_evaluation_domain.tcc:60-90's
    basic -> extended -> step preference order, plus the mixed-radix
    2^a*5^b domain for small-subgroup fields (MNT6753-Fr)."""
    if n >= 2 and (n & (n - 1)) == 0:
        if n.bit_length() - 1 <= F.spec.s:
            return Radix2Domain(F, n)
        if n.bit_length() - 1 == F.spec.s + 1:
            return ExtendedRadix2Domain(F, n)
    if n > 1 and (n & (n - 1)):
        # the reference's basic_radix2_domain itself accepts 2^a*5^b
        # sizes for small-subgroup fields (aux.tcc:46-166), so mixed
        # outranks step in the preference order
        if F.spec.small_subgroup_base:
            q = F.spec.small_subgroup_base
            rest = n // (n & (-n))
            while rest % q == 0:
                rest //= q
            if rest == 1:
                return MixedRadixDomain(F, n)
        big = 1 << (n.bit_length() - 1)
        small = n - big
        if small and not (small & (small - 1)) and n.bit_length() <= F.spec.s:
            return StepRadix2Domain(F, n)
    # last-resort sequence domains (get_evaluation_domain.tcc:119-131:
    # geometric, then arithmetic; geometric never fails for m > 1 so the
    # arithmetic domain is — as in the reference — only reachable by
    # direct construction)
    if n > 1:
        from .sequence_domains import GeometricSequenceDomain

        try:
            return GeometricSequenceDomain(F, n)
        except ValueError:
            from .sequence_domains import ArithmeticSequenceDomain

            return ArithmeticSequenceDomain(F, n)
    raise ValueError(f"no evaluation domain of size {n} for this field")


def best_mixed_domain_size(F: Fp, min_size: int) -> int | None:
    """min { n = 2^a * q^b : n >= min_size, b <= small_subgroup_power,
    a <= s } (get_evaluation_domain.tcc:33-57)."""
    spec = F.spec
    if not spec.small_subgroup_base:
        return None
    best = None
    for b in range(spec.small_subgroup_power + 1):
        r = spec.small_subgroup_base ** b
        a = 0
        while r < min_size:
            r *= 2
            a += 1
        if a <= spec.s and (best is None or r < best):
            best = r
    return best


def get_domain_of_min_size(F: Fp, min_size: int):
    """Smallest supported domain of size >= min_size, following the
    reference's selection order (get_evaluation_domain.tcc:60-135):
    basic/extended/step at min_size, then at big + rounded_small, then
    the best mixed 2^a*q^b size, then sequence domains.  The returned
    domain's .n may exceed min_size."""

    def _try(size):
        try:
            return get_evaluation_domain(F, size)
        except (ValueError, KeyError):
            return None

    d = _try(min_size)
    if d is not None and not _is_sequence_domain(d):
        return d
    # big + rounded_small (tcc:88-108): libff::log2 is the ceiling
    ceil_log2 = max(1, (min_size - 1).bit_length())
    big = 1 << (ceil_log2 - 1)
    small = min_size - big
    if small > 0:
        rounded_small = 1 << max(0, (small - 1).bit_length())
        d = _try(big + rounded_small)
        if d is not None and not _is_sequence_domain(d):
            return d
    mixed = best_mixed_domain_size(F, min_size)
    if mixed is not None:
        d = _try(mixed)
        if d is not None and not _is_sequence_domain(d):
            return d
    return get_evaluation_domain(F, min_size)  # sequence fallbacks


def _is_sequence_domain(domain) -> bool:
    from .sequence_domains import ArithmeticSequenceDomain, GeometricSequenceDomain

    return isinstance(domain, (GeometricSequenceDomain, ArithmeticSequenceDomain))
