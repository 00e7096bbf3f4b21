"""Geometric / arithmetic sequence evaluation domains.

Capability parity with libfqfft's fallback domains
(depends/libfqfft/libfqfft/evaluation_domain/domains/
geometric_sequence_domain.tcc, arithmetic_sequence_domain.tcc): when a
requested size fits none of the radix-2 family, the reference evaluates
and interpolates on a plain point sequence instead of a multiplicative
subgroup — geometric x_i = g^i with g = geometric_generator = 2
(fp.tcc:292-297), arithmetic x_i = c*i with c = arithmetic_generator = 1
(fp.tcc:301-306).

These domains are off every hot path (the challenge configs are all
powers of two, generate_parameters.cpp:35); the reference reaches them
only through get_evaluation_domain's last fallbacks
(get_evaluation_domain.tcc:119-131).  We therefore implement the
transforms as dense matrix applications: the evaluation matrix
V[j,i] = x_j^i and its exact inverse M (columns = Lagrange-basis
coefficient vectors) are precomputed host-side in exact integers once
per domain, stored as Montgomery limb planes, and applied on device as a
`lax.scan` of field vector-muls — O(n^2) field ops but fully jittable,
static-shaped, and bit-exact.  (The reference's O(n log^2 n)
Newton-basis route, basis_change.tcc:66-133, only wins at sizes these
fallbacks never see.)

Deliberate deviations from reference behavior, both cited:
 * divide_by_z_on_coset divides entry j by Z(g*x_j) (the mathematically
   correct QAP quotient step).  The reference divides every entry by the
   constant Z(g) (geometric_sequence_domain.tcc:249-257) — correct on
   radix-2 domains where Z is constant on a coset, wrong here, and
   flagged by its own "/* coset in geometric sequence? */" comment.
 * add_poly_Z uses Z = prod_{i<m} (x - x_i) of degree m.  The reference
   loop reads sequence[m], one past its own precomputed vector
   (geometric_sequence_domain.tcc:231-237).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bigint import ints_to_limbs
from .field import Fp


def _lagrange_coeff_matrix(points: list[int], p: int) -> list[list[int]]:
    """Columns M[:,j] = monomial coefficients of L_j(x), exact ints.

    L_j = (Z / (x - x_j)) / Z'(x_j), built by synthetic division of the
    vanishing polynomial — O(n^2) host bigint work, once per domain."""
    n = len(points)
    # Z(x) = prod (x - x_i), coefficients low-to-high, degree n
    Z = [1]
    for x in points:
        Z = [(-x * Z[0]) % p] + [
            (Z[k - 1] - x * Z[k]) % p for k in range(1, len(Z))
        ] + [0]
        Z[len(Z) - 1] = 1
    M = [[0] * n for _ in range(n)]
    for j, xj in enumerate(points):
        # q = Z / (x - x_j) by synthetic division (degree n-1)
        q = [0] * n
        carry = Z[n]
        for k in range(n - 1, -1, -1):
            q[k] = carry
            carry = (Z[k] + xj * carry) % p
        # Z'(x_j) = prod_{k != j} (x_j - x_k) = q(x_j)
        d = 0
        for k in range(n - 1, -1, -1):
            d = (d * xj + q[k]) % p
        dinv = pow(d, -1, p)
        for k in range(n):
            M[k][j] = q[k] * dinv % p
    return M


class _SequenceDomain:
    """Shared machinery: dense evaluate/interpolate on a point list."""

    def __init__(self, F: Fp, points: list[int]):
        self.F = F
        self.m = len(points)
        self.points = points
        self.g = F.spec.multiplicative_generator
        self._V = None
        self._M = None

    # ---- host precomputes (lazy, mirrors do_precomputation's sentinel,
    #      geometric_sequence_domain.tcc:260-275) ------------------------
    def _eval_matrix(self):
        if self._V is None:
            F, p, n = self.F, self.F.p, self.m
            cols = []
            pw = [1] * n  # x_j^i running powers
            for _ in range(n):
                cols.append(ints_to_limbs([F.spec.to_mont(v) for v in pw]))
                pw = [v * x % p for v, x in zip(pw, self.points)]
            self._V = jnp.asarray(np.stack(cols))
        return self._V

    def _interp_matrix(self):
        if self._M is None:
            F, n = self.F, self.m
            M = _lagrange_coeff_matrix(self.points, F.p)
            cols = [
                ints_to_limbs([F.spec.to_mont(M[k][j]) for k in range(n)])
                for j in range(n)
            ]
            self._M = jnp.asarray(np.stack(cols))
        return self._M

    def _apply(self, cols, a):
        """out = sum_i cols[i] * a[:, i], one field mul-add per scan step."""
        F, n = self.F, self.m
        a_T = jnp.moveaxis(a, -1, 0)[:, :, None]  # (n, L, 1)

        def step(acc, xs):
            col, ai = xs
            return F.add(acc, F.mul(col, ai)), None

        acc, _ = jax.lax.scan(step, F.zeros((n,)), (cols, a_T))
        return acc

    def _coset_powers(self, inverse: bool):
        p = self.F.p
        g = pow(self.g, -1, p) if inverse else self.g
        vals, v = [], 1
        for _ in range(self.m):
            vals.append(v)
            v = v * g % p
        return jnp.asarray(ints_to_limbs([self.F.spec.to_mont(x) for x in vals]))

    # ---- evaluation_domain API (evaluation_domain.hpp:37-98) -----------
    def fft(self, a):
        """coefficients -> evaluations at [x_j] (tcc FFT)."""
        return self._apply(self._eval_matrix(), a)

    def ifft(self, a):
        """evaluations -> coefficients (tcc iFFT)."""
        return self._apply(self._interp_matrix(), a)

    def coset_fft(self, a):
        """evaluate a(g*x) at [x_j], i.e. a at [g*x_j] (tcc cosetFFT)."""
        return self.fft(self.F.mul(a, self._coset_powers(False)))

    def icoset_fft(self, a):
        return self.F.mul(self.ifft(a), self._coset_powers(True))

    def divide_by_z_on_coset(self, a):
        """entrywise division by Z(g*x_j) (see module docstring)."""
        p = self.F.p
        zs = [self.compute_vanishing_polynomial(self.g * x % p) for x in self.points]
        if any(z == 0 for z in zs):
            # coset point landed inside the domain (always true for the
            # arithmetic sequence, whose x_0 = 0 is a fixed point of any
            # multiplicative coset; the reference's constant Z(1) there
            # is equally degenerate, arithmetic_sequence_domain.tcc:230)
            raise ValueError("coset intersects the domain; Z not invertible")
        zinv = [pow(z, -1, p) for z in zs]
        zinv_planes = jnp.asarray(
            ints_to_limbs([self.F.spec.to_mont(v) for v in zinv])
        )
        return self.F.mul(a, zinv_planes)

    def get_domain_element(self, i: int) -> int:
        return self.points[i]

    def compute_vanishing_polynomial(self, t: int) -> int:
        """Z(t) = prod (t - x_i) (tcc compute_vanishing_polynomial)."""
        p, Z = self.F.p, 1
        for x in self.points:
            Z = Z * (t - x) % p
        return Z

    def add_poly_Z(self, coeff: int, H: list):
        """H += coeff * Z, Z = prod_{i<m}(x - x_i) (tcc add_poly_Z; see
        module docstring for the degree-m correction)."""
        if len(H) != self.m + 1:
            raise ValueError("add_poly_Z expects len(H) == m+1")
        p = self.F.p
        Z = [1]
        for x in self.points:
            Z = [(-x * Z[0]) % p] + [
                (Z[k - 1] - x * Z[k]) % p for k in range(1, len(Z))
            ] + [1]
        for k in range(self.m + 1):
            H[k] = (H[k] + coeff * Z[k]) % p

    def evaluate_all_lagrange_polynomials(self, t: int) -> np.ndarray:
        """[L_j(t)] by the barycentric form, with the in-domain indicator
        special case (geometric_sequence_domain.tcc:143-155)."""
        p = self.F.p
        if t % p in [x % p for x in self.points]:
            out = [1 if x % p == t % p else 0 for x in self.points]
            return np.array(out, dtype=object)
        l_vanish = 1
        diffs = []
        for x in self.points:
            d = (t - x) % p
            diffs.append(d)
            l_vanish = l_vanish * d % p
        out = []
        for j, xj in enumerate(self.points):
            denom = 1
            for k, xk in enumerate(self.points):
                if k != j:
                    denom = denom * (xj - xk) % p
            out.append(l_vanish * pow(diffs[j] * denom % p, -1, p) % p)
        return np.array(out, dtype=object)


class GeometricSequenceDomain(_SequenceDomain):
    """x_i = geometric_generator^i = 2^i (fp.tcc:292, tcc do_precomputation)."""

    def __init__(self, F: Fp, m: int):
        if m <= 1:
            raise ValueError("GeometricSequenceDomain needs m > 1")
        p = F.p
        pts, v = [], 1
        for _ in range(m):
            pts.append(v)
            v = v * 2 % p
        if len(set(pts)) != m:
            raise ValueError("geometric sequence has repeated points")
        super().__init__(F, pts)


class ArithmeticSequenceDomain(_SequenceDomain):
    """x_i = arithmetic_generator * i = i (fp.tcc:301, tcc do_precomputation)."""

    def __init__(self, F: Fp, m: int):
        if m <= 1:
            raise ValueError("ArithmeticSequenceDomain needs m > 1")
        if m >= F.p:
            raise ValueError("domain larger than field")
        super().__init__(F, [i % F.p for i in range(m)])
