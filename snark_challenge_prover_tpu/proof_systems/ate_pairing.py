"""The reference's ate pairing stack, host-side exact integers.

Structural parity with libff's mnt4753/mnt6753 pairing code
(mnt4753_pairing.cpp:420-686, mnt6753_pairing.cpp): G1/G2 precompute
structs, the "flipped" Miller loop over extended projective (X:Y:Z:T)
coordinates with cached doubling/addition coefficients, the double
Miller loop, and the final exponentiation split into first/last chunks
using Frobenius maps and the published w0/w1 decomposition
(mnt4753_init.cpp:258-263, mnt6753_init.cpp:274-279).

Pairings are verifier-side only — O(1) per proof, never on the prover
hot path (SURVEY §2.1) — so exact host ints are the right tool; the
device towers (ops.towers Fp4/Fp6_2over3) carry the same GT/Frobenius
structure for batched device use.  The Tate engine
(proof_systems.pairing) remains as an independent cross-check.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..host.curves import HostCurve, HostExt
from ..ops.frobenius import ext_frobenius_coeffs

# ate loop count, shared by the cycle (mnt4753_init.cpp:258 ==
# mnt6753_init.cpp:274)
ATE_LOOP_COUNT = int(
    "20469120881933096200946986810463613278326969679001197740022389846243181010"
    "2935615891307667367766898917669754470400"
)

# (is_loop_count_neg, w0_abs, w0_is_neg, w1)
ATE_PARAMS = {
    "MNT4753": (True, ATE_LOOP_COUNT - 1, True, 1),   # mnt4753_init.cpp:259-263
    "MNT6753": (False, ATE_LOOP_COUNT, False, 1),     # mnt6753_init.cpp:275-279
}


class HostGT:
    """GT = Fq^(2e) = Fq^e[v]/(v^2 - u) as pairs of HostExt elements
    (libff Fp4_model / Fp6_2over3_model layout)."""

    def __init__(self, base: HostExt):
        self.base = base
        self.p = base.p

    def mul_u(self, a):
        """u * a in Fq^e (rotate components, nr-scale the top one)."""
        c = self.base.components(a)
        return self.base.from_components([c[-1] * self.base.nr % self.p] + c[:-1])

    @property
    def one(self):
        return (self.base.one, self.base.zero)

    def mul(self, A, B):
        F = self.base
        t0 = F.mul(A[0], B[0])
        t1 = F.mul(A[1], B[1])
        c0 = F.add(t0, self.mul_u(t1))
        c1 = F.sub(F.mul(F.add(A[0], A[1]), F.add(B[0], B[1])), F.add(t0, t1))
        return (c0, c1)

    def sqr(self, A):
        return self.mul(A, A)

    def inv(self, A):
        F = self.base
        norm = F.sub(F.mul(A[0], A[0]), self.mul_u(F.mul(A[1], A[1])))
        ni = F.inv(norm)
        return (F.mul(A[0], ni), F.smul(-1, F.mul(A[1], ni)))

    def unitary_inverse(self, A):
        return (A[0], self.base.smul(-1, A[1]))

    def pow(self, A, e: int):
        if e < 0:
            return self.pow(self.inv(A), -e)
        out = self.one
        for bit in bin(e)[2:] if e else "0":
            out = self.sqr(out)
            if bit == "1":
                out = self.mul(out, A)
        return out

    def frobenius_map(self, A, power: int):
        """(c0^q^p, coeff * c1^q^p) with coeff = nr^(power*(q-1)/(2e))
        (fp4.tcc / fp6_2over3.tcc Frobenius_map)."""
        F = self.base
        e = F.deg
        c0 = self._ext_frob(A[0], power)
        c1 = self._ext_frob(A[1], power)
        coeff = ext_frobenius_coeffs(self.p, F.nr, 2 * e)[power % (2 * e)]
        return (c0, F.smul(coeff, c1))

    def _ext_frob(self, a, power: int):
        F = self.base
        cs = F.components(a)
        co = ext_frobenius_coeffs(self.p, F.nr, F.deg)
        out = [cs[m] * pow(co[m], power, self.p) % self.p for m in range(F.deg)]
        return F.from_components(out)

    def eq(self, A, B):
        return A == B


@dataclass
class AteG1Precomp:
    """mnt4753_ate_G1_precomp (mnt4753_pairing.cpp:463-478)."""

    PX: int
    PY: int
    PX_twist: tuple
    PY_twist: tuple


@dataclass
class AteG2Precomp:
    """mnt4753_ate_G2_precomp: affine Q + cached dbl/add step coeffs."""

    QX: tuple
    QY: tuple
    QY2: tuple
    QX_over_twist: tuple
    QY_over_twist: tuple
    dbl_coeffs: list = field(default_factory=list)
    add_coeffs: list = field(default_factory=list)


class AtePairing:
    """One curve's ate pairing engine over exact host integers."""

    def __init__(self, hc: HostCurve):
        self.hc = hc
        F2 = hc.g2.F  # HostExt of degree e (Fq2 or Fq3)
        self.F2 = F2
        self.GT = HostGT(F2)
        self.gt = self.GT  # PairingEngine-compatible alias
        self.q = F2.p
        self.e = F2.deg
        # twist = u (the tower generator): (0,1) / (0,1,0)
        # (mnt4753_init.cpp:121, mnt6753_init.cpp:132)
        tw = [0] * self.e
        tw[1] = 1
        self.twist = F2.from_components(tw)
        self.twist_inv = F2.inv(self.twist)
        self.twist_coeff_a = hc.g2.a  # already (a*nr, 0) / (0, 0, a)
        neg, w0, w0_neg, w1 = ATE_PARAMS[hc.name]
        self.loop_neg = neg
        self.w0 = w0
        self.w0_neg = w0_neg
        self.w1 = w1

    # ---- precompute -----------------------------------------------------
    def precompute_g1(self, P) -> AteG1Precomp:
        """mnt4753_ate_precompute_G1 (:463-478); P affine (x, y) ints."""
        F2 = self.F2
        x, y = P
        emb = lambda v: F2.from_components([v] + [0] * (self.e - 1))
        return AteG1Precomp(
            PX=x,
            PY=y,
            PX_twist=F2.mul(emb(x), self.twist),
            PY_twist=F2.mul(emb(y), self.twist),
        )

    def _dbl_step(self, R):
        """doubling_step_for_flipped_miller_loop (:404-431).
        R = [X, Y, Z, T]; returns dc = (c_H, c_4C, c_J, c_L)."""
        F = self.F2
        X, Y, Z, T = R
        A = F.sqr(T)
        B = F.sqr(X)
        C = F.sqr(Y)
        D = F.sqr(C)
        E = F.sub(F.sub(F.sqr(F.add(X, C)), B), D)
        Fv = F.add(F.add(F.add(B, B), B), F.mul(self.twist_coeff_a, A))
        G = F.sqr(Fv)
        X3 = F.add(F.smul(-4, E), G)
        Y3 = F.add(
            F.smul(-8, D), F.mul(Fv, F.sub(F.add(E, E), X3))
        )
        Z3 = F.sub(F.sub(F.sqr(F.add(Y, Z)), C), F.sqr(Z))
        T3 = F.sqr(Z3)
        dc = (
            F.sub(F.sub(F.sqr(F.add(Z3, T)), T3), A),  # c_H
            F.smul(4, C),                               # c_4C
            F.sub(F.sub(F.sqr(F.add(Fv, T)), G), A),    # c_J
            F.sub(F.sub(F.sqr(F.add(Fv, X)), G), B),    # c_L
        )
        R[0], R[1], R[2], R[3] = X3, Y3, Z3, T3
        return dc

    def _add_step(self, base_X, base_Y, base_Y2, R):
        """mixed_addition_step_for_flipped_miller_loop (:433-460).
        Returns ac = (c_L1, c_RZ)."""
        F = self.F2
        X1, Y1, Z1, T1 = R
        B = F.mul(base_X, T1)
        D = F.mul(F.sub(F.sub(F.sqr(F.add(base_Y, Z1)), base_Y2), T1), T1)
        H = F.sub(B, X1)
        I = F.sqr(H)
        E = F.smul(4, I)
        J = F.mul(H, E)
        V = F.mul(X1, E)
        L1 = F.sub(D, F.add(Y1, Y1))
        X3 = F.sub(F.sub(F.sqr(L1), J), F.add(V, V))
        Y3 = F.sub(F.mul(L1, F.sub(V, X3)), F.mul(F.add(Y1, Y1), J))
        Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), T1), I)
        T3 = F.sqr(Z3)
        R[0], R[1], R[2], R[3] = X3, Y3, Z3, T3
        return (L1, Z3)

    def precompute_g2(self, Q) -> AteG2Precomp:
        """mnt4753_ate_precompute_G2 (:480-541); Q affine (X, Y) tuples."""
        F = self.F2
        QX, QY = Q
        prec = AteG2Precomp(
            QX=QX,
            QY=QY,
            QY2=F.sqr(QY),
            QX_over_twist=F.mul(QX, self.twist_inv),
            QY_over_twist=F.mul(QY, self.twist_inv),
        )
        R = [QX, QY, F.one, F.one]
        bits = bin(ATE_LOOP_COUNT)[2:]
        for bit in bits[1:]:  # skip the MSB itself
            prec.dbl_coeffs.append(self._dbl_step(R))
            if bit == "1":
                prec.add_coeffs.append(self._add_step(QX, QY, prec.QY2, R))
        if self.loop_neg:
            RZ_inv = F.inv(R[2])
            RZ2_inv = F.sqr(RZ_inv)
            RZ3_inv = F.mul(RZ2_inv, RZ_inv)
            mX = F.mul(R[0], RZ2_inv)
            mY = F.smul(-1, F.mul(R[1], RZ3_inv))
            prec.add_coeffs.append(self._add_step(mX, mY, F.sqr(mY), R))
        return prec

    # ---- Miller loops ---------------------------------------------------
    def miller_loop(self, prec_P: AteG1Precomp, prec_Q: AteG2Precomp):
        """mnt4753_ate_miller_loop (:543-594)."""
        F = self.F2
        GT = self.GT
        emb = lambda v: F.from_components([v] + [0] * (self.e - 1))
        L1_coeff = F.sub(emb(prec_P.PX), prec_Q.QX_over_twist)
        f = GT.one
        dbl_idx = add_idx = 0
        bits = bin(ATE_LOOP_COUNT)[2:]
        for bit in bits[1:]:
            c_H, c_4C, c_J, c_L = prec_Q.dbl_coeffs[dbl_idx]
            dbl_idx += 1
            g_RR = (
                F.add(
                    F.sub(F.smul(-1, c_4C), F.mul(c_J, prec_P.PX_twist)), c_L
                ),
                F.mul(c_H, prec_P.PY_twist),
            )
            f = GT.mul(GT.sqr(f), g_RR)
            if bit == "1":
                c_L1, c_RZ = prec_Q.add_coeffs[add_idx]
                add_idx += 1
                g_RQ = (
                    F.mul(c_RZ, prec_P.PY_twist),
                    F.smul(
                        -1,
                        F.add(
                            F.mul(prec_Q.QY_over_twist, c_RZ),
                            F.mul(L1_coeff, c_L1),
                        ),
                    ),
                )
                f = GT.mul(f, g_RQ)
        if self.loop_neg:
            c_L1, c_RZ = prec_Q.add_coeffs[add_idx]
            g_neg = (
                F.mul(c_RZ, prec_P.PY_twist),
                F.smul(
                    -1,
                    F.add(
                        F.mul(prec_Q.QY_over_twist, c_RZ),
                        F.mul(L1_coeff, c_L1),
                    ),
                ),
            )
            f = GT.inv(GT.mul(f, g_neg))
        return f

    def double_miller_loop(self, prec_P1, prec_Q1, prec_P2, prec_Q2):
        """mnt4753_ate_double_miller_loop (:596-672): one shared
        squaring chain for two pairings (the verifier's e(A,B)·e(C,-δ)
        pattern)."""
        GT = self.GT
        F = self.F2
        emb = lambda v: F.from_components([v] + [0] * (self.e - 1))
        L1 = F.sub(emb(prec_P1.PX), prec_Q1.QX_over_twist)
        L2 = F.sub(emb(prec_P2.PX), prec_Q2.QX_over_twist)
        f = GT.one
        dbl_idx = add_idx = 0
        bits = bin(ATE_LOOP_COUNT)[2:]

        def g_dbl(dc, pp):
            c_H, c_4C, c_J, c_L = dc
            return (
                F.add(F.sub(F.smul(-1, c_4C), F.mul(c_J, pp.PX_twist)), c_L),
                F.mul(c_H, pp.PY_twist),
            )

        def g_add(ac, pp, pq, Lc):
            c_L1, c_RZ = ac
            return (
                F.mul(c_RZ, pp.PY_twist),
                F.smul(
                    -1,
                    F.add(F.mul(pq.QY_over_twist, c_RZ), F.mul(Lc, c_L1)),
                ),
            )

        for bit in bits[1:]:
            d1 = prec_Q1.dbl_coeffs[dbl_idx]
            d2 = prec_Q2.dbl_coeffs[dbl_idx]
            dbl_idx += 1
            f = GT.mul(
                GT.mul(GT.sqr(f), g_dbl(d1, prec_P1)), g_dbl(d2, prec_P2)
            )
            if bit == "1":
                a1 = prec_Q1.add_coeffs[add_idx]
                a2 = prec_Q2.add_coeffs[add_idx]
                add_idx += 1
                f = GT.mul(
                    GT.mul(f, g_add(a1, prec_P1, prec_Q1, L1)),
                    g_add(a2, prec_P2, prec_Q2, L2),
                )
        if self.loop_neg:
            a1 = prec_Q1.add_coeffs[add_idx]
            a2 = prec_Q2.add_coeffs[add_idx]
            f = GT.inv(
                GT.mul(
                    GT.mul(f, g_add(a1, prec_P1, prec_Q1, L1)),
                    g_add(a2, prec_P2, prec_Q2, L2),
                )
            )
        return f

    # ---- final exponentiation -------------------------------------------
    def _first_chunk(self, elt, elt_inv):
        """mnt4753: elt^(q^2-1) (:198-211); mnt6753: elt^((q^3-1)(q+1))
        (mnt6753_pairing.cpp:200-216)."""
        GT = self.GT
        if self.e == 2:
            return GT.mul(GT.frobenius_map(elt, 2), elt_inv)
        q3_over = GT.mul(GT.frobenius_map(elt, 3), elt_inv)
        return GT.mul(GT.frobenius_map(q3_over, 1), q3_over)

    def _last_chunk(self, elt, elt_inv):
        """(:180-196): elt^(q*w1) * (elt or elt^-1)^w0."""
        GT = self.GT
        elt_q = GT.frobenius_map(elt, 1)
        w1_part = GT.pow(elt_q, self.w1)
        w0_part = GT.pow(elt_inv if self.w0_neg else elt, self.w0)
        return GT.mul(w1_part, w0_part)

    def final_exponentiation(self, elt):
        """(:213-224)."""
        GT = self.GT
        elt_inv = GT.inv(elt)
        first = self._first_chunk(elt, elt_inv)
        first_inv = self._first_chunk(elt_inv, elt)
        return self._last_chunk(first, first_inv)

    # ---- top-level API ---------------------------------------------------
    def ate_pairing(self, P, Q):
        """Unreduced: Miller loop only (:674-682).  P=(x,y) ints affine
        G1; Q=(X,Y) tuples affine G2; identities not supported here
        (match the reference, which asserts non-zero inputs)."""
        return self.miller_loop(self.precompute_g1(P), self.precompute_g2(Q))

    def reduced_pairing(self, P, Q):
        """mnt4753_reduced_pairing == final_exp(ate_pairing) (:684-693).
        Identity inputs (None, unreachable in the reference which
        asserts non-zero) map to GT one — e(O, Q) = e(P, O) = 1."""
        if P is None or Q is None:
            return self.GT.one
        return self.final_exponentiation(self.ate_pairing(P, Q))


def ate_engine(hc: HostCurve) -> AtePairing:
    return AtePairing(hc)
