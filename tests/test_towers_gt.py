"""Device Fq4/Fq6 (GT) towers + Frobenius maps vs exact host ints
(fp4.tcc, fp6_2over3.tcc semantics), and the G2 mul_by_q endomorphism
(mnt4753_g2.cpp:364-369) vs multiplication by q on the r-torsion."""

import jax
import jax.numpy as jnp
import numpy as np

from tools.oracle import ExtSpec, mnt4753_oracle, mnt6753_oracle
from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

N = 4


# ---- host reference: quadratic extension over ExtSpec (v^2 = u) ---------
class HostQuad:
    def __init__(self, base: ExtSpec, nr: int):
        self.base = base
        self.nr = nr  # the prime-field non-residue defining u^deg = nr

    def mul_u(self, x):
        """u * x in the base field (rotate + nr-scale of the top term)."""
        p = self.base.p
        return (x[-1] * self.nr % p,) + tuple(x[:-1])

    def mul(self, a, b):
        B = self.base
        v0 = B.mul(a[0], b[0])
        v1 = B.mul(a[1], b[1])
        c0 = B.add(v0, self.mul_u(v1))
        c1 = B.sub(B.sub(B.mul(B.add(a[0], a[1]), B.add(b[0], b[1])), v0), v1)
        return (c0, c1)

    def one(self):
        return (self.base.one, self.base.zero)

    def pow(self, a, e: int):
        out = self.one()
        for bit in bin(e)[2:]:
            out = self.mul(out, out)
            if bit == "1":
                out = self.mul(out, a)
        return out

    def inv(self, a):
        B = self.base
        norm = B.sub(B.mul(a[0], a[0]), self.mul_u(B.mul(a[1], a[1])))
        ni = B.inv(norm)
        return (B.mul(a[0], ni), tuple(-c % B.p for c in B.mul(a[1], ni)))


def _pack_gt(ext, spec, vals):
    """list of ((base-tuple), (base-tuple)) -> (2, deg, 48, N) planes."""
    deg = len(vals[0][0])
    comps = []
    for v in range(2):
        comps.append(
            np.stack(
                [
                    ints_to_limbs([spec.to_mont(x[v][c]) for x in vals])
                    for c in range(deg)
                ]
            )
        )
    return jnp.asarray(np.stack(comps))


def _unpack_gt(spec, arr):
    out = []
    n = arr.shape[-1]
    for j in range(n):
        elem = []
        for v in range(arr.shape[0]):
            elem.append(
                tuple(
                    spec.from_mont(limbs_to_ints(np.asarray(arr[v, c]))[j])
                    for c in range(arr.shape[1])
                )
            )
        out.append(tuple(elem))
    return out


def _run_gt(model, ext, base_deg, nr, rng):
    spec = model.Fq.spec
    B = ExtSpec(spec.p, base_deg, nr)
    H = HostQuad(B, nr)
    mk = lambda: tuple(
        tuple(rng.randrange(spec.p) for _ in range(base_deg)) for _ in range(2)
    )
    a = [mk() for _ in range(N)]
    b = [mk() for _ in range(N)]
    A, Bv = _pack_gt(ext, spec, a), _pack_gt(ext, spec, b)

    def everything(A, Bv):
        return (
            ext.mul(A, Bv),
            ext.sqr(A),
            ext.inv(A),
            ext.frobenius_map(A, 1),
            ext.unitary_inverse(A),
        )

    mul, sqr, inv, frob, uinv = jax.jit(everything)(A, Bv)
    assert _unpack_gt(spec, mul) == [H.mul(x, y) for x, y in zip(a, b)]
    assert _unpack_gt(spec, sqr) == [H.mul(x, x) for x in a]
    assert _unpack_gt(spec, inv) == [H.inv(x) for x in a]
    # Frobenius_map(1) is exactly x -> x^q
    assert _unpack_gt(spec, frob) == [H.pow(x, spec.p) for x in a]
    # unitary inverse: conjugation negates the v-component
    assert _unpack_gt(spec, uinv) == [
        (x[0], tuple(-c % spec.p for c in x[1])) for x in a
    ]


def test_fq4_gt(rng):
    m = mnt4753.get()
    _run_gt(m, m.Fq4, 2, mnt4753.FQ2_NON_RESIDUE, rng)


def test_fq6_gt(rng):
    m = mnt6753.get()
    _run_gt(m, m.Fq6, 3, mnt6753.FQ3_NON_RESIDUE, rng)


def _g2_to_host(model, spec, P):
    deg = np.asarray(P[0]).shape[0]

    def comp(t):
        arr = np.asarray(t)
        return tuple(spec.from_mont(limbs_to_ints(arr[c])[0]) for c in range(deg))

    X, Y, Z = (comp(t) for t in P)
    return X, Y, Z


def _check_mul_by_q(model, ocur, rng):
    """mul_by_q == multiplication by q on the r-order G2 subgroup."""
    spec = model.Fq.spec
    r = model.Fr.p
    q = model.Fq.p
    # a random multiple of the subgroup generator
    k = rng.getrandbits(64) | 1
    P_host = ocur.g2.mul(k, ocur.g2_gen)
    deg = ocur.ext_deg
    X = jnp.asarray(
        np.stack([ints_to_limbs([spec.to_mont(P_host[0][c])]) for c in range(deg)])
    )
    Y = jnp.asarray(
        np.stack([ints_to_limbs([spec.to_mont(P_host[1][c])]) for c in range(deg)])
    )
    Z = jnp.asarray(
        np.stack(
            [ints_to_limbs([spec.to_mont(1 if c == 0 else 0)]) for c in range(deg)]
        )
    )
    out = jax.jit(model.g2_mul_by_q)((X, Y, Z))
    Xo, Yo, Zo = _g2_to_host(model, spec, out)
    # normalize the projective output on host
    F = ocur.g2.F
    zi = F.inv(Zo)
    got = (F.mul(Xo, zi), F.mul(Yo, zi))
    want = ocur.g2.mul(q % r, P_host)
    assert got == want


def test_mul_by_q_mnt4753(rng):
    _check_mul_by_q(mnt4753.get(), mnt4753_oracle(), rng)


def test_mul_by_q_mnt6753(rng):
    _check_mul_by_q(mnt6753.get(), mnt6753_oracle(), rng)
