"""Group-law tests mirroring the reference's algebra tests
(depends/libff/libff/algebra/curves/tests/test_groups.cpp): add vs oracle
(incl. identity/inverse/doubling degeneracies), double, well-formedness,
affine round-trip — one jitted program per curve to keep CPU compile time
bounded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.oracle import mnt4753_oracle, mnt6753_oracle
from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_int

N = 8


def _pack_field(spec, vals):
    if isinstance(vals[0], tuple):
        deg = len(vals[0])
        return jnp.asarray(
            np.stack(
                [ints_to_limbs([spec.to_mont(v[c]) for v in vals]) for c in range(deg)]
            )
        )
    return jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in vals]))


def _zero_xy(G):
    deg = getattr(G.F, "deg", 1)
    if deg == 1:
        return 0, 0
    return (0,) * deg, (0,) * deg


def _pack_pts(G, F, spec, pts):
    """oracle affine points (None == identity) -> projective limb planes."""
    xs, ys = [], []
    for P in pts:
        if P is None:
            x, y = _zero_xy(G)
        else:
            x, y = P
        xs.append(x)
        ys.append(y)
    return G.from_affine(_pack_field(spec, xs), _pack_field(spec, ys))


def _affine_to_oracle(G, spec, aff):
    """output of G.to_affine -> list of oracle affine points."""
    X, Y, Z = (np.asarray(c) for c in aff)
    deg = getattr(G.F, "deg", 1)
    n = X.shape[-1]
    out = []
    for j in range(n):
        if deg == 1:
            z = spec.from_mont(limbs_to_int(Z[:, j]))
            x = spec.from_mont(limbs_to_int(X[:, j]))
            y = spec.from_mont(limbs_to_int(Y[:, j]))
        else:
            z = spec.from_mont(limbs_to_int(Z[0, :, j]))
            x = tuple(spec.from_mont(limbs_to_int(X[c, :, j])) for c in range(deg))
            y = tuple(spec.from_mont(limbs_to_int(Y[c, :, j])) for c in range(deg))
        out.append(None if z == 0 else (x, y))
    return out


def _unpack_pts(G, spec, P):
    aff = jax.jit(G.to_affine)(P)
    return _affine_to_oracle(G, spec, aff)


CASES = [
    ("mnt4753-g1", mnt4753.get, mnt4753_oracle, "g1", "g1_gen", "G1"),
    ("mnt4753-g2", mnt4753.get, mnt4753_oracle, "g2", "g2_gen", "G2"),
    ("mnt6753-g1", mnt6753.get, mnt6753_oracle, "g1", "g1_gen", "G1"),
    ("mnt6753-g2", mnt6753.get, mnt6753_oracle, "g2", "g2_gen", "G2"),
]


@pytest.mark.parametrize("name,get_model,get_oracle,og,ogen,tg", CASES,
                         ids=[c[0] for c in CASES])
def test_group_law(name, get_model, get_oracle, og, ogen, tg, rng):
    model = get_model()
    ocur = get_oracle()
    OG = getattr(ocur, og)
    gen = getattr(ocur, ogen)
    G = getattr(model, tg)
    spec = model.Fq.spec

    ks = [rng.getrandbits(32) | 1 for _ in range(N - 3)]
    pts_a = [OG.mul(k, gen) for k in ks] + [None, gen, OG.mul(7, gen)]
    pts_b = (
        [OG.mul(k + 5, gen) for k in ks[: N - 4]]
        + [pts_a[N - 4]]  # equal points -> doubling path
        + [gen, None, OG.neg(OG.mul(7, gen))]  # zero operands, inverse pair
    )

    A = _pack_pts(G, model.Fq, spec, pts_a)
    B = _pack_pts(G, model.Fq, spec, pts_b)

    # one compiled program: add, double, well-formed, affine round-trip
    def everything(A, B):
        s = G.add(A, B)
        d = G.double(A)
        wf = G.is_well_formed(A)
        cat = tuple(
            jnp.concatenate([x, y, z], axis=-1) for x, y, z in zip(s, d, A)
        )
        return G.to_affine(cat), wf

    aff, wf = jax.jit(everything)(A, B)
    got = _affine_to_oracle(G, spec, aff)
    want_add = [OG.add(x, y) for x, y in zip(pts_a, pts_b)]
    want_dbl = [OG.add(x, x) for x in pts_a]
    assert got[:N] == want_add
    assert got[N : 2 * N] == want_dbl
    assert got[2 * N :] == pts_a  # affine round-trip
    assert bool(np.all(np.asarray(wf)))


def test_scalar_mul_limbs(rng):
    model = mnt4753.get()
    ocur = mnt4753_oracle()
    G = model.G1
    k = rng.getrandbits(64)
    P = ocur.g1.mul(9, ocur.g1_gen)
    A = _pack_pts(G, model.Fq, model.Fq.spec, [P])
    scal = jnp.asarray(ints_to_limbs([k]))
    got = _unpack_pts(
        G,
        model.Fq.spec,
        jax.jit(lambda a, s: G.scalar_mul_limbs(a, s, num_bits=64))(A, scal),
    )
    assert got == [ocur.g1.mul(k, P)]
