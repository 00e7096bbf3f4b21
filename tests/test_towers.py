"""Fq2/Fq3 tower ops vs the exact-int oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from tools.oracle import ExtSpec
from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

N = 8


def _pack(F2, spec, vals):
    """list of deg-tuples (canonical ints) -> (deg, 48, N) Montgomery."""
    deg = len(vals[0])
    comps = []
    for c in range(deg):
        comps.append(ints_to_limbs([spec.to_mont(v[c]) for v in vals]))
    return jnp.asarray(np.stack(comps))


def _unpack(spec, arr):
    deg = arr.shape[0]
    outs = []
    for c in range(deg):
        outs.append([spec.from_mont(v) for v in limbs_to_ints(np.asarray(arr[c]))])
    return list(zip(*outs))


def _run_tower(curve, ext, deg, nr, rng):
    spec = curve.Fq.spec
    O = ExtSpec(spec.p, deg, nr)
    a = [tuple(rng.randrange(spec.p) for _ in range(deg)) for _ in range(N)]
    b = [tuple(rng.randrange(spec.p) for _ in range(deg)) for _ in range(N)]
    a[0] = tuple([0] * deg)  # boundary: zero element
    A, B = _pack(ext, spec, a), _pack(ext, spec, b)

    # one compiled program for everything (CPU compiles are the test cost)
    def everything(A, B):
        return (
            ext.mul(A, B),
            ext.sqr(A),
            ext.add(A, B),
            ext.sub(A, B),
            ext.batch_inv(A),
            ext.is_zero(A),
        )

    mul, sqr, add, sub, binv, isz = jax.jit(everything)(A, B)
    assert _unpack(spec, mul) == [O.mul(x, y) for x, y in zip(a, b)]
    assert _unpack(spec, sqr) == [O.mul(x, x) for x in a]
    assert _unpack(spec, add) == [O.add(x, y) for x, y in zip(a, b)]
    assert _unpack(spec, sub) == [O.sub(x, y) for x, y in zip(a, b)]
    assert _unpack(spec, binv) == [O.zero if O.is_zero(x) else O.inv(x) for x in a]
    assert list(np.asarray(isz)) == [O.is_zero(x) for x in a]


def test_fq2(rng):
    cur = mnt4753.get()
    _run_tower(cur, cur.Fq2, 2, mnt4753.FQ2_NON_RESIDUE, rng)


def test_fq3(rng):
    cur = mnt6753.get()
    _run_tower(cur, cur.Fq3, 3, mnt6753.FQ3_NON_RESIDUE, rng)
