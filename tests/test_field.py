"""Montgomery prime-field ops vs exact Python-int arithmetic, for both
753-bit primes of the MNT4753/MNT6753 cycle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models.primes import FIELD_A, FIELD_B
from snark_challenge_prover_tpu.ops.field import Fp
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

N = 16

FA = Fp(FIELD_A, "FqA")
FB = Fp(FIELD_B, "FqB")


def _mont_vec(F, rng, n=N):
    vals = [rng.randrange(F.p) for _ in range(n)]
    return vals, jnp.asarray(F.host_to_mont_limbs(vals))


def _from_mont(F, arr):
    return [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


@pytest.mark.parametrize("F", [FA, FB], ids=["pA", "pB"])
def test_mul_add_sub_neg(F, rng):
    av, A = _mont_vec(F, rng)
    bv, B = _mont_vec(F, rng)
    # force boundary values
    av[0], bv[0] = 0, 0
    av[1], bv[1] = F.p - 1, F.p - 1
    av[2] = 0
    A = jnp.asarray(F.host_to_mont_limbs(av))
    B = jnp.asarray(F.host_to_mont_limbs(bv))

    got = _from_mont(F, jax.jit(F.mul)(A, B))
    assert got == [x * y % F.p for x, y in zip(av, bv)]

    got = _from_mont(F, jax.jit(F.add)(A, B))
    assert got == [(x + y) % F.p for x, y in zip(av, bv)]

    got = _from_mont(F, jax.jit(F.sub)(A, B))
    assert got == [(x - y) % F.p for x, y in zip(av, bv)]

    got = _from_mont(F, jax.jit(F.neg)(A))
    assert got == [(-x) % F.p for x in av]

    got = _from_mont(F, jax.jit(F.sqr)(A))
    assert got == [x * x % F.p for x in av]


@pytest.mark.parametrize("F", [FA], ids=["pA"])
def test_inv_and_batch_inv(F, rng):
    av, A = _mont_vec(F, rng)
    av[0] = 0  # zero maps to zero
    av[1] = 1
    av[2] = F.p - 1
    A = jnp.asarray(F.host_to_mont_limbs(av))
    want = [pow(x, -1, F.p) if x else 0 for x in av]
    got = _from_mont(F, jax.jit(F.inv)(A))
    assert got == want
    got = _from_mont(F, jax.jit(F.batch_inv)(A))
    assert got == want


@pytest.mark.parametrize("F", [FA], ids=["pA"])
def test_mont_conversions(F, rng):
    av, A = _mont_vec(F, rng)
    canon = jax.jit(F.to_canonical)(A)
    assert limbs_to_ints(np.asarray(canon)) == av
    back = jax.jit(F.from_canonical)(canon)
    assert _from_mont(F, back) == av


@pytest.mark.parametrize("F", [FB], ids=["pB"])
def test_mul_small(F, rng):
    av, A = _mont_vec(F, rng)
    got = _from_mont(F, jax.jit(lambda x: F.mul_small(x, 13))(A))
    assert got == [x * 13 % F.p for x in av]
    got = _from_mont(F, jax.jit(lambda x: F.mul_small(x, 11))(A))
    assert got == [x * 11 % F.p for x in av]


def test_pow_int(rng):
    F = FA
    av, A = _mont_vec(F, rng, 4)
    e = 0xDEADBEEFCAFE
    got = _from_mont(F, jax.jit(lambda x: F.pow_int(x, e))(A))
    assert got == [pow(x, e, F.p) for x in av]
