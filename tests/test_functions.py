"""Batched modular-function tests (cuda-fixnum tests/test-suite.cu
analogue: golden values from exact host ints, byte-wise comparison)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.ops import functions as fn
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints


@pytest.fixture(scope="module")
def F():
    return mnt4753.get().Fr


def test_modexp(F, rng):
    p = F.p
    N = 4
    bases = [rng.randrange(p) for _ in range(N)]
    exps = [rng.randrange(p) for _ in range(N)]
    b = jnp.asarray(ints_to_limbs([F.spec.to_mont(v) for v in bases]))
    e = jnp.asarray(ints_to_limbs(exps))
    out = fn.modexp(F, b, e)
    got = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(out))]
    assert got == [pow(b_, e_, p) for b_, e_ in zip(bases, exps)]


def test_modinv(F, rng):
    p = F.p
    vals = [rng.randrange(1, p) for _ in range(4)] + [0]
    a = jnp.asarray(ints_to_limbs([F.spec.to_mont(v) for v in vals]))
    out = fn.modinv(F, a)
    got = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(out))]
    assert got == [pow(v, -1, p) if v else 0 for v in vals]


def test_quorem(rng):
    nums = [rng.randrange(1 << 753) for _ in range(4)]
    dens = [rng.randrange(1, 1 << 400) for _ in range(4)]
    n = jnp.asarray(ints_to_limbs(nums))
    d = jnp.asarray(ints_to_limbs(dens))
    q, r = fn.quorem(n, d)
    qs = limbs_to_ints(np.asarray(q))
    rs = limbs_to_ints(np.asarray(r))
    for num, den, qq, rr in zip(nums, dens, qs, rs):
        assert qq == num // den and rr == num % den


def test_divexact(rng):
    dens = [rng.randrange(1, 1 << 370) for _ in range(4)]
    quots = [rng.randrange(1, 1 << 370) for _ in range(4)]
    nums = [a * b for a, b in zip(dens, quots)]
    out = fn.divexact(jnp.asarray(ints_to_limbs(nums)), jnp.asarray(ints_to_limbs(dens)))
    assert limbs_to_ints(np.asarray(out)) == quots


def test_chinese(rng):
    F1 = mnt4753.get().Fr   # p1 = r(MNT4753)
    F2 = mnt4753.get().Fq   # p2 = q(MNT4753)
    p1, p2 = F1.p, F2.p
    xs = [rng.randrange(p1 * p2 // 2) for _ in range(3)]
    a = jnp.asarray(ints_to_limbs([x % p1 for x in xs]))
    b = jnp.asarray(ints_to_limbs([x % p2 for x in xs]))
    out = fn.chinese(F1, F2, a, b)
    got = limbs_to_ints(np.asarray(out))
    for x, g in zip(xs, got):
        assert g % p1 == x % p1 and g % p2 == x % p2


def test_paillier_demo(rng):
    # tiny primes are fine for the capability demo
    pp, qq = 1000003, 1000033
    n = pp * qq
    lam = (pp - 1) * (qq - 1)
    g = n + 1
    m = rng.randrange(n)
    r = rng.randrange(1, n)
    c = fn.paillier_encrypt(n, g, m, r)
    assert fn.paillier_decrypt(n, lam, c) == m
