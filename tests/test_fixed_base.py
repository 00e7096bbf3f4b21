"""Fixed-base windowed exponentiation + wNAF tests against exact host
curve arithmetic (libff multiexp.tcc:552-682, wnaf.tcc coverage)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.host.curves import mnt4753_host
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops import fixed_base
from snark_challenge_prover_tpu.proof_systems.groth16_full import _g1_to_ints
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs


@pytest.fixture(scope="module")
def setup():
    model = mnt4753.get()
    hc = mnt4753_host()
    base = model.g1_generator()
    table = fixed_base.get_window_table(model.G1, 3, base)
    return model, hc, base, table


def test_find_wnaf_reconstructs(rng):
    for w in (2, 3, 5):
        for _ in range(5):
            s = rng.randrange(1 << 200)
            naf = fixed_base.find_wnaf(w, s)
            assert sum(d << i for i, d in enumerate(naf)) == s
            for d in naf:
                assert d == 0 or (d % 2 == 1 and abs(d) < (1 << w))


def test_batch_exp_matches_host(setup, rng):
    model, hc, base, table = setup
    p = model.Fr.p
    scalars = [0, 1, 2, rng.randrange(p), p - 1]
    s = jnp.asarray(ints_to_limbs(scalars))
    out = jax.jit(
        lambda t, s: model.G1.to_affine(fixed_base.batch_exp(model.G1, 3, t, s))
    )(table, s)
    x, y, z = (np.asarray(v) for v in out)
    for i, k in enumerate(scalars):
        got = _g1_to_ints(model, (x[:, i], y[:, i], z[:, i]))
        assert got == hc.g1.mul(k, hc.g1_gen), f"scalar {k}"


def test_batch_exp_with_coeff(setup, rng):
    model, hc, base, table = setup
    F = model.Fr
    p = F.p
    coeff = rng.randrange(1, p)
    scalars = [rng.randrange(p) for _ in range(3)]
    s_mont = jnp.asarray(ints_to_limbs([F.spec.to_mont(v) for v in scalars]))
    out = jax.jit(
        lambda t, s: model.G1.to_affine(
            fixed_base.batch_exp_with_coeff(model.G1, 3, t, F.const(coeff), s, F)
        )
    )(table, s_mont)
    x, y, z = (np.asarray(v) for v in out)
    for i, k in enumerate(scalars):
        got = _g1_to_ints(model, (x[:, i], y[:, i], z[:, i]))
        assert got == hc.g1.mul(coeff * k % p, hc.g1_gen)


def test_wnaf_exp_matches_host(setup, rng):
    model, hc, base, table = setup
    k = rng.randrange(1, model.Fr.p)
    P = fixed_base.fixed_window_wnaf_exp(model.G1, 4, base, k)
    got = _g1_to_ints(model, model.G1.to_affine(P))
    assert got == hc.g1.mul(k, hc.g1_gen)


def test_opt_window_wnaf_zero_and_small(setup):
    model, hc, base, table = setup
    P0 = fixed_base.opt_window_wnaf_exp(model.G1, base, 0)
    assert _g1_to_ints(model, model.G1.to_affine(P0)) is None
    P5 = fixed_base.opt_window_wnaf_exp(model.G1, base, 5)
    assert _g1_to_ints(model, model.G1.to_affine(P5)) == hc.g1.mul(5, hc.g1_gen)
