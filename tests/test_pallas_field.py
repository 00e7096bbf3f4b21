"""Pallas Montgomery-mul kernel vs the XLA field core, bit-for-bit.

Runs on whatever backend is default (conftest does NOT force a
platform): on CPU the kernel runs in Pallas interpreter mode; on TPU
the same test exercises the compiled Mosaic kernel."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops import pallas_field as pf
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints


def test_mont_mul_kernel_exact(rng):
    from jax.experimental.pallas import tpu as pltpu

    F = mnt4753.get().Fq
    spec = F.spec
    p = spec.p
    N = 128
    avals = [rng.randrange(p) for _ in range(N - 3)] + [0, 1, p - 1]
    bvals = [rng.randrange(p) for _ in range(N - 3)] + [p - 1, 0, p - 1]
    a = jnp.asarray(ints_to_limbs(avals))
    b = jnp.asarray(ints_to_limbs(bvals))

    if jax.default_backend() == "tpu":
        out = pf.mont_mul_pallas(spec, a, b, 128)
    else:
        with pltpu.force_tpu_interpret_mode():
            out = pf.mont_mul_pallas(spec, a, b, 128)

    got = limbs_to_ints(np.asarray(out))
    Rinv = pow(spec.R, -1, p)
    want = [x * y % p * Rinv % p for x, y in zip(avals, bvals)]
    assert got == want
