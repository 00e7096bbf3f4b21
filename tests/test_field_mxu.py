"""MXU Toeplitz REDC (field.Fp._redc_mxu) vs exact Python ints.

The constant-operand convolutions of Montgomery REDC run as banded
matmuls over byte limb planes (bf16 inputs, f32 accumulation — exact by
range analysis, see field.py).  Bit-exactness must hold on every
backend, so these tests run on CPU like the rest of the suite.
"""

import jax
import jax.numpy as jnp
import pytest

from snark_challenge_prover_tpu.models.primes import FIELD_A, FIELD_B
from snark_challenge_prover_tpu.ops.field import Fp
from snark_challenge_prover_tpu.utils.bigint import limbs_to_ints

N = 16


@pytest.mark.parametrize("F", [Fp(FIELD_A, "FqA"), Fp(FIELD_B, "FqB")], ids=["pA", "pB"])
def test_redc_mxu_matches_exact(F, rng):
    import numpy as np

    av = [rng.randrange(F.p) for _ in range(N)]
    bv = [rng.randrange(F.p) for _ in range(N)]
    # boundary values: zero, p-1, one
    av[0], bv[0] = 0, rng.randrange(F.p)
    av[1], bv[1] = F.p - 1, F.p - 1
    av[2], bv[2] = 1, 1
    A = jnp.asarray(F.host_to_mont_limbs(av))
    B = jnp.asarray(F.host_to_mont_limbs(bv))

    from snark_challenge_prover_tpu.ops import limbs as lb

    got = jax.jit(lambda x, y: F._redc_mxu(lb.mul_wide(x, y)))(A, B)
    want = jax.jit(lambda x, y: F._redc(lb.mul_wide(x, y)))(A, B)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    got_ints = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(got))]
    assert got_ints == [x * y % F.p for x, y in zip(av, bv)]


@pytest.mark.parametrize("F", [Fp(FIELD_A, "FqA")], ids=["pA"])
def test_mxu_env_dispatch(F, rng, monkeypatch):
    """SNARK_TPU_MXU=1 routes Fp.mul through the MXU REDC (trace-time env)."""
    import numpy as np

    monkeypatch.setenv("SNARK_TPU_MXU", "1")
    av = [rng.randrange(F.p) for _ in range(8)]
    bv = [rng.randrange(F.p) for _ in range(8)]
    A = jnp.asarray(F.host_to_mont_limbs(av))
    B = jnp.asarray(F.host_to_mont_limbs(bv))
    got = jax.jit(F.mul)(A, B)
    got_ints = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(got))]
    assert got_ints == [x * y % F.p for x, y in zip(av, bv)]
