"""Distributed 4-step FFT vs the single-device domain, on the virtual
8-device CPU mesh — the TPU analogue of the reference's OpenMP parallel
FFT equivalence (basic_radix2_domain_aux.tcc:218-296)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops.fft import Radix2Domain
from snark_challenge_prover_tpu.parallel.fft_sharded import (
    coset_fft_sharded,
    fft_sharded,
    icoset_fft_sharded,
    ifft_sharded,
)
from snark_challenge_prover_tpu.parallel.mesh import make_mesh
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs


@pytest.fixture(scope="module")
def setup(request):
    from tests.conftest import cpu_devices

    model = mnt4753.get()
    F = model.Fr
    mesh = make_mesh(8, devices=cpu_devices(8))
    n = 64  # n1 = n2 = 8 on an 8-device mesh
    dom = Radix2Domain(F, n)
    import random

    rng = random.Random(5)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    a = jnp.asarray(ints_to_limbs([F.spec.to_mont(c) for c in coeffs]))
    return model, F, mesh, dom, a


def test_fft_sharded_matches_single(setup):
    model, F, mesh, dom, a = setup
    want = np.asarray(dom.fft(a))
    got = np.asarray(fft_sharded(mesh, F, a))
    assert np.array_equal(got, want)


def test_ifft_sharded_roundtrip(setup):
    model, F, mesh, dom, a = setup
    ev = fft_sharded(mesh, F, a)
    back = np.asarray(ifft_sharded(mesh, F, ev))
    assert np.array_equal(back, np.asarray(a))


def test_compute_h_sharded_matches_single(setup):
    """Full 7-pass compute_H, distributed vs replicated (main.cpp:105-163
    semantics)."""
    import random

    from snark_challenge_prover_tpu.parallel.pipeline import compute_h_sharded
    from snark_challenge_prover_tpu.proof_systems.groth16 import compute_h

    model, F, mesh, dom, a = setup
    rng = random.Random(9)
    n = 64
    mk = lambda: jnp.asarray(
        ints_to_limbs([F.spec.to_mont(rng.randrange(F.p)) for _ in range(n)])
    )
    ca, cb, cc = mk(), mk(), mk()
    want = np.asarray(compute_h(model, dom, ca, cb, cc))
    got = np.asarray(compute_h_sharded(mesh, model, ca, cb, cc))
    assert np.array_equal(got, want)


def test_coset_sharded_matches_single(setup):
    model, F, mesh, dom, a = setup
    want = np.asarray(dom.coset_fft(a))
    got = np.asarray(coset_fft_sharded(mesh, F, a))
    assert np.array_equal(got, want)
    back = np.asarray(icoset_fft_sharded(mesh, F, jnp.asarray(got)))
    assert np.array_equal(back, np.asarray(a))
