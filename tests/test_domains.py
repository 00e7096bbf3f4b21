"""Extended/step evaluation-domain tests (libfqfft
evaluation_domain_test.cpp analogue: FFT vs naive evaluation, inverse
round-trips, coset round-trips, vanishing-polynomial identities,
Lagrange interpolation, and the domain-selection rule)."""

import os
import random

import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.ops.fft import (
    ExtendedRadix2Domain,
    MixedRadixDomain,
    Radix2Domain,
    StepRadix2Domain,
    get_evaluation_domain,
)
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

HEAVY = os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") == "1"


def _roundtrip_checks(F, dom, rng, probe_idx):
    p = F.p
    m = dom.m if hasattr(dom, "m") else dom.n
    coeffs = [rng.randrange(p) for _ in range(m)]
    a = jnp.asarray(ints_to_limbs([F.spec.to_mont(c) for c in coeffs]))

    ev = dom.fft(a)
    ev_ints = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(ev))]
    for i in probe_idx:
        x = dom.get_domain_element(i)
        want = sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
        assert ev_ints[i] == want, f"FFT != naive eval at {i}"

    back = dom.ifft(ev)
    assert [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(back))] == coeffs

    cv = dom.coset_fft(a)
    cb = dom.icoset_fft(cv)
    assert [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(cb))] == coeffs

    dv = dom.divide_by_z_on_coset(cv)
    dv_ints = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(dv))]
    cv_ints = [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(cv))]
    g = F.spec.multiplicative_generator
    for i in probe_idx:
        Z = dom.compute_vanishing_polynomial(g * dom.get_domain_element(i) % p)
        assert dv_ints[i] * Z % p == cv_ints[i], f"divide_by_Z at {i}"

    # Z vanishes on the domain; add_poly_Z adds coeff * Z
    for i in probe_idx:
        assert dom.compute_vanishing_polynomial(dom.get_domain_element(i)) == 0
    if hasattr(dom, "add_poly_Z"):
        H = [0] * (m + 1)
        dom.add_poly_Z(7, H)
        x = rng.randrange(p)
        assert sum(c * pow(x, j, p) for j, c in enumerate(H)) % p == (
            7 * dom.compute_vanishing_polynomial(x) % p
        )

    if hasattr(dom, "evaluate_all_lagrange_polynomials"):
        t = rng.randrange(p)
        L = dom.evaluate_all_lagrange_polynomials(t)
        want = sum(c * pow(t, j, p) for j, c in enumerate(coeffs)) % p
        got = sum(int(L[i]) * ev_ints[i] for i in range(m)) % p
        assert got == want, "Lagrange interpolation"


def test_step_radix2_domain(rng):
    F = mnt4753.get().Fr
    dom = get_evaluation_domain(F, 12)  # 8 + 4
    assert isinstance(dom, StepRadix2Domain)
    _roundtrip_checks(F, dom, rng, [0, 1, 5, 8, 11])


@pytest.mark.skipif(not HEAVY, reason="2^16 extended-domain FFT is heavy on 1-core CI")
def test_extended_radix2_domain(rng):
    F = mnt6753.get().Fr  # s = 15 -> extended at 2^16
    dom = get_evaluation_domain(F, 1 << 16)
    assert isinstance(dom, ExtendedRadix2Domain)
    _roundtrip_checks(F, dom, rng, [0, 1, 40000, (1 << 16) - 1])


def test_domain_selection():
    F4 = mnt4753.get().Fr  # s = 30
    F6 = mnt6753.get().Fr  # s = 15, small subgroup 5^2
    assert isinstance(get_evaluation_domain(F4, 16), Radix2Domain)
    assert isinstance(get_evaluation_domain(F4, 12), StepRadix2Domain)
    assert isinstance(get_evaluation_domain(F6, 1 << 16), ExtendedRadix2Domain)
    assert isinstance(get_evaluation_domain(F6, 40), MixedRadixDomain)  # 2^3 * 5
    # 7 = 4+2+1: no structured shape -> sequence-domain fallback, matching
    # libfqfft get_evaluation_domain's geometric fallback
    from snark_challenge_prover_tpu.ops.sequence_domains import (
        GeometricSequenceDomain,
    )

    assert isinstance(get_evaluation_domain(F4, 7), GeometricSequenceDomain)
