"""Sequence-domain tests (libfqfft geometric/arithmetic domains,
geometric_sequence_domain.tcc / arithmetic_sequence_domain.tcc): FFT vs
naive evaluation at the sequence points, interpolation round-trip, coset
round-trip, per-point divide-by-Z, vanishing polynomial, Lagrange
coefficients, and the dispatcher fallback for non-radix-2 sizes."""

import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops.fft import get_evaluation_domain
from snark_challenge_prover_tpu.ops.sequence_domains import (
    ArithmeticSequenceDomain,
    GeometricSequenceDomain,
)
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints


def _pack(F, vals):
    return jnp.asarray(ints_to_limbs([F.spec.to_mont(v) for v in vals]))


def _unpack(F, arr):
    return [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


def _domain_checks(F, dom, rng, check_divide=True):
    p = F.p
    m = dom.m
    coeffs = [rng.randrange(p) for _ in range(m)]
    a = _pack(F, coeffs)

    ev = _unpack(F, dom.fft(a))
    for i in range(m):
        x = dom.get_domain_element(i)
        assert ev[i] == sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p

    assert _unpack(F, dom.ifft(_pack(F, ev))) == coeffs

    cv = dom.coset_fft(a)
    g = F.spec.multiplicative_generator
    cv_ints = _unpack(F, cv)
    for i in range(m):
        x = g * dom.get_domain_element(i) % p
        assert cv_ints[i] == sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
    assert _unpack(F, dom.icoset_fft(cv)) == coeffs

    if check_divide:
        dv = _unpack(F, dom.divide_by_z_on_coset(cv))
        for i in range(m):
            Z = dom.compute_vanishing_polynomial(g * dom.get_domain_element(i) % p)
            assert dv[i] * Z % p == cv_ints[i]
    else:
        with pytest.raises(ValueError):
            dom.divide_by_z_on_coset(cv)

    # Z vanishes exactly on the domain
    for i in range(m):
        assert dom.compute_vanishing_polynomial(dom.get_domain_element(i)) == 0
    t = rng.randrange(p)
    H = [0] * (m + 1)
    dom.add_poly_Z(7, H)
    want = 7 * dom.compute_vanishing_polynomial(t) % p
    assert sum(c * pow(t, k, p) for k, c in enumerate(H)) % p == want

    # Lagrange: sum_j L_j(t) * f(x_j) == f(t); indicator inside the domain
    L = dom.evaluate_all_lagrange_polynomials(t)
    f_t = sum(c * pow(t, j, p) for j, c in enumerate(coeffs)) % p
    acc = 0
    for j in range(m):
        fx = sum(c * pow(dom.get_domain_element(j), k, p) for k, c in enumerate(coeffs))
        acc = (acc + int(L[j]) * fx) % p
    assert acc == f_t
    L0 = dom.evaluate_all_lagrange_polynomials(dom.get_domain_element(1))
    assert list(L0) == [1 if j == 1 else 0 for j in range(m)]


def test_geometric_domain(rng):
    F = mnt4753.get().Fr
    dom = GeometricSequenceDomain(F, 7)
    assert [dom.get_domain_element(i) for i in range(3)] == [1, 2, 4]
    _domain_checks(F, dom, rng)


def test_arithmetic_domain(rng):
    F = mnt4753.get().Fr
    dom = ArithmeticSequenceDomain(F, 6)
    assert [dom.get_domain_element(i) for i in range(3)] == [0, 1, 2]
    # x_0 = 0 is fixed by any multiplicative coset, so divide_by_Z must
    # refuse (see sequence_domains.divide_by_z_on_coset)
    _domain_checks(F, dom, rng, check_divide=False)


def test_dispatcher_falls_back_to_geometric():
    F = mnt4753.get().Fr
    dom = get_evaluation_domain(F, 7)
    assert isinstance(dom, GeometricSequenceDomain)
    with pytest.raises(ValueError):
        get_evaluation_domain(F, 1)
