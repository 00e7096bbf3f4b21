"""Evaluation-domain tests (model: libfqfft's gtest typed tests,
depends/libfqfft/libfqfft/tests/evaluation_domain_test.cpp): FFT vs naive
evaluation, iFFT round-trip, coset round-trip, divide-by-Z — bit-exact vs
the integer oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools import oracle as orc
from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.ops.fft import (
    MixedRadixDomain,
    Radix2Domain,
    get_evaluation_domain,
)
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_ints


def _pack(F, vals):
    return jnp.asarray(ints_to_limbs([F.spec.to_mont(v) for v in vals]))


def _unpack(F, arr):
    return [F.spec.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


@pytest.mark.parametrize("model_get", [mnt4753.get, mnt6753.get], ids=["m4", "m6"])
def test_radix2_fft_matches_oracle(model_get, rng):
    model = model_get()
    F = model.Fr
    p = F.p
    n = 16
    dom = get_evaluation_domain(F, n)
    assert isinstance(dom, Radix2Domain)
    omega = F.spec.get_root_of_unity(n)

    coeffs = [rng.randrange(p) for _ in range(n)]
    A = _pack(F, coeffs)

    got = _unpack(F, jax.jit(dom.fft)(A))
    assert got == orc.fft(coeffs, omega, p)

    evals = got
    back = _unpack(F, jax.jit(dom.ifft)(_pack(F, evals)))
    assert back == coeffs

    got = _unpack(F, jax.jit(dom.coset_fft)(A))
    g = F.spec.multiplicative_generator
    want = orc.fft([c * pow(g, i, p) % p for i, c in enumerate(coeffs)], omega, p)
    assert got == want

    back = _unpack(F, jax.jit(dom.icoset_fft)(_pack(F, got)))
    assert back == coeffs

    got = _unpack(F, jax.jit(dom.divide_by_z_on_coset)(A))
    zinv = pow(pow(g, n, p) - 1, -1, p)
    assert got == [c * zinv % p for c in coeffs]


def test_mixed_radix_fft(rng):
    model = mnt6753.get()
    F = model.Fr  # small subgroup 5^2 defined
    p = F.p
    n = 40  # 2^3 * 5
    dom = get_evaluation_domain(F, n)
    assert isinstance(dom, MixedRadixDomain)
    omega = F.spec.get_root_of_unity(n)

    coeffs = [rng.randrange(p) for _ in range(n)]
    A = _pack(F, coeffs)
    got = _unpack(F, jax.jit(dom.fft)(A))
    assert got == orc.fft_mixed(coeffs, omega, p)

    back = _unpack(F, jax.jit(dom.ifft)(_pack(F, got)))
    assert back == coeffs

    got = _unpack(F, jax.jit(dom.coset_fft)(A))
    back = _unpack(F, jax.jit(dom.icoset_fft)(_pack(F, got)))
    assert back == coeffs


def test_lagrange_polynomials(rng):
    model = mnt4753.get()
    F = model.Fr
    p = F.p
    n = 8
    dom = Radix2Domain(F, n)
    t = rng.randrange(p)
    lag = dom.evaluate_all_lagrange_polynomials(t)
    # sum_i v_i L_i(t) == interp(v)(t)
    vals = [rng.randrange(p) for _ in range(n)]
    omega = F.spec.get_root_of_unity(n)
    coeffs = orc.ifft(vals, omega, p)
    direct = sum(c * pow(t, j, p) for j, c in enumerate(coeffs)) % p
    viaL = sum(v * int(l) for v, l in zip(vals, lag)) % p
    assert direct == viaL
    # domain-element special case
    lag0 = dom.evaluate_all_lagrange_polynomials(dom.get_domain_element(3))
    assert list(lag0) == [1 if i == 3 else 0 for i in range(n)]


def test_domain_size_errors():
    from snark_challenge_prover_tpu.ops.fft import StepRadix2Domain

    model = mnt4753.get()
    # 24 = 16 + 8 is a valid step domain (step_radix2_domain.tcc)
    assert isinstance(get_evaluation_domain(model.Fr, 24), StepRadix2Domain)
    with pytest.raises(ValueError):
        get_evaluation_domain(model.Fr, 7)  # 4+2+1: no supported shape
    with pytest.raises(ValueError):
        Radix2Domain(model.Fr, 2 ** 31)  # exceeds 2-adicity s=30
