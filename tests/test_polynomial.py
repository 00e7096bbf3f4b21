"""Polynomial arithmetic tests (libfqfft polynomial_arithmetic_test.cpp /
kronecker_substitution_test.cpp analogues)."""

import random

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops import polynomial as poly


def _rand_poly(rng, p, deg):
    return [rng.randrange(p) for _ in range(deg + 1)]


def test_add_sub_mul_naive(rng):
    p = 10007
    a = _rand_poly(rng, p, 7)
    b = _rand_poly(rng, p, 4)
    s = poly.addition(a, b, p)
    d = poly.subtraction(s, b, p)
    assert d == poly._trim(a, p)
    m = poly.multiplication_naive(a, b, p)
    t = rng.randrange(p)
    assert poly.evaluate_polynomial(m, t, p) == (
        poly.evaluate_polynomial(a, t, p) * poly.evaluate_polynomial(b, t, p) % p
    )


def test_kronecker_matches_naive(rng):
    p = mnt4753.get().Fr.p
    a = _rand_poly(rng, p, 9)
    b = _rand_poly(rng, p, 6)
    assert poly.kronecker_substitution(a, b, p) == poly.multiplication_naive(a, b, p)


def test_fft_multiplication_matches_naive(rng):
    model = mnt4753.get()
    p = model.Fr.p
    a = _rand_poly(rng, p, 5)
    b = _rand_poly(rng, p, 4)
    assert poly.multiplication_fft(model.Fr, a, b) == poly.multiplication_naive(a, b, p)


def test_division(rng):
    p = 10007
    a = _rand_poly(rng, p, 9)
    b = _rand_poly(rng, p, 3)
    q, r = poly.division(a, b, p)
    recon = poly.addition(poly.multiplication_naive(q, b, p), r, p)
    assert recon == poly._trim(a, p)
    assert len(r) < len(poly._trim(b, p)) or r == [0]


def test_xgcd(rng):
    p = 10007
    # gcd((x-3)f, (x-3)g) should be divisible by (x-3) when f,g coprime
    f = [1, 1]      # x + 1
    g = [2, 0, 1]   # x^2 + 2
    x3 = [p - 3, 1]  # x - 3
    a = poly.multiplication_naive(x3, f, p)
    b = poly.multiplication_naive(x3, g, p)
    gcd, u, v = poly.xgcd(a, b, p)
    lhs = poly.addition(
        poly.multiplication_naive(u, a, p), poly.multiplication_naive(v, b, p), p
    )
    assert lhs == gcd
    assert gcd[-1] == 1  # monic
    _, rem = poly.division(gcd, x3, p)
    assert rem == [0]


def test_lagrange_interpolation(rng):
    p = 10007
    pts = [1, 2, 3, 4]
    f = _rand_poly(rng, p, 3)
    evals = [poly.evaluate_polynomial(f, x, p) for x in pts]
    t = rng.randrange(p)
    assert poly.evaluate_lagrange_polynomial(pts, evals, t, p) == (
        poly.evaluate_polynomial(f, t, p)
    )
