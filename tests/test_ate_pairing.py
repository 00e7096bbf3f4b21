"""The ate pairing stack (reference structure: precompute / flipped
Miller loop / chunked final exponentiation) — bilinearity, GT order,
double-Miller consistency, for both curves (test_bilinearity.cpp's
checks)."""

import pytest

from snark_challenge_prover_tpu.host.curves import host_curve
from snark_challenge_prover_tpu.proof_systems.ate_pairing import AtePairing


@pytest.mark.parametrize("curve", ["MNT4753", "MNT6753"])
def test_ate_bilinearity(curve, rng):
    hc = host_curve(curve)
    eng = AtePairing(hc)
    GT = eng.GT

    a = rng.getrandbits(48) | 1
    b = rng.getrandbits(48) | 1
    P, Q = hc.g1_gen, hc.g2_gen
    aP = hc.g1.mul(a, P)
    bQ = hc.g2.mul(b, Q)

    e_PQ = eng.reduced_pairing(P, Q)
    assert e_PQ != GT.one, "degenerate pairing"
    # e(aP, bQ) == e(P, Q)^(ab)
    lhs = eng.reduced_pairing(aP, bQ)
    assert lhs == GT.pow(e_PQ, a * b)
    # e(aP, Q) == e(P, aQ) == e(P,Q)^a
    assert eng.reduced_pairing(aP, Q) == GT.pow(e_PQ, a)
    assert eng.reduced_pairing(P, hc.g2.mul(a, Q)) == GT.pow(e_PQ, a)


@pytest.mark.parametrize("curve", ["MNT4753", "MNT6753"])
def test_ate_gt_order(curve):
    """Reduced pairing values live in the order-r subgroup."""
    hc = host_curve(curve)
    eng = AtePairing(hc)
    e = eng.reduced_pairing(hc.g1_gen, hc.g2_gen)
    assert eng.GT.pow(e, hc.fr_spec.p) == eng.GT.one


@pytest.mark.parametrize("curve", ["MNT4753", "MNT6753"])
def test_ate_double_miller_loop(curve, rng):
    """final_exp(double_miller(P1,Q1,P2,Q2)) == e(P1,Q1)*e(P2,Q2)
    (test_bilinearity.cpp's double-loop check)."""
    hc = host_curve(curve)
    eng = AtePairing(hc)
    GT = eng.GT
    P1 = hc.g1.mul(rng.getrandbits(32) | 1, hc.g1_gen)
    Q1 = hc.g2.mul(rng.getrandbits(32) | 1, hc.g2_gen)
    P2 = hc.g1.mul(rng.getrandbits(32) | 1, hc.g1_gen)
    Q2 = hc.g2.mul(rng.getrandbits(32) | 1, hc.g2_gen)
    f = eng.double_miller_loop(
        eng.precompute_g1(P1), eng.precompute_g2(Q1),
        eng.precompute_g1(P2), eng.precompute_g2(Q2),
    )
    want = GT.mul(eng.reduced_pairing(P1, Q1), eng.reduced_pairing(P2, Q2))
    assert eng.final_exponentiation(f) == want


def test_ate_chunked_final_exp_equals_one_shot():
    """The chunked final exponentiation (first chunk q^2-1, last chunk
    via w0/w1) equals one-shot exponentiation by the full final
    exponent (q^4-1)/r — the value the reference publishes as
    mnt4753_final_exponent (mnt4753_init.cpp:260)."""
    hc = host_curve("MNT4753")
    eng = AtePairing(hc)
    q, r = hc.fq_spec.p, hc.fr_spec.p
    assert (q**4 - 1) % r == 0
    final_exponent = (q**4 - 1) // r
    f = eng.ate_pairing(hc.g1_gen, hc.g2_gen)
    assert eng.GT.pow(f, final_exponent) == eng.final_exponentiation(f)
