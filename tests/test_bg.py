"""BG (r1cs_bg_ppzksnark) round-trip: the framework analogue of the
reference's Mina-facing Bowe-Gabizon prover (r1cs_bg_ppzksnark.tcc) —
Groth16 keys, prover-supplied delta randomizer d, delta_prime-carrying
proof, component verification (caml_mnt4753.cpp:1038-1055 semantics).
"""

import random

import pytest

from snark_challenge_prover_tpu.host.curves import mnt4753_host
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems import bg
from snark_challenge_prover_tpu.relations.examples import (
    generate_r1cs_example_with_field_input,
)


@pytest.fixture(scope="module")
def roundtrip():
    model = mnt4753.get()
    rng = random.Random(42)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp = bg.generator(model, ex.constraint_system, rng)
    d = rng.randrange(2, model.Fr.p)  # a genuinely nontrivial randomizer
    proof = bg.prover(model, kp.pk, d, ex.primary_input, ex.auxiliary_input, rng)
    return model, ex, kp, proof, d


def test_proof_verifies(roundtrip):
    model, ex, kp, proof, d = roundtrip
    assert bg.verifier_strong_IC(kp.vk, ex.primary_input, proof)
    assert bg.verifier_weak_IC(kp.vk, ex.primary_input, proof)


def test_delta_prime_is_d_delta(roundtrip):
    model, ex, kp, proof, d = roundtrip
    hc = mnt4753_host()
    assert proof.delta_prime == hc.g2.mul(d, kp.pk.delta_g2)


def test_wrong_input_rejected(roundtrip):
    model, ex, kp, proof, d = roundtrip
    bad = list(ex.primary_input)
    bad[0] = (bad[0] + 1) % model.Fr.p
    assert not bg.verifier_strong_IC(kp.vk, bad, proof)


def test_tampered_delta_prime_rejected(roundtrip):
    """Swapping the proof's delta_prime for the vk delta must break the
    QAP check (C was built over d*delta)."""
    model, ex, kp, proof, d = roundtrip
    forged = bg.BGProof(
        g_A=proof.g_A, g_B=proof.g_B, g_C=proof.g_C,
        delta_prime=kp.vk.delta_g2,
    )
    assert not bg.verifier_strong_IC(kp.vk, ex.primary_input, forged)


def test_reference_literal_check_only_closes_for_d_one():
    """The fork's as-written online verifier pairs C with vk.delta
    (r1cs_bg_ppzksnark.tcc:564-566); that form verifies exactly the
    d == 1 proofs."""
    model = mnt4753.get()
    rng = random.Random(7)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 4, 1, rng)
    kp = bg.generator(model, ex.constraint_system, rng)
    p1 = bg.prover(model, kp.pk, 1, ex.primary_input, ex.auxiliary_input, rng)
    assert bg.verifier_strong_IC(
        kp.vk, ex.primary_input, p1, reference_literal_qap_check=True
    )
    pd = bg.prover(model, kp.pk, 12345, ex.primary_input, ex.auxiliary_input, rng)
    assert bg.verifier_strong_IC(kp.vk, ex.primary_input, pd)
    assert not bg.verifier_strong_IC(
        kp.vk, ex.primary_input, pd, reference_literal_qap_check=True
    )


def test_verify_components(roundtrip):
    """caml-style component verification, including a caller-populated
    (y_s, z = d*y_s) pair satisfying e(y_s, delta') e(-z, delta) == 1."""
    model, ex, kp, proof, d = roundtrip
    hc = mnt4753_host()
    y_s = hc.g1.mul(987, hc.g1_gen)
    z = hc.g1.mul(d, y_s)
    assert bg.verify_components(
        proof.g_A, proof.g_B, proof.g_C, proof.delta_prime, z, y_s,
        kp.vk, ex.primary_input,
    )
    bad_z = hc.g1.add(z, hc.g1_gen)
    assert not bg.verify_components(
        proof.g_A, proof.g_B, proof.g_C, proof.delta_prime, bad_z, y_s,
        kp.vk, ex.primary_input,
    )
