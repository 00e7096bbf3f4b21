"""PGHR13 (r1cs_ppzksnark) integration tests: the framework analogue of
libsnark's test_r1cs_ppzksnark / run_r1cs_ppzksnark harness — generator
-> prover -> verifier round-trip on a synthetic R1CS, plus wrong-input
and tamper rejection, on MNT4753."""

import random

import pytest

from snark_challenge_prover_tpu.host.curves import mnt4753_host
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems import pghr13
from snark_challenge_prover_tpu.relations.examples import (
    generate_r1cs_example_with_field_input,
)


@pytest.fixture(scope="module")
def roundtrip():
    model = mnt4753.get()
    rng = random.Random(123)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp = pghr13.generator(model, ex.constraint_system, rng)
    proof = pghr13.prover(model, kp.pk, ex.primary_input, ex.auxiliary_input, rng)
    return model, ex, kp, proof


def test_proof_verifies(roundtrip):
    model, ex, kp, proof = roundtrip
    assert pghr13.verifier_strong_IC(kp.vk, ex.primary_input, proof)
    assert pghr13.verifier_weak_IC(kp.vk, ex.primary_input, proof)


def test_wrong_input_rejected(roundtrip):
    model, ex, kp, proof = roundtrip
    p = model.Fr.p
    bad = list(ex.primary_input)
    bad[0] = (bad[0] + 1) % p
    assert not pghr13.verifier_strong_IC(kp.vk, bad, proof)


def test_strong_ic_length_check(roundtrip):
    model, ex, kp, proof = roundtrip
    assert not pghr13.verifier_strong_IC(kp.vk, ex.primary_input[:1], proof)


def test_tampered_proof_rejected(roundtrip):
    model, ex, kp, proof = roundtrip
    hc = mnt4753_host()
    # tamper g_A.g: breaks the A knowledge-commitment check
    bad = pghr13.Proof(
        g_A=(hc.g1.add(proof.g_A[0], hc.g1_gen), proof.g_A[1]),
        g_B=proof.g_B, g_C=proof.g_C, g_H=proof.g_H, g_K=proof.g_K,
    )
    assert not pghr13.verifier_strong_IC(kp.vk, ex.primary_input, bad)
    # tamper g_H: breaks QAP divisibility
    bad2 = pghr13.Proof(
        g_A=proof.g_A, g_B=proof.g_B, g_C=proof.g_C,
        g_H=hc.g1.add(proof.g_H, hc.g1_gen), g_K=proof.g_K,
    )
    assert not pghr13.verifier_strong_IC(kp.vk, ex.primary_input, bad2)
    # tamper g_K: breaks the same-coefficient check
    bad3 = pghr13.Proof(
        g_A=proof.g_A, g_B=proof.g_B, g_C=proof.g_C,
        g_H=proof.g_H, g_K=hc.g1.add(proof.g_K, hc.g1_gen),
    )
    assert not pghr13.verifier_strong_IC(kp.vk, ex.primary_input, bad3)


def test_proof_elements_on_curve(roundtrip):
    model, ex, kp, proof = roundtrip
    hc = mnt4753_host()
    for P in (proof.g_A[0], proof.g_A[1], proof.g_B[1], proof.g_C[0],
              proof.g_C[1], proof.g_H, proof.g_K):
        assert hc.g1.is_on_curve(P)
    assert hc.g2.is_on_curve(proof.g_B[0])
