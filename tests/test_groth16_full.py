"""Full Groth16 (r1cs_gg_ppzksnark) integration tests: the framework
analogue of test_r1cs_gg_ppzksnark.cpp:24-43 / run_r1cs_gg_ppzksnark.tcc:
generator -> prover -> verifier round-trip on a synthetic R1CS, plus
wrong-input rejection, on MNT4753.

Heavy XLA compiles on the 1-core CI host: one curve, one tiny circuit,
shared shapes wherever possible."""

import random

import pytest

from snark_challenge_prover_tpu.host.curves import mnt4753_host
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems import groth16_full as gg
from snark_challenge_prover_tpu.relations.examples import (
    generate_r1cs_example_with_field_input,
)


@pytest.fixture(scope="module")
def roundtrip():
    model = mnt4753.get()
    rng = random.Random(99)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp = gg.generator(model, ex.constraint_system, rng)
    proof = gg.prover(model, kp.pk, ex.primary_input, ex.auxiliary_input, rng)
    return model, ex, kp, proof


def test_proof_verifies(roundtrip):
    model, ex, kp, proof = roundtrip
    assert gg.verifier_strong_IC(kp.vk, ex.primary_input, proof)
    assert gg.verifier_weak_IC(kp.vk, ex.primary_input, proof)
    assert gg.affine_verifier_strong_IC(kp.vk, ex.primary_input, proof)


def test_wrong_input_rejected(roundtrip):
    model, ex, kp, proof = roundtrip
    p = model.Fr.p
    bad = list(ex.primary_input)
    bad[0] = (bad[0] + 1) % p
    assert not gg.verifier_strong_IC(kp.vk, bad, proof)


def test_strong_ic_length_check(roundtrip):
    model, ex, kp, proof = roundtrip
    # strong IC rejects length mismatch outright (tcc:583-607)
    assert not gg.verifier_strong_IC(kp.vk, ex.primary_input[:1], proof)
    # weak IC accepts a shorter prefix only if remaining inputs are zero;
    # here they aren't, so the pairing check fails (different acc)
    assert not gg.verifier_weak_IC(kp.vk, ex.primary_input[:1], proof)


def test_tampered_proof_rejected(roundtrip):
    model, ex, kp, proof = roundtrip
    hc = mnt4753_host()
    bad = gg.Proof(
        g_A=hc.g1.add(proof.g_A, hc.g1_gen), g_B=proof.g_B, g_C=proof.g_C
    )
    assert not gg.verifier_strong_IC(kp.vk, ex.primary_input, bad)


def test_proof_wire_bytes(roundtrip):
    model, ex, kp, proof = roundtrip
    data = proof.to_bytes(model)
    # G1 + G2(deg 2) + G1 = (2 + 4 + 2) * 96 bytes
    assert len(data) == 8 * 96


def test_key_serialization_roundtrip(roundtrip):
    """Key/proof (de)serialization round-trip, as in the reference's
    test_r1cs_gg_ppzksnark serialization checks (tcc examples harness)."""
    import numpy as np

    from snark_challenge_prover_tpu.io import keys as K

    model, ex, kp, proof = roundtrip
    pk2 = K.read_proving_key(K.write_proving_key(kp.pk))
    assert pk2.alpha_g1 == kp.pk.alpha_g1
    assert pk2.beta_g2 == kp.pk.beta_g2
    assert np.array_equal(pk2.A_query[0], np.asarray(kp.pk.A_query[0]))
    assert np.array_equal(pk2.B_query_g2[1], np.asarray(kp.pk.B_query_g2[1]))
    assert pk2.constraint_system.num_constraints == (
        kp.pk.constraint_system.num_constraints
    )
    assert pk2.constraint_system.is_satisfied(ex.primary_input, ex.auxiliary_input)

    vk2 = K.read_verification_key(K.write_verification_key(kp.vk))
    assert vk2.alpha_g1_beta_g2 == kp.vk.alpha_g1_beta_g2
    assert vk2.ABC_g1 == kp.vk.ABC_g1
    # deserialized vk verifies the proof
    assert gg.verifier_strong_IC(vk2, ex.primary_input, proof)

    proof2 = K.read_proof(proof.to_bytes(model), model.name)
    assert (proof2.g_A, proof2.g_B, proof2.g_C) == (proof.g_A, proof.g_B, proof.g_C)


def test_proof_elements_on_curve(roundtrip):
    model, ex, kp, proof = roundtrip
    hc = mnt4753_host()
    assert hc.g1.is_on_curve(proof.g_A)
    assert hc.g2.is_on_curve(proof.g_B)
    assert hc.g1.is_on_curve(proof.g_C)
