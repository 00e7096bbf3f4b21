"""Keypair/proof string serialization (io/caml_serialization.py +
the camlsnark_*_proving_key_to_string/of_string family) — the caml
entry points at caml_mnt4753.cpp:644-693, round-tripped on a real
keypair.  Layout follows the reference's BINARY_OUTPUT +
MONTGOMERY_OUTPUT + NO_PT_COMPRESSION operator<< chain."""

import random

import numpy as np
import pytest

from snark_challenge_prover_tpu.io import caml_serialization as cser
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems import groth16_full as g16
from snark_challenge_prover_tpu.relations.examples import (
    generate_r1cs_example_with_field_input,
)


@pytest.fixture(scope="module")
def keypair_proof():
    model = mnt4753.get()
    rng = random.Random(42)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp = g16.generator(model, ex.constraint_system, rng)
    proof = g16.prover(model, kp.pk, ex.primary_input,
                       ex.auxiliary_input, rng)
    return model, ex, kp, proof


def test_proving_key_roundtrip(keypair_proof):
    model, ex, kp, proof = keypair_proof
    data = cser.proving_key_to_bytes(kp.pk)
    pk2 = cser.proving_key_from_bytes("MNT4753", data)
    assert pk2.alpha_g1 == kp.pk.alpha_g1
    assert pk2.beta_g2 == kp.pk.beta_g2
    assert pk2.delta_g2 == kp.pk.delta_g2
    for name in ("A_query", "H_query", "L_query"):
        for a, b in zip(getattr(pk2, name), getattr(kp.pk, name)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(pk2.B_query_g2, kp.pk.B_query_g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cs2 = pk2.constraint_system
    cs1 = kp.pk.constraint_system
    assert cs2.primary_input_size == cs1.primary_input_size
    assert len(cs2.constraints) == len(cs1.constraints)
    # a re-serialization is byte-identical (canonical layout)
    assert cser.proving_key_to_bytes(pk2) == data


def test_verification_key_roundtrip(keypair_proof):
    model, ex, kp, proof = keypair_proof
    data = cser.verification_key_to_bytes(kp.vk)
    vk2 = cser.verification_key_from_bytes("MNT4753", data)
    assert vk2.alpha_g1_beta_g2 == kp.vk.alpha_g1_beta_g2
    assert vk2.delta_g2 == kp.vk.delta_g2
    assert vk2.ABC_g1 == kp.vk.ABC_g1
    # the deserialized vk still verifies the proof
    assert g16.verifier_strong_IC(vk2, ex.primary_input, proof)


def test_proof_roundtrip(keypair_proof):
    model, ex, kp, proof = keypair_proof
    data = cser.proof_to_bytes_caml("MNT4753", proof)
    p2 = cser.proof_from_bytes_caml("MNT4753", data)
    assert p2.g_A == proof.g_A
    assert p2.g_B == proof.g_B
    assert p2.g_C == proof.g_C
    assert g16.verifier_strong_IC(kp.vk, ex.primary_input, p2)


def test_native_string_entry_points(keypair_proof):
    """The camlsnark_* blob entry points round the same bytes."""
    from snark_challenge_prover_tpu.io.caml_ffi import CamlFFI, load

    if load() is None:
        pytest.skip("libcamlsnark.so unavailable")
    model, ex, kp, proof = keypair_proof
    ffi = CamlFFI("MNT4753")
    vk_bytes = cser.verification_key_to_bytes(kp.vk)
    assert ffi.verification_key_to_string(kp.vk) == vk_bytes
    vk2 = ffi.verification_key_of_string(vk_bytes)
    assert vk2.ABC_g1 == kp.vk.ABC_g1
    proof_bytes = cser.proof_to_bytes_caml("MNT4753", proof)
    assert ffi.proof_to_string(proof) == proof_bytes
