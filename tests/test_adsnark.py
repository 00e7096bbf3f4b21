"""ADSNARK (proof_systems/adsnark.py): authentication layer (PRF MAC +
Schnorr label signatures, symmetric and public verification) ungated;
the full generator/prover/verifier round-trip behind
SNARK_TPU_HEAVY_TESTS (device keygen compiles).
"""

import os
import random

import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems import adsnark


@pytest.fixture(scope="module")
def auth_setup():
    model = mnt4753.get()
    rng = random.Random(13)
    keys = adsnark.auth_generator(model, rng)
    values = [rng.randrange(model.Fr.p) for _ in range(3)]
    labels = [f"label-{i}".encode() for i in range(3)]
    data = adsnark.auth_sign(model, values, keys.sak, labels, rng)
    return model, rng, keys, values, labels, data


def test_auth_sym_verify(auth_setup):
    model, rng, keys, values, labels, data = auth_setup
    assert adsnark.auth_verify_sym(model, values, data, keys.sak, labels)
    bad = list(values)
    bad[1] = (bad[1] + 1) % model.Fr.p
    assert not adsnark.auth_verify_sym(model, bad, data, keys.sak, labels)


def test_auth_pub_verify(auth_setup):
    model, rng, keys, values, labels, data = auth_setup
    assert adsnark.auth_verify_pub(model, values, data, keys.pak, labels)
    bad = list(values)
    bad[0] = (bad[0] + 1) % model.Fr.p
    assert not adsnark.auth_verify_pub(model, bad, data, keys.pak, labels)


def test_auth_wrong_label_rejected(auth_setup):
    model, rng, keys, values, labels, data = auth_setup
    wrong = [b"other-0", labels[1], labels[2]]
    assert not adsnark.auth_verify_sym(model, values, data, keys.sak, wrong)
    assert not adsnark.auth_verify_pub(model, values, data, keys.pak, wrong)


def test_signature_forgery_rejected(auth_setup):
    model, rng, keys, values, labels, data = auth_setup
    from dataclasses import replace

    forged = [replace(data[0], sigma=(data[0].sigma[0] + 1, data[0].sigma[1]))]
    assert not adsnark.auth_verify_pub(
        model, values[:1], forged, keys.pak, labels[:1]
    )


@pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="device keygen compile heavy on XLA:CPU",
)
def test_adsnark_roundtrip():
    from snark_challenge_prover_tpu.relations.examples import (
        generate_r1cs_example_with_field_input,
    )

    model = mnt4753.get()
    rng = random.Random(21)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    keys = adsnark.auth_generator(model, rng)
    labels = [b"in-0", b"in-1"]
    data = adsnark.auth_sign(model, ex.primary_input, keys.sak, labels, rng)
    assert adsnark.auth_verify_sym(
        model, ex.primary_input, data, keys.sak, labels
    )

    kp = adsnark.generator(model, ex.constraint_system, keys.pap, rng)
    proof = adsnark.prover(
        model, kp.pk, ex.primary_input, ex.auxiliary_input, data, rng
    )
    assert adsnark.verifier_sym(model, kp.vk, proof, keys.sak, labels)
    assert adsnark.verifier_pub(
        model, kp.vk, proof, data, keys.pak, labels
    )
    # wrong labels -> symmetric rejection
    assert not adsnark.verifier_sym(
        model, kp.vk, proof, keys.sak, [b"x-0", b"x-1"]
    )
