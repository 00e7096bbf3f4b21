"""In-circuit Groth16 verifier (gadgets/verifier_gadget.py) on a real
(vk, proof): the circuit must be satisfiable exactly when the native
verifier accepts — the framework analogue of libsnark's
test_r1cs_ppzksnark_verifier_gadget (recursion building block).
"""

import random

import pytest

from snark_challenge_prover_tpu.gadgets.protoboard import Protoboard
from snark_challenge_prover_tpu.gadgets.verifier_gadget import (
    Groth16VerifierGadget,
)
from snark_challenge_prover_tpu.host.curves import host_curve
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
    proof = g16.prover(model, kp.pk, ex.primary_input, ex.auxiliary_input, rng)
    assert g16.verifier_strong_IC(kp.vk, ex.primary_input, proof)
    return model, ex, kp, proof


@pytest.fixture(scope="module")
def circuit(keypair_proof):
    model, ex, kp, proof = keypair_proof
    hc = host_curve("MNT4753")
    pb = Protoboard(hc.g2.F.p)
    g = Groth16VerifierGadget(pb, hc, kp.vk, num_inputs=len(ex.primary_input))
    g.generate_r1cs_witness(ex.primary_input, proof)
    return hc, pb, g, ex, kp, proof


def test_valid_proof_satisfies(circuit):
    hc, pb, g, ex, kp, proof = circuit
    assert pb.is_satisfied()


def test_invalid_proof_unsatisfiable(circuit):
    """Filling from a proof with a tampered A leaves the equality pins
    broken."""
    hc, pb, g, ex, kp, proof = circuit
    bad_A = hc.g1.add(proof.g_A, hc.g1_gen)
    bad = g16.Proof(g_A=bad_A, g_B=proof.g_B, g_C=proof.g_C)
    assert not g16.verifier_strong_IC(kp.vk, ex.primary_input, bad)
    g.generate_r1cs_witness(ex.primary_input, bad)
    assert not pb.is_satisfied()
    # restore
    g.generate_r1cs_witness(ex.primary_input, proof)
    assert pb.is_satisfied()


def test_wrong_public_input_unsatisfiable(circuit):
    hc, pb, g, ex, kp, proof = circuit
    bad_primary = list(ex.primary_input)
    bad_primary[0] = (bad_primary[0] + 1) % hc.fr_spec.p
    g.generate_r1cs_witness(bad_primary, proof)
    assert not pb.is_satisfied()
    g.generate_r1cs_witness(ex.primary_input, proof)
    assert pb.is_satisfied()
