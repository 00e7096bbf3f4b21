"""Multi-predicate PCD (proof_systems/mp_pcd.py): per-predicate step
circuits where incoming proofs verify against a WITNESS vk that is
set-commitment-authenticated — the framework analogue of libsnark's
test_r1cs_mp_ppzkpcd (tally example shape) at toy sizes, with the
outer keygen behind SNARK_TPU_HEAVY_TESTS (compile budget).
"""

import os
import random

import pytest

from snark_challenge_prover_tpu.host.curves import host_curve
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems.mp_pcd import (
    MPPCDProver,
    MPPCDStepCircuit,
    vk_digest,
    vk_set_commitment,
)
from snark_challenge_prover_tpu.proof_systems.pcd import (
    CompliancePredicate,
    R1CSPCDLocalData,
    R1CSPCDMessage,
)
from snark_challenge_prover_tpu.relations.r1cs import (
    LinearCombination as LC,
    R1CSConstraint,
    R1CSConstraintSystem,
)


def _counter_predicate(p, mult=1):
    """out = mult*in + inc over [1 | out_type(1), out_value(2) |
    arity(3) | in_type(4), in_value(5) | inc(6)] — two variants make a
    two-predicate set (the mp system's reason to exist)."""
    cs = R1CSConstraintSystem(p, primary_input_size=2,
                              auxiliary_input_size=4)
    cs.add_constraint(
        R1CSConstraint(
            LC.of_var(5) * mult + LC.of_var(6), LC.of_var(0), LC.of_var(2)
        )
    )
    return CompliancePredicate(
        name=mult, type=1, constraint_system=cs,
        outgoing_message_payload_length=1, max_arity=1,
        incoming_message_payload_lengths=[1], local_data_length=1,
        witness_length=0,
    )


@pytest.fixture(scope="module")
def inner_proofs():
    """TWO inner (MNT4753) keypairs of the same (5,2) shape — a real
    vk set; proofs under keypair 0."""
    import random as _r

    from snark_challenge_prover_tpu.proof_systems import groth16_full as g16
    from snark_challenge_prover_tpu.relations.examples import (
        generate_r1cs_example_with_field_input,
    )

    model = mnt4753.get()
    rng = _r.Random(42)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp0 = g16.generator(model, ex.constraint_system, rng)
    kp1 = g16.generator(model, ex.constraint_system, _r.Random(77))
    proof = g16.prover(model, kp0.pk, ex.primary_input,
                       ex.auxiliary_input, rng)
    assert g16.verifier_strong_IC(kp0.vk, ex.primary_input, proof)
    return model, ex, kp0, kp1, proof


def test_vk_set_commitment_roundtrip(inner_proofs):
    model, ex, kp0, kp1, proof = inner_proofs
    hc = host_curve("MNT4753")
    root, leaves = vk_set_commitment(hc, [kp0.vk, kp1.vk], num_inputs=2)
    assert leaves[0] == vk_digest(hc, kp0.vk, 2)
    assert leaves[1] == vk_digest(hc, kp1.vk, 2)
    assert leaves[0] != leaves[1]
    root2, _ = vk_set_commitment(hc, [kp1.vk, kp0.vk], num_inputs=2)
    assert root != root2  # order-sensitive Merkle accumulator


def test_mp_step_circuit_with_witness_vk(inner_proofs):
    """Arity 1 over outer=MNT6753: predicate holds, the predecessor
    proof verifies against the WITNESS vk, and the vk digest
    authenticates against the committed set."""
    model, ex, kp0, kp1, proof = inner_proofs
    p = model.Fq.p
    hc = host_curve("MNT4753")
    pred = _counter_predicate(p)
    root, leaves = vk_set_commitment(hc, [kp0.vk, kp1.vk], num_inputs=2)

    circ = MPPCDStepCircuit("MNT6753", pred, set_depth=1, arity=1)
    t, v = ex.primary_input
    inc = R1CSPCDMessage(type=t, payload=[v])
    ld = R1CSPCDLocalData(payload=[7])
    out = R1CSPCDMessage(type=t, payload=[(v + 7) % p])
    assert circ.fill(out, [inc], ld, [], root,
                     inner=[(kp0.vk, proof, 0, leaves)]) is True

    # the WRONG vk (valid member of the set, but the proof was not made
    # under it): set membership holds, the verifier pins break
    assert circ.fill(out, [inc], ld, [], root,
                     inner=[(kp1.vk, proof, 1, leaves)]) is False

    # right vk, WRONG membership slot: the Merkle walk breaks
    assert circ.fill(out, [inc], ld, [], root,
                     inner=[(kp0.vk, proof, 1, leaves)]) is False


@pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="outer keygen compile is heavy on XLA:CPU",
)
def test_mp_base_case_roundtrip():
    rng = random.Random(9)
    prover = MPPCDProver("MNT4753")
    p = host_curve("MNT6753").g2.F.p
    preds = [_counter_predicate(p, 1), _counter_predicate(p, 2)]
    kp = prover.keygen(preds, rng)
    out = R1CSPCDMessage(type=1, payload=[3])
    inc0 = R1CSPCDMessage(type=1, payload=[0])
    ld = R1CSPCDLocalData(payload=[3])
    proof = prover.prove(kp, 0, out, [inc0], ld, [], rng)
    assert prover.verify(kp, 0, out, proof)
