"""PCD framework (proof_systems/pcd.py): compliance predicates, the
single-predicate step circuit (predicate + in-circuit verifier per
incoming edge), and constraint-level recursion over the MNT cycle —
the framework analogue of libsnark's r1cs_sp_ppzkpcd tests, with the
outer keygen/prove behind SNARK_TPU_HEAVY_TESTS (compile budget).
"""

import os
import random

import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems.pcd import (
    CompliancePredicate,
    PCDStepCircuit,
    R1CSPCDLocalData,
    R1CSPCDMessage,
    SPPCDProver,
)
from snark_challenge_prover_tpu.relations.r1cs import (
    LinearCombination as LC,
    R1CSConstraint,
    R1CSConstraintSystem,
)

P4 = mnt4753.get().Fr.p  # MNT6753 circuits' field == MNT4753 Fq?  No:
# the counter predicate below is used on BOTH curves' field in tests;
# build it parameterized.


def _counter_predicate(p):
    """out_value = in_value + inc over wires
    [1 | out_type(1), out_value(2) | arity(3) | in_type(4), in_value(5)
       | inc(6)]; primary = outgoing message."""
    cs = R1CSConstraintSystem(p, primary_input_size=2,
                              auxiliary_input_size=4)
    cs.add_constraint(
        R1CSConstraint(
            LC.of_var(5) + LC.of_var(6), LC.of_var(0), LC.of_var(2)
        )
    )
    return CompliancePredicate(
        name=1, type=1, constraint_system=cs,
        outgoing_message_payload_length=1, max_arity=1,
        incoming_message_payload_lengths=[1], local_data_length=1,
        witness_length=0,
    )


def test_predicate_satisfaction():
    pred = _counter_predicate(P4)
    out = R1CSPCDMessage(type=1, payload=[8])
    inc = R1CSPCDMessage(type=1, payload=[5])
    ld = R1CSPCDLocalData(payload=[3])
    assert pred.is_satisfied(out, [inc], ld, [])
    bad = R1CSPCDMessage(type=1, payload=[9])
    assert not pred.is_satisfied(bad, [inc], ld, [])


def test_base_case_step_circuit():
    """Arity 0: the step circuit is the predicate alone."""
    from snark_challenge_prover_tpu.host.curves import host_curve

    p = host_curve("MNT6753").g2.F.p  # outer MNT4753 -> inner MNT6753
    pred = _counter_predicate(p)
    circ = PCDStepCircuit("MNT4753", pred, arity=0)
    out = R1CSPCDMessage(type=1, payload=[3])
    inc0 = R1CSPCDMessage(type=1, payload=[0])
    ld = R1CSPCDLocalData(payload=[3])
    # base case still carries the (zeroed) incoming slot in the wiring
    assert circ.fill(out, [inc0], ld, []) is True
    bad = R1CSPCDMessage(type=1, payload=[4])
    assert circ.fill(bad, [inc0], ld, []) is False


@pytest.fixture(scope="module")
def inner_proof():
    """A real MNT4753 proof whose 2-element primary plays the incoming
    message (type, value) — same (5,2) shapes as test_groth16_full, so
    device compiles are persistent-cache hits."""
    import random as _r

    from snark_challenge_prover_tpu.proof_systems import groth16_full as g16
    from snark_challenge_prover_tpu.relations.examples import (
        generate_r1cs_example_with_field_input,
    )

    model = mnt4753.get()
    rng = _r.Random(42)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp = g16.generator(model, ex.constraint_system, rng)
    proof = g16.prover(model, kp.pk, ex.primary_input, ex.auxiliary_input,
                       rng)
    return model, ex, kp, proof


def test_recursive_step_circuit(inner_proof):
    """Arity 1 over outer=MNT6753 (inner=MNT4753): predicate holds AND
    the predecessor proof verifies in-circuit."""
    model, ex, kp, proof = inner_proof
    p = model.Fq.p  # outer MNT6753 circuits live over MNT4753's Fq
    pred = _counter_predicate(p)
    circ = PCDStepCircuit("MNT6753", pred, inner_vk=kp.vk, arity=1)
    t, v = ex.primary_input  # message = the proof's public input
    inc = R1CSPCDMessage(type=t, payload=[v])
    ld = R1CSPCDLocalData(payload=[7])
    out = R1CSPCDMessage(type=t, payload=[(v + 7) % p])
    assert circ.fill(out, [inc], ld, [], inner_proofs=[proof]) is True
    # a forged predecessor proof breaks the verifier gadget's pins
    from snark_challenge_prover_tpu.host.curves import host_curve
    from snark_challenge_prover_tpu.proof_systems.groth16_full import Proof

    hc = host_curve("MNT4753")
    forged = Proof(
        g_A=hc.g1.add(proof.g_A, hc.g1_gen), g_B=proof.g_B, g_C=proof.g_C
    )
    assert circ.fill(out, [inc], ld, [], inner_proofs=[forged]) is False


@pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="outer keygen compile is heavy on XLA:CPU",
)
def test_base_case_roundtrip():
    rng = random.Random(9)
    prover = SPPCDProver("MNT4753")
    from snark_challenge_prover_tpu.host.curves import host_curve

    p = host_curve("MNT6753").g2.F.p
    pred = _counter_predicate(p)
    kp = prover.keygen(pred, rng)
    out = R1CSPCDMessage(type=1, payload=[3])
    inc0 = R1CSPCDMessage(type=1, payload=[0])
    ld = R1CSPCDLocalData(payload=[3])
    proof = prover.prove(kp, out, [inc0], ld, [], rng)
    assert prover.verify(kp, out, proof)
