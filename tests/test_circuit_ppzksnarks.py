"""BACS / USCS / TBCS relations, reductions, and ppzkSNARK round-trips:
the framework analogue of libsnark's test_bacs_ppzksnark /
test_uscs_ppzksnark / test_tbcs_ppzksnark harnesses, on MNT4753.

One shared module fixture per scheme keeps the XLA compile count low on
the 1-core CI host."""

import random

import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.relations.bacs import BACSCircuit, BACSGate
from snark_challenge_prover_tpu.relations.r1cs import LinearCombination as LC
from snark_challenge_prover_tpu.relations.tbcs import (
    TBCS_GATE_AND,
    TBCS_GATE_NOR,
    TBCS_GATE_X_AND_NOT_Y,
    TBCS_GATE_XOR,
    TBCSCircuit,
    TBCSGate,
)
from snark_challenge_prover_tpu.relations.uscs import USCSConstraintSystem
from snark_challenge_prover_tpu.reductions import (
    bacs_to_r1cs,
    tbcs_to_uscs,
)

MODEL = mnt4753.get()
P = MODEL.Fr.p


# ---------------------------------------------------------------------------
# example instances
# ---------------------------------------------------------------------------

def _bacs_example(rng):
    """(x1 + x2) * x3 = c checked by an output gate; x1, x2 primary."""
    circuit = BACSCircuit(P, primary_input_size=2, auxiliary_input_size=1)
    x1, x2, x3 = rng.randrange(P), rng.randrange(P), rng.randrange(P)
    c = (x1 + x2) * x3 % P
    # w4 = (x1 + x2) * x3
    circuit.add_gate(
        BACSGate(LC([(1, 1), (2, 1)]), LC.of_var(3), output=4)
    )
    # w5 = (w4 - c) * 1   -- circuit output, zero iff satisfied
    circuit.add_gate(
        BACSGate(
            LC([(4, 1), (0, -c)]), LC.constant(1), output=5,
            is_circuit_output=True,
        )
    )
    assert circuit.is_valid()
    return circuit, [x1, x2], [x3]


def _uscs_example():
    """x1 primary = 1, x2 aux = 1; three +-1 constraints touching both."""
    cs = USCSConstraintSystem(P, primary_input_size=1, auxiliary_input_size=1)
    cs.add_constraint(LC([(1, 2), (0, -1)]))          # 2 x1 - 1
    cs.add_constraint(LC([(2, 2), (0, -1)]))          # 2 x2 - 1
    cs.add_constraint(LC([(1, 1), (2, 1), (0, -1)]))  # x1 + x2 - 1
    return cs, [1], [1]


def _tbcs_example():
    """Primary bit x1, aux bit x2; output gate XOR(x1, x2) -> satisfied
    iff x1 == x2; plus an internal AND gate feeding a second output that
    is identically false."""
    c = TBCSCircuit(primary_input_size=1, auxiliary_input_size=1)
    c.add_gate(TBCSGate(1, 2, TBCS_GATE_XOR, 3, is_circuit_output=True))
    c.add_gate(TBCSGate(1, 3, TBCS_GATE_AND, 4))
    c.add_gate(
        TBCSGate(4, 4, TBCS_GATE_X_AND_NOT_Y, 5, is_circuit_output=True)
    )
    assert c.is_valid()
    return c, [True], [True]


# ---------------------------------------------------------------------------
# relation / reduction unit tests (host-only, fast)
# ---------------------------------------------------------------------------

def test_bacs_relation_and_reduction():
    rng = random.Random(5)
    circuit, primary, aux = _bacs_example(rng)
    assert circuit.is_satisfied(primary, aux)
    assert not circuit.is_satisfied(primary, [aux[0] + 1])

    cs = bacs_to_r1cs.instance_map(circuit)
    wires = bacs_to_r1cs.witness_map(circuit, primary, aux)
    assert cs.is_satisfied(wires[: len(primary)], wires[len(primary):])
    bad = list(wires)
    bad[2] = (bad[2] + 1) % P
    assert not cs.is_satisfied(bad[: len(primary)], bad[len(primary):])


def test_tbcs_relation_and_reduction():
    circuit, primary, aux = _tbcs_example()
    assert circuit.is_satisfied(primary, aux)
    assert not circuit.is_satisfied(primary, [False])

    # all 16 gate types: USCS lowering agrees with direct evaluation
    for t in range(16):
        c1 = TBCSCircuit(primary_input_size=2, auxiliary_input_size=0)
        c1.add_gate(TBCSGate(1, 2, t, 3))
        cs = tbcs_to_uscs.instance_map(c1, P)
        for x in (False, True):
            for y in (False, True):
                wires = tbcs_to_uscs.witness_map(c1, [x, y], [])
                assert cs.is_satisfied(wires[:2], wires[2:]), (t, x, y)
                # flipping the gate output must break the gate constraint
                badwires = list(wires)
                badwires[2] = 1 - badwires[2]
                assert not cs.is_satisfied(badwires[:2], badwires[2:]), (
                    t, x, y,
                )

    cs = tbcs_to_uscs.instance_map(circuit, P)
    wires = tbcs_to_uscs.witness_map(circuit, primary, aux)
    assert cs.is_satisfied(wires[: len(primary)], wires[len(primary):])


def test_uscs_relation():
    cs, primary, aux = _uscs_example()
    assert cs.is_satisfied(primary, aux)
    assert not cs.is_satisfied(primary, [2])


# ---------------------------------------------------------------------------
# ppzkSNARK round-trips (device batch_exp + MSM; heavier)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bacs_roundtrip():
    from snark_challenge_prover_tpu.proof_systems import bacs_ppzksnark as bacs

    rng = random.Random(11)
    circuit, primary, aux = _bacs_example(rng)
    kp = bacs.generator(MODEL, circuit, rng)
    proof = bacs.prover(MODEL, kp.pk, primary, aux, rng)
    return bacs, circuit, primary, kp, proof


def test_bacs_ppzksnark(bacs_roundtrip):
    bacs, circuit, primary, kp, proof = bacs_roundtrip
    assert bacs.verifier_strong_IC(kp.vk, primary, proof)
    bad = list(primary)
    bad[0] = (bad[0] + 1) % P
    assert not bacs.verifier_strong_IC(kp.vk, bad, proof)


@pytest.fixture(scope="module")
def uscs_roundtrip():
    from snark_challenge_prover_tpu.proof_systems import uscs_ppzksnark as uscs

    rng = random.Random(13)
    cs, primary, aux = _uscs_example()
    kp = uscs.generator(MODEL, cs, rng)
    proof = uscs.prover(MODEL, kp.pk, primary, aux, rng)
    return uscs, primary, kp, proof


def test_uscs_ppzksnark(uscs_roundtrip):
    uscs, primary, kp, proof = uscs_roundtrip
    assert uscs.verifier_strong_IC(kp.vk, primary, proof)
    assert not uscs.verifier_strong_IC(kp.vk, [0], proof)


def test_uscs_tampered_proof(uscs_roundtrip):
    from snark_challenge_prover_tpu.host.curves import mnt4753_host

    uscs, primary, kp, proof = uscs_roundtrip
    hc = mnt4753_host()
    bad = uscs.Proof(
        V_g1=hc.g1.add(proof.V_g1, hc.g1_gen),
        alpha_V_g1=proof.alpha_V_g1, H_g1=proof.H_g1, V_g2=proof.V_g2,
    )
    assert not uscs.verifier_strong_IC(kp.vk, primary, bad)


@pytest.fixture(scope="module")
def tbcs_roundtrip():
    from snark_challenge_prover_tpu.proof_systems import tbcs_ppzksnark as tbcs

    rng = random.Random(17)
    circuit, primary, aux = _tbcs_example()
    kp = tbcs.generator(MODEL, circuit, rng)
    proof = tbcs.prover(MODEL, kp.pk, primary, aux, rng)
    return tbcs, primary, kp, proof


def test_tbcs_ppzksnark(tbcs_roundtrip):
    tbcs, primary, kp, proof = tbcs_roundtrip
    assert tbcs.verifier_strong_IC(kp.vk, primary, proof)
    assert not tbcs.verifier_strong_IC(kp.vk, [False], proof)
