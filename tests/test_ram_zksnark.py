"""RAM zkSNARK (proof_systems/ram_zksnark.py): the one-step RAM
compliance predicate with Merkle memory, its witness-map chaining, and
the PCD composition — the framework analogue of libsnark's
test_ram_zksnark at toy sizes (outer PCD keygen behind
SNARK_TPU_HEAVY_TESTS).
"""

import os
import random

import pytest

from snark_challenge_prover_tpu.host.curves import host_curve
from snark_challenge_prover_tpu.proof_systems import ram_zksnark as rz
from snark_challenge_prover_tpu.relations.tinyram import (
    TinyRAMArchParams,
    TinyRAMProgram,
)

AP = TinyRAMArchParams(w=8, k=3)
P_FIELD = host_curve("MNT6753").g2.F.p  # outer MNT4753 step circuits


def _memory_program():
    """store/load round-trip then accept: mem[2] = r0; r1 = mem[2];
    answer (r1 - 5)."""
    p = TinyRAMProgram(AP, [])
    p.add("mov", des=0, arg2=5)           # r0 = 5
    p.add("storew", arg1=0, arg2=2)       # mem[2] = r0
    p.add("loadw", des=1, arg2=2)         # r1 = mem[2]
    p.add("sub", des=2, arg1=1, arg2=5)   # r2 = r1 - 5
    p.add("answer", arg1=0, arg2=2, imm=False)  # answer r2 (0 => accept)
    return p


@pytest.fixture(scope="module")
def handler():
    return rz.RamCompliancePredicateHandler(_memory_program(), 2, P_FIELD)


def test_predicate_shape(handler):
    pred = handler.get_compliance_predicate()
    assert pred.max_arity == 1
    assert pred.outgoing_message_payload_length == handler.state_len
    # wire prefix convention: [1 | out | arity | in | local | witness]
    assert pred.witness_length > 0
    assert pred.constraint_system.num_constraints > 0


def test_step_chain_executes_and_accepts(handler):
    """Drive the witness map through the whole program: every step's
    circuit must be satisfiable (witness_map asserts), roots must
    chain, and the final state must accept."""
    mem = {}
    state = rz.base_case_state(handler, [])
    roots = [state.root]
    for _ in range(5):
        state = handler.witness_map(state, mem, want_halt=0)
        roots.append(state.root)
    assert state.has_accepted == 1
    assert state.timestamp == 5
    # the store at step 2 changed the root; loads did not
    assert roots[2] != roots[1]
    assert roots[3] == roots[2]
    # memory really holds the stored word under the final root
    assert rz.merkle_mem_root(P_FIELD, {2: 5}, 2) == state.root


def test_step_chain_is_a_compliance_chain(handler):
    """Each (in, out) message pair satisfies the packaged predicate —
    the exact interface the PCD layer consumes."""
    from snark_challenge_prover_tpu.proof_systems.pcd import (
        R1CSPCDLocalData,
        R1CSPCDMessage,
    )

    pred = handler.get_compliance_predicate()
    mem = {}
    state = rz.base_case_state(handler, [])
    prev = state
    state = handler.witness_map(prev, mem, want_halt=0)
    out = R1CSPCDMessage(type=1, payload=state.payload())
    inc = R1CSPCDMessage(type=1, payload=prev.payload())
    ld = R1CSPCDLocalData(payload=[0])
    # reconstruct the witness tail straight from the filled protoboard
    n_prefix = (1 + handler.state_len) + 1 + (1 + handler.state_len) + 1
    full = handler.pb.primary_input() + handler.pb.auxiliary_input()
    tail = full[n_prefix:]
    assert pred.is_satisfied(out, [inc], ld, tail)
    # a tampered root breaks compliance
    bad_payload = list(state.payload())
    bad_payload[3 + handler.K] = (bad_payload[3 + handler.K] + 1) % P_FIELD
    bad = R1CSPCDMessage(type=1, payload=bad_payload)
    assert not pred.is_satisfied(bad, [inc], ld, tail)


def test_tampered_memory_rejected(handler):
    """A wrong incoming root makes the step's memory authentication
    unsatisfiable."""
    mem = {}
    state = rz.base_case_state(handler, [])
    state = handler.witness_map(state, mem, want_halt=0)  # mov
    bad = rz.RamState(
        timestamp=state.timestamp, pc=state.pc, flag=state.flag,
        regs=state.regs, root=(state.root + 1) % P_FIELD,
        has_accepted=state.has_accepted,
    )
    with pytest.raises(AssertionError):
        handler.witness_map(bad, mem, want_halt=0)  # storew step


@pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="PCD keygen/prove compile is heavy on XLA:CPU",
)
def test_ram_zksnark_roundtrip():
    rng = random.Random(4)
    kp = rz.generator(_memory_program(), 2, rng)
    state, proof = rz.prover(kp, [], 5, rng)
    assert rz.verifier(kp, [], state, proof)
