"""TinyRAM relation + RAM->R1CS reduction (relations/tinyram.py,
reductions/ram_to_r1cs.py): simulator ISA behavior, circuit
satisfiability on real traces, soundness under tampering, and the
boot-tape/memory-checking path — the framework analogue of libsnark's
tinyram/ram_to_r1cs test suite.  The full ppzksnark wrap
(proof_systems/ram_ppzksnark.py) is exercised behind
SNARK_TPU_HEAVY_TESTS (keygen compiles are minutes on XLA:CPU).
"""

import os

import pytest

from snark_challenge_prover_tpu.reductions.ram_to_r1cs import (
    ram_to_r1cs,
    ram_witness_map,
)
from snark_challenge_prover_tpu.relations.tinyram import (
    Instruction,
    TinyRAMArchParams,
    TinyRAMProgram,
    simulate,
)

AP = TinyRAMArchParams(w=8, k=4)


def test_simulator_arith_and_flags():
    # r0 = 200; r1 = 100; add -> 300 wraps to 44 carry 1
    p = TinyRAMProgram(AP, [])
    p.add("mov", des=0, arg2=200)
    p.add("mov", des=1, arg2=100)
    p.add("add", des=2, arg1=0, arg2=1, imm=False)
    p.add("answer", arg2=0)
    ok, ans, trace = simulate(p, [])
    assert ok and ans == 0
    assert trace[-1].regs[2] == (200 + 100) & 0xFF
    # trace rows record pre-state; final add's carry seen via rerun
    p2 = TinyRAMProgram(AP, list(p.instructions[:3]))
    p2.add("cjmp", arg2=5)  # carry flag set -> jump off-program = reject
    p2.add("answer", arg2=0)
    ok2, _, _ = simulate(p2, [])
    assert not ok2  # jumped to 5 >= len -> invalid


def test_simulator_full_isa_smoke():
    """Each implemented opcode executes without error and answer(0)
    accepts."""
    p = TinyRAMProgram(AP, [])
    p.add("mov", des=0, arg2=0b1100)
    p.add("mov", des=1, arg2=0b1010)
    for op in ("and", "or", "xor"):
        p.add(op, des=2, arg1=0, arg2=1, imm=False)
    p.add("not", des=2, arg2=1, imm=False)
    p.add("sub", des=2, arg1=0, arg2=1, imm=False)
    p.add("mull", des=2, arg1=0, arg2=1, imm=False)
    p.add("umulh", des=2, arg1=0, arg2=1, imm=False)
    p.add("smulh", des=2, arg1=0, arg2=1, imm=False)
    p.add("udiv", des=2, arg1=0, arg2=1, imm=False)
    p.add("umod", des=2, arg1=0, arg2=1, imm=False)
    p.add("shl", des=2, arg1=0, arg2=2)
    p.add("shr", des=2, arg1=0, arg2=1)
    p.add("cmpe", arg1=0, arg2=1, imm=False)
    p.add("cmpg", arg1=0, arg2=1, imm=False)
    p.add("cmpge", arg1=0, arg2=1, imm=False)
    p.add("storew", arg1=0, arg2=7)
    p.add("loadw", des=3, arg2=7)
    p.add("storeb", arg1=0, arg2=9)
    p.add("loadb", des=3, arg2=9)
    p.add("answer", arg2=0)
    ok, ans, trace = simulate(p, [])
    assert ok
    assert trace[-1].regs[3] == 0b1100  # loadb got the stored byte


def test_simulator_read_tape():
    p = TinyRAMProgram(AP, [])
    p.add("read", des=0, arg2=0)
    p.add("read", des=1, arg2=0)
    p.add("add", des=2, arg1=0, arg2=1, imm=False)
    p.add("answer", arg2=0)
    ok, _, trace = simulate(p, [7, 8])
    assert ok and trace[-1].regs[2] == 15


def test_instruction_encoding():
    ins = Instruction("add", des=2, arg1=1, arg2=3, arg2_is_imm=False)
    word = ins.encode(AP)
    # decode by hand: W=8, reg_bits=2
    assert word & 0xFF == 3
    assert (word >> 8) & 0b11 == 1
    assert (word >> 10) & 0b11 == 2
    assert (word >> 12) & 1 == 0
    assert (word >> 13) == 0b00100


# ---------------------------------------------------------------------------
# the circuit
# ---------------------------------------------------------------------------

def _sum_program():
    """r2 = tape[0] + tape[1] (via memory), answer r2 - expected == 0.

    Exercises: loadw from boot region, add, sub, jmp-free flow,
    storew + loadw round-trip through the memory checker."""
    p = TinyRAMProgram(AP, [])
    p.add("loadw", des=0, arg2=0)           # r0 = mem[0] (boot tape[0])
    p.add("loadw", des=1, arg2=1)           # r1 = mem[1]
    p.add("add", des=2, arg1=0, arg2=1, imm=False)
    p.add("storew", arg1=2, arg2=5)         # mem[5] = r2
    p.add("loadw", des=3, arg2=5)           # r3 = mem[5]
    p.add("sub", des=3, arg1=3, arg2=15)    # r3 -= 15 (the expected sum)
    p.add("answer", arg2=3, imm=False)      # accept iff r3 == 0
    return p


@pytest.fixture(scope="module")
def circuit():
    prog = _sum_program()
    T = 8
    pb, handles = ram_to_r1cs(prog, tape_len=2, T=T)
    return prog, pb, handles


def test_circuit_accepts_valid_trace(circuit):
    prog, pb, handles = circuit
    accepted, primary, aux = ram_witness_map(pb, handles, prog, [7, 8])
    assert accepted
    assert primary == [7, 8]
    assert pb.is_satisfied()


def test_circuit_rejects_wrong_tape(circuit):
    """With a tape whose sum != 15 the program rejects (answer != 0)."""
    prog, pb, handles = circuit
    with pytest.raises(ValueError):
        ram_witness_map(pb, handles, prog, [7, 9])


def test_circuit_rejects_tampered_register(circuit):
    prog, pb, handles = circuit
    ram_witness_map(pb, handles, prog, [7, 8])
    assert pb.is_satisfied()
    # bump a mid-trace register value
    var = handles["regs"][3][2]
    pb.set_val(var, (pb.val(var) + 1) % pb.p)
    assert not pb.is_satisfied()


def test_circuit_rejects_tampered_memory_value(circuit):
    """Forging a loaded value must break either the load binding or the
    routing/adjacency memory-consistency check."""
    prog, pb, handles = circuit
    ram_witness_map(pb, handles, prog, [7, 8])
    assert pb.is_satisfied()
    # the boot row for tape[1] feeds loadw r1 <- mem[1]; nudging the
    # register after the load breaks the load/value chain
    var = handles["regs"][2][1]
    pb.set_val(var, (pb.val(var) + 1) % pb.p)
    assert not pb.is_satisfied()


def test_circuit_unsupported_opcode_raises():
    p = TinyRAMProgram(AP, [])
    p.add("mull", des=0, arg1=0, arg2=1)
    p.add("answer", arg2=0)
    with pytest.raises(NotImplementedError):
        ram_to_r1cs(p, tape_len=0, T=2)


@pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="PGHR13 keygen/prove compiles are heavy on XLA:CPU",
)
def test_ram_ppzksnark_roundtrip():
    import random

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.proof_systems import ram_ppzksnark

    model = mnt4753.get()
    rng = random.Random(5)
    prog = _sum_program()
    kp = ram_ppzksnark.generator(model, prog, tape_len=2, T=8, rng=rng)
    proof = ram_ppzksnark.prover(model, kp, [7, 8], rng)
    assert ram_ppzksnark.verifier(model, kp, [7, 8], proof)
    assert not ram_ppzksnark.verifier(model, kp, [7, 9], proof)
