"""RAM ppzkSNARK: prove TinyRAM executions (ram_ppzksnark parity).

Capability parity with libsnark/zk_proof_systems/ppzksnark/
ram_ppzksnark (ram_ppzksnark.{hpp,tcc}): generator/prover/verifier for
statements "TinyRAM program P accepts public tape x within T steps",
implemented — exactly as the reference does — as the ram_to_r1cs
reduction composed with the R1CS ppzkSNARK (the reference instantiates
r1cs_ppzksnark = PGHR13; we use proof_systems.pghr13, with the device
MSM/FFT pipeline underneath).

The architecture params + program + time bound live in the keypair
(ram_ppzksnark_architecture_params, tcc keygen binds the machine);
the primary input is the public tape.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..reductions.ram_to_r1cs import ram_to_r1cs, ram_witness_map
from ..relations.tinyram import TinyRAMProgram
from . import pghr13


@dataclass
class RamKeypair:
    pk: object
    vk: object
    program: TinyRAMProgram
    tape_len: int
    T: int


def generator(model, program: TinyRAMProgram, tape_len: int, T: int,
              rng) -> RamKeypair:
    """ram_ppzksnark_generator (tcc:60-90): reduce the machine to R1CS
    once, keygen with the r1cs ppzksnark."""
    pb, handles = ram_to_r1cs(program, tape_len, T)
    cs = pb.get_constraint_system()
    kp = pghr13.generator(model, cs, rng)
    out = RamKeypair(pk=kp.pk, vk=kp.vk, program=program,
                     tape_len=tape_len, T=T)
    out._handles = (pb, handles)  # circuit reused by the prover
    return out


def prover(model, kp: RamKeypair, tape, rng):
    """ram_ppzksnark_prover (tcc:92-120): witness-map the execution
    trace, then the r1cs prover."""
    pb, handles = kp._handles
    accepted, primary, aux = ram_witness_map(pb, handles, kp.program, tape)
    assert accepted
    return pghr13.prover(model, kp.pk, primary, aux, rng)


def verifier(model, kp: RamKeypair, tape, proof) -> bool:
    """ram_ppzksnark_verifier (tcc:122-140): the public input is the
    tape itself."""
    return pghr13.verifier_strong_IC(kp.vk, list(tape), proof)
