"""BACS ppzkSNARK — proof system for bilinear arithmetic circuits.

Capability parity with libsnark/zk_proof_systems/ppzksnark/
bacs_ppzksnark/bacs_ppzksnark.{hpp,tcc}: a thin adapter that lowers the
circuit through reductions.bacs_to_r1cs and delegates to the PGHR13
R1CS ppzkSNARK (tcc:56-57, 72-74), exactly as the reference does.
The keypair carries the circuit so the prover can recompute wires.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..reductions import bacs_to_r1cs
from ..relations.bacs import BACSCircuit
from . import pghr13

Proof = pghr13.Proof
VerificationKey = pghr13.VerificationKey


@dataclass
class ProvingKey:
    """bacs_ppzksnark_proving_key (hpp:68-118): circuit + R1CS pk."""

    circuit: BACSCircuit
    r1cs_pk: pghr13.ProvingKey


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


def generator(model, circuit: BACSCircuit, rng) -> Keypair:
    """bacs_ppzksnark_generator (tcc:52-64)."""
    cs = bacs_to_r1cs.instance_map(circuit)
    kp = pghr13.generator(model, cs, rng)
    return Keypair(ProvingKey(circuit=circuit, r1cs_pk=kp.pk), kp.vk)


def prover(model, pk: ProvingKey, primary, auxiliary, rng) -> Proof:
    """bacs_ppzksnark_prover (tcc:67-79)."""
    wires = bacs_to_r1cs.witness_map(pk.circuit, primary, auxiliary)
    r1cs_aux = wires[len(primary):]
    return pghr13.prover(model, pk.r1cs_pk, primary, r1cs_aux, rng)


verifier_process_vk = pghr13.verifier_process_vk
online_verifier_weak_IC = pghr13.online_verifier_weak_IC
online_verifier_strong_IC = pghr13.online_verifier_strong_IC
verifier_weak_IC = pghr13.verifier_weak_IC
verifier_strong_IC = pghr13.verifier_strong_IC
