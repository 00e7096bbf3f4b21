"""TBCS ppzkSNARK — proof system for two-input boolean circuits.

Capability parity with libsnark/zk_proof_systems/ppzksnark/
tbcs_ppzksnark/tbcs_ppzksnark.{hpp,tcc}: a thin adapter that lowers the
circuit through reductions.tbcs_to_uscs and delegates to the USCS
ppzkSNARK, exactly as the reference does (tcc generator/prover wrap
uscs_ppzksnark_*).  Primary inputs are bit vectors; they enter the
USCS verifier as 0/1 field elements.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..reductions import tbcs_to_uscs
from ..relations.tbcs import TBCSCircuit
from . import uscs_ppzksnark as uscs

Proof = uscs.Proof
VerificationKey = uscs.VerificationKey


@dataclass
class ProvingKey:
    """tbcs_ppzksnark_proving_key: circuit + USCS pk."""

    circuit: TBCSCircuit
    uscs_pk: uscs.ProvingKey


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


def generator(model, circuit: TBCSCircuit, rng) -> Keypair:
    cs = tbcs_to_uscs.instance_map(circuit, model.Fr.p)
    kp = uscs.generator(model, cs, rng)
    return Keypair(ProvingKey(circuit=circuit, uscs_pk=kp.pk), kp.vk)


def prover(model, pk: ProvingKey, primary, auxiliary, rng) -> Proof:
    wires = tbcs_to_uscs.witness_map(pk.circuit, primary, auxiliary)
    uscs_primary = wires[: len(primary)]
    uscs_aux = wires[len(primary):]
    return uscs.prover(model, pk.uscs_pk, uscs_primary, uscs_aux, rng)


def _field_primary(primary):
    return [1 if b else 0 for b in primary]


def verifier_process_vk(vk):
    return uscs.verifier_process_vk(vk)


def online_verifier_weak_IC(vk, primary, proof):
    return uscs.online_verifier_weak_IC(vk, _field_primary(primary), proof)


def online_verifier_strong_IC(vk, primary, proof):
    return uscs.online_verifier_strong_IC(vk, _field_primary(primary), proof)


def verifier_weak_IC(vk, primary, proof):
    return uscs.verifier_weak_IC(vk, _field_primary(primary), proof)


def verifier_strong_IC(vk, primary, proof):
    return uscs.verifier_strong_IC(vk, _field_primary(primary), proof)
