"""Multi-predicate proof-carrying data (r1cs_mp_ppzkpcd structure).

Capability parity with libsnark/zk_proof_systems/pcd/r1cs_pcd/
r1cs_mp_ppzkpcd (r1cs_mp_ppzkpcd.{hpp,tcc} + mp_pcd_circuits.{hpp,tcc}):
PCD over a SET of compliance predicates.  The structural deltas vs the
single-predicate system (proof_systems.pcd) are exactly the reference's:

  * each predicate gets its own step circuit and keypair
    (r1cs_mp_ppzkpcd.tcc keygen loops over the predicate vector);
  * inside a step circuit the verification key used to check an
    incoming proof is a WITNESS (the prover supplies whichever
    predicate produced the predecessor), so the verifier gadget is the
    variable-vk variant (gadgets.verifier_gadget
    Groth16VerifierGadgetVarVK ≙ r1cs_ppzksnark_verification_key_variable);
  * the witness vk is authenticated against a COMMITMENT to the vk set
    that travels as part of the public input: the vk's knapsack-CRH
    digest must have a Merkle membership path to the commitment
    (gadgets.knapsack SetCommitmentGadget ≙ set_commitment_gadget with
    the knapsack CRH, mp_pcd_circuits.hpp:88-120);
  * the step circuit's primary input is [outgoing message, commitment]
    — the commitment is an input, not a constant, which breaks the
    key-generation circularity (vks exist only after keygen).

Scope mirrors proof_systems.pcd: full constraint-level circuits with
real witnesses (including real inner proofs through the variable-vk
verifier), outer keygen/prove composed through groth16_full but gated
behind SNARK_TPU_HEAVY_TESTS — a cold ~400k-constraint keygen costs
hours of XLA:CPU compile on this image.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..gadgets.knapsack import (
    SetCommitmentGadget,
    knapsack_hash_fields,
    merkle_knapsack_path,
    merkle_knapsack_root,
)
from ..gadgets.protoboard import Protoboard
from ..gadgets.verifier_gadget import (
    Groth16VerifierGadgetVarVK,
    vk_field_elements,
)
from ..host.curves import host_curve
from ..relations.r1cs import LinearCombination as LC, R1CSConstraint
from .pcd import CompliancePredicate, R1CSPCDLocalData, R1CSPCDMessage


def vk_digest(hc, vk, num_inputs: int) -> int:
    """Knapsack digest of the canonical vk flattening."""
    return knapsack_hash_fields(
        hc.g2.F.p, vk_field_elements(hc, vk, num_inputs)
    )


def vk_set_commitment(hc, vks, num_inputs: int):
    """(root, leaves) for a power-of-two padded vk set."""
    leaves = [vk_digest(hc, vk, num_inputs) for vk in vks]
    n = 1
    while n < len(leaves):
        n *= 2
    leaves = leaves + [0] * (n - len(leaves))
    return merkle_knapsack_root(hc.g2.F.p, leaves), leaves


class MPPCDStepCircuit:
    """mp_compliance_step_pcd_circuit_maker: one predicate's constraints
    + per incoming edge a variable-vk verifier whose vk digest is
    set-committed against the commitment input wire."""

    def __init__(self, outer_curve: str, predicate: CompliancePredicate,
                 set_depth: int = 1, arity: int = 0):
        inner_curve = "MNT6753" if outer_curve == "MNT4753" else "MNT4753"
        self.inner_hc = host_curve(inner_curve)
        self.outer_curve = outer_curve
        self.predicate = predicate
        self.arity = arity
        self.set_depth = set_depth
        pb = Protoboard(self.inner_hc.g2.F.p)
        self.pb = pb

        n_pred_vars = predicate.constraint_system.num_variables
        self.pred_vars = [pb.allocate_var(f"pv{i}")
                          for i in range(n_pred_vars)]
        # primary input: [outgoing message | commitment]
        self.commitment = pb.allocate_var("setc_root")
        pb.set_input_sizes(
            predicate.constraint_system.primary_input_size + 1
        )
        for cons in predicate.constraint_system.constraints:
            pb.add_r1cs_constraint(
                R1CSConstraint(cons.a, cons.b, cons.c), "predicate"
            )

        self.verifiers = []
        self.set_gadgets = []
        if arity > 0:
            msg_base = (1 + predicate.outgoing_message_payload_length) + 1
            for k in range(arity):
                payload_len = predicate.incoming_message_payload_lengths[
                    min(k, len(predicate.incoming_message_payload_lengths) - 1)
                ]
                vg = Groth16VerifierGadgetVarVK(
                    pb, self.inner_hc, num_inputs=1 + payload_len,
                    annotation=f"mpv{k}",
                )
                self.verifiers.append(vg)
                # authenticate the witness vk against the commitment
                sg = SetCommitmentGadget(
                    pb, set_depth, vg.vk_digest, self.commitment.lc(),
                    annotation=f"setc{k}",
                )
                self.set_gadgets.append(sg)
                # bind the verified statement to the predicate's
                # incoming-message wires
                for j in range(1 + payload_len):
                    pred_wire = self.pred_vars[msg_base + j]
                    pb.add_r1cs_constraint(
                        R1CSConstraint(
                            LC.constant(1),
                            pred_wire.lc() - vg.inputs[j].lc(),
                            LC.constant(0),
                        ),
                        f"bind msg{k}.{j}",
                    )
                msg_base += 1 + payload_len

    def fill(self, outgoing, incoming, local_data, witness, commitment,
             inner=None):
        """inner: per edge, (vk, proof, leaf_index, leaves)."""
        pb = self.pb
        assignment = outgoing.as_assignment()
        assignment.append(len(incoming))
        for msg in incoming:
            assignment += msg.as_assignment()
        assignment += local_data.as_assignment()
        assignment += list(witness)
        assert len(assignment) == len(self.pred_vars)
        for var, val in zip(self.pred_vars, assignment):
            pb.set_val(var, val)
        pb.set_val(self.commitment, commitment)
        for k, (vg, sg) in enumerate(zip(self.verifiers, self.set_gadgets)):
            vk, proof, leaf_index, leaves = inner[k]
            msg_inputs = incoming[k].as_assignment()
            vg.generate_r1cs_witness(vk, msg_inputs, proof)
            bits, path = merkle_knapsack_path(pb.p, leaves, leaf_index)
            sg.generate_r1cs_witness(bits, path)
        return pb.is_satisfied()


@dataclass
class MPPCDKeypair:
    """r1cs_mp_ppzkpcd_keypair: one (pk, vk) per predicate + the vk-set
    commitment all step circuits authenticate against."""

    pks: list
    vks: list
    predicates: list
    commitment: int
    leaves: list


class MPPCDProver:
    """r1cs_mp_ppzkpcd generator/prover/verifier composition."""

    def __init__(self, outer_curve: str = "MNT4753"):
        self.outer_curve = outer_curve

    def _model(self):
        from ..models import mnt4753, mnt6753

        return (
            mnt4753.get() if self.outer_curve == "MNT4753" else mnt6753.get()
        )

    def keygen(self, predicates, rng, arity: int = 0,
               set_depth: int = 1) -> MPPCDKeypair:
        """Loop the Groth16 generator over every predicate's step
        circuit, then commit to the resulting vk set
        (r1cs_mp_ppzkpcd.tcc keygen)."""
        from . import groth16_full as g16

        hc = host_curve(
            "MNT6753" if self.outer_curve == "MNT4753" else "MNT4753"
        )
        circuits = []
        pks = []
        vks = []
        for pred in predicates:
            circ = MPPCDStepCircuit(self.outer_curve, pred,
                                    set_depth=set_depth, arity=arity)
            kp = g16.generator(
                self._model(), circ.pb.get_constraint_system(), rng
            )
            circuits.append(circ)
            pks.append(kp.pk)
            vks.append(kp.vk)
        num_inputs = max(
            1 + p.incoming_message_payload_lengths[0] for p in predicates
        )
        commitment, leaves = vk_set_commitment(hc, vks, num_inputs)
        out = MPPCDKeypair(pks=pks, vks=vks, predicates=list(predicates),
                           commitment=commitment, leaves=leaves)
        out._circuits = circuits
        return out

    def prove(self, kp: MPPCDKeypair, which: int, outgoing, incoming,
              local_data, witness, rng, inner=None):
        from . import groth16_full as g16

        circ = kp._circuits[which]
        ok = circ.fill(outgoing, incoming, local_data, witness,
                       kp.commitment, inner)
        assert ok, "mp step circuit unsatisfied"
        primary = circ.pb.primary_input()
        auxiliary = circ.pb.auxiliary_input()
        return g16.prover(self._model(), kp.pks[which], primary,
                          auxiliary, rng)

    def verify(self, kp: MPPCDKeypair, which: int,
               outgoing: R1CSPCDMessage, proof) -> bool:
        from . import groth16_full as g16

        pred = kp.predicates[which]
        primary = outgoing.as_assignment()[
            : pred.constraint_system.primary_input_size
        ] + [kp.commitment]
        return g16.verifier_strong_IC(kp.vks[which], primary, proof)
