"""Proof-carrying data over the MNT cycle (r1cs_sp_ppzkpcd structure).

Capability parity with libsnark/zk_proof_systems/pcd/r1cs_pcd — the
compliance-predicate framework plus the single-predicate PCD circuit
construction (sp_pcd_circuits.{hpp,tcc}):

  * `R1CSPCDMessage` / `R1CSPCDLocalData` / `CompliancePredicate`:
    a predicate is an R1CS over wires
      [outgoing message | arity | incoming messages | local data]
    accepting iff the local invariant holds (compliance_predicate.hpp);
  * `build_pcd_step_circuit`: the PCD step circuit = the compliance
    predicate's constraints REPLICATED over protoboard wires, composed
    with one in-circuit SNARK verifier per incoming message
    (gadgets/verifier_gadget.Groth16VerifierGadget) checking the
    predecessor proof against the translated message — exactly
    sp_pcd_circuits' sp_compliance_step_pcd_circuit_maker shape (its
    curve-cycle split: the step circuit lives over this curve's Fr ==
    the partner curve's Fq, so partner proofs verify natively);
  * `SPPCDProver.prove_step_witness`: fills the full step-circuit
    witness (predicate assignment + verifier-gadget wires) from a real
    predecessor proof and checks it satisfies — the constraint-level
    content of pcd_prover (r1cs_sp_ppzkpcd.tcc:180-260).

Scope honesty: the OUTER keygen/prove over the ~190k-constraint step
circuit (and therefore end-to-end recursive proofs) is wired through
proof_systems.groth16_full but is not exercised by default tests — on
this image a cold keygen at that size costs hours of XLA:CPU compile;
`SNARK_TPU_HEAVY_TESTS` enables the full path.  Base-case proofs
(arity 0) need no verifier gadget and round-trip cheaply.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..gadgets.protoboard import PBVariable, Protoboard
from ..gadgets.verifier_gadget import Groth16VerifierGadget
from ..host.curves import host_curve
from ..relations.r1cs import (
    LinearCombination as LC,
    R1CSConstraint,
    R1CSConstraintSystem,
)


@dataclass
class R1CSPCDMessage:
    """r1cs_pcd_message: a typed payload of field elements."""

    type: int
    payload: list

    def as_assignment(self):
        return [self.type] + list(self.payload)


@dataclass
class R1CSPCDLocalData:
    payload: list

    def as_assignment(self):
        return list(self.payload)


@dataclass
class CompliancePredicate:
    """compliance_predicate<FieldT> (compliance_predicate.hpp:77-120):
    an R1CS over [1 | outgoing | arity | incoming... | local data]."""

    name: int
    type: int
    constraint_system: R1CSConstraintSystem
    outgoing_message_payload_length: int
    max_arity: int
    incoming_message_payload_lengths: list
    local_data_length: int
    witness_length: int
    relies_on_same_type_inputs: bool = True

    def is_satisfied(self, outgoing: R1CSPCDMessage, incoming: list,
                     local_data: R1CSPCDLocalData, witness: list) -> bool:
        """compliance_predicate.tcc is_satisfied: evaluate the R1CS on
        the concatenated assignment."""
        assignment = outgoing.as_assignment()
        assignment.append(len(incoming))
        for msg in incoming:
            assignment += msg.as_assignment()
        assignment += local_data.as_assignment()
        assignment += list(witness)
        primary = assignment[: self.constraint_system.primary_input_size]
        auxiliary = assignment[self.constraint_system.primary_input_size:]
        return self.constraint_system.is_satisfied(primary, auxiliary)


class PCDStepCircuit:
    """The sp PCD step circuit over one curve of the cycle: predicate
    constraints + one verifier gadget per incoming message."""

    def __init__(self, outer_curve: str, predicate: CompliancePredicate,
                 inner_vk=None, arity: int = 0):
        # the step circuit lives over the OUTER curve's Fr, which equals
        # the INNER (partner) curve's Fq — partner proofs verify natively
        inner_curve = "MNT6753" if outer_curve == "MNT4753" else "MNT4753"
        self.inner_hc = host_curve(inner_curve)
        self.outer_curve = outer_curve
        self.predicate = predicate
        self.arity = arity
        pb = Protoboard(self.inner_hc.g2.F.p)
        self.pb = pb

        # wires mirroring the predicate's variable order
        n_pred_vars = predicate.constraint_system.num_variables
        self.pred_vars = [pb.allocate_var(f"pv{i}")
                          for i in range(n_pred_vars)]
        pb.set_input_sizes(predicate.constraint_system.primary_input_size)
        for cons in predicate.constraint_system.constraints:
            pb.add_r1cs_constraint(
                R1CSConstraint(cons.a, cons.b, cons.c), "predicate"
            )

        # one in-circuit verifier per incoming message (the predecessor
        # proof attests the incoming message was itself compliant); the
        # verifier's public-input wires are BOUND to the predicate's
        # incoming-message wires — the message the predicate reasons
        # about is exactly the statement the predecessor proof attests
        self.verifiers = []
        if arity > 0:
            assert inner_vk is not None, "recursion needs the inner vk"
            msg_base = (1 + predicate.outgoing_message_payload_length) + 1
            for k in range(arity):
                payload_len = predicate.incoming_message_payload_lengths[
                    min(k, len(predicate.incoming_message_payload_lengths) - 1)
                ]
                vg = Groth16VerifierGadget(
                    pb, self.inner_hc, inner_vk,
                    num_inputs=1 + payload_len,
                    annotation=f"pcdv{k}",
                )
                self.verifiers.append(vg)
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

    def fill(self, outgoing, incoming, local_data, witness,
             inner_proofs=None):
        """Fill predicate wires + each verifier gadget from a real
        predecessor proof; satisfiable iff the step is compliant AND
        every predecessor proof verifies."""
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
        for k, vg in enumerate(self.verifiers):
            msg_inputs = incoming[k].as_assignment()
            vg.generate_r1cs_witness(msg_inputs, inner_proofs[k])
        return pb.is_satisfied()


@dataclass
class SPPCDKeypair:
    pk: object
    vk: object
    predicate: CompliancePredicate


class SPPCDProver:
    """r1cs_sp_ppzkpcd generator/prover/verifier composition.  Base
    case (arity 0): the step circuit is just the predicate — keygen and
    prove with the device Groth16.  Recursive case: the step circuit
    includes verifier gadgets; keygen/prove identical in form but
    ~190k constraints heavier per incoming edge."""

    def __init__(self, outer_curve: str = "MNT4753"):
        self.outer_curve = outer_curve

    def _model(self):
        from ..models import mnt4753, mnt6753

        return (
            mnt4753.get() if self.outer_curve == "MNT4753" else mnt6753.get()
        )

    def keygen(self, predicate: CompliancePredicate, rng,
               inner_vk=None, arity: int = 0) -> SPPCDKeypair:
        from . import groth16_full as g16

        circuit = PCDStepCircuit(self.outer_curve, predicate, inner_vk, arity)
        cs = circuit.pb.get_constraint_system()
        kp = g16.generator(self._model(), cs, rng)
        out = SPPCDKeypair(pk=kp.pk, vk=kp.vk, predicate=predicate)
        out._circuit = circuit
        return out

    def prove(self, kp: SPPCDKeypair, outgoing, incoming, local_data,
              witness, rng, inner_proofs=None):
        from . import groth16_full as g16

        circuit = kp._circuit
        ok = circuit.fill(outgoing, incoming, local_data, witness,
                          inner_proofs)
        assert ok, "step circuit unsatisfied"
        primary = circuit.pb.primary_input()
        auxiliary = circuit.pb.auxiliary_input()
        return g16.prover(self._model(), kp.pk, primary, auxiliary, rng)

    def verify(self, kp: SPPCDKeypair, outgoing: R1CSPCDMessage,
               proof) -> bool:
        from . import groth16_full as g16

        primary = outgoing.as_assignment()[
            : kp.predicate.constraint_system.primary_input_size
        ]
        return g16.verifier_strong_IC(kp.vk, primary, proof)
