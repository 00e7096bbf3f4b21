"""TBCS — two-input boolean circuit satisfiability.

Capability parity with libsnark/relations/circuit_satisfaction_problems/
tbcs/tbcs.{hpp,cpp}: gates take two wires and one of 16 boolean types
(the type opcode IS the truth table, read at position 3-(2X+Y) —
tbcs.cpp:24-37); wire 0 is the constant TRUE; a circuit is satisfied
when every output gate evaluates to false.
"""

from __future__ import annotations

from dataclasses import dataclass

# gate type opcodes (tbcs.hpp:55-72): the 4-bit truth table
TBCS_GATE_CONSTANT_0 = 0
TBCS_GATE_AND = 1
TBCS_GATE_X_AND_NOT_Y = 2
TBCS_GATE_X = 3
TBCS_GATE_NOT_X_AND_Y = 4
TBCS_GATE_Y = 5
TBCS_GATE_XOR = 6
TBCS_GATE_OR = 7
TBCS_GATE_NOR = 8
TBCS_GATE_EQUIVALENCE = 9
TBCS_GATE_NOT_Y = 10
TBCS_GATE_IF_Y_THEN_X = 11
TBCS_GATE_NOT_X = 12
TBCS_GATE_IF_X_THEN_Y = 13
TBCS_GATE_NAND = 14
TBCS_GATE_CONSTANT_1 = 15


@dataclass
class TBCSGate:
    """tbcs_gate (tbcs.hpp:87-111)."""

    left_wire: int
    right_wire: int
    type: int
    output: int
    is_circuit_output: bool = False

    def evaluate(self, wires) -> bool:
        """tbcs.cpp:24-37: wire 0 reads as TRUE; the opcode is indexed
        at 3 - (2X + Y)."""
        X = True if self.left_wire == 0 else bool(wires[self.left_wire - 1])
        Y = True if self.right_wire == 0 else bool(wires[self.right_wire - 1])
        pos = 3 - ((2 if X else 0) + (1 if Y else 0))
        return bool(self.type & (1 << pos))


class TBCSCircuit:
    """tbcs_circuit (tbcs.hpp:133-180)."""

    def __init__(self, primary_input_size: int = 0,
                 auxiliary_input_size: int = 0):
        self.primary_input_size = primary_input_size
        self.auxiliary_input_size = auxiliary_input_size
        self.gates: list[TBCSGate] = []

    @property
    def num_inputs(self) -> int:
        return self.primary_input_size + self.auxiliary_input_size

    @property
    def num_gates(self) -> int:
        return len(self.gates)

    @property
    def num_wires(self) -> int:
        return self.num_inputs + self.num_gates

    def add_gate(self, g: TBCSGate):
        assert g.output == self.num_wires + 1, "gates must assign wires in order"
        self.gates.append(g)

    def is_valid(self) -> bool:
        for i, g in enumerate(self.gates):
            n_before = self.num_inputs + i
            if g.output != n_before + 1:
                return False
            if g.left_wire > n_before or g.right_wire > n_before:
                return False
            if not (0 <= g.type < 16):
                return False
        return True

    def get_all_wires(self, primary, auxiliary) -> list:
        """tbcs.cpp:215-235."""
        wires = [bool(v) for v in list(primary) + list(auxiliary)]
        for g in self.gates:
            wires.append(g.evaluate(wires))
        return wires

    def get_all_outputs(self, primary, auxiliary) -> list:
        wires = self.get_all_wires(primary, auxiliary)
        return [wires[g.output - 1] for g in self.gates if g.is_circuit_output]

    def is_satisfied(self, primary, auxiliary) -> bool:
        """All circuit outputs false (tbcs.cpp:252-264)."""
        return not any(self.get_all_outputs(primary, auxiliary))
