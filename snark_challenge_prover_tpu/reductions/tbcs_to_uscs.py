"""TBCS -> USCS reduction.

Capability parity with libsnark/reductions/tbcs_to_uscs/tbcs_to_uscs.tcc:
each of the 16 boolean gate types lowers to one USCS constraint (a
linear combination over {x, y, z, 1} that lands in {-1, +1} exactly
when z = g(x, y) on boolean wires — the coefficient table is
tcc:50-135), plus one booleanity constraint 2w - 1 per wire and one
output-forcing constraint w + 1 per circuit output.
"""

from __future__ import annotations

from ..relations.r1cs import LinearCombination
from ..relations.tbcs import TBCSCircuit
from ..relations.uscs import USCSConstraintSystem

# (cx, cy, cz, c1) per gate opcode, from tbcs_to_uscs.tcc:50-135
_GATE_LC = {
    0: (0, 0, 1, 1),      # CONSTANT_0
    1: (-2, -2, 4, 1),    # AND
    2: (-2, 2, 4, -1),    # X_AND_NOT_Y
    3: (-1, 0, 1, 1),     # X
    4: (2, -2, 4, -1),    # NOT_X_AND_Y
    5: (0, 1, 1, -1),     # Y
    6: (1, 1, 1, -1),     # XOR
    7: (-2, -2, 4, -1),   # OR
    8: (2, 2, 4, -3),     # NOR
    9: (1, 1, 1, -2),     # EQUIVALENCE
    10: (0, -1, 1, 0),    # NOT_Y
    11: (-2, 2, 4, -3),   # IF_Y_THEN_X
    12: (-1, 0, 1, 0),    # NOT_X
    13: (2, -2, 4, -3),   # IF_X_THEN_Y
    14: (2, 2, 4, -5),    # NAND
    15: (0, 0, 1, 0),     # CONSTANT_1
}


def instance_map(circuit: TBCSCircuit, p: int) -> USCSConstraintSystem:
    """tbcs_to_uscs_instance_map (tcc:22-150)."""
    assert circuit.is_valid()
    cs = USCSConstraintSystem(
        p,
        primary_input_size=circuit.primary_input_size,
        auxiliary_input_size=circuit.auxiliary_input_size + circuit.num_gates,
    )
    for g in circuit.gates:
        cx, cy, cz, c1 = _GATE_LC[g.type]
        terms = []
        if cx:
            terms.append((g.left_wire, cx))
        if cy:
            terms.append((g.right_wire, cy))
        if cz:
            terms.append((g.output, cz))
        if c1:
            terms.append((0, c1))
        cs.add_constraint(LinearCombination(terms))
    # booleanity: 2w - 1 in {-1, 1} for wires 0..num_wires-1 (tcc:138-142)
    for i in range(circuit.num_wires):
        cs.add_constraint(LinearCombination([(i, 2), (0, -1)]))
    # outputs forced to 0: w + 1 in {-1, 1} with w boolean => w = 0
    for g in circuit.gates:
        if g.is_circuit_output:
            cs.add_constraint(LinearCombination([(g.output, 1), (0, 1)]))
    return cs


def witness_map(circuit: TBCSCircuit, primary, auxiliary) -> list:
    """tbcs_to_uscs_witness_map (tcc:152-160): bits -> field elements."""
    return [1 if b else 0 for b in circuit.get_all_wires(primary, auxiliary)]
