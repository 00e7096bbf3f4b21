"""R1CS constraint systems.

Capability parity with libsnark's R1CS relation layer
(libsnark/relations/constraint_satisfaction_problems/r1cs/r1cs.hpp:52-141,
variable.hpp/tcc): linear combinations over Fr, constraints
<A,w>*<B,w> = <C,w>, satisfiability checking, and the prover-side
`swap_AB_if_beneficial` density heuristic.

Circuit construction is inherently host-side sequential code (it is in
the reference too — C++ host templates); values are exact Python ints
mod r.  The TPU framework consumes a finished constraint system through
reductions.r1cs_to_qap, which lowers the sparse matrices to device
gather/segment-sum programs.

Variable indexing follows libsnark: index 0 is the constant ONE, indices
1..num_inputs are primary (public) inputs, the rest auxiliary (witness).
"""

from __future__ import annotations

from dataclasses import dataclass


class LinearCombination:
    """Sparse linear combination sum_j coeff_j * x_{index_j}
    (libsnark variable.hpp linear_combination<FieldT>)."""

    __slots__ = ("terms",)

    def __init__(self, terms=None):
        # list of (var_index, coeff) with coeff an int (reduced lazily)
        self.terms = list(terms) if terms else []

    @classmethod
    def of_var(cls, index: int, coeff: int = 1):
        return cls([(index, coeff)])

    @classmethod
    def constant(cls, value: int):
        return cls([(0, value)]) if value else cls()

    def __add__(self, other: "LinearCombination"):
        return LinearCombination(self.terms + other.terms)

    def __mul__(self, scalar: int):
        return LinearCombination([(i, c * scalar) for i, c in self.terms])

    __rmul__ = __mul__

    def __sub__(self, other: "LinearCombination"):
        return self + (other * -1)

    def evaluate(self, assignment, p: int) -> int:
        """<self, (1, assignment...)> mod p
        (variable.tcc linear_combination::evaluate)."""
        acc = 0
        for idx, coeff in self.terms:
            val = 1 if idx == 0 else assignment[idx - 1]
            acc += coeff * val
        return acc % p

    def collate(self, p: int) -> dict:
        """Merge duplicate indices; drop zero coefficients."""
        out: dict[int, int] = {}
        for idx, coeff in self.terms:
            out[idx] = (out.get(idx, 0) + coeff) % p
        return {i: c for i, c in out.items() if c}

    def is_valid(self, num_variables: int) -> bool:
        return all(0 <= i <= num_variables for i, _ in self.terms)


@dataclass
class R1CSConstraint:
    """<a,w> * <b,w> = <c,w>  (r1cs.hpp:52 r1cs_constraint<FieldT>).

    is_square marks a==b constraints (r1cs.hpp:57): the R1CS->SAP
    reduction keeps them as a single square constraint instead of the
    two-constraint (a+b)^2 / (a-b)^2 split."""

    a: LinearCombination
    b: LinearCombination
    c: LinearCombination
    is_square: bool = False


class R1CSConstraintSystem:
    """A list of R1CS constraints plus the primary/auxiliary split
    (r1cs.hpp:99-141 r1cs_constraint_system<FieldT>)."""

    def __init__(self, p: int, primary_input_size: int = 0,
                 auxiliary_input_size: int = 0):
        self.p = p
        self.primary_input_size = primary_input_size
        self.auxiliary_input_size = auxiliary_input_size
        self.constraints: list[R1CSConstraint] = []

    # ---- shape -----------------------------------------------------------
    @property
    def num_variables(self) -> int:
        return self.primary_input_size + self.auxiliary_input_size

    @property
    def num_constraints(self) -> int:
        return len(self.constraints)

    @property
    def num_square_constraints(self) -> int:
        """Constraints flagged a==b (r1cs.hpp:119); consumed by
        reductions.r1cs_to_sap."""
        return sum(1 for c in self.constraints if c.is_square)

    def add_constraint(self, c: R1CSConstraint):
        self.constraints.append(c)

    def is_valid(self) -> bool:
        n = self.num_variables
        return all(
            c.a.is_valid(n) and c.b.is_valid(n) and c.c.is_valid(n)
            for c in self.constraints
        )

    # ---- semantics ---------------------------------------------------------
    def is_satisfied(self, primary, auxiliary) -> bool:
        """Check every constraint on (primary ++ auxiliary)
        (r1cs.tcc is_satisfied)."""
        assignment = list(primary) + list(auxiliary)
        p = self.p
        for cons in self.constraints:
            a = cons.a.evaluate(assignment, p)
            b = cons.b.evaluate(assignment, p)
            c = cons.c.evaluate(assignment, p)
            if a * b % p != c:
                return False
        return True

    def swap_AB_if_beneficial(self):
        """If the B matrix is denser in non-input variables than A, swap
        every constraint's a/b — the B MSM runs over G2 where group ops
        cost ~3x, so the sparser side should live there
        (r1cs.tcc swap_AB_if_beneficial)."""
        touched_a: set[int] = set()
        touched_b: set[int] = set()
        for cons in self.constraints:
            touched_a.update(i for i, _ in cons.a.terms if i > self.primary_input_size)
            touched_b.update(i for i, _ in cons.b.terms if i > self.primary_input_size)
        if len(touched_b) > len(touched_a):
            for cons in self.constraints:
                cons.a, cons.b = cons.b, cons.a
            return True
        return False
