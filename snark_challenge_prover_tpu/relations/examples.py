"""Synthetic satisfiable R1CS instances for tests and fixtures.

Same circuit shapes as the reference's example generators
(libsnark/relations/.../r1cs/examples/r1cs_examples.tcc:25-160):

  * field-input: a chain alternating (a+b)*1=c and a*b=c constraints,
    closed by one squaring constraint over the sum of all variables.
  * binary-input: XOR chains res = u + v - 2uv over random prior bits.

Randomness comes from a caller-supplied PRNG so fixtures are
reproducible (the reference uses FieldT::random_element / std::rand).
"""

from __future__ import annotations

from dataclasses import dataclass

from .r1cs import LinearCombination as LC, R1CSConstraint, R1CSConstraintSystem


@dataclass
class R1CSExample:
    constraint_system: R1CSConstraintSystem
    primary_input: list
    auxiliary_input: list


def generate_r1cs_example_with_field_input(
    p: int, num_constraints: int, num_inputs: int, rng
) -> R1CSExample:
    assert num_inputs <= num_constraints + 2
    cs = R1CSConstraintSystem(
        p,
        primary_input_size=num_inputs,
        auxiliary_input_size=2 + num_constraints - num_inputs,
    )

    assignment = []
    a = rng.randrange(p)
    b = rng.randrange(p)
    assignment += [a, b]

    for i in range(num_constraints - 1):
        if i % 2:
            # a * b = c
            A = LC.of_var(i + 1)
            B = LC.of_var(i + 2)
            C = LC.of_var(i + 3)
            tmp = a * b % p
        else:
            # (a + b) * 1 = c
            A = LC.of_var(i + 1) + LC.of_var(i + 2)
            B = LC.of_var(0)
            C = LC.of_var(i + 3)
            tmp = (a + b) % p
        assignment.append(tmp)
        a, b = b, tmp
        cs.add_constraint(R1CSConstraint(A, B, C))

    # closing constraint: (sum of all prior vars)^2 = last var
    A = LC()
    B = LC()
    fin = 0
    for i in range(1, cs.num_variables):
        A = A + LC.of_var(i)
        B = B + LC.of_var(i)
        fin = (fin + assignment[i - 1]) % p
    C = LC.of_var(cs.num_variables)
    cs.add_constraint(R1CSConstraint(A, B, C))
    assignment.append(fin * fin % p)

    primary = assignment[:num_inputs]
    auxiliary = assignment[num_inputs:]
    assert cs.num_variables == len(assignment)
    assert cs.is_satisfied(primary, auxiliary)
    return R1CSExample(cs, primary, auxiliary)


def generate_r1cs_example_with_binary_input(
    p: int, num_constraints: int, num_inputs: int, rng
) -> R1CSExample:
    assert num_inputs >= 1
    cs = R1CSConstraintSystem(
        p, primary_input_size=num_inputs, auxiliary_input_size=num_constraints
    )
    assignment = [rng.randrange(2) for _ in range(num_inputs)]

    lastvar = num_inputs - 1
    for i in range(num_constraints):
        lastvar += 1
        u = rng.randrange(num_inputs) if i == 0 else rng.randrange(i)
        v = rng.randrange(num_inputs) if i == 0 else rng.randrange(i)
        # XOR: 2u * v = u + v - res
        A = LC.of_var(u + 1, 2)
        B = LC.of_var(v + 1, 1)
        if u == v:
            C = LC.of_var(u + 1, 2)
        else:
            C = LC.of_var(u + 1, 1) + LC.of_var(v + 1, 1)
        C = C + LC.of_var(lastvar + 1, -1)
        cs.add_constraint(R1CSConstraint(A, B, C))
        res = (assignment[u] + assignment[v] - 2 * assignment[u] * assignment[v]) % p
        assignment.append(res)

    primary = assignment[:num_inputs]
    auxiliary = assignment[num_inputs:]
    assert cs.is_satisfied(primary, auxiliary)
    return R1CSExample(cs, primary, auxiliary)
