"""Gadget DSL tests: each gadget's constraints must accept its own
witness and reject tampered assignments (gadgetlib1 test style), and a
protoboard circuit must flow into the full Groth16 stack."""

import random

import pytest

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.gadgets.protoboard import (
    PBVariableArray,
    Protoboard,
)
from snark_challenge_prover_tpu.gadgets.basic_gadgets import (
    ComparisonGadget,
    ConjunctionGadget,
    DisjunctionGadget,
    InnerProductGadget,
    MultiplicationGadget,
    PackingGadget,
    generate_boolean_r1cs_constraint,
)

P = mnt4753.get().Fr.p


def test_packing_gadget(rng):
    pb = Protoboard(P)
    packed = pb.allocate_var("packed")
    bits = PBVariableArray.allocate(pb, 8, "bits")
    g = PackingGadget(pb, bits, packed)
    g.generate_r1cs_constraints()
    pb.set_val(packed, 0b10110101)
    g.generate_r1cs_witness_from_packed()
    assert pb.is_satisfied()
    assert [pb.val(b) for b in bits] == [1, 0, 1, 0, 1, 1, 0, 1]
    pb.set_val(bits[0], 0)  # break it
    assert not pb.is_satisfied()


def test_packing_from_bits(rng):
    pb = Protoboard(P)
    packed = pb.allocate_var()
    bits = PBVariableArray.allocate(pb, 5, "bits")
    g = PackingGadget(pb, bits, packed)
    g.generate_r1cs_constraints()
    for b in bits:
        pb.set_val(b, rng.randrange(2))
    g.generate_r1cs_witness_from_bits()
    assert pb.is_satisfied()


def test_boolean_constraint():
    pb = Protoboard(P)
    x = pb.allocate_var()
    generate_boolean_r1cs_constraint(pb, x)
    pb.set_val(x, 1)
    assert pb.is_satisfied()
    pb.set_val(x, 2)
    assert not pb.is_satisfied()


def test_inner_product(rng):
    pb = Protoboard(P)
    n = 5
    A = PBVariableArray.allocate(pb, n, "A")
    B = PBVariableArray.allocate(pb, n, "B")
    res = pb.allocate_var("res")
    g = InnerProductGadget(pb, A, B, res)
    g.generate_r1cs_constraints()
    av = [rng.randrange(P) for _ in range(n)]
    bv = [rng.randrange(P) for _ in range(n)]
    for v, x in zip(A, av):
        pb.set_val(v, x)
    for v, x in zip(B, bv):
        pb.set_val(v, x)
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert pb.val(res) == sum(a * b for a, b in zip(av, bv)) % P


@pytest.mark.parametrize("cls,fn", [
    (DisjunctionGadget, lambda bits: 1 if any(bits) else 0),
    (ConjunctionGadget, lambda bits: 1 if all(bits) else 0),
])
def test_or_and_gadgets(cls, fn, rng):
    for trial in range(4):
        pb = Protoboard(P)
        ins = PBVariableArray.allocate(pb, 4, "in")
        out = pb.allocate_var("out")
        g = cls(pb, ins, out)
        g.generate_r1cs_constraints()
        bits = [rng.randrange(2) for _ in range(4)]
        if trial == 0:
            bits = [0, 0, 0, 0]
        if trial == 1:
            bits = [1, 1, 1, 1]
        for v, x in zip(ins, bits):
            pb.set_val(v, x)
        g.generate_r1cs_witness()
        assert pb.is_satisfied()
        assert pb.val(out) == fn(bits)


def test_comparison_gadget(rng):
    for a, b in [(3, 7), (7, 3), (5, 5), (0, 15), (15, 15)]:
        pb = Protoboard(P)
        A = pb.allocate_var("A")
        B = pb.allocate_var("B")
        less = pb.allocate_var("less")
        leq = pb.allocate_var("leq")
        g = ComparisonGadget(pb, 4, A, B, less, leq)
        g.generate_r1cs_constraints()
        pb.set_val(A, a)
        pb.set_val(B, b)
        g.generate_r1cs_witness()
        assert pb.is_satisfied(), (a, b)
        assert pb.val(less) == (1 if a < b else 0), (a, b)
        assert pb.val(leq) == (1 if a <= b else 0), (a, b)


def test_protoboard_to_constraint_system(rng):
    """A protoboard circuit is a valid R1CSConstraintSystem: x*y == z
    with x public."""
    pb = Protoboard(P)
    x = pb.allocate_var("x")
    y = pb.allocate_var("y")
    z = pb.allocate_var("z")
    g = MultiplicationGadget(pb, x, y, z)
    g.generate_r1cs_constraints()
    pb.set_input_sizes(1)
    pb.set_val(x, 6)
    pb.set_val(y, 7)
    g.generate_r1cs_witness()
    cs = pb.get_constraint_system()
    assert cs.is_satisfied(pb.primary_input(), pb.auxiliary_input())
    assert pb.val(z) == 42
