"""gadgetlib2-style DSL + adapter (gadgets/gadgetlib2.py): the second
circuit API of the reference, converted into relations.r1cs — the
framework analogue of gadgetlib2's adapter tests.
"""

from snark_challenge_prover_tpu.gadgets.gadgetlib2 import (
    GadgetLibAdapter,
    LinearCombination,
    Protoboard,
    Variable,
)
from snark_challenge_prover_tpu.models import mnt4753

P = mnt4753.get().Fr.p


def _product_circuit():
    pb = Protoboard(P)
    x = Variable("x")
    a = Variable("a")
    b = Variable("b")
    pb.setVal(x, 35)
    pb.setVal(a, 5)
    pb.setVal(b, 7)
    pb.setPublicAmount(1)
    pb.addRank1Constraint(a, b, x, "a*b=x")
    pb.enforceBooleanity(Variable("bit"))  # unset -> 0, boolean ok
    return pb, x, a, b


def test_satisfaction_and_val():
    pb, x, a, b = _product_circuit()
    assert pb.isSatisfied()
    assert pb.val(a + b) == 12
    assert pb.val(2 * a - b) == 3
    pb.setVal(x, 36)
    assert not pb.isSatisfied()


def test_unary_constraint():
    pb = Protoboard(P)
    v = Variable()
    pb.setVal(v, 4)
    pb.addUnaryConstraint(LinearCombination(v) - 4, "v == 4")
    assert pb.isSatisfied()
    pb.setVal(v, 5)
    assert not pb.isSatisfied()


def test_adapter_roundtrip():
    pb, x, a, b = _product_circuit()
    cs, primary, aux = GadgetLibAdapter().convert(pb)
    assert cs.num_constraints == 2
    assert primary == [35]
    assert cs.is_satisfied(primary, aux)
    assert not cs.is_satisfied([36], aux)


def test_adapter_feeds_proof_system():
    """The converted system drives the host-side satisfiability exactly
    like native relations (device proving covered by the shared proof-
    system tests)."""
    pb, x, a, b = _product_circuit()
    cs, primary, aux = GadgetLibAdapter().convert(pb)
    assert cs.num_variables == len(primary) + len(aux)
    assert cs.is_valid()
