"""Pairing-verification gadget (gadgets/pairing_gadgets.py) vs the host
ate engine: the in-circuit e(P,Q) must equal reduced_pairing(P,Q) and
the circuit must reject tampered results — the framework analogue of
libsnark's test_weierstrass_miller_loop / final_exponentiation tests.

MNT4753 only by default (the deg-3 MNT6753 build is ~1.5x bigger);
set SNARK_TPU_HEAVY_TESTS=1 to cover both curves.
"""

import os

import pytest

from snark_challenge_prover_tpu.gadgets.field_ext_gadgets import ExtVariable
from snark_challenge_prover_tpu.gadgets.pairing_gadgets import (
    ReducedPairingGadget,
)
from snark_challenge_prover_tpu.gadgets.protoboard import Protoboard
from snark_challenge_prover_tpu.host.curves import host_curve
from snark_challenge_prover_tpu.proof_systems.ate_pairing import AtePairing

CURVES = ["MNT4753"]
if os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") == "1":
    CURVES.append("MNT6753")


@pytest.fixture(scope="module", params=CURVES)
def built(request):
    name = request.param
    hc = host_curve(name)
    P = hc.g1.mul(5, hc.g1_gen)
    Q = hc.g2.mul(7, hc.g2_gen)

    pb = Protoboard(hc.g2.F.p)
    deg = hc.g2.F.deg
    px, py = pb.allocate_var("px"), pb.allocate_var("py")
    pb.set_val(px, P[0])
    pb.set_val(py, P[1])
    qx = ExtVariable.allocate(pb, deg, "qx")
    qy = ExtVariable.allocate(pb, deg, "qy")
    qx.set(pb, Q[0])
    qy.set(pb, Q[1])

    g = ReducedPairingGadget(pb, hc, (px, py), (qx, qy))
    g.generate_r1cs_witness()
    return name, hc, P, Q, pb, g


def test_matches_host_engine(built):
    name, hc, P, Q, pb, g = built
    engine = AtePairing(hc)
    want = engine.reduced_pairing(P, Q)
    got = g.result_values()
    F = hc.g2.F
    assert got[0] == tuple(F.components(want[0]))
    assert got[1] == tuple(F.components(want[1]))


def test_circuit_satisfied(built):
    name, hc, P, Q, pb, g = built
    assert pb.is_satisfied()


def test_tampered_result_rejected(built):
    """Nudging any single wire — here the G1 x input — must break the
    chain of constraints deriving the pairing value."""
    name, hc, P, Q, pb, g = built
    from snark_challenge_prover_tpu.gadgets.protoboard import PBVariable

    var = PBVariable(1)  # px, allocated first
    old = pb.val(var)
    pb.set_val(var, (old + 1) % pb.p)
    assert not pb.is_satisfied()
    pb.set_val(var, old)
    assert pb.is_satisfied()


def test_bilinearity_through_circuit():
    """e(2P, Q) == e(P, Q)^2 with both sides produced by circuits."""
    hc = host_curve("MNT4753")
    engine = AtePairing(hc)
    P = hc.g1.mul(3, hc.g1_gen)
    Q = hc.g2.mul(4, hc.g2_gen)
    P2 = hc.g1.add(P, P)

    pb = Protoboard(hc.g2.F.p)
    px, py = pb.allocate_var(), pb.allocate_var()
    pb.set_val(px, P2[0])
    pb.set_val(py, P2[1])
    qx = ExtVariable.allocate(pb, 2)
    qy = ExtVariable.allocate(pb, 2)
    qx.set(pb, Q[0])
    qy.set(pb, Q[1])
    g = ReducedPairingGadget(pb, hc, (px, py), (qx, qy))
    g.generate_r1cs_witness()
    got = g.result_values()

    base = engine.reduced_pairing(P, Q)
    want = engine.GT.sqr(base)
    F = hc.g2.F
    assert got[0] == tuple(F.components(want[0]))
    assert got[1] == tuple(F.components(want[1]))
