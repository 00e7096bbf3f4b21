"""G1/G2 curve-operation gadgets (gadgets/curve_gadgets.py) vs the host
curve groups — the framework analogue of libsnark's
test_weierstrass_gadgets (gadgetlib1/gadgets/curves/tests).
"""

import random

import pytest

from snark_challenge_prover_tpu.gadgets.curve_gadgets import (
    G1AddGadget,
    G1CheckerGadget,
    G1DoubleGadget,
    G2AddGadget,
    G2CheckerGadget,
)
from snark_challenge_prover_tpu.gadgets.field_ext_gadgets import ExtVariable
from snark_challenge_prover_tpu.gadgets.protoboard import Protoboard
from snark_challenge_prover_tpu.host.curves import host_curve
from snark_challenge_prover_tpu.models import mnt4753, mnt6753


@pytest.fixture(scope="module")
def hc4():
    return host_curve("MNT4753")


def _g1_consts(name):
    m = mnt4753.get() if name == "MNT4753" else mnt6753.get()
    import numpy as np

    # host ints of the curve coefficients
    from snark_challenge_prover_tpu.utils.bigint import limbs_to_int

    hc = host_curve(name)
    return hc, hc.g1.a, hc.g1.b


def test_g1_add_matches_host(hc4):
    hc = hc4
    P = hc.g1.mul(7, hc.g1_gen)
    Q = hc.g1.mul(11, hc.g1_gen)
    R = hc.g1.add(P, Q)
    pb = Protoboard(hc.g1.F.p)
    vars_ = {n: pb.allocate_var(n) for n in ("x1", "y1", "x2", "y2", "x3", "y3")}
    for n, v in zip(("x1", "y1", "x2", "y2"), (*P, *Q)):
        pb.set_val(vars_[n], v)
    g = G1AddGadget(
        pb,
        (vars_["x1"], vars_["y1"]),
        (vars_["x2"], vars_["y2"]),
        (vars_["x3"], vars_["y3"]),
    )
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert (pb.val(vars_["x3"]), pb.val(vars_["y3"])) == R
    assert pb.num_constraints == 3
    # tamper
    pb.set_val(vars_["y3"], (pb.val(vars_["y3"]) + 1) % pb.p)
    assert not pb.is_satisfied()


def test_g1_double_matches_host(hc4):
    hc = hc4
    P = hc.g1.mul(9, hc.g1_gen)
    R = hc.g1.add(P, P)
    pb = Protoboard(hc.g1.F.p)
    x1, y1, x3, y3 = (pb.allocate_var() for _ in range(4))
    pb.set_val(x1, P[0])
    pb.set_val(y1, P[1])
    g = G1DoubleGadget(pb, hc.g1.a, (x1, y1), (x3, y3))
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert (pb.val(x3), pb.val(y3)) == R
    assert pb.num_constraints == 4


def test_g1_checker(hc4):
    hc = hc4
    P = hc.g1.mul(5, hc.g1_gen)
    pb = Protoboard(hc.g1.F.p)
    x, y = pb.allocate_var(), pb.allocate_var()
    pb.set_val(x, P[0])
    pb.set_val(y, P[1])
    g = G1CheckerGadget(pb, hc.g1.a, hc.g1.b, (x, y))
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert pb.num_constraints == 3
    # a non-point fails
    pb.set_val(y, (P[1] + 1) % pb.p)
    g.generate_r1cs_witness()
    assert not pb.is_satisfied()


@pytest.mark.parametrize("name,deg,nr", [("MNT4753", 2, 13), ("MNT6753", 3, 11)],
                         ids=["g2-mnt4", "g2-mnt6"])
def test_g2_add_matches_host(name, deg, nr):
    hc = host_curve(name)
    P = hc.g2.mul(3, hc.g2_gen)
    Q = hc.g2.mul(8, hc.g2_gen)
    R = hc.g2.add(P, Q)
    pb = Protoboard(hc.g2.F.p)

    def mk(pt):
        x = ExtVariable.allocate(pb, deg)
        y = ExtVariable.allocate(pb, deg)
        x.set(pb, pt[0])
        y.set(pb, pt[1])
        return (x, y)

    p1, p2 = mk(P), mk(Q)
    res = (ExtVariable.allocate(pb, deg), ExtVariable.allocate(pb, deg))
    g = G2AddGadget(pb, deg, nr, p1, p2, res)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert (res[0].values(pb), res[1].values(pb)) == R


@pytest.mark.parametrize("name,deg,nr", [("MNT4753", 2, 13), ("MNT6753", 3, 11)],
                         ids=["g2-mnt4", "g2-mnt6"])
def test_g2_checker(name, deg, nr):
    hc = host_curve(name)
    P = hc.g2.mul(6, hc.g2_gen)
    pb = Protoboard(hc.g2.F.p)
    x = ExtVariable.allocate(pb, deg)
    y = ExtVariable.allocate(pb, deg)
    x.set(pb, P[0])
    y.set(pb, P[1])
    a2 = hc.g2.F.components(hc.g2.a)
    b2 = hc.g2.F.components(hc.g2.b)
    g = G2CheckerGadget(pb, deg, nr, a2, b2, (x, y))
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    # tamper: shift y off the curve
    y.set(pb, tuple((c + 1) % pb.p for c in P[1]))
    g.generate_r1cs_witness()
    assert not pb.is_satisfied()
