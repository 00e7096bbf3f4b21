"""Extension-field gadgets (gadgets/field_ext_gadgets.py) vs host tower
arithmetic — satisfiability, value correctness, tamper rejection, and
product counts matching the documented constraint budget.
"""

import random

import pytest

from snark_challenge_prover_tpu.gadgets.field_ext_gadgets import (
    ExtInvGadget,
    ExtVariable,
    Fp2MulGadget,
    Fp2SqrGadget,
    Fp3MulGadget,
    Tower2MulGadget,
    Tower2Variable,
)
from snark_challenge_prover_tpu.gadgets.protoboard import Protoboard
from snark_challenge_prover_tpu.host.curves import HostExt
from snark_challenge_prover_tpu.models import mnt4753, mnt6753

P4 = mnt4753.get().Fq.p  # Fq of MNT4753 (Fp2/Fp4 towers, nr = 13)
P6 = mnt6753.get().Fq.p  # Fq of MNT6753 (Fp3/Fp6 towers, nr = 11)
NR4 = 13
NR6 = 11


def _alloc_set(pb, deg, vals):
    x = ExtVariable.allocate(pb, deg)
    x.set(pb, vals)
    return x


def test_fp2_mul_matches_host():
    rng = random.Random(5)
    F2 = HostExt(P4, 2, NR4)
    pb = Protoboard(P4)
    av = (rng.randrange(P4), rng.randrange(P4))
    bv = (rng.randrange(P4), rng.randrange(P4))
    a = _alloc_set(pb, 2, av)
    b = _alloc_set(pb, 2, bv)
    out = ExtVariable.allocate(pb, 2)
    g = Fp2MulGadget(pb, NR4, a, b, out)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert out.values(pb) == F2.mul(av, bv)
    # 3 products + 2 linear rows
    assert pb.num_constraints == 5


def test_fp2_mul_tamper_rejected():
    pb = Protoboard(P4)
    a = _alloc_set(pb, 2, (3, 4))
    b = _alloc_set(pb, 2, (5, 6))
    out = ExtVariable.allocate(pb, 2)
    g = Fp2MulGadget(pb, NR4, a, b, out)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    (idx, _), = out.comps[0].terms
    from snark_challenge_prover_tpu.gadgets.protoboard import PBVariable

    pb.set_val(PBVariable(idx), (pb.lc_val(out.comps[0]) + 1) % P4)
    assert not pb.is_satisfied()


def test_fp2_sqr_matches_host():
    rng = random.Random(6)
    F2 = HostExt(P4, 2, NR4)
    pb = Protoboard(P4)
    av = (rng.randrange(P4), rng.randrange(P4))
    a = _alloc_set(pb, 2, av)
    out = ExtVariable.allocate(pb, 2)
    g = Fp2SqrGadget(pb, NR4, a, out)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert out.values(pb) == F2.sqr(av)
    assert pb.num_constraints == 4  # 2 products + 2 linear


def test_fp3_mul_matches_host():
    rng = random.Random(7)
    F3 = HostExt(P6, 3, NR6)
    pb = Protoboard(P6)
    av = tuple(rng.randrange(P6) for _ in range(3))
    bv = tuple(rng.randrange(P6) for _ in range(3))
    a = _alloc_set(pb, 3, av)
    b = _alloc_set(pb, 3, bv)
    out = ExtVariable.allocate(pb, 3)
    g = Fp3MulGadget(pb, NR6, a, b, out)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert out.values(pb) == F3.mul(av, bv)
    assert pb.num_constraints == 9  # 6 products + 3 linear


@pytest.mark.parametrize(
    "p,base_deg,nr", [(P4, 2, NR4), (P6, 3, NR6)], ids=["fp4", "fp6"]
)
def test_tower2_mul_matches_host_gt(p, base_deg, nr):
    """Fp4 = Fp2[v]/(v^2-u) (MNT4753 GT) and Fp6 = Fp3[v]/(v^2-u)
    (MNT6753 GT) against host GT multiplication (ate_pairing.HostGT)."""
    from snark_challenge_prover_tpu.host.curves import host_curve
    from snark_challenge_prover_tpu.proof_systems.ate_pairing import HostGT

    rng = random.Random(8)
    hc = host_curve("MNT4753" if base_deg == 2 else "MNT6753")
    gt = HostGT(hc.g2.F)  # base = the same quadratic/cubic extension

    pb = Protoboard(p)
    av = tuple(
        tuple(rng.randrange(p) for _ in range(base_deg)) for _ in range(2)
    )
    bv = tuple(
        tuple(rng.randrange(p) for _ in range(base_deg)) for _ in range(2)
    )
    a = Tower2Variable.allocate(pb, base_deg)
    b = Tower2Variable.allocate(pb, base_deg)
    a.set(pb, av)
    b.set(pb, bv)
    out = Tower2Variable.allocate(pb, base_deg)
    g = Tower2MulGadget(pb, base_deg, nr, a, b, out)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    assert out.values(pb) == gt.mul(av, bv)


@pytest.mark.parametrize("deg,p,nr", [(2, P4, NR4), (3, P6, NR6)],
                         ids=["fp2", "fp3"])
def test_inverse_gadget(deg, p, nr):
    rng = random.Random(9)
    pb = Protoboard(p)
    av = tuple(rng.randrange(1, p) for _ in range(deg))
    a = _alloc_set(pb, deg, av)
    inv = ExtVariable.allocate(pb, deg)
    g = ExtInvGadget(pb, deg, nr, a, inv)
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    F = HostExt(p, deg, nr)
    assert F.mul(av, inv.values(pb)) == F.from_components(
        [1] + [0] * (deg - 1)
    )
