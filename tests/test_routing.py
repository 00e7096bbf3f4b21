"""Benes routing-network gadget (gadgets/routing.py): satisfiability,
output correctness, tamper rejection — pure host circuit checks, the
framework analogue of libsnark's test_routing_gadgets
(gadgetlib1/gadgets/routing/).
"""

import itertools
import random

import pytest

from snark_challenge_prover_tpu.gadgets.protoboard import Protoboard
from snark_challenge_prover_tpu.gadgets.routing import (
    BenesRoutingGadget,
    route_benes,
)
from snark_challenge_prover_tpu.models import mnt4753

P = mnt4753.get().Fr.p


def _setup(n, lines, sigma, values=None):
    pb = Protoboard(P)
    ins = []
    for i in range(n):
        pkt = [pb.allocate_var(f"in{i}.{l}") for l in range(lines)]
        for l, v in enumerate(
            values[i] if values else [i * 10 + l for l in range(lines)]
        ):
            pb.set_val(pkt[l], v)
        ins.append(pkt)
    g = route_benes(pb, ins, sigma)
    return pb, ins, g


@pytest.mark.parametrize("n", [2, 4, 8])
def test_all_small_permutations(n):
    """Exhaustive for n=2,4; sampled for n=8."""
    perms = (
        list(itertools.permutations(range(n)))
        if n <= 4
        else [random.Random(s).sample(range(n), n) for s in range(10)]
    )
    for sigma in perms:
        pb, ins, g = _setup(n, 2, list(sigma))
        assert pb.is_satisfied(), f"unsat for sigma={sigma}"
        for j in range(n):
            for l in range(2):
                assert pb.val(g.outputs[j][l]) == pb.val(ins[sigma[j]][l]), (
                    f"wrong routing for sigma={sigma}"
                )


def test_larger_network_random():
    rng = random.Random(99)
    n, lines = 16, 3
    sigma = rng.sample(range(n), n)
    vals = [[rng.randrange(P) for _ in range(lines)] for _ in range(n)]
    pb, ins, g = _setup(n, lines, sigma, vals)
    assert pb.is_satisfied()
    for j in range(n):
        assert [pb.val(v) for v in g.outputs[j]] == vals[sigma[j]]


def test_constraint_count():
    """S switches, each 1 boolean + 2 per line: Benes has
    n/2 * (2 log2 n - 1) switches."""
    import math

    n, lines = 8, 2
    pb, ins, g = _setup(n, lines, list(range(n)))
    S = n // 2 * (2 * int(math.log2(n)) - 1)
    assert pb.num_constraints == S * (1 + 2 * lines)


def test_tampered_switch_rejected():
    pb, ins, g = _setup(4, 1, [1, 0, 3, 2])
    assert pb.is_satisfied()
    # flip one routed output value
    var = g.outputs[0][0]
    pb.set_val(var, (pb.val(var) + 1) % P)
    assert not pb.is_satisfied()


def test_non_power_of_two_rejected():
    pb = Protoboard(P)
    ins = [[pb.allocate_var()] for _ in range(3)]
    with pytest.raises(ValueError):
        BenesRoutingGadget(pb, ins)


# ---------------------------------------------------------------------------
# AS-Waksman (arbitrary N)
# ---------------------------------------------------------------------------

from snark_challenge_prover_tpu.gadgets.routing import (  # noqa: E402
    ASWaksmanRoutingGadget,
    route_as_waksman,
)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 7])
def test_as_waksman_all_small_permutations(n):
    perms = (
        list(itertools.permutations(range(n)))
        if n <= 5
        else [random.Random(s).sample(range(n), n) for s in range(30)]
    )
    for sigma in perms:
        pb = Protoboard(P)
        ins = []
        for i in range(n):
            v = pb.allocate_var()
            pb.set_val(v, i + 100)
            ins.append([v])
        g = route_as_waksman(pb, ins, list(sigma))
        assert pb.is_satisfied(), f"unsat n={n} sigma={sigma}"
        for j in range(n):
            assert pb.val(g.outputs[j][0]) == sigma[j] + 100, (
                f"wrong n={n} sigma={sigma}"
            )


def test_as_waksman_larger_random():
    rng = random.Random(4)
    n = 13
    sigma = rng.sample(range(n), n)
    pb = Protoboard(P)
    ins = []
    vals = []
    for i in range(n):
        v = pb.allocate_var()
        val = rng.randrange(P)
        pb.set_val(v, val)
        vals.append(val)
        ins.append([v])
    g = route_as_waksman(pb, ins, sigma)
    assert pb.is_satisfied()
    for j in range(n):
        assert pb.val(g.outputs[j][0]) == vals[sigma[j]]


def test_as_waksman_fewer_switches_than_benes():
    """For power-of-two N the AS-Waksman saves one switch per level."""
    n = 8
    pb1 = Protoboard(P)
    ins1 = [[pb1.allocate_var()] for _ in range(n)]
    BenesRoutingGadget(pb1, ins1).generate_r1cs_constraints()
    pb2 = Protoboard(P)
    ins2 = [[pb2.allocate_var()] for _ in range(n)]
    ASWaksmanRoutingGadget(pb2, ins2).generate_r1cs_constraints()
    assert pb2.num_constraints < pb1.num_constraints
