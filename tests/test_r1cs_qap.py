"""R1CS relation + R1CS->QAP reduction tests.

Mirrors the reference's relation/reduction coverage: example circuits
must be satisfied (r1cs_examples.tcc sanity asserts), and the witness
map's H must satisfy A(t)B(t) - C(t) = H(t)Z(t) at a random point —
the QAP divisibility property the Groth16 proof encodes
(r1cs_to_qap.tcc:82-99)."""

import random

import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.relations.examples import (
    generate_r1cs_example_with_binary_input,
    generate_r1cs_example_with_field_input,
)
from snark_challenge_prover_tpu.relations.r1cs import LinearCombination as LC
from snark_challenge_prover_tpu.reductions import r1cs_to_qap as qap
from snark_challenge_prover_tpu.utils.bigint import limbs_to_ints


def test_field_input_example_satisfied(rng):
    p = mnt4753.get().Fr.p
    ex = generate_r1cs_example_with_field_input(p, 7, 2, rng)
    cs = ex.constraint_system
    assert cs.num_constraints == 7
    assert cs.primary_input_size == 2
    assert cs.is_valid()
    assert cs.is_satisfied(ex.primary_input, ex.auxiliary_input)
    # tampered witness must fail
    bad = list(ex.auxiliary_input)
    bad[0] = (bad[0] + 1) % p
    assert not cs.is_satisfied(ex.primary_input, bad)


def test_binary_input_example_satisfied(rng):
    p = mnt6753.get().Fr.p
    ex = generate_r1cs_example_with_binary_input(p, 10, 3, rng)
    assert ex.constraint_system.is_satisfied(ex.primary_input, ex.auxiliary_input)


def test_swap_AB_if_beneficial():
    p = mnt4753.get().Fr.p
    from snark_challenge_prover_tpu.relations.r1cs import (
        R1CSConstraint,
        R1CSConstraintSystem,
    )

    cs = R1CSConstraintSystem(p, primary_input_size=1, auxiliary_input_size=3)
    # B touches more non-input variables than A -> must swap
    cs.add_constraint(R1CSConstraint(LC.of_var(1), LC.of_var(2) + LC.of_var(3), LC.of_var(4)))
    assert cs.swap_AB_if_beneficial()
    assert [i for i, _ in cs.constraints[0].a.terms] == [2, 3]
    # now A is denser: no second swap
    assert not cs.swap_AB_if_beneficial()


def test_lc_evaluate():
    p = 101
    lc = LC.of_var(0, 5) + LC.of_var(2, 3) - LC.of_var(1, 1)
    # <lc, (1, x1=10, x2=7)> = 5 + 21 - 10 = 16
    assert lc.evaluate([10, 7], p) == 16
    assert lc.collate(p) == {0: 5, 2: 3, 1: 100}


@pytest.mark.parametrize("model_get", [mnt4753.get, mnt6753.get])
def test_qap_divisibility(model_get, rng):
    model = model_get()
    p = model.Fr.p
    ex = generate_r1cs_example_with_field_input(p, 5, 2, rng)
    cs = ex.constraint_system

    t = rng.randrange(1, p)
    inst = qap.instance_map_with_evaluation(cs, t, model.Fr)
    full, H = qap.witness_map(model, cs, ex.primary_input, ex.auxiliary_input)
    H_ints = [model.Fr.spec.from_mont(v) for v in limbs_to_ints(np.asarray(H))]

    w = [1] + full
    A_t = sum(a * wi for a, wi in zip(inst.At, w)) % p
    B_t = sum(b * wi for b, wi in zip(inst.Bt, w)) % p
    C_t = sum(c * wi for c, wi in zip(inst.Ct, w)) % p
    H_t = sum(h * pow(t, i, p) for i, h in enumerate(H_ints)) % p
    assert (A_t * B_t - C_t) % p == H_t * inst.Zt % p


def test_qap_divisibility_blinded(rng):
    model = mnt4753.get()
    p = model.Fr.p
    ex = generate_r1cs_example_with_field_input(p, 5, 2, rng)
    cs = ex.constraint_system
    t = rng.randrange(1, p)
    inst = qap.instance_map_with_evaluation(cs, t, model.Fr)
    d1, d2, d3 = (rng.randrange(p) for _ in range(3))
    full, H = qap.witness_map(model, cs, ex.primary_input, ex.auxiliary_input, d1, d2, d3)
    H_ints = [model.Fr.spec.from_mont(v) for v in limbs_to_ints(np.asarray(H))]
    w = [1] + full
    A_t = (sum(a * wi for a, wi in zip(inst.At, w)) + d1 * inst.Zt) % p
    B_t = (sum(b * wi for b, wi in zip(inst.Bt, w)) + d2 * inst.Zt) % p
    C_t = (sum(c * wi for c, wi in zip(inst.Ct, w)) + d3 * inst.Zt) % p
    H_t = sum(h * pow(t, i, p) for i, h in enumerate(H_ints)) % p
    assert (A_t * B_t - C_t) % p == H_t * inst.Zt % p
