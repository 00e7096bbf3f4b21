"""GM17 (r1cs_se_ppzksnark) integration tests: the framework analogue of
libsnark's test_r1cs_se_ppzksnark / run_r1cs_se_ppzksnark harness —
generator -> prover -> verifier round-trip on a synthetic R1CS, plus
wrong-input and tamper rejection, on MNT4753.

Also unit-checks the R1CS->SAP reduction: the extended assignment
satisfies every derived square constraint (A(w)^2 = C(w) pointwise on
the domain)."""

import random

import pytest

from snark_challenge_prover_tpu.host.curves import mnt4753_host
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.proof_systems import gm17
from snark_challenge_prover_tpu.reductions import r1cs_to_sap as sap
from snark_challenge_prover_tpu.relations.examples import (
    generate_r1cs_example_with_field_input,
)


def test_sap_reduction_satisfied():
    """The SAP evaluations satisfy aA^2 == aC on the first
    2n_c + 2l + 1 rows (the reduction's constraints), and the instance
    map agrees with direct polynomial evaluation at t."""
    model = mnt4753.get()
    p = model.Fr.p
    rng = random.Random(7)
    ex = generate_r1cs_example_with_field_input(p, 5, 2, rng)
    cs = ex.constraint_system

    full = sap.extended_assignment(cs, ex.primary_input, ex.auxiliary_input)
    aA, aC = sap.assemble_ac_evaluations(cs, full, model.Fr)
    rows = sap.sap_min_size(cs)
    for k in range(rows):
        assert aA[k] * aA[k] % p == aC[k] % p, f"SAP row {k} unsatisfied"

    # instance map vs witness evaluations: sum_i w_i A_i(t) must equal
    # the Lagrange interpolation of aA at t (same for C) — the two
    # independent constructions of the same polynomial evaluation
    from snark_challenge_prover_tpu.ops.fft import get_domain_of_min_size

    t = rng.randrange(1, p)
    inst = sap.instance_map_with_evaluation(cs, t, model.Fr)
    wfull = [1] + full
    A_t = sum(inst.At[i] * wfull[i] for i in range(len(inst.At))) % p
    C_t = sum(inst.Ct[i] * wfull[i] for i in range(len(inst.Ct))) % p
    domain = get_domain_of_min_size(model.Fr, sap.sap_min_size(cs))
    u = [int(v) for v in domain.evaluate_all_lagrange_polynomials(t)]
    A_interp = sum(aA[k] * u[k] for k in range(len(aA))) % p
    C_interp = sum(aC[k] * u[k] for k in range(len(aC))) % p
    assert A_t == A_interp
    assert C_t == C_interp


@pytest.fixture(scope="module")
def roundtrip():
    model = mnt4753.get()
    rng = random.Random(42)
    ex = generate_r1cs_example_with_field_input(model.Fr.p, 5, 2, rng)
    kp = gm17.generator(model, ex.constraint_system, rng)
    proof = gm17.prover(model, kp.pk, ex.primary_input, ex.auxiliary_input, rng)
    return model, ex, kp, proof


def test_proof_verifies(roundtrip):
    model, ex, kp, proof = roundtrip
    assert gm17.verifier_strong_IC(kp.vk, ex.primary_input, proof)
    assert gm17.verifier_weak_IC(kp.vk, ex.primary_input, proof)


def test_wrong_input_rejected(roundtrip):
    model, ex, kp, proof = roundtrip
    p = model.Fr.p
    bad = list(ex.primary_input)
    bad[0] = (bad[0] + 1) % p
    assert not gm17.verifier_strong_IC(kp.vk, bad, proof)


def test_strong_ic_length_check(roundtrip):
    model, ex, kp, proof = roundtrip
    assert not gm17.verifier_strong_IC(kp.vk, ex.primary_input[:1], proof)


def test_tampered_proof_rejected(roundtrip):
    model, ex, kp, proof = roundtrip
    hc = mnt4753_host()
    bad = gm17.Proof(A=hc.g1.add(proof.A, hc.g1_gen), B=proof.B, C=proof.C)
    assert not gm17.verifier_strong_IC(kp.vk, ex.primary_input, bad)
    bad2 = gm17.Proof(A=proof.A, B=proof.B, C=hc.g1.add(proof.C, hc.g1_gen))
    assert not gm17.verifier_strong_IC(kp.vk, ex.primary_input, bad2)


def test_proof_elements_on_curve(roundtrip):
    model, ex, kp, proof = roundtrip
    hc = mnt4753_host()
    assert hc.g1.is_on_curve(proof.A)
    assert hc.g2.is_on_curve(proof.B)
    assert hc.g1.is_on_curve(proof.C)
