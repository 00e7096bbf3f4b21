"""camlsnark_* C ABI (native/caml_ffi.cpp) through the ctypes bridge:
the framework analogue of the reference's OCaml FFI surface
(libsnark/caml/caml_mnt4753.cpp) — field/bigint arithmetic, protoboard
circuit construction, constraint-system digest, and the prove-side
hand-off into the TPU proof systems.
"""

import hashlib
import random

import pytest

pytest.importorskip("ctypes")

from snark_challenge_prover_tpu.io import caml_ffi as cf

if cf.load() is None:
    pytest.skip("libcamlsnark.so unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def ffi():
    return cf.CamlFFI("MNT4753")


def test_modulus_matches_framework(ffi):
    from snark_challenge_prover_tpu.models import mnt4753

    assert ffi.modulus() == mnt4753.get().Fr.p


def test_field_arithmetic_roundtrip(ffi):
    p = ffi.modulus()
    rng = random.Random(3)
    for _ in range(10):
        a, b = rng.randrange(p), rng.randrange(p)
        fa, fb = ffi.field_of_int_value(a), ffi.field_of_int_value(b)
        fm = ffi("field_mul", fa, fb)
        fs = ffi("field_add", fa, fb)
        fi = ffi("field_inv", fa)
        assert ffi.field_to_int(fm) == a * b % p
        assert ffi.field_to_int(fs) == (a + b) % p
        assert ffi.field_to_int(fi) == pow(a, -1, p)
        for h in (fa, fb, fm, fs, fi):
            ffi("field_delete", h, restype=None)


def test_field_sqrt(ffi):
    import ctypes

    p = ffi.modulus()
    a = 12345
    sq = ffi.field_of_int_value(a * a % p)
    assert ffi("field_is_square", sq, restype=ctypes.c_bool)
    root_h = ffi("field_sqrt", sq)
    root = ffi.field_to_int(root_h)
    assert root * root % p == a * a % p


def test_bigint_ops(ffi):
    import ctypes

    x = ffi("bigint_r_of_decimal_string", b"123456789123456789123456789")
    y = ffi("bigint_r_of_decimal_string", b"1000000007")
    q = ffi("bigint_r_div", x, y)
    qi = ffi.fn(
        "bigint_r_to_data", restype=ctypes.POINTER(ctypes.c_char)
    )(q)
    val = int.from_bytes(ctypes.string_at(qi, 96), "little")
    assert val == 123456789123456789123456789 // 1000000007
    assert ffi("bigint_r_compare", x, y, restype=ctypes.c_int) > 0
    assert ffi("bigint_r_test_bit", x, 0, restype=ctypes.c_bool) == bool(
        123456789123456789123456789 & 1
    )


def test_find_wnaf_reconstructs(ffi):
    import ctypes

    s = 0xDEADBEEF12345678951413
    raw = s.to_bytes(96, "little")
    big = ffi("bigint_r_of_data", raw)
    w = 4
    naf = ffi("bigint_r_find_wnaf", w, big)
    n = ffi("long_vector_length", naf, restype=ctypes.c_int)
    digits = [
        ffi("long_vector_get", naf, i, restype=ctypes.c_long)
        for i in range(n)
    ]
    # wNAF invariants + reconstruction
    assert sum(d << i for i, d in enumerate(digits)) == s
    assert all(d == 0 or d % 2 for d in digits)
    assert all(abs(d) < (1 << (w + 1)) for d in digits)


def _build_product_circuit(pb):
    """x (primary) = a * b (auxiliary): one constraint a*b = x."""
    x = pb.allocate()
    a = pb.allocate()
    b = pb.allocate()
    pb.set_input_sizes(1)
    pb.set(a, 37)
    pb.set(b, 11)
    pb.set(x, 37 * 11)
    pb.add_constraint(
        pb.lc([(1, a)]), pb.lc([(1, b)]), pb.lc([(1, x)])
    )
    return x, a, b


def test_protoboard_extract(ffi):
    """Native circuit construction -> extraction into relations.r1cs."""
    pb = ffi.protoboard()
    _build_product_circuit(pb)
    assert pb.num_variables() == 3
    cs, primary, aux = pb.extract()
    assert cs.num_constraints == 1
    assert primary == [37 * 11]
    assert aux == [37, 11]
    assert cs.is_satisfied(primary, aux)
    assert not cs.is_satisfied([5], aux)


def _build_chain_circuit_ffi(pb, p, num_constraints, num_inputs, rng):
    """The r1cs_examples.tcc field-input chain, built through the C ABI
    — same SHAPE as relations.examples.generate_r1cs_example_with_
    field_input so device compiles hit the persistent cache."""
    n_vars = num_constraints + 2
    vars_ = [pb.allocate() for _ in range(n_vars)]
    pb.set_input_sizes(num_inputs)
    assignment = []
    a, b = rng.randrange(p), rng.randrange(p)
    assignment += [a, b]
    for i in range(num_constraints - 1):
        if i % 2:
            A = pb.lc([(1, vars_[i])])
            B = pb.lc([(1, vars_[i + 1])])
            tmp = a * b % p
        else:
            A = pb.lc([(1, vars_[i]), (1, vars_[i + 1])])
            B = pb.lc([(1, 0)])
            tmp = (a + b) % p
        C = pb.lc([(1, vars_[i + 2])])
        assignment.append(tmp)
        a, b = b, tmp
        pb.add_constraint(A, B, C)
    fin = sum(assignment) % p
    A = pb.lc([(1, v) for v in vars_[:-1]])
    B = pb.lc([(1, v) for v in vars_[:-1]])
    C = pb.lc([(1, vars_[-1])])
    pb.add_constraint(A, B, C)
    assignment.append(fin * fin % p)
    for v, val in zip(vars_, assignment):
        pb.set(v, val)


def test_protoboard_to_device_groth16(ffi):
    """Native circuit construction -> extract -> TPU Groth16 round-trip
    (the Mina keypair_create/proof_create path, proving on device) —
    the chain circuit mirrors relations.examples at (5, 2), so the
    jitted keygen/prover programs are persistent-cache hits."""
    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.proof_systems import groth16_full as g16

    model = mnt4753.get()
    p = model.Fr.p
    pb = ffi.protoboard()
    rng = random.Random(42)
    _build_chain_circuit_ffi(pb, p, 5, 2, rng)
    cs, primary, aux = pb.extract()
    assert cs.num_constraints == 5  # 4 chain constraints + closing square
    assert cs.primary_input_size == 2
    assert cs.is_satisfied(primary, aux)

    # structural cross-check vs the framework's own example generator
    from snark_challenge_prover_tpu.relations.examples import (
        generate_r1cs_example_with_field_input,
    )

    ex = generate_r1cs_example_with_field_input(p, 5, 2, random.Random(42))
    assert ex.constraint_system.num_constraints == cs.num_constraints
    assert ex.primary_input == primary
    assert ex.auxiliary_input == aux

    rng = random.Random(11)
    kp = g16.generator(model, cs, rng)
    proof = g16.prover(model, kp.pk, primary, aux, rng)
    assert g16.verifier_strong_IC(kp.vk, primary, proof)
    bad = list(primary)
    bad[0] = (bad[0] + 1) % p
    assert not g16.verifier_strong_IC(kp.vk, bad, proof)


def test_digest_matches_reference_layout(ffi):
    """The native MD5 digest hashes (size_t index, 96-byte canonical
    coeff) per term (caml_mnt4753.cpp:493-524) — reproduce in Python."""
    pb = ffi.protoboard()
    _build_product_circuit(pb)
    got = pb.digest()

    h = hashlib.md5()
    for idx in (2, 3, 1):  # a, b, x term indices in insertion order
        h.update(idx.to_bytes(8, "little"))
        h.update((1).to_bytes(96, "little"))
    assert got == h.digest()


def test_renumber_and_append(ffi):
    """Substitute variable 1 by 2*v2, shift the rest — the snarky
    circuit-splicing primitive (caml_mnt4753.cpp:79-139)."""
    import ctypes

    pb = ffi.protoboard()
    v1 = pb.allocate()
    v2 = pb.allocate()
    pb.add_constraint(
        pb.lc([(1, v1)]), pb.lc([(1, 0)]), pb.lc([(1, v2)])
    )
    target = ffi("r1cs_constraint_system_create")
    changes = ffi("linear_combination_vector_create")
    sub = pb.lc([(2, 5)])  # v1 -> 2 * wire5
    ffi("linear_combination_vector_emplace_back", changes, sub, restype=None)
    ffi(
        "protoboard_renumber_and_append_constraints",
        pb.pb, target, changes, 10, restype=None,
    )
    n = ffi(
        "r1cs_constraint_system_num_constraints",
        target, restype=ctypes.c_size_t,
    )
    assert n == 1
    ffi("r1cs_constraint_system_delete", target, restype=None)


def test_mnt6753_prefix_exists():
    ffi6 = cf.CamlFFI("MNT6753")
    from snark_challenge_prover_tpu.models import mnt6753

    assert ffi6.modulus() == mnt6753.get().Fr.p
