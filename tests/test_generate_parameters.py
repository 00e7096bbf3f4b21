"""generate_parameters CLI round-trip (generate_parameters.cpp:24-137
semantics): the generated params/input files must feed straight back
through the prover, and the proof must match the exact-int oracle run on
the very same files — the fixture generator and the prover agree on d, m
and every layout detail (round-1 bug: the CLI asserted m == d where the
reference writes m = d + 1)."""

import hashlib
import io
import struct

import pytest


def _parse_with_oracle(cur, params_path, input_path):
    from tools import oracle as orc

    raw = open(params_path, "rb").read()
    buf = io.BytesIO(raw)
    d = struct.unpack("<Q", buf.read(8))[0]
    m = struct.unpack("<Q", buf.read(8))[0]
    params = {
        "d": d,
        "m": m,
        "A": [orc.read_g1(buf, cur) for _ in range(m + 1)],
        "B1": [orc.read_g1(buf, cur) for _ in range(m + 1)],
        "B2": [orc.read_g2(buf, cur) for _ in range(m + 1)],
        "L": [orc.read_g1(buf, cur) for _ in range(m - 1)],
        "H": [orc.read_g1(buf, cur) for _ in range(d)],
    }
    assert buf.read() == b"", "trailing bytes in params file"

    fp = cur.fr_spec.p
    buf = io.BytesIO(open(input_path, "rb").read())
    inputs = {
        "w": [orc.read_mont(buf, fp) for _ in range(m + 1)],
        "ca": [orc.read_mont(buf, fp) for _ in range(d + 1)],
        "cb": [orc.read_mont(buf, fp) for _ in range(d + 1)],
        "cc": [orc.read_mont(buf, fp) for _ in range(d + 1)],
        "r": orc.read_mont(buf, fp),
    }
    assert buf.read() == b"", "trailing bytes in input file"
    return params, inputs


def test_generate_for_curve_roundtrip(tmp_path):
    import random

    from tools import oracle as orc
    from snark_challenge_prover_tpu.cli_generate_parameters import generate_for_curve
    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.proof_systems.groth16 import ChallengeProver

    model = mnt4753.get()
    rng = random.Random(42)
    pp, ip = generate_for_curve(model, 3, rng, tmp_path)

    cur = orc.mnt4753_oracle()
    params, inputs = _parse_with_oracle(cur, pp, ip)
    assert params["d"] == 7 and params["m"] == 8  # d = 2^3 - 1, m = d + 1

    # every generated point must be on its curve (real proving key, not noise)
    for key in ("A", "B1", "L", "H"):
        for P in params[key]:
            assert cur.g1.is_on_curve(P)
    for P in params["B2"]:
        assert cur.g2.is_on_curve(P)

    want = orc.prove(cur, params, inputs)
    prover = ChallengeProver(model, msm_window=4)
    got = prover.prove_files(str(pp), str(ip))
    assert hashlib.sha256(got).hexdigest() == hashlib.sha256(want).hexdigest()
