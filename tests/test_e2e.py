"""End-to-end golden test: byte-exact proof equality with the exact-int
oracle on generated fixtures, for both curves — the framework's version of
the challenge's sha256 comparison (README.md:46-58).

Fixtures are generated once per session by tools/oracle.py and cached
under tests/_fixtures (the reference binary cannot be built in this image;
the oracle is an independent exact implementation of the same spec)."""

import hashlib
import io
from pathlib import Path

import pytest

from tools import oracle as orc
from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.proof_systems.groth16 import ChallengeProver

FIXDIR = Path(__file__).parent / "_fixtures"
LOG2D = 3  # d+1 = 8 — tiny but covers every pipeline stage


def _fixture(curve_name: str):
    FIXDIR.mkdir(exist_ok=True)
    pbase = FIXDIR / f"{curve_name}-{LOG2D}"
    paths = {
        "params": pbase.with_suffix(".params"),
        "input": pbase.with_suffix(".input"),
        "output": pbase.with_suffix(".output"),
    }
    if not all(p.exists() for p in paths.values()):
        cur, params, inputs = orc.generate_fixture(curve_name, LOG2D, seed=11)
        orc.write_params_file(paths["params"], cur, params)
        orc.write_input_file(paths["input"], cur, inputs)
        paths["output"].write_bytes(orc.prove(cur, params, inputs))
    return paths


@pytest.mark.parametrize(
    "curve_name,model_get", [("MNT4753", mnt4753.get), ("MNT6753", mnt6753.get)]
)
def test_challenge_prover_byte_exact(curve_name, model_get):
    paths = _fixture(curve_name)
    prover = ChallengeProver(model_get(), msm_window=4)
    got = prover.prove_files(str(paths["params"]), str(paths["input"]))
    want = paths["output"].read_bytes()
    assert hashlib.sha256(got).hexdigest() == hashlib.sha256(want).hexdigest(), (
        "proof bytes differ from oracle"
    )


def test_serialization_roundtrip():
    """params/input readers consume exactly the oracle's writer output."""
    from snark_challenge_prover_tpu.io import serialization as ser

    paths = _fixture("MNT4753")
    params = ser.read_params(str(paths["params"]), g2_deg=2)
    inp = ser.read_input(str(paths["input"]), params.d, params.m)
    assert params.d == (1 << LOG2D) - 1
    assert params.A[0].shape == (48, params.m + 1)
    assert params.B2[0].shape == (2, 48, params.m + 1)
    assert inp.ca.shape == (48, params.d + 1)
