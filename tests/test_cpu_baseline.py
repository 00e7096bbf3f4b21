"""native/cpu_baseline (the measured CPU comparator, reference
main.cpp pipeline reimplementation) must be byte-exact against the
exact-int oracle on both curves — the same sha256 protocol the
challenge uses (README.md:46-58)."""

import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
EXE = REPO / "native" / "build" / "cpu_baseline"


@pytest.mark.parametrize("curve", ["MNT4753", "MNT6753"])
def test_cpu_baseline_byte_exact(curve, tmp_path):
    if not EXE.exists():
        r = subprocess.run(["make", "-C", str(REPO / "native"), "cpu"])
        if r.returncode or not EXE.exists():
            pytest.skip("native toolchain unavailable")
    from tests.test_e2e import _fixture

    paths = _fixture(curve)
    out = tmp_path / "proof.bin"
    res = subprocess.run(
        [str(EXE), curve, "compute", str(paths["params"]), str(paths["input"]), str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-500:]
    assert out.read_bytes() == paths["output"].read_bytes()
