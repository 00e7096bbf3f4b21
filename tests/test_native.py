"""Native (C++) loader must agree byte-for-byte with the numpy path —
the framework's version of the reference's dual-implementation
sha256-equality backbone (SURVEY §4)."""

import numpy as np
import pytest

from snark_challenge_prover_tpu.io import native, serialization as ser
from tests.test_e2e import _fixture


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native runtime unavailable (no g++?)")
    return True


def test_repack_matches_numpy(built, nprng):
    from snark_challenge_prover_tpu.utils.bigint import bytes_to_limbs_le

    buf = nprng.integers(0, 256, size=96 * 17, dtype=np.uint8).tobytes()
    want = bytes_to_limbs_le(buf)
    lib = native._load()
    out = np.empty((48, 17), dtype=np.uint32)
    import ctypes

    lib.sc_repack_fq(
        (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf),
        17,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    assert np.array_equal(out, want)


def test_pack_roundtrip(built, nprng):
    planes = nprng.integers(0, 1 << 16, size=(48, 9), dtype=np.uint32)
    data = native.pack_fq(planes)
    from snark_challenge_prover_tpu.utils.bigint import bytes_to_limbs_le

    assert np.array_equal(bytes_to_limbs_le(data), planes)


def test_native_file_loaders_match_numpy(built):
    paths = _fixture("MNT4753")
    p_np = ser.read_params_bytes(open(paths["params"], "rb").read(), 2)
    p_nat = ser.read_params(str(paths["params"]), 2)
    assert p_nat.d == p_np.d and p_nat.m == p_np.m
    for a, b in [
        (p_nat.A, p_np.A), (p_nat.B1, p_np.B1), (p_nat.B2, p_np.B2),
        (p_nat.L, p_np.L), (p_nat.H, p_np.H),
    ]:
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])

    i_np = ser.read_input_bytes(open(paths["input"], "rb").read(), p_np.d, p_np.m)
    i_nat = ser.read_input(str(paths["input"]), p_np.d, p_np.m)
    for a, b in [
        (i_nat.w, i_np.w), (i_nat.ca, i_np.ca), (i_nat.cb, i_np.cb),
        (i_nat.cc, i_np.cc), (i_nat.r, i_np.r),
    ]:
        assert np.array_equal(a, b)
