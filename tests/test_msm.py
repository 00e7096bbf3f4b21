"""MSM vs the exact-int oracle.

Digit extraction is verified exhaustively at full 753-bit width (cheap,
host-checkable); the EC pipeline is exercised with 64-bit scalars (same
code path, W=8 windows) to keep CPU runtime sane, plus identity/zero/
duplicate-bucket edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.oracle import mnt4753_oracle, mnt6753_oracle
from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.ops import msm as msm_mod
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

from tests.test_group import _pack_pts, _unpack_pts


def test_window_digits_fullwidth(rng):
    xs = [rng.getrandbits(753) for _ in range(5)] + [0, (1 << 753) - 1]
    arr = jnp.asarray(ints_to_limbs(xs))
    for c in (4, 8, 13, 16):
        digs = np.asarray(msm_mod.window_digits(arr, c))
        W = (753 + c - 1) // c
        assert digs.shape == (W, len(xs))
        for j, x in enumerate(xs):
            for w in range(W):
                assert digs[w, j] == (x >> (w * c)) & ((1 << c) - 1), (c, w, j)


@pytest.mark.parametrize(
    "model_get,oracle_get,grp",
    [
        (mnt4753.get, mnt4753_oracle, "g1"),
        (mnt4753.get, mnt4753_oracle, "g2"),
        (mnt6753.get, mnt6753_oracle, "g1"),
    ],
    ids=["m4-g1", "m4-g2", "m6-g1"],
)
def test_msm_small_scalars(model_get, oracle_get, grp, rng):
    model = model_get()
    ocur = oracle_get()
    OG = getattr(ocur, grp)
    gen = ocur.g1_gen if grp == "g1" else ocur.g2_gen
    G = model.G1 if grp == "g1" else model.G2
    spec = model.Fq.spec

    N = 13
    pts = [OG.mul(rng.getrandbits(48) | 1, gen) for _ in range(N - 2)]
    pts += [None, pts[0]]  # identity point + duplicate point
    scalars = [rng.getrandbits(64) for _ in range(N - 3)] + [0, 1, rng.getrandbits(64)]

    want = None
    for s, P in zip(scalars, pts):
        want = OG.add(want, OG.mul(s, P))

    P = _pack_pts(G, model.Fq, spec, pts)
    S = jnp.asarray(ints_to_limbs(scalars))

    # exercise several window widths incl. digit collisions; scalar_bits=64
    # bounds the Horner chain (full-width digit slicing is covered by
    # test_window_digits_fullwidth and the e2e golden test).  The "tree"
    # run covers the work-efficient Ladner-Fischer scan + the
    # group-subtraction segment totals.
    for c, impl in ((4, "hillis"), (8, "hillis"), (5, "tree")):
        out = jax.jit(
            lambda p, s: msm_mod.msm(G, p, s, c, scalar_bits=64, scan_impl=impl)
        )(P, S)
        got = _unpack_pts(G, spec, out)
        assert got == [want], f"c={c} impl={impl}"


@pytest.mark.parametrize(
    "model_get,oracle_get,grp",
    [
        (mnt4753.get, mnt4753_oracle, "g1"),
        (mnt4753.get, mnt4753_oracle, "g2"),
        (mnt6753.get, mnt6753_oracle, "g1"),
    ],
    ids=["m4-g1", "m4-g2", "m6-g1"],
)
def test_msm_full_width_scalars(model_get, oracle_get, grp, rng):
    """753-bit scalars exercise the W=84-189 window-count regime where
    both round-1 TPU faults lived (VERDICT items 1/7).  Heavy on CPU
    (gate: SNARK_TPU_HEAVY_TESTS), always-on when a TPU is attached."""
    import os

    if jax.default_backend() != "tpu" and not os.environ.get(
        "SNARK_TPU_HEAVY_TESTS"
    ):
        pytest.skip("full-width MSM on CPU is minutes-slow; set SNARK_TPU_HEAVY_TESTS=1")

    model = model_get()
    ocur = oracle_get()
    OG = getattr(ocur, grp)
    gen = ocur.g1_gen if grp == "g1" else ocur.g2_gen
    G = model.G1 if grp == "g1" else model.G2
    spec = model.Fq.spec

    N = 8
    pts = [OG.mul(rng.getrandbits(40) | 1, gen) for _ in range(N - 1)] + [None]
    scalars = [rng.getrandbits(753) for _ in range(N - 2)] + [0, model.Fr.p - 1]

    want = None
    for s, P in zip(scalars, pts):
        want = OG.add(want, OG.mul(s, P))

    P = _pack_pts(G, model.Fq, spec, pts)
    S = jnp.asarray(ints_to_limbs(scalars))

    # the uniform G2 window policy (TPU floors c at 8; CPU keeps c)
    c = msm_mod.g2_window_bits(N, 4) if grp == "g2" else 4
    out = jax.jit(lambda p, s: msm_mod.msm(G, p, s, c))(P, S)
    got = _unpack_pts(G, spec, out)
    assert got == [want], f"c={c}"


def test_msm_multi_matches_singles(rng):
    model = mnt4753.get()
    ocur = mnt4753_oracle()
    G = model.G1
    spec = model.Fq.spec

    lens = [7, 11]
    all_pts, all_scal, wants = [], [], []
    for n in lens:
        pts = [ocur.g1.mul(rng.getrandbits(40) | 1, ocur.g1_gen) for _ in range(n)]
        scal = [rng.getrandbits(64) for _ in range(n)]
        want = None
        for s, P in zip(scal, pts):
            want = ocur.g1.add(want, ocur.g1.mul(s, P))
        all_pts.append(_pack_pts(G, model.Fq, spec, pts))
        all_scal.append(jnp.asarray(ints_to_limbs(scal)))
        wants.append(want)

    pts_m, scal_m = msm_mod.pad_and_stack(model.Fr, all_pts, all_scal)
    out = jax.jit(
        lambda p, s: msm_mod.msm_multi(G, p, s, 6, scalar_bits=64)
    )(pts_m, scal_m)
    got = _unpack_pts(G, spec, out)
    assert got == wants


@pytest.mark.parametrize("impl", ["hillis", "tree", "bitrev"])
def test_msm_staged_matches_oracle(rng, monkeypatch, impl):
    """msm_multi_staged (the TPU execution path: host loop of bucket +
    triangle programs split at the scatter boundary — PLAN.md round-3
    root cause) == host oracle, with chunking forced so the N-chunk
    bucket-accumulation fold is exercised.  "bitrev" is the TPU default
    (bit-reversed contiguous-halves Blelloch — no stride-2 relayouts);
    "tree" the work-efficient Ladner-Fischer; "hillis" the CPU
    default."""
    monkeypatch.setenv("SNARK_TPU_MSM_LANES", "1024")  # force n_chunks > 1
    model = mnt4753.get()
    ocur = mnt4753_oracle()
    G = model.G1
    spec = model.Fq.spec

    # N=200 > the 128-lane chunk floor so n_chunks=2 with the 1024 cap
    M, N = 2, 200
    all_pts, all_scal, wants = [], [], []
    for i in range(M):
        uniq = [ocur.g1.mul(rng.getrandbits(40) | 1, ocur.g1_gen) for _ in range(16)]
        pts = [uniq[j % 16] for j in range(N)]
        pts[3] = None  # identity in the stream
        scal = [rng.getrandbits(64) for _ in range(N)]
        scal[5] = 0
        want = None
        for s, P in zip(scal, pts):
            want = ocur.g1.add(want, ocur.g1.mul(s, P))
        all_pts.append(_pack_pts(G, model.Fq, spec, pts))
        all_scal.append(jnp.asarray(ints_to_limbs(scal)))
        wants.append(want)

    pts_m, scal_m = msm_mod.pad_and_stack(model.Fr, all_pts, all_scal)
    out = msm_mod.msm_multi_staged(G, pts_m, scal_m, c=5, scalar_bits=64,
                                   scan_impl=impl)
    got = _unpack_pts(G, spec, out)
    assert got == wants
