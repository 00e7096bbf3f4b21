"""Sharded MSM vs single-device MSM on the virtual 8-device CPU mesh —
the TPU analogue of the reference's OpenMP chunk-split equivalence
(multiexp.tcc:403-441: per-thread partials, sequential reduce).

Covers the two paths the round-1 dryrun crashed on: the all-gather axis
layout of per-device partials (limb planes must stay leading) and the
EC tree combine, for both G1 and the tower-coordinate G2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.oracle import mnt4753_oracle
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops import msm as msm_mod
from snark_challenge_prover_tpu.parallel.mesh import make_mesh
from snark_challenge_prover_tpu.parallel.msm_sharded import msm_multi_sharded
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

from tests.test_group import _pack_pts, _unpack_pts


@pytest.fixture(scope="module")
def mesh():
    from tests.conftest import cpu_devices

    return make_mesh(8, devices=cpu_devices(8))


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_msm_multi_sharded_matches_single(mesh, grp, rng):
    model = mnt4753.get()
    ocur = mnt4753_oracle()
    OG = getattr(ocur, grp)
    gen = ocur.g1_gen if grp == "g1" else ocur.g2_gen
    G = model.G1 if grp == "g1" else model.G2
    spec = model.Fq.spec

    N = 16  # divides the 8-device mesh evenly (2 per shard)
    pts = [OG.mul(rng.getrandbits(40) | 1, gen) for _ in range(N - 2)]
    pts += [None, pts[0]]  # identity + duplicate
    scalars = [rng.getrandbits(64) for _ in range(N - 2)] + [0, 1]

    want = None
    for s, P in zip(scalars, pts):
        want = OG.add(want, OG.mul(s, P))

    P = _pack_pts(G, model.Fq, spec, pts)
    S = jnp.asarray(ints_to_limbs(scalars))

    pts_m = tuple(a[..., None, :] for a in P)  # M=1
    scal_m = S[:, None, :]
    out = msm_multi_sharded(mesh, G, pts_m, scal_m, c=4, scalar_bits=64)
    got = _unpack_pts(G, spec, out)
    assert got == [want]

    # cross-check vs the single-device engine on the same inputs
    single = jax.jit(
        lambda p, s: msm_mod.msm_multi(G, p, s, 4, scalar_bits=64)
    )(pts_m, scal_m)
    assert _unpack_pts(G, spec, single) == [want]


def test_msm_sharded_2d_hierarchical(mesh, rng):
    """2-level (DCN x ICI) hierarchical reduce == flat result, on a
    2x4 virtual mesh (the multi-host pattern, SURVEY §2.5)."""
    from tests.conftest import cpu_devices

    from snark_challenge_prover_tpu.parallel.mesh import make_mesh_2d
    from snark_challenge_prover_tpu.parallel.msm_sharded import (
        msm_multi_sharded_2d,
    )

    model = mnt4753.get()
    ocur = mnt4753_oracle()
    G = model.G1
    spec = model.Fq.spec
    mesh2 = make_mesh_2d(2, 4, devices=cpu_devices(8))

    N = 16
    pts = [ocur.g1.mul(rng.getrandbits(40) | 1, ocur.g1_gen) for _ in range(N)]
    scalars = [rng.getrandbits(64) for _ in range(N)]
    want = None
    for s, P in zip(scalars, pts):
        want = ocur.g1.add(want, ocur.g1.mul(s, P))

    P = _pack_pts(G, model.Fq, spec, pts)
    S = jnp.asarray(ints_to_limbs(scalars))
    out = msm_multi_sharded_2d(
        mesh2, G, tuple(a[..., None, :] for a in P), S[:, None, :],
        c=4, scalar_bits=64,
    )
    assert _unpack_pts(G, spec, out) == [want]


_heavy = pytest.mark.skipif(
    __import__("os").environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="full-width tower/staged-FFT compiles cost >30 min on the "
           "1-core XLA:CPU host (the G1 variant runs by default)",
)


@pytest.mark.parametrize(
    "grp", ["g1", pytest.param("g2", marks=_heavy)]
)
def test_msm_multi_sharded_full_width(mesh, grp, rng):
    """FULL-width (753-bit) scalars over the mesh at c=2 — the shape the
    production sharded prover runs (digit extraction at limb
    boundaries, Horner depth, padding all at full width; the 64-bit
    variants above keep the driver dryrun cheap)."""
    model = mnt4753.get()
    ocur = mnt4753_oracle()
    OG = getattr(ocur, grp)
    gen = ocur.g1_gen if grp == "g1" else ocur.g2_gen
    G = model.G1 if grp == "g1" else model.G2
    spec = model.Fq.spec
    r_ord = ocur.fr_spec.p

    N = 16
    pts = [OG.mul(rng.getrandbits(40) | 1, gen) for _ in range(N - 2)]
    pts += [None, pts[0]]
    scalars = [rng.getrandbits(753) % r_ord for _ in range(N - 2)] + [0, 1]

    want = None
    for s, P in zip(scalars, pts):
        want = OG.add(want, OG.mul(s, P))

    P = _pack_pts(G, model.Fq, spec, pts)
    S = jnp.asarray(ints_to_limbs(scalars))
    out = msm_multi_sharded(
        mesh, G, tuple(a[..., None, :] for a in P), S[:, None, :], c=2
    )
    assert _unpack_pts(G, spec, out) == [want]


@_heavy
def test_prove_step_sharded_staged_fft_full_width(rng):
    """The STAGED sharded prover with the 4-step distributed FFT at
    full scalar width vs the exact-int oracle — the production
    multichip path end to end (a 2-device mesh keeps d+1 >= D^2 at the
    tiny fixture size)."""
    import functools
    import io

    from tests.conftest import cpu_devices
    from __graft_entry__ import _tiny_fixture
    from snark_challenge_prover_tpu.parallel.pipeline import (
        prove_step_sharded_staged,
    )
    from snark_challenge_prover_tpu.proof_systems.groth16 import (
        _g1_proj_to_host,
        _g2_proj_to_host,
    )
    from tools import oracle as orc

    mesh2 = make_mesh(2, devices=cpu_devices(8)[:2])
    model, params_dev, input_dev, d, m = _tiny_fixture()
    cur, params, inputs = orc.generate_fixture("MNT4753", 3, seed=5)
    proof_bytes = orc.prove(cur, params, inputs)
    buf = io.BytesIO(proof_bytes)
    want_A = orc.read_g1(buf, cur)
    want_B = orc.read_g2(buf, cur)
    want_C = orc.read_g1(buf, cur)

    At, Bt2, C = jax.block_until_ready(
        prove_step_sharded_staged(
            mesh2, model, params_dev, input_dev, d=d, m=m, c=2,
            sharded_fft=True,
        )
    )
    got_A = _g1_proj_to_host(model, tuple(t[..., 0:1] for t in At))
    got_B = _g2_proj_to_host(model, Bt2)
    got_C = _g1_proj_to_host(model, tuple(t[..., 0:1] for t in C))
    assert got_A == want_A
    assert got_B == want_B
    assert got_C == want_C


def test_prove_step_sharded_matches_oracle(mesh):
    """Full sharded prove step == the exact-int oracle proof (the
    dryrun_multichip path, end to end on the CPU mesh)."""
    import functools

    from __graft_entry__ import _tiny_fixture
    from snark_challenge_prover_tpu.parallel.pipeline import prove_step_sharded
    from snark_challenge_prover_tpu.proof_systems.groth16 import (
        _g1_proj_to_host,
        _g2_proj_to_host,
    )
    from tools import oracle as orc

    model, params_dev, input_dev, d, m = _tiny_fixture()
    cur, params, inputs = orc.generate_fixture("MNT4753", 3, seed=5)
    proof_bytes = orc.prove(cur, params, inputs)
    import io

    buf = io.BytesIO(proof_bytes)
    want_A = orc.read_g1(buf, cur)
    want_B = orc.read_g2(buf, cur)
    want_C = orc.read_g1(buf, cur)

    step = jax.jit(
        functools.partial(prove_step_sharded, mesh, model, d=d, m=m, c=4)
    )
    At, Bt2, C = jax.block_until_ready(step(params_dev, input_dev))

    got_A = _g1_proj_to_host(model, tuple(t[..., 0:1] for t in At))
    got_B = _g2_proj_to_host(model, Bt2)
    got_C = _g1_proj_to_host(model, tuple(t[..., 0:1] for t in C))
    assert got_A == want_A
    assert got_B == want_B
    assert got_C == want_C
