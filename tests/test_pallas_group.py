"""Fused Pallas EC group-law kernels vs the XLA Curve formulas, bit-exact.

The kernel MATH (lazy-Montgomery RCB add / dbl-2007-bl,
ops.pallas_group._apply_formula) is checked against the XLA path as a
plain jitted function — the identical trace the Pallas kernel body
runs, without interpret-mode's per-op dispatch (a 20k-equation kernel
takes >15 min to interpret on this 1-core host).  The Pallas CALL
plumbing (BlockSpec tiling, const operand) gets a tiny interpret-mode
smoke at tile 8; on TPU the same smoke exercises the compiled Mosaic
kernel, and tools/tpu_staged_probe checks the full MSM against the
exact-int oracle.

Outputs must match limb-for-limb: both paths reduce every coordinate
to the canonical representative, so the projective triples coincide
exactly (not merely as group elements)."""

import contextlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snark_challenge_prover_tpu.models import mnt4753, mnt6753
from snark_challenge_prover_tpu.ops import pallas_group as pg

# the tower formula graphs (60k-120k equations) take >45 min each to
# compile on this 1-core XLA:CPU host; the G1 variant runs by default,
# the G2 towers under the heavy gate (their end-to-end exactness is
# also covered on-chip: bench.py byte-exact vs the C++ comparator)
heavy = pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1"
    and jax.default_backend() != "tpu",
    reason="tower formula compile is heavy on 1-core XLA:CPU",
)


def _rand_points(curve, oracle_curve, gen, n, rng, fqs, deg):
    """n points as limb planes (affine, Z=1 after from_affine)."""
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

    pts = []
    P = oracle_curve.mul(rng.randrange(2, 1 << 30), gen)
    step = oracle_curve.mul(rng.randrange(2, 1 << 30), gen)
    for _ in range(n):
        pts.append(P)
        P = oracle_curve.add(P, step)

    def enc(coord_idx):
        if deg == 1:
            vals = [fqs.to_mont(p[coord_idx]) for p in pts]
            return jnp.asarray(ints_to_limbs(vals))
        comps = []
        for c in range(deg):
            vals = [fqs.to_mont(p[coord_idx][c]) for p in pts]
            comps.append(ints_to_limbs(vals))
        return jnp.asarray(np.stack(comps, axis=0))

    return enc(0), enc(1), pts


CASES = [
    ("m4-g1", mnt4753, "g1", 1),
    pytest.param("m4-g2", mnt4753, "g2", 2, marks=heavy),
    pytest.param("m6-g2", mnt6753, "g2", 3, marks=heavy),
]


def _setup(model_mod, grp, rng):
    from tools import oracle as orc

    model = model_mod.get()
    curve = model.G1 if grp == "g1" else model.G2
    ocur = orc.ORACLES[model.name]()
    og = ocur.g1 if grp == "g1" else ocur.g2
    ogen = ocur.g1_gen if grp == "g1" else ocur.g2_gen
    return model, curve, og, ogen


@pytest.mark.parametrize("name,model_mod,grp,deg", CASES,
                         ids=["m4-g1", "m4-g2", "m6-g2"])
def test_ec_add_formula_exact(name, model_mod, grp, deg, rng):
    model, curve, og, ogen = _setup(model_mod, grp, rng)
    fqs = model.Fq.spec
    n = 8
    X, Y, _ = _rand_points(curve, og, ogen, n, rng, fqs, deg)
    X2, Y2, _ = _rand_points(curve, og, ogen, n, rng, fqs, deg)
    P = curve.from_affine(X, Y)
    Q = curve.from_affine(X2, Y2)
    # edge lanes: identity P, identity Q, P==Q (doubling), Q == -P
    zero = curve.zero((n,))
    P = curve.select(jnp.arange(n) == 0, zero, P)
    Q = curve.select(jnp.arange(n) == 1, zero, Q)
    Q = curve.select(jnp.arange(n) == 2, P, Q)
    Q = curve.select(jnp.arange(n) == 3, curve.neg(P), Q)

    want = jax.jit(curve._add_flat)(P, Q)
    got = pg.ec_op_jax_reference(curve, "add", P, Q)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("name,model_mod,grp,deg", CASES,
                         ids=["m4-g1", "m4-g2", "m6-g2"])
def test_ec_dbl_formula_exact(name, model_mod, grp, deg, rng):
    model, curve, og, ogen = _setup(model_mod, grp, rng)
    fqs = model.Fq.spec
    n = 8
    X, Y, _ = _rand_points(curve, og, ogen, n, rng, fqs, deg)
    P = curve.from_affine(X, Y)
    P = curve.select(jnp.arange(n) == 0, curve.zero((n,)), P)

    want = jax.jit(curve._double_flat)(P)
    got = pg.ec_op_jax_reference(curve, "dbl", P)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@heavy
def test_pallas_call_plumbing_smoke(rng, monkeypatch):
    """Tiny tile through the REAL pallas_call path (interpreted on CPU,
    compiled Mosaic on TPU): tiling, const operand, padding.  Heavy-
    gated off-TPU: interpret mode re-executes the ~20k-op kernel trace
    in Python on every run (~10 min on this host); the compiled path is
    exercised continuously by the on-chip probes and bench."""
    monkeypatch.setenv("SNARK_TPU_EC_TILE", "8")
    model, curve, og, ogen = _setup(mnt4753, "g1", rng)
    fqs = model.Fq.spec
    n = 5  # not a tile multiple: exercises the pad path
    X, Y, _ = _rand_points(curve, og, ogen, n, rng, fqs, 1)
    X2, Y2, _ = _rand_points(curve, og, ogen, n, rng, fqs, 1)
    P = curve.from_affine(X, Y)
    Q = curve.from_affine(X2, Y2)
    want = jax.jit(curve._add_flat)(P, Q)

    if jax.default_backend() == "tpu":
        ctx = contextlib.nullcontext()
    else:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        got = pg.ec_op_pallas(curve, "add", P, Q)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_lazy_bound_tracking():
    """The reduce path: bounds stay within the REDC-exactness envelope."""
    class FakeCtx:
        def __init__(self):
            self.col = {}

        def colv(self, name):
            return np.zeros((48, 1), np.uint32)

    lf = pg.LazyFp(FakeCtx(), 4)
    a = pg.LazyVal(np.zeros((48, 4), np.uint32), 1)
    out = lf.add(a, a)
    assert out.bound == 2
    s = lf.sub(a, out)
    assert s.bound <= pg.MAXB
