"""Multi-chip MSM: shard the (scalar, point) stream across the mesh.

TPU-native replacement for the reference's OpenMP chunk split
(multiexp.tcc:403-441: split stream into `chunks`, per-thread multi_exp,
sequential reduce of partials): each device runs the full windowed
Pippenger over its shard, then the tiny per-device partial results
(one projective point per MSM) are all-gathered over ICI and combined
identically on every device.  EC addition is not an arithmetic psum, so
the combine is an explicit log-depth masked-add fold of the gathered
(D, ...) axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import msm as msm_mod
from .mesh import DATA_AXIS, INNER_AXIS, OUTER_AXIS


def _tree_combine(curve, pts, n: int):
    """Fold a trailing length-n axis of projective points with EC adds.

    Runs as a fori_loop masked in-place halving so the graph holds ONE
    traced EC add instead of log2(n) unrolled levels — the sharded MSM
    programs must compile on the driver's 1-core XLA:CPU host, where
    every extra traced group op costs ~10 s of compile (ops.msm._ec_reduce
    uses the same structure for the same reason).  n = device count, so
    runtime is log2(n) tiny masked passes.

    The device axis must be the LAST axis so the limb/component axes stay
    where curve.add expects them (limbs leading): each leaf has shape
    (48[, deg], M, n)."""
    import math

    F = curve.F
    X, Y, Z = pts
    if n == 1:
        return X[..., 0], Y[..., 0], Z[..., 0]
    levels = math.ceil(math.log2(n))
    npad = 1 << levels
    if npad != n:  # pad with the identity (0:1:0)
        pad_batch = X.shape[F.elem_ndim:-1] + (npad - n,)
        X = jnp.concatenate([X, F.zeros(pad_batch)], axis=-1)
        Y = jnp.concatenate([Y, F.ones(pad_batch)], axis=-1)
        Z = jnp.concatenate([Z, F.zeros(pad_batch)], axis=-1)
    idx = jnp.arange(npad)

    def level(t, state):
        d = jnp.int32(npad) >> (t + 1)
        shifted = tuple(jnp.roll(s, -d, axis=-1) for s in state)
        comb = curve.add(state, shifted)
        keep = idx < d
        out = []
        for c_, s_ in zip(comb, state):
            k = keep.reshape((1,) * (c_.ndim - 1) + (npad,))
            out.append(jnp.where(k, c_, s_))
        return tuple(out)

    from ..utils import op_counts

    with op_counts.loop_scope(levels):
        X, Y, Z = jax.lax.fori_loop(0, levels, level, (X, Y, Z))
    return X[..., 0], Y[..., 0], Z[..., 0]


def msm_multi_sharded(mesh: Mesh, curve, points, scalars_canonical,
                      c: int | None = None, scalar_bits: int = msm_mod.SCALAR_BITS,
                      scan_impl: str | None = None):
    """Like ops.msm.msm_multi but sharded over mesh's data axis along N.

    points: (X, Y, Z) with trailing batch (M, N); N must divide evenly by
    the mesh size (pad with zero scalars first via pad_and_stack).
    Returns replicated projective points with batch (M,).
    """
    X, _, _ = points
    ndim = X.ndim
    D = mesh.shape[DATA_AXIS]

    pt_spec = P(*([None] * (ndim - 1) + [DATA_AXIS]))
    g2_extra = ndim - 3  # 0 for G1, 1 for towers
    scal_spec = P(*([None, None] + [DATA_AXIS]))
    out_spec = P()

    def local(X, Y, Z, S):
        part = msm_mod.msm_multi(
            curve, (X, Y, Z), S, c=c, scalar_bits=scalar_bits,
            scan_impl=scan_impl,
        )  # (..., M) projective partial on this shard
        gathered = tuple(
            # gather onto a NEW TRAILING axis so the limb/component axes
            # stay leading for the EC combine (round-1 bug: axis=0 buried
            # the limb axis behind the device axis)
            jax.lax.all_gather(t, DATA_AXIS, axis=t.ndim) for t in part
        )  # (..., M, D)
        return _tree_combine(curve, gathered, D)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(pt_spec, pt_spec, pt_spec, scal_spec),
        out_specs=(out_spec, out_spec, out_spec),
        check_rep=False,
    )
    return fn(*points, scalars_canonical)


def msm_multi_sharded_2d(mesh: Mesh, curve, points, scalars_canonical,
                         c: int | None = None,
                         scalar_bits: int = msm_mod.SCALAR_BITS,
                         scan_impl: str = "hillis"):
    """Multi-host MSM over a 2-level (OUTER=DCN, INNER=ICI) mesh.

    The point stream shards over BOTH axes along N.  Per-device partials
    reduce hierarchically: all-gather + EC combine over the fast inner
    (ICI) axis first, then one point per host crosses the slow outer
    (DCN) axis — DCN traffic is one projective point per host per MSM,
    the hierarchical-reduce pattern of SURVEY §2.5.
    """
    X, _, _ = points
    ndim = X.ndim
    Do = mesh.shape[OUTER_AXIS]
    Di = mesh.shape[INNER_AXIS]

    pt_spec = P(*([None] * (ndim - 1) + [(OUTER_AXIS, INNER_AXIS)]))
    scal_spec = P(None, None, (OUTER_AXIS, INNER_AXIS))
    out_spec = P()

    def local(X, Y, Z, S):
        part = msm_mod.msm_multi(
            curve, (X, Y, Z), S, c=c, scalar_bits=scalar_bits,
            scan_impl=scan_impl,
        )
        # level 1: ICI reduce (fast, within a host's slice)
        g_in = tuple(
            jax.lax.all_gather(t, INNER_AXIS, axis=t.ndim) for t in part
        )
        part = _tree_combine(curve, g_in, Di)
        # level 2: DCN reduce (one point per host per MSM)
        g_out = tuple(
            jax.lax.all_gather(t, OUTER_AXIS, axis=t.ndim) for t in part
        )
        return _tree_combine(curve, g_out, Do)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(pt_spec, pt_spec, pt_spec, scal_spec),
        out_specs=(out_spec, out_spec, out_spec),
        check_rep=False,
    )
    return fn(*points, scalars_canonical)
