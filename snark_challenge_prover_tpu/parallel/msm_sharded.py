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
from .mesh import DATA_AXIS


def _tree_combine(curve, pts, n: int):
    """Fold a leading length-n axis of projective points with EC adds
    (log2(n) unrolled levels; n = device count, so this is tiny)."""
    X, Y, Z = pts
    while n > 1:
        half = (n + 1) // 2
        lo = tuple(t[:half] for t in (X, Y, Z))
        hi = tuple(t[half:] for t in (X, Y, Z))
        if hi[0].shape[0] < half:  # odd: pad with identity
            pad = half - hi[0].shape[0]
            batch = hi[0].shape[1:]
            F = curve.F
            hi = (
                jnp.concatenate([hi[0], jnp.broadcast_to(F.zeros(batch)[None], (pad,) + hi[0].shape[1:])]),
                jnp.concatenate([hi[1], jnp.broadcast_to(F.ones(batch)[None], (pad,) + hi[1].shape[1:])]),
                jnp.concatenate([hi[2], jnp.broadcast_to(F.zeros(batch)[None], (pad,) + hi[2].shape[1:])]),
            )
        X, Y, Z = curve.add(lo, hi)
        n = half
    return X[0], Y[0], Z[0]


def msm_multi_sharded(mesh: Mesh, curve, points, scalars_canonical,
                      c: int | None = None, scalar_bits: int = msm_mod.SCALAR_BITS,
                      scan_impl: str = "hillis"):
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
            jax.lax.all_gather(t, DATA_AXIS, axis=0) for t in part
        )  # (D, ..., M)
        return _tree_combine(curve, gathered, D)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(pt_spec, pt_spec, pt_spec, scal_spec),
        out_specs=(out_spec, out_spec, out_spec),
        check_rep=False,
    )
    return fn(*points, scalars_canonical)
