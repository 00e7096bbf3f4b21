"""Knowledge commitments: pairs (g in T1, h in T2) with componentwise
group structure (libsnark/knowledge_commitment/knowledge_commitment.hpp:37+).

The reference stores the Groth16 B-query as a *sparse* vector of
(G2, G1) pairs and provides `kc_batch_exp` (keygen) and
`kc_multi_exp_with_mixed_addition` (prover) that walk both components
together (kc_multiexp.tcc).  On TPU, sparsity is replaced by zero-scalar
masking (free in the bucket kernel) and "simultaneous" means the two
MSMs are issued into one jit program — XLA overlaps them; there is no
per-element locality to exploit the way the CPU cache version does.
"""

from __future__ import annotations

from typing import NamedTuple

from ..ops import fixed_base
from ..ops import msm as msm_mod


class KCVector(NamedTuple):
    """Dense knowledge-commitment vector: component point batches of
    equal trailing length (the reference's sparse_vector is an
    optimization over exactly this, knowledge_commitment.hpp:37)."""

    g: tuple  # T1 projective/affine batch (e.g. G2 points)
    h: tuple  # T2 batch (e.g. G1 points)


def kc_batch_exp(curve_T1, curve_T2, window_T1: int, window_T2: int,
                 table_T1, table_T2, coeff_T1, coeff_T2, scalars_mont, F):
    """[(coeff_T1 s_i) * base_T1, (coeff_T2 s_i) * base_T2] — the B-query
    builder (kc_multiexp.tcc kc_batch_exp; coeffs are Fr::one() in the
    Groth16 generator, r1cs_gg_ppzksnark.tcc:330)."""
    g = fixed_base.batch_exp_with_coeff(
        curve_T1, window_T1, table_T1, coeff_T1, scalars_mont, F
    )
    h = fixed_base.batch_exp_with_coeff(
        curve_T2, window_T2, table_T2, coeff_T2, scalars_mont, F
    )
    return KCVector(g=g, h=h)


def kc_multi_exp(curve_T1, curve_T2, kc: KCVector, scalars_canonical,
                 c: int | None = None):
    """Simultaneous MSM over both components
    (kc_multi_exp_with_mixed_addition, kc_multiexp.tcc; zero scalars are
    masked inside the bucket kernel rather than filtered)."""
    g = msm_mod.msm(curve_T1, kc.g, scalars_canonical, c)
    h = msm_mod.msm(curve_T2, kc.h, scalars_canonical, c)
    return g, h


def kc_multi_exp_fused(curve_T1, curve_T2, kc: KCVector, scalars_canonical,
                       c: int | None = None, scalar_bits: int = 753,
                       scan_impl: str = "hillis"):
    """The SIMULTANEOUS walk proper: one digit decomposition, one stable
    sort, one segment structure — applied to BOTH component groups.

    This is the TPU rendering of kc_multi_exp_with_mixed_addition's
    single pass over (G2, G1) pairs (kc_multiexp.tcc:64-130): the
    scalar-derived control state (window digits, bucket ordering,
    segment boundaries, scatter targets) is computed once and drives
    two EC data paths inside one jit program, instead of two
    independent msm() calls re-deriving it.  Both components use the
    G2-floored window (they must share digits).

    Returns (T1 result, T2 result), projective batches of shape (1,).
    """
    import jax
    import jax.numpy as jnp

    from ..utils import op_counts

    N = scalars_canonical.shape[-1]
    c = msm_mod.g2_window_bits(N, c)
    B = 1 << c
    W = (scalar_bits + c - 1) // c

    digits = msm_mod.window_digits(
        scalars_canonical[:, None, :], c, scalar_bits
    )  # (W, 1, N)
    dig_groups = digits[::-1].reshape(W, 1, 1, N)

    pts1 = tuple(a[..., None, :] for a in kc.g)
    pts2 = tuple(a[..., None, :] for a in kc.h)

    def one_group(curve, pts, carry, digs, idx, keys):
        """One window's bucket pass for one component group, driven by
        the SHARED sort (idx/keys)."""
        F = curve.F
        X, Y, Z = pts
        extra = X.ndim - 2

        def gather(arr):
            def take_m(a_m, i_m):
                return jnp.take(a_m, i_m, axis=-1)

            return jax.vmap(take_m, in_axes=(-2, 1), out_axes=-2)(arr, idx)

        Xs, Ys, Zs = gather(X), gather(Y), gather(Z)
        zero_d = keys == 0
        batch = keys.shape
        Xs = F.select(zero_d, F.zeros(batch), Xs)
        Ys = F.select(zero_d, F.ones(batch), Ys)
        Zs = F.select(zero_d, F.zeros(batch), Zs)
        start = jnp.concatenate(
            [jnp.ones(keys.shape[:-1] + (1,), bool),
             keys[..., 1:] != keys[..., :-1]],
            axis=-1,
        )
        sx, sy, sz = msm_mod._ec_segmented_scan(
            curve, (Xs, Ys, Zs), start, impl=scan_impl
        )
        is_end = jnp.concatenate(
            [keys[..., 1:] != keys[..., :-1],
             jnp.ones(keys.shape[:-1] + (1,), bool)],
            axis=-1,
        )
        tgt = jnp.where(is_end, keys, B)
        rows = jnp.zeros((1, 1, 1), jnp.int32)
        tgt_flat = (rows * (B + 1) + tgt).reshape(-1)

        def scatter(vals, init):
            flat = vals.reshape(vals.shape[:extra] + (-1,))
            out = init.at[..., tgt_flat].set(flat)
            return out.reshape(init.shape[:extra] + (1, 1, B + 1))[..., :B]

        bX = scatter(sx, F.zeros((B + 1,)))
        bY = scatter(sy, F.ones((B + 1,)))
        bZ = scatter(sz, F.zeros((B + 1,)))
        run = msm_mod._ec_scan(
            curve, (bX[..., 1:], bY[..., 1:], bZ[..., 1:]),
            axis=bX.ndim - 1, reverse=True, impl=scan_impl,
        )
        S = msm_mod._ec_reduce(curve, run)

        def dbl(i, P):
            return curve.double(P)

        with op_counts.loop_scope(c):
            carry = jax.lax.fori_loop(0, c, dbl, carry)
        S2 = tuple(t[..., 0, :] for t in S)  # drop the group axis -> (1,)
        return curve.add(carry, S2)

    def body(carrys, digs):
        # digs: (1, 1, N) — SHARED control computation
        idx = jnp.argsort(digs, axis=-1, stable=True).astype(jnp.int32)
        keys = jnp.take_along_axis(digs, idx, axis=-1)
        c1 = one_group(curve_T1, pts1, carrys[0], digs, idx, keys)
        c2 = one_group(curve_T2, pts2, carrys[1], digs, idx, keys)
        return (c1, c2), None

    init = (curve_T1.zero((1,)), curve_T2.zero((1,)))
    with op_counts.loop_scope(W):
        out, _ = jax.lax.scan(body, init, dig_groups)
    return out
