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
