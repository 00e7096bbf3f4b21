"""Fused simultaneous-walk knowledge-commitment MSM
(proof_systems/knowledge_commitment.kc_multi_exp_fused) vs the
independent per-group MSMs — the TPU rendering of
kc_multi_exp_with_mixed_addition's single pass (kc_multiexp.tcc).

Heavy-gated: the G2-containing compile is minutes on XLA:CPU.
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SNARK_TPU_HEAVY_TESTS", "0") != "1",
    reason="G2 compile heavy on XLA:CPU",
)


def test_fused_matches_separate():
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.proof_systems.knowledge_commitment import (
        KCVector,
        kc_multi_exp_fused,
    )
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs
    from tools import oracle as orc

    model = mnt4753.get()
    cur = orc.ORACLES["MNT4753"]()
    rng = random.Random(3)
    N = 8
    g2_pts = []
    g1_pts = []
    P2, P1 = cur.g2_gen, cur.g1_gen
    for _ in range(N):
        g2_pts.append(P2)
        g1_pts.append(P1)
        P2 = cur.g2.add(P2, cur.g2_gen)
        P1 = cur.g1.add(P1, cur.g1_gen)
    scalars = [rng.randrange(1 << 62) for _ in range(N)]

    fq = model.Fq.spec
    import numpy as np

    x1 = ints_to_limbs([fq.to_mont(P[0]) for P in g1_pts])
    y1 = ints_to_limbs([fq.to_mont(P[1]) for P in g1_pts])
    x2 = np.stack([
        ints_to_limbs([fq.to_mont(P[0][c]) for P in g2_pts]) for c in range(2)
    ])
    y2 = np.stack([
        ints_to_limbs([fq.to_mont(P[1][c]) for P in g2_pts]) for c in range(2)
    ])
    kc = KCVector(
        g=model.G2.from_affine(jnp.asarray(x2), jnp.asarray(y2)),
        h=model.G1.from_affine(jnp.asarray(x1), jnp.asarray(y1)),
    )
    scal = jnp.asarray(ints_to_limbs(scalars))

    fused = jax.jit(
        lambda s: kc_multi_exp_fused(
            model.G2, model.G1, kc, s, scalar_bits=64
        )
    )(scal)
    (g2x, g2y, g2z), (g1x, g1y, g1z) = fused

    # oracle expectation
    want2 = cur.g2.msm(scalars, g2_pts)
    want1 = cur.g1.msm(scalars, g1_pts)
    from snark_challenge_prover_tpu.proof_systems.groth16 import (
        _g1_proj_to_host,
        _g2_proj_to_host,
    )

    got2 = _g2_proj_to_host(model, (g2x, g2y, g2z))
    got1 = _g1_proj_to_host(model, (g1x, g1y, g1z))
    assert got2 == want2
    assert got1 == want1
