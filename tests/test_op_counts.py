"""Op-count instrumentation (PROFILE_OP_COUNTS parity, fp.hpp:46-52).

Counts are recorded at trace time with loop-scope multipliers, giving
the number of field/group element-ops the compiled graph EXECUTES
(masked lanes count as executed — that is what the hardware does).
Only lowering is needed, so these tests never compile."""

import jax

from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.utils import op_counts


def test_pow_int_counts():
    model = mnt4753.get()
    F = model.Fq
    a = F.ones((3,))
    with op_counts.counting() as c:
        jax.jit(lambda x: F.pow_int(x, 13)).lower(a)
    rep = c.report()
    # 13 = 0b1101: 4 bits -> 4 squarings + 4 (masked) multiplies, x batch 3
    assert rep[f"{F.name}.sqr"] == 4 * 3
    assert rep[f"{F.name}.mul"] == 4 * 3


def test_group_add_counts():
    model = mnt4753.get()
    G = model.G1
    F = model.Fq
    a = F.ones((5,))
    P = (a, a, a)
    with op_counts.counting() as c:
        jax.jit(G.add).lower(P, P)
    rep = c.report()
    assert rep[f"{G.name}.add"] == 5
    # complete RCB addition: 12M + 3m_a + 2m_3b per point
    assert rep[f"{F.name}.mul"] == (12 + 3 + 2) * 5


def test_msm_counts_scale_with_windows():
    """The Horner doubling chain must be multiplied by its runtime trip
    counts (windows x c), not counted once per trace."""
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

    model = mnt4753.get()
    G = model.G1
    N = 4
    S = jnp.asarray(ints_to_limbs([3] * N))
    P = (model.Fq.ones((N,)), model.Fq.ones((N,)), model.Fq.ones((N,)))
    with op_counts.counting() as c:
        jax.jit(
            lambda p, s: msm_mod.msm(G, p, s, 4, scalar_bits=16)
        ).lower(P, S)
    rep = c.report()
    # 16-bit scalars, c=4 -> W=4 windows, 4 doublings each = 16 dbl per MSM
    assert rep[f"{G.name}.dbl"] >= 16
    counts = c.counts
    assert counts[f"{G.name}.add"] > 0
