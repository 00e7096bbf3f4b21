"""Probe for the full-width G2 MSM TPU-runtime fault.

On current axon TPU stacks, a 753-bit G2 (Fq2) Pippenger MSM with
window c=4 (189 windows) crashes the TPU worker process ("kernel
fault"), independent of window grouping; c=8 runs clean, as does the
same program over G1 and as do 128-bit scalars at c=4.  The framework
therefore floors the G2 window at 8 (groth16.ChallengeProver.
G2_MIN_WINDOW; result is window-independent so bytes are unchanged).
Run this probe (`python -m tools.tpu_g2_probe 753c4`) after TPU runtime
updates to check whether the floor can be lifted.

Variants: 128 (128-bit, c=4) | 753c8 | 753wg8 (c=4, group=8) | 753c4."""
import random
import sys

import jax
import jax.numpy as jnp

from tools.oracle import mnt4753_oracle
from snark_challenge_prover_tpu.models import mnt4753
from snark_challenge_prover_tpu.ops import msm as msm_mod
from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs
from tests.test_group import _pack_pts, _unpack_pts

rng = random.Random(7)
model = mnt4753.get()
ocur = mnt4753_oracle()
G = model.G2
spec = model.Fq.spec
print("backend:", jax.default_backend(), flush=True)

N = 11
pts = [ocur.g2.mul(rng.getrandbits(48) | 1, ocur.g2_gen) for _ in range(N)]
P = _pack_pts(G, model.Fq, spec, pts)


def run(tag, bits, c, wg):
    scalars = [rng.getrandbits(bits) % spec.p for _ in range(N)]
    want = None
    for s, Q in zip(scalars, pts):
        want = ocur.g2.add(want, ocur.g2.mul(s, Q))
    S = jnp.asarray(ints_to_limbs(scalars))
    print(f"[{tag}] bits={bits} c={c} wg={wg} ...", flush=True)
    out = jax.jit(
        lambda p, s: msm_mod.msm(G, p, s, c, window_group=wg, scalar_bits=bits)
    )(P, S)
    got = _unpack_pts(G, spec, out)
    print(f"[{tag}] done match={got == [want]}", flush=True)


order = sys.argv[1:] or ["128", "753c8", "753wg8", "753c4"]
for tag in order:
    if tag == "128":
        run(tag, 128, 4, None)
    elif tag == "753c8":
        run(tag, 753, 8, None)
    elif tag == "753wg8":
        run(tag, 753, 4, 8)
    elif tag == "753c4":
        run(tag, 753, 4, None)
print("ALL DONE", flush=True)
