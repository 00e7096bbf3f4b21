"""On-chip probe + correctness check for ops.msm.msm_multi_staged.

Runs the staged (multi-program) MSM at the exact shape that faults the
monolithic fused MSM (N=4099, M=4, c=9 — BENCH_r01..r03), health-checks
the worker with a post-run fetch, and compares every result against the
host exact-int oracle.

Usage: python -m tools.tpu_staged_probe [N] [M] [c] [window_group]
(SNARK_TPU_MSM_LANES tunes the per-dispatch lane cap.)
"""
import json
import sys
import time

import numpy as np


def main(N=4099, M=4, c=9, window_group=None):
    from snark_challenge_prover_tpu.config import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs, limbs_to_int
    from tools.oracle import mnt4753_oracle

    model = mnt4753.get()
    ocur = mnt4753_oracle()
    fqs, frs = model.Fq.spec, model.Fr.spec
    base = ocur.g1.mul(7, ocur.g1_gen)
    step = ocur.g1.mul(11, ocur.g1_gen)
    uniq = []
    P = base
    for _ in range(min(N, 64)):
        uniq.append(P)
        P = ocur.g1.add(P, step)
    pts = (uniq * (N // len(uniq) + 1))[:N]
    X = jnp.asarray(ints_to_limbs([fqs.to_mont(p[0]) for p in pts]))
    Y = jnp.asarray(ints_to_limbs([fqs.to_mont(p[1]) for p in pts]))
    Xs = jnp.broadcast_to(X[:, None, :], (48, M, N))
    Ys = jnp.broadcast_to(Y[:, None, :], (48, M, N))
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 1 << 62, size=(M * N, 13), dtype=np.uint64)
    scal = []
    for row in raw:
        v = 0
        for x in row:
            v = (v << 62) | int(x)
        scal.append(v % frs.p)
    S = jnp.asarray(ints_to_limbs(scal)).reshape(48, M, N)

    curve = model.G1
    pp = curve.from_affine(Xs, Ys)
    t0 = time.time()
    out = msm_mod.msm_multi_staged(curve, pp, S, c=c,
                                   window_group=window_group)
    out = jax.block_until_ready(out)
    first_s = time.time() - t0
    # health canary: block_until_ready passes on a poisoned worker
    canary = np.asarray(jax.block_until_ready(jnp.arange(8) + 1))
    assert int(canary[-1]) == 8
    t0 = time.time()
    out2 = msm_mod.msm_multi_staged(curve, pp, S, c=c,
                                    window_group=window_group)
    out2 = jax.block_until_ready(out2)
    steady_s = time.time() - t0

    # host-oracle comparison of every MSM result.  The point stream
    # cycles over len(uniq) unique points, so sum_j s_ij*P_j collapses to
    # sum_u (sum of u's scalars mod r) * P_u — len(uniq) scalar muls per
    # MSM instead of N.
    q = fqs.p
    r_ord = ocur.fr_spec.p
    ok = True
    for i in range(M):
        Xi, Yi, Zi = (fqs.from_mont(limbs_to_int(np.asarray(t)[:, i])) for t in out)
        agg = [0] * len(uniq)
        for j in range(N):
            agg[j % len(uniq)] = (agg[j % len(uniq)] + scal[i * N + j]) % r_ord
        exp = None
        for u, s in enumerate(agg):
            if s == 0:
                continue
            term = ocur.g1.mul(s, uniq[u])
            exp = term if exp is None else ocur.g1.add(exp, term)
        if Zi == 0:
            got = None
        else:
            zi = pow(Zi, -1, q)
            got = (Xi * zi % q, Yi * zi % q)
        if got != exp:
            ok = False
    print(json.dumps({"N": N, "M": M, "c": c, "first_s": round(first_s, 1),
                      "steady_s": round(steady_s, 2), "oracle_match": ok}),
          flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 4099, int(a[1]) if len(a) > 1 else 4,
         int(a[2]) if len(a) > 2 else 9,
         int(a[3]) if len(a) > 3 else None)
