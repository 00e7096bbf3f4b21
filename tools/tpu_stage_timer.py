"""Per-stage timing of the staged MSM on the real chip: separates the
bucket-accumulation dispatches (sort+gather+scan+scatter+fold) from the
triangle+Horner dispatches and from the digit program, so optimization
effort goes where the seconds are.

Usage: python -m tools.tpu_stage_timer [N] [M] [c] [Gr]
Honors SNARK_TPU_PALLAS / SNARK_TPU_MSM_LANES / SNARK_TPU_EC_TILE.
"""
import json
import sys
import time

import numpy as np


def main(N=4099, M=4, c=9, Gr=84):
    from snark_challenge_prover_tpu.config import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

    model = mnt4753.get()
    fqs, frs = model.Fq.spec, model.Fr.spec
    rng = np.random.default_rng(5)
    # synthetic affine points: random x with a valid y is expensive; use
    # generator multiples cycled (arithmetic cost is value-independent)
    from tools.oracle import mnt4753_oracle

    ocur = mnt4753_oracle()
    uniq = []
    P = ocur.g1.mul(7, ocur.g1_gen)
    step = ocur.g1.mul(11, ocur.g1_gen)
    for _ in range(64):
        uniq.append(P)
        P = ocur.g1.add(P, step)
    pts = (uniq * (N // 64 + 1))[:N]
    X = jnp.asarray(ints_to_limbs([fqs.to_mont(p[0]) for p in pts]))
    Y = jnp.asarray(ints_to_limbs([fqs.to_mont(p[1]) for p in pts]))
    curve = model.G1
    Xs = jnp.broadcast_to(X[:, None, :], (48, M, N))
    Ys = jnp.broadcast_to(Y[:, None, :], (48, M, N))
    Xp, Yp, Zp = curve.from_affine(Xs, Ys)
    raw = rng.integers(0, 1 << 62, size=(M * N, 13), dtype=np.uint64)
    scal = []
    for row in raw:
        v = 0
        for x in row:
            v = (v << 62) | int(x)
        scal.append(v % frs.p)
    S = jnp.asarray(ints_to_limbs(scal)).reshape(48, M, N)

    F = curve.F
    B = 1 << c
    W = (753 + c - 1) // c
    cap = msm_mod.msm_lane_cap()
    Nc = max(128, cap // max(1, Gr * M))
    n_chunks = (N + Nc - 1) // Nc
    Np = n_chunks * Nc
    if Np != N:
        pad = [(0, 0), (0, 0), (0, Np - N)]
        Xp, Yp, Zp = (jnp.pad(t, pad) for t in (Xp, Yp, Zp))
        S = jnp.pad(S, pad)
    W_pad = (W + Gr - 1) // Gr * Gr
    scan_impl = msm_mod.staged_scan_impl()

    digits_fn = msm_mod._digits_program(c, 753)
    bucket = msm_mod._bucket_program(curve, c, Gr, M, Nc, scan_impl)
    triangle = msm_mod._triangle_program(curve, c, Gr, M, scan_impl)

    def run(report):
        t0 = time.time()
        digits = digits_fn(S)
        if W_pad != W:
            digits = jnp.concatenate(
                [digits, jnp.zeros((W_pad - W, M, Np), jnp.int32)], axis=0)
        digits = jax.block_until_ready(jnp.flip(digits, axis=0))
        t_dig = time.time() - t0

        carry = curve.zero((M,))
        t_bucket = 0.0
        t_tri = 0.0
        for g in range(W_pad // Gr):
            dg = digits[g * Gr:(g + 1) * Gr]
            acc = (F.zeros((Gr, M, B)), F.ones((Gr, M, B)),
                   F.zeros((Gr, M, B)))
            for k in range(n_chunks):
                sl = slice(k * Nc, (k + 1) * Nc)
                t0 = time.time()
                acc = jax.block_until_ready(bucket(
                    acc, Xp[..., sl], Yp[..., sl], Zp[..., sl], dg[..., sl]))
                t_bucket += time.time() - t0
            t0 = time.time()
            carry = jax.block_until_ready(triangle(carry, *acc))
            t_tri += time.time() - t0
        if report:
            print(json.dumps({
                "N": N, "M": M, "c": c, "Gr": Gr, "Nc": Nc,
                "n_chunks": n_chunks, "digits_s": round(t_dig, 3),
                "bucket_s": round(t_bucket, 3),
                "triangle_s": round(t_tri, 3),
                "total_s": round(t_dig + t_bucket + t_tri, 3),
            }), flush=True)
        return carry

    c0 = run(False)   # compile
    np.asarray(c0[0][:, 0])  # drain the queue with a REAL fetch
    t0 = time.time()
    carry = run(True)    # steady (per-dispatch block_until_ready times)
    t_enq = time.time() - t0
    # on this tunnel block_until_ready can return without waiting; only
    # a device->host fetch proves the work actually ran to completion
    t0 = time.time()
    np.asarray(carry[0][:, 0])
    t_fetch = time.time() - t0
    print(json.dumps({"steady_wall_s": round(t_enq, 3),
                      "final_fetch_s": round(t_fetch, 3),
                      "true_total_s": round(t_enq + t_fetch, 3)}),
          flush=True)
    canary = np.asarray(jax.block_until_ready(jnp.arange(4) + 1))
    assert int(canary[-1]) == 4


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*(a + [4099, 4, 9, 84][len(a):]))
