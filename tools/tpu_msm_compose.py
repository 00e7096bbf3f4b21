"""Progressive composition probe for the G1 fused-MSM TPU fault.

tools/tpu_msm_bisect: every stage of msm_multi's body PASSES in
isolation at the crash shape (N=4099) — the fault is emergent in the
composite.  This probe rebuilds msm_multi's body stage prefix by stage
prefix, keeping the REAL outer lax.scan over window groups, to find the
first prefix that faults.

  p1  scan{ sort + gather + mask }                + carry add
  p2  scan{ p1 + segmented scan }                 + carry add
  p3  scan{ p2 + bucket scatter }                 + carry add
  p4  scan{ p3 + triangle + reduce }              + carry add
  p5  scan{ p4 + horner doublings } == msm_multi  (expected FAIL)

Usage: python -m tools.tpu_msm_compose <p1..p5> [wg]
       python -m tools.tpu_msm_compose            # sweep via subprocess
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def build(N: int, M: int = 4):
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs
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
    return model, Xs, Ys, S


def run_prefix(prefix: str, wg: int, N: int = 4099, M: int = 4, c: int = 9):
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.ops import msm as msm_mod

    model, Xs, Ys, S = build(N, M)
    curve = model.G1
    F = curve.F
    pts = curve.from_affine(Xs, Ys)
    level = int(prefix[1])
    barrier = prefix.endswith("b")
    variant = prefix[2:3] if len(prefix) > 2 and prefix[2] in "rtw" else ""

    def msm_prefix(points, scalars):
        X, Y, Z = points
        B = 1 << c
        W = (753 + c - 1) // c
        Gr = wg
        W_pad = ((W + Gr - 1) // Gr) * Gr
        digits = msm_mod.window_digits(scalars, c)
        if W_pad != W:
            digits = jnp.concatenate(
                [digits, jnp.zeros((W_pad - W, M, N), jnp.int32)], axis=0)
        dig_groups = digits[::-1].reshape(W_pad // Gr, Gr, M, N)
        extra = X.ndim - 2

        def body(carry, digs):
            idx = jnp.argsort(digs, axis=-1, stable=True).astype(jnp.int32)
            keys = jnp.take_along_axis(digs, idx, axis=-1)

            def gather(arr):
                def take_m(a_m, i_m):
                    return jnp.take(a_m, i_m, axis=-1)
                return jax.vmap(take_m, in_axes=(-2, 1), out_axes=-2)(arr, idx)

            Xs_, Ys_, Zs_ = gather(X), gather(Y), gather(Z)
            zero_d = keys == 0
            batch = (Gr, M, N)
            Xs_ = F.select(zero_d, F.zeros(batch), Xs_)
            Ys_ = F.select(zero_d, F.ones(batch), Ys_)
            Zs_ = F.select(zero_d, F.zeros(batch), Zs_)
            if level == 1:
                return curve.add(carry, (Xs_[..., 0, :, 0], Ys_[..., 0, :, 0],
                                         Zs_[..., 0, :, 0])), None

            start = jnp.concatenate(
                [jnp.ones((Gr, M, 1), bool), keys[..., 1:] != keys[..., :-1]],
                axis=-1)
            sx, sy, sz = msm_mod._ec_segmented_scan(
                curve, (Xs_, Ys_, Zs_), start)
            if level == 2:
                return curve.add(carry, (sx[..., 0, :, 0], sy[..., 0, :, 0],
                                         sz[..., 0, :, 0])), None

            is_end = jnp.concatenate(
                [keys[..., 1:] != keys[..., :-1], jnp.ones((Gr, M, 1), bool)],
                axis=-1)
            tgt = jnp.where(is_end, keys, B)
            rows = (jnp.arange(Gr)[:, None, None] * (M * (B + 1))
                    + jnp.arange(M)[None, :, None] * (B + 1))
            tgt_flat = (rows + tgt).reshape(-1)

            def scatter(vals, init):
                flat = vals.reshape(vals.shape[:extra] + (-1,))
                out = init.at[..., tgt_flat].set(flat)
                return out.reshape(
                    init.shape[:extra] + (Gr, M, B + 1))[..., :B]

            bX = scatter(sx, F.zeros((Gr * M * (B + 1),)))
            bY = scatter(sy, F.ones((Gr * M * (B + 1),)))
            bZ = scatter(sz, F.zeros((Gr * M * (B + 1),)))
            if level == 3:
                return curve.add(carry, (bX[..., 0, :, 1], bY[..., 0, :, 1],
                                         bZ[..., 0, :, 1])), None
            if barrier:
                bX, bY, bZ = jax.lax.optimization_barrier((bX, bY, bZ))

            if variant == "w":      # scan-free weighted bucket sum
                # S = sum_b b*T_b = sum_k 2^k * reduce(T_b : bit k set),
                # Horner MSB-first -- only reduce/select/double/add ops
                bit_src = jnp.arange(B)
                Sg = None
                for k in range(c - 1, -1, -1):
                    m_k = ((bit_src >> k) & 1).astype(bool)
                    mX = F.select(jnp.broadcast_to(m_k, (Gr, M, B)), bX,
                                  F.zeros((Gr, M, B)))
                    mY = F.select(jnp.broadcast_to(m_k, (Gr, M, B)), bY,
                                  F.ones((Gr, M, B)))
                    mZ = F.select(jnp.broadcast_to(m_k, (Gr, M, B)), bZ,
                                  F.zeros((Gr, M, B)))
                    Rk = msm_mod._ec_reduce(curve, (mX, mY, mZ))
                    if Sg is None:
                        Sg = Rk
                    else:
                        Sg = curve.add(curve.double(Sg), Rk)
            elif variant == "r":      # reduce only, no reverse scan
                Sg = msm_mod._ec_reduce(
                    curve, (bX[..., 1:], bY[..., 1:], bZ[..., 1:]))
            elif variant == "t":    # tree (slicing) impl for both
                run = msm_mod._ec_scan(
                    curve, (bX[..., 1:], bY[..., 1:], bZ[..., 1:]),
                    axis=bX.ndim - 1, reverse=True, impl="tree")
                Sg = msm_mod._ec_reduce(curve, run)
            else:
                run = msm_mod._ec_scan(
                    curve, (bX[..., 1:], bY[..., 1:], bZ[..., 1:]),
                    axis=bX.ndim - 1, reverse=True)
                Sg = msm_mod._ec_reduce(curve, run)  # (..., Gr, M)
            if level == 4:
                return curve.add(carry, tuple(t[..., 0, :] for t in Sg)), None

            def dbl(i, P_):
                return curve.double(P_)

            def horner_step(cr, S_j):
                cr = jax.lax.fori_loop(0, c, dbl, cr)
                return curve.add(cr, S_j), None

            S_stacked = tuple(jnp.moveaxis(t, -2, 0) for t in Sg)
            carry, _ = jax.lax.scan(horner_step, carry, S_stacked)
            return carry, None

        init = curve.zero((M,))
        out, _ = jax.lax.scan(body, init, dig_groups)
        return out

    t0 = time.time()
    out = jax.jit(msm_prefix)(pts, S)
    out = jax.block_until_ready(out)
    # HEALTH CHECK: a poisoned worker passes block_until_ready but fails
    # the next real fetch (tools/tpu_fetch_probe) — fetch to prove life.
    canary = np.asarray(jax.block_until_ready(jnp.arange(8) + 1))
    assert int(canary[-1]) == 8
    host = [np.asarray(t)[:, 0] for t in out]
    print(json.dumps({"prefix": prefix, "wg": wg,
                      "first_s": round(time.time() - t0, 1)}), flush=True)


def main():
    sweep = [("p1", 4), ("p2", 4), ("p3", 4), ("p4", 4), ("p5", 4)]
    for prefix, wg in sweep:
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-m", "tools.tpu_msm_compose", prefix, str(wg)],
            capture_output=True, text=True,
            timeout=int(os.environ.get("PROBE_TIMEOUT", "2400")))
        tail = (res.stdout + res.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        print(f"{'PASS' if res.returncode == 0 else 'FAIL'} {prefix} wg={wg} "
              f"wall={time.time()-t0:.0f}s {last[:160]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_prefix(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    else:
        main()
