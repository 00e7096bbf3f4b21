"""Bisect WHICH component of the fused G1 MSM faults the TPU at N~2^12.

tools/tpu_msm_probe established: the fault is window_group-independent
and absent at N=11, so it lives in an op whose behaviour changes with N.
Each invocation runs ONE stage of msm_multi's body in isolation at the
bench shape (Gr=4, M=4, N=4099, G1 full width):

  sort     argsort + take_along_axis of digits
  gather   point gather (vmap take) + zero-digit masking
  segscan  segmented EC scan (hillis)
  scatter  segment-total scatter into buckets
  triangle reverse EC scan over buckets + tree reduce
  horner   c doublings + add per group under lax.scan
  ecadd    one full-width EC add at the (Gr, M, N) batch
  ecchain  12 sequential masked EC-add levels (the segscan's add load)

Usage: python -m tools.tpu_msm_bisect <stage> [N]
       python -m tools.tpu_msm_bisect          # sweep all via subprocess
"""
import json
import os
import subprocess
import sys
import time

STAGES = ["sort", "gather", "ecadd", "ecchain", "segscan", "scatter",
          "triangle", "horner"]


def build(N: int, Gr: int = 4, M: int = 4, c: int = 9):
    import numpy as np
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs
    from tools.oracle import mnt4753_oracle

    model = mnt4753.get()
    ocur = mnt4753_oracle()
    fqs = model.Fq.spec
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
    Xs = jnp.broadcast_to(X[:, None, None, :], (48, Gr, M, N))
    Ys = jnp.broadcast_to(Y[:, None, None, :], (48, Gr, M, N))
    rng = np.random.default_rng(5)
    digs = jnp.asarray(rng.integers(0, 1 << c, size=(Gr, M, N), dtype=np.int32))
    return model, Xs, Ys, digs


def run_stage(stage: str, N: int):
    import jax
    import jax.numpy as jnp

    model, Xs, Ys, digs = build(N)
    G = model.G1
    F = model.Fq
    from snark_challenge_prover_tpu.ops import msm as msm_mod

    Gr, M, _ = digs.shape
    B = 1 << 9
    ones = F.ones(digs.shape)
    Zs = jnp.broadcast_to(ones, Xs.shape)

    if stage == "sort":
        def fn(d):
            idx = jnp.argsort(d, axis=-1, stable=True).astype(jnp.int32)
            return jnp.take_along_axis(d, idx, axis=-1)
        out = jax.jit(fn)(digs)
    elif stage == "gather":
        def fn(X, d):
            idx = jnp.argsort(d, axis=-1, stable=True).astype(jnp.int32)
            def take_m(a_m, i_m):
                return jnp.take(a_m, i_m, axis=-1)
            return jax.vmap(take_m, in_axes=(-2, 1), out_axes=-2)(
                X[:, 0], idx)
        out = jax.jit(fn)(Xs, digs)
    elif stage == "ecadd":
        def fn(X, Y, Z):
            return G.add((X, Y, Z), (X, Y, Z))
        out = jax.jit(fn)(Xs, Ys, Zs)
    elif stage == "ecchain":
        def fn(X, Y, Z):
            def lev(t, st):
                s2 = tuple(jnp.roll(s, 1, axis=-1) for s in st)
                comb = G.add(s2, st)
                keep = (jnp.arange(st[0].shape[-1]) >= t)
                return tuple(
                    jnp.where(keep.reshape((1,) * (c.ndim - 1) + (-1,)), c, s)
                    for c, s in zip(comb, st)
                )
            return jax.lax.fori_loop(0, 12, lev, (X, Y, Z))
        out = jax.jit(fn)(Xs, Ys, Zs)
    elif stage == "segscan":
        def fn(X, Y, Z, d):
            start = jnp.concatenate(
                [jnp.ones((Gr, M, 1), bool), d[..., 1:] != d[..., :-1]],
                axis=-1)
            return msm_mod._ec_segmented_scan(G, (X, Y, Z), start)
        out = jax.jit(fn)(Xs, Ys, Zs, digs)
    elif stage == "scatter":
        def fn(X, Y, Z, keys):
            is_end = jnp.concatenate(
                [keys[..., 1:] != keys[..., :-1], jnp.ones((Gr, M, 1), bool)],
                axis=-1)
            tgt = jnp.where(is_end, keys, B)
            rows = (jnp.arange(Gr)[:, None, None] * (M * (B + 1))
                    + jnp.arange(M)[None, :, None] * (B + 1))
            tgt_flat = (rows + tgt).reshape(-1)

            def scatter(vals, init):
                flat = vals.reshape(vals.shape[:1] + (-1,))
                outp = init.at[..., tgt_flat].set(flat)
                return outp.reshape(init.shape[:1] + (Gr, M, B + 1))[..., :B]

            return (scatter(X, F.zeros((Gr * M * (B + 1),))),
                    scatter(Y, F.ones((Gr * M * (B + 1),))),
                    scatter(Z, F.zeros((Gr * M * (B + 1),))))
        out = jax.jit(fn)(Xs, Ys, Zs, digs)
    elif stage == "triangle":
        bX = F.zeros((Gr, M, B))
        bY = F.ones((Gr, M, B))
        bZ = F.zeros((Gr, M, B))
        def fn(bX, bY, bZ):
            run = msm_mod._ec_scan(G, (bX, bY, bZ), axis=bX.ndim - 1,
                                   reverse=True)
            return msm_mod._ec_reduce(G, run)
        out = jax.jit(fn)(bX, bY, bZ)
    elif stage == "horner":
        S = (F.zeros((Gr, M)), F.ones((Gr, M)), F.zeros((Gr, M)))
        def fn(S):
            def dbl(i, P):
                return G.double(P)
            def step_(cr, S_j):
                cr = jax.lax.fori_loop(0, 9, dbl, cr)
                return G.add(cr, S_j), None
            St = tuple(jnp.moveaxis(t, -2, 0) for t in S)
            carry = G.zero((M,))
            carry, _ = jax.lax.scan(step_, carry, St)
            return carry
        out = jax.jit(fn)(S)
    else:
        raise SystemExit(f"unknown stage {stage}")
    jax.block_until_ready(out)
    # HEALTH CHECK: block_until_ready returns success even when the
    # execution faulted the worker asynchronously (tools/tpu_fetch_probe:
    # run1other fails after a poisoning run).  Only a real device->host
    # fetch proves the worker survived.
    import numpy as np

    canary = np.asarray(jax.block_until_ready(jnp.arange(8) + 1))
    assert int(canary[-1]) == 8
    print(json.dumps({"stage": stage, "N": N, "ok": True}), flush=True)


def main():
    N = int(os.environ.get("BISECT_N", "4099"))
    results = []
    for st in STAGES:
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-m", "tools.tpu_msm_bisect", st, str(N)],
            capture_output=True, text=True,
            timeout=int(os.environ.get("PROBE_TIMEOUT", "2400")),
        )
        tail = (res.stdout + res.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        print(f"{'PASS' if res.returncode == 0 else 'FAIL'} {st:9s} "
              f"wall={time.time()-t0:.0f}s {last[:200]}", flush=True)
        results.append((st, res.returncode))
    print("==== SUMMARY ====")
    for st, rc in results:
        print(f"{'PASS' if rc == 0 else 'FAIL'} {st}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_stage(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 4099)
    else:
        main()
