"""Probe for the G1 fused-MSM TPU fault (BENCH_r01/r02: the bench's
G1 stage crashes the axon TPU worker at d+1=2^12).

Runs ONE configuration of the exact `_g1_stage`-shaped program (M fused
MSMs over G1, full-width scalars) per invocation, so a worker fault
cannot poison the next config.  The sweep driver is `main()` (no args):
it subprocess-runs each config with a timeout and prints a table.

Usage:
  python -m tools.tpu_msm_probe                 # full sweep
  python -m tools.tpu_msm_probe one <log2N> <M> <c> <wg|0> [bits]
"""
import json
import os
import subprocess
import sys
import time


def run_one(log2n: int, M: int, c: int, wg, bits: int = 753):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs
    from tools.oracle import mnt4753_oracle

    model = mnt4753.get()
    ocur = mnt4753_oracle()
    G, fqs, frs = model.G1, model.Fq.spec, model.Fr.spec
    N = (1 << log2n) + 3  # odd tail like the bench's m+1 = 2^k + 3

    # small strided stream of distinct points, tiled to N (cheap host gen)
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
    pack = G.from_affine(Xs, Ys)

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 1 << 62, size=(M * N, 13), dtype=np.uint64)
    scal = []
    for row in raw:
        v = 0
        for x in row:
            v = (v << 62) | int(x)
        scal.append((v % frs.p) >> (753 - bits) if bits < 753 else v % frs.p)
    S = jnp.asarray(ints_to_limbs(scal)).reshape(48, M, N)

    t0 = time.time()
    fn = jax.jit(
        lambda p, s: msm_mod.msm_multi(
            G, p, s, c, window_group=(wg or None), scalar_bits=bits
        )
    )
    out = fn(pack, S)
    out = jax.block_until_ready(out)
    dt = time.time() - t0
    t0 = time.time()
    out2 = jax.block_until_ready(fn(pack, S))
    steady = time.time() - t0
    # spot-check MSM 0 against the host oracle
    from snark_challenge_prover_tpu.utils.bigint import limbs_to_int

    q = fqs.p
    Xo, Yo, Zo = (
        fqs.from_mont(limbs_to_int(np.asarray(t)[:, 0])) for t in out
    )
    want = None
    for s, pt in zip(scal[:N], pts):
        want = ocur.g1.add(want, ocur.g1.mul(s, pt))
    if Zo == 0:
        got = None
    else:
        zi = pow(Zo, -1, q)
        got = (Xo * zi % q, Yo * zi % q)
    print(json.dumps({
        "ok": True, "match": got == want, "first_s": round(dt, 1),
        "steady_s": round(steady, 2),
    }), flush=True)


SWEEP = [
    # (log2N, M, c, wg, bits) — ordered to answer "is it window_group?"
    (12, 4, 9, 0, 753),   # the bench config (wg=0 -> default: all 84)
    (12, 4, 9, 4, 753),   # small group: ~16x smaller working set
    (12, 4, 9, 16, 753),
    (12, 4, 8, 8, 753),
    (12, 4, 12, 4, 753),
    (14, 4, 11, 4, 753),  # the fast-config production size
]


def main():
    results = []
    for cfg in SWEEP:
        log2n, M, c, wg, bits = cfg
        tag = f"N=2^{log2n}+3 M={M} c={c} wg={wg or 'def'} bits={bits}"
        print(f"--- {tag}", flush=True)
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-m", "tools.tpu_msm_probe", "one",
             str(log2n), str(M), str(c), str(wg), str(bits)],
            capture_output=True, text=True,
            timeout=int(os.environ.get("PROBE_TIMEOUT", "2400")),
        )
        wall = time.time() - t0
        tail = (res.stdout + res.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        print(f"    rc={res.returncode} wall={wall:.0f}s {last[:300]}",
              flush=True)
        results.append((tag, res.returncode, last[:200]))
    print("==== SUMMARY ====")
    for tag, rc, last in results:
        print(f"{'PASS' if rc == 0 else 'FAIL'}  {tag}  {last}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        log2n, M, c, wg = map(int, sys.argv[2:6])
        bits = int(sys.argv[6]) if len(sys.argv) > 6 else 753
        run_one(log2n, M, c, wg, bits)
    else:
        main()
