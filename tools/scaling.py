"""Weak-scaling harness: MSM + FFT efficiency at D ∈ {1,2,4,8} devices.

Runs the sharded MSM (parallel/msm_sharded.py) and the 4-step FFT
(parallel/fft_sharded.py) on meshes of increasing size with the
per-device problem size held constant (weak scaling), and emits a JSON
artifact with efficiency vs the 1-device run — the BASELINE.md target
is >= 80%.

On this host real multi-chip hardware is unavailable: by default the
harness uses the virtual 8-device CPU mesh (functional scaling + comm
pattern validation; timings there measure the XLA CPU backend, not
ICI).  On a real multi-chip TPU slice the same script measures true
scaling — pass --platform tpu.

Usage: python -m tools.scaling [--log2-per-device 8] [--out scaling.json]
"""

from __future__ import annotations

import argparse
import json
import time


def run(platform: str, log2_per_device: int, curve: str = "MNT4753",
        scalar_bits: int = 64, repeats: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snark_challenge_prover_tpu.models import mnt4753, mnt6753
    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.parallel.fft_sharded import fft_sharded
    from snark_challenge_prover_tpu.parallel.mesh import make_mesh
    from snark_challenge_prover_tpu.parallel.msm_sharded import msm_multi_sharded
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

    devices = jax.devices(platform)
    model = mnt4753.get() if curve == "MNT4753" else mnt6753.get()
    F, Fq, G1 = model.Fr, model.Fq, model.G1

    n_per = 1 << log2_per_device
    rng = np.random.default_rng(7)
    results = []
    import os

    # every mesh size costs a fresh multi-minute XLA:CPU shard_map
    # compile on this 1-core host; SNARK_SCALING_SIZES=1,8 measures just
    # the efficiency endpoints when the full sweep cannot fit a round
    size_env = os.environ.get("SNARK_SCALING_SIZES")
    wanted = ([int(x) for x in size_env.split(",")] if size_env
              else [1, 2, 4, 8])
    sizes = [d for d in wanted if d <= len(devices)]
    for D in sizes:
        mesh = make_mesh(D, devices=devices)
        N = n_per * D
        # synthetic points: strip of small multiples of the generator
        # (host-cheap; arithmetic cost is distribution-independent)
        k = rng.integers(1, 1 << 20, size=min(N, 64))
        from tools.oracle import ORACLES

        cur = ORACLES[curve]()
        pts = [cur.g1.mul(int(x), cur.g1_gen) for x in k]
        pts = (pts * (N // len(pts) + 1))[:N]
        xs = ints_to_limbs([Fq.spec.to_mont(P[0]) for P in pts])
        ys = ints_to_limbs([Fq.spec.to_mont(P[1]) for P in pts])
        X, Y, Z = G1.from_affine(jnp.asarray(xs), jnp.asarray(ys))
        pts_m = tuple(a[..., None, :] for a in (X, Y, Z))
        scal = ints_to_limbs(
            [int(x) for x in rng.integers(0, 1 << 62, size=N, dtype=np.uint64)]
        )
        scal_m = jnp.asarray(scal)[:, None, :]

        def msm_run():
            out = msm_multi_sharded(
                mesh, G1, pts_m, scal_m, c=8, scalar_bits=scalar_bits
            )
            return jax.block_until_ready(out)

        msm_run()  # compile
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            msm_run()
            ts.append(time.perf_counter() - t0)
        msm_s = min(ts)

        # FFT: weak scaling over n = n_per * D (needs n >= D^2 for 4-step)
        n_fft = max(n_per * D, D * D)
        coeffs = [int(x) for x in rng.integers(0, 1 << 62, size=n_fft, dtype=np.uint64)]
        a = jnp.asarray(ints_to_limbs([F.spec.to_mont(c) for c in coeffs]))

        def fft_run():
            return jax.block_until_ready(fft_sharded(mesh, F, a))

        fft_run()
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fft_run()
            ts.append(time.perf_counter() - t0)
        fft_s = min(ts)

        results.append(
            {"devices": D, "msm_n": N, "msm_s": msm_s, "fft_n": n_fft, "fft_s": fft_s}
        )

    base = results[0]
    for r in results:
        # weak scaling: perfect = constant time as D grows with N/D fixed
        r["msm_weak_eff"] = round(base["msm_s"] / r["msm_s"], 3)
        r["fft_weak_eff"] = round(base["fft_s"] / r["fft_s"], 3)
    return {
        "platform": platform,
        "curve": curve,
        "log2_per_device": log2_per_device,
        "scalar_bits": scalar_bits,
        "points": results,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--log2-per-device", type=int, default=8)
    ap.add_argument("--curve", default="MNT4753")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()
    import os

    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    data = run(args.platform, args.log2_per_device, args.curve)
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data["points"][-1]))


if __name__ == "__main__":
    main()
