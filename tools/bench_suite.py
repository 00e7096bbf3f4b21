"""Microbenchmark suite: per-kernel throughput numbers.

The reference's only benches are cuda-fixnum/bench/bench.cu (mul_lo /
mul_wide / modexp over widths) and the self-timed prover phases
(SURVEY §6).  This suite covers the same axes for the TPU build:

  * field-mul throughput (Montgomery muls/s) vs batch size
  * G1/G2 add throughput
  * FFT wall time per size
  * MSM points/s sweep over 2^14..2^20 (BASELINE.md north-star metric)
  * end-to-end challenge prove at a chosen size

Run: python tools/bench_suite.py [--sizes 14,16] [--field-only]
Each result prints as one JSON line for machine consumption.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **extra}),
          flush=True)


def bench_field(model, sizes):
    F = model.Fr
    rng = np.random.default_rng(0)
    for lg in sizes:
        n = 1 << lg
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32))
        f = jax.jit(F.mul)
        dt = _bench(f, a, b)
        emit("field_mul_throughput", round(n / dt), "mul/s", batch=n,
             ms=round(dt * 1e3, 3))


def bench_group(model, sizes):
    G1 = model.G1
    F = model.Fq
    rng = np.random.default_rng(0)
    for lg in sizes:
        n = 1 << lg
        mk = lambda: jnp.asarray(
            rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
        )
        P = (mk(), mk(), mk())
        Q = (mk(), mk(), mk())
        f = jax.jit(G1.add)
        dt = _bench(f, P, Q)
        emit("g1_add_throughput", round(n / dt), "add/s", batch=n,
             ms=round(dt * 1e3, 3))


def bench_fft(model, sizes):
    from snark_challenge_prover_tpu.ops.fft import get_evaluation_domain

    F = model.Fr
    rng = np.random.default_rng(0)
    for lg in sizes:
        n = 1 << lg
        dom = get_evaluation_domain(F, n)
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32))
        f = jax.jit(dom.fft)
        dt = _bench(f, a)
        emit("fft_time", round(dt * 1e3, 2), "ms", size=n,
             melem_s=round(n / dt / 1e6, 3))


def bench_msm(model, sizes, window=None):
    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from snark_challenge_prover_tpu.ops.fixed_base import get_window_table, batch_exp

    G1 = model.G1
    F = model.Fr
    rng = np.random.default_rng(0)
    # real curve points: k*G for small k via a fixed-base table
    for lg in sizes:
        n = 1 << lg
        ks = np.zeros((48, n), dtype=np.uint32)
        ks[0] = rng.integers(1, 1 << 16, n)  # distinct small multiples of G
        table = get_window_table(G1, 4, model.g1_generator())
        pts = jax.jit(lambda t, s: batch_exp(G1, 4, t, s))(table, jnp.asarray(ks))
        scal = jnp.asarray(rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32))

        def run(pts, scal):
            return msm_mod.msm(G1, pts, scal, window)

        f = jax.jit(run)
        dt = _bench(f, pts, scal, warmup=1, iters=1)
        emit("msm_throughput", round(n / dt), "points/s", size=n,
             s=round(dt, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10,12")
    ap.add_argument("--curve", default="MNT4753")
    ap.add_argument("--field-only", action="store_true")
    ap.add_argument("--msm", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from snark_challenge_prover_tpu.models import mnt4753, mnt6753

    model = mnt4753.get() if args.curve == "MNT4753" else mnt6753.get()
    emit("devices", len(jax.devices()), "chips", backend=jax.default_backend())

    bench_field(model, sizes)
    if args.field_only:
        return
    bench_group(model, sizes)
    bench_fft(model, sizes)
    if args.msm:
        bench_msm(model, sizes)


if __name__ == "__main__":
    main()
