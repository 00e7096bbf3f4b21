"""Map the >2^16-lane TPU fault across op classes and sizes.

tools/tpu_fetch_probe found the composite G1 MSM faults the worker when
the flattened (Gr, M, N) batch exceeds 2^16 lanes.  This probe checks
which PRIMITIVE op classes share the limit, each in a fresh process with
a post-run health-check fetch:

  fmul <log2n>    one XLA field mul at 2^log2n lanes
  fmul_pallas <k> the Pallas Montgomery-mul kernel at 2^k lanes
  ecadd <k>       one complete EC add at 2^k lanes
  ecfori <k>      12 fori_loop levels of masked EC adds at 2^k lanes
  sort <k>        argsort+take of (16, 2^k/16) int32
  fft <k>         radix-2 iFFT at domain size 2^k (the compute_H shape)

Usage: python -m tools.tpu_size_probe <op> <log2n>
       python -m tools.tpu_size_probe   # sweep (subprocess-isolated)
"""
import json
import subprocess
import sys
import time

import numpy as np


def _health(jax, jnp):
    c = np.asarray(jax.block_until_ready(jnp.arange(8) + 1))
    assert int(c[-1]) == 8


def run(op: str, log2n: int):
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

    model = mnt4753.get()
    F = model.Fq
    n = 1 << log2n
    rng = np.random.default_rng(11)

    if op in ("fmul", "fmul_pallas"):
        raw = rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
        a = jnp.asarray(raw)
        b = jnp.asarray(raw[:, ::-1].copy())
        if op == "fmul_pallas":
            from snark_challenge_prover_tpu.ops.pallas_field import (
                mont_mul_pallas,
            )

            out = jax.jit(
                lambda x, y: mont_mul_pallas(F.spec, x, y, 256)
            )(a, b)
        else:
            out = jax.jit(F.mul)(a, b)
        jax.block_until_ready(out)
    elif op == "ecadd":
        from tools.tpu_msm_compose import build

        model2, Xs, Ys, S = build(min(n, 4096), M=1)
        G = model2.G1
        X = jnp.broadcast_to(Xs[:, 0, :][:, None, :], (48, n // min(n, 4096), min(n, 4096)))
        Y = jnp.broadcast_to(Ys[:, 0, :][:, None, :], X.shape)
        Z = F.ones(X.shape[1:])
        out = jax.jit(lambda x, y, z: G.add((x, y, z), (x, y, z)))(X, Y, Z)
        jax.block_until_ready(out)
    elif op == "ecfori":
        from tools.tpu_msm_compose import build

        model2, Xs, Ys, S = build(min(n, 4096), M=1)
        G = model2.G1
        X = jnp.broadcast_to(Xs[:, 0, :][:, None, :], (48, n // min(n, 4096), min(n, 4096)))
        Y = jnp.broadcast_to(Ys[:, 0, :][:, None, :], X.shape)
        Z = F.ones(X.shape[1:])

        def fn(X, Y, Z):
            def lev(t, st):
                s2 = tuple(jnp.roll(s, 1, axis=-1) for s in st)
                comb = G.add(s2, st)
                keep = jnp.arange(st[0].shape[-1]) >= t
                return tuple(
                    jnp.where(keep.reshape((1,) * (cc.ndim - 1) + (-1,)), cc, ss)
                    for cc, ss in zip(comb, st)
                )
            return jax.lax.fori_loop(0, 12, lev, (X, Y, Z))

        out = jax.jit(fn)(X, Y, Z)
        jax.block_until_ready(out)
    elif op == "sort":
        d = jnp.asarray(rng.integers(0, 512, size=(16, n // 16), dtype=np.int32))

        def fn(d):
            idx = jnp.argsort(d, axis=-1, stable=True).astype(jnp.int32)
            return jnp.take_along_axis(d, idx, axis=-1)

        out = jax.jit(fn)(d)
        jax.block_until_ready(out)
    elif op == "fft":
        from snark_challenge_prover_tpu.ops.fft import get_evaluation_domain

        Fr = model.Fr
        vals = jnp.asarray(
            rng.integers(0, 1 << 16, size=(48, n), dtype=np.uint32)
        )
        dom = get_evaluation_domain(Fr, n)
        out = jax.jit(dom.ifft)(vals)
        jax.block_until_ready(out)
    else:
        raise SystemExit(f"unknown op {op}")

    _health(jax, jnp)
    print(json.dumps({"op": op, "log2n": log2n, "ok": True}), flush=True)


SWEEP = [
    ("fmul", 17), ("fmul", 20),
    ("ecadd", 17), ("ecfori", 17),
    ("sort", 20),
    ("fft", 17),
    ("fmul_pallas", 20),
]


def main():
    for op, k in SWEEP:
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-m", "tools.tpu_size_probe", op, str(k)],
            capture_output=True, text=True, timeout=2400)
        tail = (res.stdout + res.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        print(f"{'PASS' if res.returncode == 0 else 'FAIL'} {op:12s} 2^{k} "
              f"wall={time.time()-t0:.0f}s {last[:140]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2:
        run(sys.argv[1], int(sys.argv[2]))
    else:
        main()
