"""Narrow the G1-MSM TPU fault to its surfacing point.

tools/tpu_msm_probe shows: msm_multi at (M=4, N=4099, c=9) EXECUTES
twice (block_until_ready passes) and then the device->host fetch of the
tiny (48,4) result raises "TPU device error" — i.e. the worker dies
during/after execution and the error surfaces at the next sync.

Variants (one per invocation; subprocess sweep as main):
  run1fetch   one execution, then fetch the result
  run1sleep   one execution, sleep 10 s, then fetch
  run1other   one execution, then fetch an UNRELATED device array
  run2        two executions, block only (no fetch), then exit 0
  smallout    one execution, fetch, but with N=1024 (below fault size?)

Usage: python -m tools.tpu_fetch_probe <variant>
"""
import json
import subprocess
import sys
import time

VARIANTS = ["run1fetch", "run1sleep", "run1other", "run2", "smallout"]


def run_full(N: int, wg: int = 4, M: int = 4, c: int = 9):
    """Real msm_multi at exact N + health-check fetch."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from tools.tpu_msm_compose import build

    model, Xs, Ys, S = build(N, M)
    G = model.G1
    pts = G.from_affine(Xs, Ys)
    fn = jax.jit(lambda p, s: msm_mod.msm_multi(G, p, s, c, window_group=wg))
    out = jax.block_until_ready(fn(pts, S))
    host = [np.asarray(t) for t in out]
    print(json.dumps({"N": N, "wg": wg, "M": M, "c": c, "ok": True}),
          flush=True)


def run(variant: str):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.ops import msm as msm_mod
    from tools.tpu_msm_probe import run_one  # noqa: F401 (shared builders)
    from tools.tpu_msm_compose import build

    N = 1024 if variant == "smallout" else 4099
    model, Xs, Ys, S = build(N)
    G = model.G1
    pts = G.from_affine(Xs, Ys)
    fn = jax.jit(lambda p, s: msm_mod.msm_multi(G, p, s, 9, window_group=4))
    out = jax.block_until_ready(fn(pts, S))
    print("exec1 done", flush=True)
    if variant == "run2":
        out = jax.block_until_ready(fn(pts, S))
        print("exec2 done", flush=True)
        print(json.dumps({"variant": variant, "ok": True}), flush=True)
        return
    if variant == "run1sleep":
        time.sleep(10)
    if variant == "run1other":
        probe = jax.block_until_ready(jnp.arange(16) * 2)
        print("other fetch:", np.asarray(probe)[:2], flush=True)
        print(json.dumps({"variant": variant, "ok": True}), flush=True)
        return
    host = [np.asarray(t) for t in out]
    print("fetched", [h.shape for h in host], flush=True)
    print(json.dumps({"variant": variant, "ok": True}), flush=True)


def main():
    for v in VARIANTS:
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-m", "tools.tpu_fetch_probe", v],
            capture_output=True, text=True, timeout=1800)
        tail = (res.stdout + res.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        print(f"{'PASS' if res.returncode == 0 else 'FAIL'} {v:10s} "
              f"wall={time.time()-t0:.0f}s {last[:160]}", flush=True)


def threshold():
    """Search the N threshold of the fault (full msm_multi + fetch)."""
    for N in [4096, 4097, 2048, 3072, 4099]:
        t0 = time.time()
        res = subprocess.run(
            [sys.executable, "-m", "tools.tpu_fetch_probe", "full", str(N)],
            capture_output=True, text=True, timeout=1800)
        tail = (res.stdout + res.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        print(f"{'PASS' if res.returncode == 0 else 'FAIL'} N={N:5d} "
              f"lanes={16*N:6d} wall={time.time()-t0:.0f}s {last[:120]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "full":
        run_full(int(sys.argv[2]),
                 wg=int(sys.argv[3]) if len(sys.argv) > 3 else 4,
                 M=int(sys.argv[4]) if len(sys.argv) > 4 else 4,
                 c=int(sys.argv[5]) if len(sys.argv) > 5 else 9)
    elif len(sys.argv) > 1 and sys.argv[1] == "threshold":
        threshold()
    elif len(sys.argv) > 1:
        run(sys.argv[1])
    else:
        main()
