"""Headline benchmark: end-to-end Groth16 challenge proof on MNT4753.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): its baseline is
operational — `main MNT4753 compute` self-timing.  vs_baseline here is
MEASURED, not estimated: native/cpu_baseline.cpp reimplements the
reference's CPU pipeline (CIOS Montgomery mul, branchy projective
formulas, Pippenger MSM with OpenMP chunking, radix-2 FFT — see its
header for the file:line map) and is run on the very same fixture
files; its proof bytes must match ours (large-size byte-exactness
check, the same sha256 protocol as README.md:46-58).

Timeout-proofing (round-5 restructure; BENCH_r04 rc=124 post-mortem):
the headline JSON line is emitted IMMEDIATELY after the steady-state
measurement.  The CPU comparator runs afterwards under a bounded
timeout; if it completes, a superseding JSON line with the measured
vs_baseline is printed (drivers take the last parseable line).  A
budget clock skips the second prove when the first (compile-including)
run already consumed most of it, so a stray cold compile degrades the
number instead of erasing it.

Environment knobs:
  BENCH_LOG2_D (default 16)  -- domain size exponent (d+1 = 2^k)
  BENCH_CURVE  (default MNT4753)
  BENCH_CACHE  (default /tmp/snark_bench_cache) -- fixture/baseline cache
  BENCH_CPU    (default 1; 0 skips the CPU comparator run)
  BENCH_CPU_TIMEOUT (default 7200 seconds, clamped to remaining budget)
  BENCH_BUDGET_S (default 2700) -- soft wall-clock budget for the whole run
"""

import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent


def _gen_fixture_files(curve: str, log2_d: int, pdir: Path):
    """Synthetic params/input in the challenge wire format (structure of
    generate_parameters.cpp:60-112 with random points; the prover
    exercises the identical code path)."""
    import numpy as np

    from tools import oracle as orc
    from snark_challenge_prover_tpu.models import mnt4753, mnt6753

    model = mnt4753.get() if curve == "MNT4753" else mnt6753.get()
    rng = np.random.default_rng(42)
    d_plus_1 = 1 << log2_d
    d = d_plus_1 - 1
    m = d_plus_1 + 2
    cur = orc.ORACLES[curve]()
    frs = model.Fr.spec

    def strip_pts(group, gen, count, cap):
        base = group.mul(7, gen)
        step = group.mul(11, gen)
        pts = []
        P = base
        for _ in range(min(count, cap)):
            pts.append(P)
            P = group.add(P, step)
        return (pts * (count // len(pts) + 1))[:count]

    t0 = time.time()
    params_path = pdir / f"{curve}-{log2_d}.params"
    input_path = pdir / f"{curve}-{log2_d}.input"
    import struct

    with open(params_path, "wb") as f:
        f.write(struct.pack("<Q", d))
        f.write(struct.pack("<Q", m))
        g1_m1 = strip_pts(cur.g1, cur.g1_gen, m + 1, 256)
        for P in g1_m1:
            orc.write_g1(f, cur, P)
        for P in g1_m1:
            orc.write_g1(f, cur, P)
        for P in strip_pts(cur.g2, cur.g2_gen, m + 1, 128):
            orc.write_g2(f, cur, P)
        for P in g1_m1[: m - 1]:
            orc.write_g1(f, cur, P)
        for P in g1_m1[:d]:
            orc.write_g1(f, cur, P)

    rp = frs.p
    rvals = rng.integers(0, 1 << 62, size=(3 * (d + 1) + m + 2, 13), dtype=np.uint64)
    vals = []
    for row in rvals:
        v = 0
        for x in row:
            v = (v << 62) | int(x)
        vals.append(v % rp)
    w = [1] + vals[:m]
    ca = vals[m : m + d + 1]
    cb = vals[m + d + 1 : m + 2 * (d + 1)]
    cc = [a * b % rp for a, b in zip(ca, cb)]
    r = vals[-1]
    with open(input_path, "wb") as f:
        for v in w:
            orc.write_mont(f, rp, v)
        for arr in (ca, cb, cc):
            for v in arr:
                orc.write_mont(f, rp, v)
        orc.write_mont(f, rp, r)
    return params_path, input_path, time.time() - t0


def _cpu_baseline(curve, params_path, input_path, cache: Path, log2_d: int,
                  timeout: float | None = None):
    """Run the measured CPU comparator once per fixture; cache the result."""
    meta = cache / f"{curve}-{log2_d}.cpu.json"
    out = cache / f"{curve}-{log2_d}.cpu.output"
    if meta.exists() and out.exists():
        return json.loads(meta.read_text()), out
    exe = REPO / "native" / "build" / "cpu_baseline"
    if not exe.exists():
        subprocess.run(["make", "-C", str(REPO / "native"), "cpu"], check=False)
    if not exe.exists() or os.environ.get("BENCH_CPU", "1") == "0":
        return None, None
    cap = int(os.environ.get("BENCH_CPU_TIMEOUT", "7200"))
    if timeout is not None:
        cap = min(cap, max(30, int(timeout)))
    try:
        res = subprocess.run(
            [str(exe), curve, "compute", str(params_path), str(input_path), str(out)],
            capture_output=True, text=True, timeout=cap,
        )
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"# cpu comparator exceeded {cap}s, skipped\n")
        return None, None
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-500:] + "\n")
        return None, None
    data = json.loads(res.stdout.strip().splitlines()[-1])
    meta.write_text(json.dumps(data))
    return data, out


def main():
    from snark_challenge_prover_tpu.config import apply_jax_platform_env

    apply_jax_platform_env()
    # persistent compile cache (TPU executables from prior runs included)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO / "tests" / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # The axon TPU tunnel can be transiently down ("TPU backend
    # setup/compile error"); rather than crash with no number, retry,
    # then fall back to a smaller CPU-backend measurement (flagged in
    # the metric name so it is never mistaken for a TPU figure).
    platform = "tpu"
    import time as _time

    for attempt in range(int(os.environ.get("BENCH_TPU_RETRIES", "3"))):
        try:
            devs = jax.devices()
            if any(d.platform in ("tpu", "axon") for d in devs):
                break
            platform = "cpu"
            break
        except RuntimeError as e:
            sys.stderr.write(f"# TPU init attempt {attempt}: {e}\n")
            _time.sleep(60)
    else:
        platform = "cpu"
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("BENCH_LOG2_D", "8")  # CPU-feasible size
        sys.stderr.write("# TPU unavailable - CPU fallback measurement\n")
    os.environ.setdefault("SNARK_TPU_PROFILE", "0")
    # default 2^16: the largest size with a round-5-warmed executable
    # cache AND a cached single-core C++ comparator run (425.7 s); the
    # round-5 measured steady state is 105.9 s, byte-exact (PLAN.md)
    log2_d = int(os.environ.get("BENCH_LOG2_D", "16"))
    curve = os.environ.get("BENCH_CURVE", "MNT4753")
    cache = Path(os.environ.get("BENCH_CACHE", "/tmp/snark_bench_cache"))
    cache.mkdir(parents=True, exist_ok=True)

    from snark_challenge_prover_tpu.io import serialization as ser
    from snark_challenge_prover_tpu.proof_systems.groth16 import ChallengeProver
    from snark_challenge_prover_tpu.models import mnt4753, mnt6753

    model = mnt4753.get() if curve == "MNT4753" else mnt6753.get()

    params_path = cache / f"{curve}-{log2_d}.params"
    input_path = cache / f"{curve}-{log2_d}.input"
    gen_s = 0.0
    if not (params_path.exists() and input_path.exists()):
        params_path, input_path, gen_s = _gen_fixture_files(curve, log2_d, cache)

    deg = 2 if curve == "MNT4753" else 3
    params = ser.read_params(str(params_path), deg)
    inp = ser.read_input(str(input_path), params.d, params.m)

    budget = float(os.environ.get("BENCH_BUDGET_S", "2700"))
    t_start = time.time()

    prover = ChallengeProver(model)
    # compile + first run
    t0 = time.time()
    proof = prover.prove_arrays(params, inp)
    first_s = time.time() - t0
    # steady state -- skipped if the first (compile-including) run already
    # ate most of the budget, so SOME number always gets out
    steady_is_first = (time.time() - t_start) > 0.6 * budget
    if steady_is_first:
        steady_s = first_s
        sys.stderr.write("# budget: steady-state rerun skipped, value "
                         "includes compile time\n")
    else:
        t0 = time.time()
        proof = prover.prove_arrays(params, inp)
        steady_s = time.time() - t0

    # serialize our proof for the byte-exactness check
    class _Sink:
        def write(self, data):
            self.data = data

    sink = _Sink()
    our_bytes = ser.write_proof(sink, *proof, g2_deg=deg)
    our_sha = hashlib.sha256(our_bytes).hexdigest()

    suffix = "" if platform == "tpu" else "_cpufallback"
    metric = f"groth16_{curve.lower()}_proof_latency_2e{log2_d}{suffix}"

    def emit(vs):
        print(json.dumps({"metric": metric, "value": round(steady_s, 4),
                          "unit": "s", "vs_baseline": vs}), flush=True)

    # headline line FIRST: a comparator overrun can no longer erase the
    # measurement.  vs_baseline from the comparator cache if present.
    meta = cache / f"{curve}-{log2_d}.cpu.json"
    cached_vs = None
    if meta.exists():
        try:
            cached_vs = round(json.loads(meta.read_text())["compute_s"] / steady_s, 3)
        except Exception:
            pass
    emit(cached_vs if cached_vs is not None else 0.0)
    print(f"# fixture_gen={gen_s:.1f}s first(incl compile)={first_s:.1f}s "
          f"steady={steady_s:.2f}s sha256={our_sha[:16]}", file=sys.stderr)

    remaining = budget - (time.time() - t_start)
    cpu, cpu_out = _cpu_baseline(curve, params_path, input_path, cache, log2_d,
                                 timeout=remaining)
    byte_exact = None
    cpu_s = None
    if cpu is not None:
        cpu_s = cpu["compute_s"]
        if cpu_out and cpu_out.exists():
            byte_exact = hashlib.sha256(cpu_out.read_bytes()).hexdigest() == our_sha
        # superseding line with the measured ratio (drivers parse the last)
        emit(round(cpu_s / steady_s, 3))
    print(
        f"# cpu_measured={('%.2f' % cpu_s) if cpu_s is not None else 'n/a'}s "
        f"byte_exact_vs_cpu={byte_exact}",
        file=sys.stderr,
    )
    if byte_exact is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
