"""Command-line prover: drop-in equivalent of the reference binary
(libsnark/main.cpp:274-295):

    python -m snark_challenge_prover_tpu.cli MNT4753 compute \
        MNT4753-parameters MNT4753-input MNT4753-output

Prints the same coarse phase timings ("load params", "load inputs",
"cpu", "store", total) as main.cpp:201-270.
"""

from __future__ import annotations

import sys
import time


def main(argv=None):
    from .config import apply_jax_platform_env, setup_compilation_cache

    apply_jax_platform_env()
    setup_compilation_cache()
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 5 or argv[1] != "compute":
        print(
            "usage: cli.py <MNT4753|MNT6753> compute <params> <input> <output>",
            file=sys.stderr,
        )
        return 2
    curve, _, params_path, input_path, output_path = argv

    from .proof_systems.groth16 import ChallengeProver
    from .io import serialization as ser

    if curve == "MNT4753":
        from .models import mnt4753 as model_mod
    elif curve == "MNT6753":
        from .models import mnt6753 as model_mod
    else:
        print(f"unknown curve {curve}", file=sys.stderr)
        return 2

    t_start = time.perf_counter()
    t = t_start

    def print_time(label):
        nonlocal t
        t2 = time.perf_counter()
        print(f"{label}: {int((t2 - t) * 1000)} ms")
        t = t2

    model = model_mod.get()
    deg = 2 if curve == "MNT4753" else 3
    params = ser.read_params(params_path, deg)
    print_time("load params")
    inp = ser.read_input(input_path, params.d, params.m)
    print_time("load inputs")

    prover = ChallengeProver(model)
    proof = prover.prove_arrays(params, inp)
    print_time("cpu")

    ser.write_proof(output_path, *proof, g2_deg=deg)
    print_time("store")
    print(
        f"Total time from input to output: "
        f"{int((time.perf_counter() - t_start) * 1000)} ms"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
