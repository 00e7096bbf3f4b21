"""Challenge fixture generator: the framework's `generate_parameters`
binary (libsnark/generate_parameters.cpp:24-137).

Builds a synthetic satisfiable R1CS with d-1 constraints and 1 public
input, runs the full Groth16 generator, precomputes the domain
evaluations ca/cb/cc (A/B/C rows + input-consistency rows), samples r,
and writes <curve>-parameters / <curve>-input files in the challenge
wire format for both curves.

Defaults match the reference: log2(d+1) = 20 (MNT4753) / 15 (MNT6753);
`fast` mode uses 14 / 10 (generate_parameters.cpp:125-137).

Usage: python -m snark_challenge_prover_tpu.cli_generate_parameters [fast]
       [--log2d-mnt4 N] [--log2d-mnt6 N] [--seed S] [--outdir DIR]
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

import numpy as np


def generate_for_curve(model, log2_d: int, rng, outdir: Path):
    from .io.serialization import Writer
    from .proof_systems.groth16_full import generator
    from .reductions.r1cs_to_qap import assemble_abc_evaluations
    from .relations.examples import generate_r1cs_example_with_field_input
    from .utils.bigint import int_to_limbs

    p = model.Fr.p
    d_plus_1 = 1 << log2_d
    d = d_plus_1 - 1
    ex = generate_r1cs_example_with_field_input(p, d - 1, 1, rng)
    cs = ex.constraint_system
    kp = generator(model, cs, rng)
    pk = kp.pk
    m = cs.num_variables
    # d-1 constraints, 1 input -> m = (d-1) + 2 = d+1 variables, exactly
    # as the reference (generate_parameters.cpp:38 writes m = d+1)
    assert m == d + 1, (m, d)

    spec = model.Fq.spec

    def write_g1_planes(w: Writer, pair, count):
        x, y = (np.asarray(v) for v in pair)
        # interleave x,y per point, zero rows where y == 0 (identity)
        for j in range(count):
            if not y[:, j].any():
                w.chunks.append(b"\x00" * 192)
            else:
                w.fq_block(np.stack([x[:, j], y[:, j]], axis=1))

    def write_g2_planes(w: Writer, pair, count):
        x, y = (np.asarray(v) for v in pair)
        deg = x.shape[0]
        for j in range(count):
            if not y[:, :, j].any():
                w.chunks.append(b"\x00" * (2 * deg * 96))
            else:
                w.fq_block(np.ascontiguousarray(x[:, :, j].T))
                w.fq_block(np.ascontiguousarray(y[:, :, j].T))

    import struct

    w = Writer()
    w.chunks.append(struct.pack("<Q", d))
    w.chunks.append(struct.pack("<Q", m))
    write_g1_planes(w, pk.A_query, m + 1)
    write_g1_planes(w, pk.B_query_g1, m + 1)
    write_g2_planes(w, pk.B_query_g2, m + 1)
    write_g1_planes(w, pk.L_query, m - 1)
    write_g1_planes(w, pk.H_query, d)
    params_path = outdir / f"{model.name}-parameters"
    params_path.write_bytes(w.bytes())

    # input file: w[m+1] = const-padded assignment; ca/cb/cc; r
    # (generate_parameters.cpp:44-57,86-108)
    full = list(ex.primary_input) + list(ex.auxiliary_input)
    aA, aB, aC = assemble_abc_evaluations(
        cs, ex.primary_input, ex.auxiliary_input, model.Fr
    )
    r = rng.randrange(p)

    frs = model.Fr.spec
    wi = Writer()
    for v in [1] + full:
        wi.fq_block(int_to_limbs(frs.to_mont(v)).reshape(48, 1))
    for vec in (aA, aB, aC):
        assert len(vec) == d + 1
        for v in vec:
            wi.fq_block(int_to_limbs(frs.to_mont(v)).reshape(48, 1))
    wi.fq_block(int_to_limbs(frs.to_mont(r)).reshape(48, 1))
    input_path = outdir / f"{model.name}-input"
    input_path.write_bytes(wi.bytes())
    return params_path, input_path


def main(argv=None) -> int:
    from .config import apply_jax_platform_env, setup_compilation_cache

    apply_jax_platform_env()
    setup_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="full", choices=["full", "fast"])
    ap.add_argument("--log2d-mnt4", type=int, default=None)
    ap.add_argument("--log2d-mnt6", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--curve", default="both",
                    choices=["both", "MNT4753", "MNT6753"])
    args = ap.parse_args(argv)

    from .models import mnt4753, mnt6753

    log4 = args.log2d_mnt4 or (14 if args.mode == "fast" else 20)
    log6 = args.log2d_mnt6 or (10 if args.mode == "fast" else 15)
    rng = random.Random(args.seed) if args.seed is not None else random.Random()
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    jobs = []
    if args.curve in ("both", "MNT4753"):
        jobs.append((mnt4753.get(), log4))
    if args.curve in ("both", "MNT6753"):
        jobs.append((mnt6753.get(), log6))
    for model, lg in jobs:
        pp, ip = generate_for_curve(model, lg, rng, outdir)
        print(f"{model.name}: wrote {pp} and {ip}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
