"""Stage-1 field-arithmetic demo CLI: the framework's analogue of the
cuda-fixnum bridge binary (cuda-fixnum/main.cu:129-193 do_fixnum_example).

Stream format (matching the reference): repeat until EOF
    size_t n
    n/2 Fq(MNT4753) elements x0, n/2 elements x1   (96-byte Montgomery LE)
    n/2 Fq(MNT6753) elements y0, n/2 elements y1
and for each chunk write n/2 Montgomery products x0[i]*x1[i] mod q4
followed by n/2 products y0[i]*y1[i] mod q6.  (The reference zero-pads
to 128 bytes internally for the 1024-bit warp fixnum, main.cu:120-122;
our 48x16-bit planes are already 768-bit so no shift is needed.)

Usage: python -m snark_challenge_prover_tpu.cli_fixnum <inputs> <outputs>
"""

from __future__ import annotations

import struct
import sys

import jax
import numpy as np


def _mul_block(F, a_bytes: bytes, b_bytes: bytes) -> bytes:
    import jax.numpy as jnp

    from .utils.bigint import bytes_to_limbs_le, limbs_to_bytes_le

    a = jnp.asarray(bytes_to_limbs_le(a_bytes))
    b = jnp.asarray(bytes_to_limbs_le(b_bytes))
    out = jax.jit(F.mul)(a, b)
    return limbs_to_bytes_le(np.asarray(out))


def main(argv=None) -> int:
    from .config import apply_jax_platform_env, setup_compilation_cache

    apply_jax_platform_env()
    setup_compilation_cache()
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: cli_fixnum <inputs> <outputs>", file=sys.stderr)
        return 2

    from .models import mnt4753, mnt6753

    fq4 = mnt4753.get().Fq  # q(MNT4753)
    fq6 = mnt6753.get().Fq  # q(MNT6753)

    with open(argv[0], "rb") as f, open(argv[1], "wb") as out:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (n,) = struct.unpack("<Q", hdr)
            half = n // 2
            x0 = f.read(96 * half)
            x1 = f.read(96 * half)
            out.write(_mul_block(fq4, x0, x1))
            y0 = f.read(96 * half)
            y1 = f.read(96 * half)
            out.write(_mul_block(fq6, y0, y1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
