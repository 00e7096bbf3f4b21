"""Distributed 4-step FFT over a device mesh.

The reference's multicore FFT (basic_radix2_domain_aux.tcc:218-296) is
a two-phase decomposition: per-chunk twiddled folds of the whole array
(an all-to-all read pattern) followed by independent serial FFTs and a
strided regather.  That is structurally Bailey's 4-step method, which
maps 1:1 onto a TPU mesh (SURVEY §2.5):

    view x as an (n1, n2) matrix, shard columns (n2) across devices
    1. local size-n1 FFTs down each column           [no comm]
    2. twiddle by w_n^(j2 * k1)                      [no comm]
    3. transpose                                     [all_to_all on ICI]
    4. local size-n2 FFTs down each new column       [no comm]

Output element k1 + n1*k2 lands at array position [k1, k2] of the
transposed layout; `fft_sharded` returns the naturally-ordered (48, n)
result by undoing the index mixing with one gather on the way out.

Sizes: n = n1 * n2, n2 = D * n2loc with D = mesh size; all powers of 2.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.fft import basic_radix2_fft_batched, _power_vector
from ..ops.field import Fp
from ..utils.bigint import ints_to_limbs
from .mesh import DATA_AXIS


@lru_cache(maxsize=None)
def _twiddle_block(F: Fp, n: int, n1: int, j2_start: int, n2loc: int, omega: int):
    """W[., k1, j2] = omega^(j2 * k1), Montgomery, for this device's
    column strip j2 in [j2_start, j2_start + n2loc)."""
    p = F.p
    vals = [
        pow(omega, (j2_start + j2) * k1, p)
        for k1 in range(n1)
        for j2 in range(n2loc)
    ]
    return ints_to_limbs([F.spec.to_mont(v) for v in vals]).reshape(48, n1, n2loc)


def _split(n: int, D: int) -> tuple[int, int]:
    """Pick n = n1 * n2 as square as possible with D | n1 and D | n2
    (step 1 shards j2; the all_to_all transpose splits k1) — requires
    n >= D^2, the usual 4-step scaling regime."""
    n1 = 1
    while n1 * n1 < n:
        n1 *= 2
    n2 = n // n1
    while n1 % D and n2 > 1:
        n1 *= 2
        n2 = n // n1
    while n2 % D and n1 >= 2 * D:
        n1 //= 2
        n2 = n // n1
    if n1 % D or n2 % D:
        raise ValueError(f"cannot shard FFT of size {n} over {D} devices")
    return n1, n2


def fft_sharded(mesh: Mesh, F: Fp, a, omega: int | None = None,
                inverse: bool = False, scale_by_n_inv: bool = False):
    """Distributed DFT of (48, n) planes over the mesh's data axis.

    Returns the naturally-ordered evaluation vector, replicated output
    sharding (callers typically feed it straight into elementwise ops,
    which JAX re-shards automatically)."""
    D = mesh.shape[DATA_AXIS]
    n = a.shape[1]
    n1, n2 = _split(n, D)
    n2loc = n2 // D
    p = F.p
    if omega is None:
        omega = F.spec.get_root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    w_n1 = pow(omega, n2, p)   # primitive n1-th root
    w_n2 = pow(omega, n1, p)   # primitive n2-th root

    # per-device twiddle strips, stacked on a leading device axis so the
    # shard_map body can slice its own block as a constant
    tw = np.stack(
        [
            _twiddle_block(F, n, n1, d * n2loc, n2loc, omega)
            for d in range(D)
        ]
    )  # (D, 48, n1, n2loc)
    tw_dev = jnp.asarray(tw)

    def body(a_blk, tw_blk):
        # a_blk: (48, n1, n2loc) — this device's column strip j2
        a1 = basic_radix2_fft_batched(F, a_blk, w_n1)     # step 1: k1 axis
        a1 = F.mul(a1, tw_blk[0])                          # step 2 twiddle
        # step 3: transpose k1 <-> j2 across devices.  all_to_all splits
        # axis k1 into D chunks and concatenates along j2.
        a1 = jax.lax.all_to_all(
            a1, DATA_AXIS, split_axis=1, concat_axis=2, tiled=True
        )  # (48, n1/D, n2)
        # step 4: FFT along the full n2 axis (now local), batch = n1/D
        a2 = basic_radix2_fft_batched(
            F, jnp.swapaxes(a1, 1, 2), w_n2
        )  # (48, n2, n1/D) — index [k2, k1_local]
        return jnp.swapaxes(a2, 1, 2)  # (48, n1/D, n2)

    spec_in = P(None, None, DATA_AXIS)   # shard j2 strips
    spec_tw = P(DATA_AXIS, None, None, None)
    spec_out = P(None, DATA_AXIS, None)  # k1 sharded after transpose

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_in, spec_tw),
        out_specs=spec_out,
        check_rep=False,
    )
    out = fn(a.reshape(48, n1, n2), tw_dev)  # (48, n1, n2): [k1, k2]
    # natural order: result[k1 + n1*k2] = out[k1, k2] -> transpose+flatten
    res = jnp.swapaxes(out, 1, 2).reshape(48, n)  # index k1 fastest? no:
    # out[., k1, k2] -> swap -> [., k2, k1] -> reshape row-major gives
    # index k2*n1 + k1 = k1 + n1*k2 ✓
    if scale_by_n_inv:
        res = F.mul_const(res, F.const(pow(n, -1, p)))
    return res


def ifft_sharded(mesh: Mesh, F: Fp, a, omega: int | None = None):
    return fft_sharded(mesh, F, a, omega=omega, inverse=True,
                       scale_by_n_inv=True)


def coset_fft_sharded(mesh: Mesh, F: Fp, a):
    g = F.spec.multiplicative_generator
    return fft_sharded(mesh, F, F.mul(a, _power_vector(F, g, a.shape[1])))


def icoset_fft_sharded(mesh: Mesh, F: Fp, a):
    out = ifft_sharded(mesh, F, a)
    ginv = pow(F.spec.multiplicative_generator, -1, F.p)
    return F.mul(out, _power_vector(F, ginv, a.shape[1]))
