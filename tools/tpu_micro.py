"""Microbenchmarks of the staged-MSM building blocks on the real chip,
with REAL device->host fetches bounding every measurement (this
runtime's block_until_ready can return before execution completes).

Times, per op over the bucket-program shapes: the fused EC-add kernel,
argsort, the point gather, the tree-scan glue (one level of even/odd
slicing + interleave), and the scatter.
"""
import json
import sys
import time

import numpy as np


def _tiny_fetch(out):
    """Force completion with a 1-element fetch: slice DEVICE-side first
    (np.asarray(full_leaf) would measure the ~35 MB/s tunnel, not the
    compute)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    while leaf.ndim:
        leaf = leaf[0]
    return np.asarray(leaf)


def bench(fn, *args, reps=3):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    _tiny_fetch(out)  # drain
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        _tiny_fetch(out)
        ts.append(time.time() - t0)
    return min(ts)


def main(lanes=262144):
    from snark_challenge_prover_tpu.config import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from snark_challenge_prover_tpu.models import mnt4753
    from snark_challenge_prover_tpu.ops import pallas_group as pg
    from snark_challenge_prover_tpu.utils.bigint import ints_to_limbs

    model = mnt4753.get()
    curve = model.G1
    spec = model.Fq.spec
    rng = np.random.default_rng(2)
    from tools.oracle import mnt4753_oracle

    ocur = mnt4753_oracle()
    P = ocur.g1.mul(9, ocur.g1_gen)
    x = spec.to_mont(P[0])
    y = spec.to_mont(P[1])
    X = jnp.asarray(np.broadcast_to(
        ints_to_limbs([x]), (48, lanes)).copy())
    Y = jnp.asarray(np.broadcast_to(
        ints_to_limbs([y]), (48, lanes)).copy())
    one = jnp.asarray(np.broadcast_to(
        ints_to_limbs([spec.to_mont(1)]), (48, lanes)).copy())
    Pt = (X, Y, one)
    res = {}

    # fused EC add kernel over all lanes
    def add_fn(a, b, c, d, e, f):
        return pg.ec_op_pallas(curve, "add", (a, b, c), (d, e, f))

    t = bench(jax.jit(add_fn), *Pt, *Pt)
    res["ec_add_kernel_s"] = round(t, 4)
    res["ec_adds_per_s"] = round(lanes / t)

    # plain pallas mont mul over the same lanes (48, lanes)
    from snark_challenge_prover_tpu.ops.pallas_field import mont_mul_pallas

    t = bench(jax.jit(lambda a, b: mont_mul_pallas(spec, a, b, 256)), X, Y)
    res["mont_mul_kernel_s"] = round(t, 4)
    res["mont_muls_per_s"] = round(lanes / t)

    # sort + gather glue at the bucket-program shape
    Gr, M, Nc = 84, 4, lanes // (84 * 4)
    digs = jnp.asarray(
        rng.integers(0, 512, size=(Gr, M, Nc), dtype=np.int32))
    XP = jnp.asarray(rng.integers(
        0, 1 << 16, size=(48, M, Nc), dtype=np.uint32))

    def sort_fn(d):
        idx = jnp.argsort(d, axis=-1, stable=True).astype(jnp.int32)
        return jnp.take_along_axis(d, idx, axis=-1), idx

    keys, idx = jax.jit(sort_fn)(digs)
    t = bench(jax.jit(sort_fn), digs)
    res["argsort_s"] = round(t, 4)

    def gather_fn(arr, idx):
        def take_m(a_m, i_m):
            return jnp.take(a_m, i_m, axis=-1)

        return jax.vmap(take_m, in_axes=(-2, 1), out_axes=-2)(arr, idx)

    t = bench(jax.jit(gather_fn), XP, idx)
    res["gather_one_coord_s"] = round(t, 4)

    # one tree-scan level of slicing glue (even/odd split + interleave)
    big = jnp.asarray(rng.integers(
        0, 1 << 16, size=(48, Gr, M, Nc), dtype=np.uint32))

    def glue_fn(tv):
        half = tv.shape[-1] // 2
        even = tv[..., 0:2 * half:2]
        odd = tv[..., 1:2 * half:2]
        s = even + odd  # stand-in for the kernel combine
        out = jnp.stack([s, odd], axis=-1).reshape(
            tv.shape[:-1] + (2 * half,))
        return out

    t = bench(jax.jit(glue_fn), big)
    res["scan_level_glue_one_coord_s"] = round(t, 4)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 262144)
