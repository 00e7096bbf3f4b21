"""TPU-shaped Pippenger multi-scalar multiplication.

Replaces the reference's two MSM engines — Bos-Coster (heap-sequential,
multiexp.tcc:285-400, unusable on SIMD hardware) and BDLO12/Pippenger
(multiexp.tcc:166-283) — with a fully data-parallel Pippenger:

  1. all window digits at once: (W, M, N) int32
  2. window groups under one lax.scan (memory/VPU-width trade-off);
     within a group every phase is vectorized across windows AND across
     the M independent MSMs sharing this call:
       a. stable sort of points by bucket digit           [XLA sort]
       b. segmented inclusive scan with EC add as monoid  [associative_scan,
          ~2N vectorized adds/window — Blelloch work-efficient]
       c. scatter segment totals into 2^c bucket slots
       d. bucket triangle sum via two suffix scans        [~4*2^c adds]
  3. Horner across windows: carry = 2^c * carry + S_w.  The ~753
     sequential doublings are the algorithm's critical path; batching M
     MSMs (the prover's A/B1/H/L share one call) amortizes it.

Result equality with the reference is exact: every method computes the
same group element sum_i s_i * P_i, and proofs serialize affine
coordinates only (libsnark/serialization.hpp:44-54).

Scalars enter in *canonical* (non-Montgomery) limb form; the Groth16
layer converts with Fp.to_canonical (the integer value is what multiplies
the point — libff multi_exp semantics).  Zero scalars contribute the
identity, so length padding is free (multi_exp_with_mixed_addition's
zero-skip, multiexp.tcc:444-495, becomes a mask instead of a filter).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .group import Curve

SCALAR_BITS = 753


def default_window_bits(n: int) -> int:
    """Bucket window size, ~log2(n)-3 clamped to [4, 16] (a digit must fit
    in two 16-bit limbs); same flavour as get_exp_window_size
    (multiexp.tcc:507)."""
    if n <= 1:
        return 4
    return max(4, min(16, int(math.log2(n)) - 3))


# Full-width (753-bit) extension-field MSMs with window c=4 (W=189
# windows) reproducibly crash the TPU runtime worker ("kernel fault";
# tools/tpu_g2_probe.py); c=8 (W=95) is clean.  Any window split
# computes the identical group element, so every G2 path run on a TPU
# backend shares this floor.  Override via SNARK_TPU_G2_WINDOW.
#
# The floor is TPU-ONLY (round 4): it used to cover XLA:CPU as well,
# where the same shape once segfaulted the compiler after ~1 h — that
# was root-caused to an 8 MB pthread-stack overflow in a recursive
# compiler pass and is fixed by config.raise_stack_limit (2 GB) in
# every entry point.  On CPU a large floor is actively harmful: the
# bucket-triangle work is W * 2^c regardless of N, so the tiny-shape
# multichip dryrun spent HOURS executing 95x255-bucket G2 triangles on
# the driver's 1-core host (MULTICHIP_r02/r03 rc=124 root cause).
G2_MIN_WINDOW = 8


def g2_window_bits(n: int, requested: int | None = None) -> int:
    """The single G2 window policy (guards the c<8 TPU kernel fault —
    see G2_MIN_WINDOW)."""
    import os

    env = os.environ.get("SNARK_TPU_G2_WINDOW")
    if env is not None:
        return int(env)
    base = requested if requested is not None else default_window_bits(n)
    # Fail CLOSED: this guards a known TPU runtime fault, so the floor
    # applies unless the backend is affirmatively known to be non-TPU.
    try:
        is_tpu = jax.default_backend() == "tpu"
    except Exception:
        is_tpu = True
    return max(base, G2_MIN_WINDOW) if is_tpu else base


def window_digits(scalars, c: int, scalar_bits: int = SCALAR_BITS):
    """(48, *batch) canonical uint32 limbs -> (W, *batch) int32 digits,
    least-significant window first.

    Fully vectorized over W (one gather + broadcast shifts): the graph
    size is window-count-independent, where the previous per-window
    Python loop unrolled W * ~5 ops — at c=2 (W=377) that unroll alone
    dominated the XLA:CPU compile of the multichip dryrun programs."""
    W = (scalar_bits + c - 1) // c
    pad = jnp.zeros((2,) + scalars.shape[1:], scalars.dtype)
    s = jnp.concatenate([scalars, pad], axis=0)  # (L+2, *batch)
    bit = np.arange(W) * c
    i0 = jnp.asarray(bit // 16, jnp.int32)
    off = bit % 16  # host ints
    bshape = (W,) + (1,) * (s.ndim - 1)
    off_a = jnp.asarray(off, jnp.uint32).reshape(bshape)
    lo = jnp.take(s, i0, axis=0)           # (W, *batch)
    hi = jnp.take(s, i0 + 1, axis=0)
    # off == 0: hi's bits land at >= 16 and are masked off (c <= 16)
    val = (lo >> off_a) | (hi << (jnp.uint32(16) - off_a))
    mask = jnp.uint32((1 << c) - 1)
    return (val & mask).astype(jnp.int32)  # (W, *batch)


def _hillis_levels(n: int) -> int:
    return max(1, math.ceil(math.log2(max(2, n))))


def _ec_reduce(curve: Curve, elems):
    """EC-add fold reduction along the LAST axis — replaces full scans
    whose only consumed output was the final element (round-1 spent a
    whole Hillis-Steele pass on it).  Implemented as a fori_loop masked
    in-place halving so the graph holds ONE traced combine (an unrolled
    tree quadruples XLA:CPU compile time on G2-sized graphs); runtime is
    log N full-width masked-add passes."""
    from ..utils import op_counts

    n = elems[0].shape[-1]
    if n == 1:
        return tuple(t[..., 0] for t in elems)
    levels = _hillis_levels(n)
    npad = 1 << levels
    x = elems
    if npad != n:
        F = curve.F
        pad_batch = x[0].shape[F.elem_ndim : -1] + (npad - n,)
        x = (
            jnp.concatenate([x[0], F.zeros(pad_batch)], axis=-1),
            jnp.concatenate([x[1], F.ones(pad_batch)], axis=-1),
            jnp.concatenate([x[2], F.zeros(pad_batch)], axis=-1),
        )
    idx = jnp.arange(npad)

    def level(t, state):
        d = jnp.int32(npad) >> (t + 1)
        shifted = tuple(jnp.roll(s, -d, axis=-1) for s in state)
        comb = curve.add(state, shifted)
        keep = idx < d
        out = []
        for c_, s_ in zip(comb, state):
            k = keep.reshape((1,) * (c_.ndim - 1) + (npad,))
            out.append(jnp.where(k, c_, s_))
        return tuple(out)

    with op_counts.loop_scope(levels):
        out = jax.lax.fori_loop(0, levels, level, x)
    return tuple(t[..., 0] for t in out)


def _ec_scan_tree(curve: Curve, elems, reverse: bool = False):
    """Work-efficient inclusive EC scan along the last axis
    (Ladner-Fischer recursive halving): ~2N combines total vs
    Hillis-Steele's N log N, with 2 log N traced combines in the graph.
    Requires nothing of N (odd tails handled exactly)."""
    if reverse:
        elems = tuple(jnp.flip(t, axis=-1) for t in elems)

    def rec(x):
        L = x[0].shape[-1]
        if L == 1:
            return x
        half = L // 2
        even = tuple(t[..., 0 : 2 * half : 2] for t in x)
        odd = tuple(t[..., 1 : 2 * half : 2] for t in x)
        pairs = curve.add(even, odd)  # combine (x[2i], x[2i+1])
        if L % 2:
            pairs = tuple(
                jnp.concatenate([p, t[..., -1:]], axis=-1)
                for p, t in zip(pairs, x)
            )
        ps = rec(pairs)  # ps[i] = inclusive scan at position 2i+1
        # even positions: scan[2i] = ps[i-1] + x[2i] (ps[-1] = identity)
        F = curve.F
        batch = even[0].shape[F.elem_ndim : -1] + (1,)
        ident = (F.zeros(batch), F.ones(batch), F.zeros(batch))
        prev = tuple(
            jnp.concatenate([i_, p[..., : half - 1]], axis=-1)
            for i_, p in zip(ident, ps)
        )
        ev = curve.add(prev, even)
        # interleave ev (even slots) and ps (odd slots)
        out = tuple(
            jnp.stack([a, b[..., :half]], axis=-1).reshape(
                a.shape[:-1] + (2 * half,)
            )
            for a, b in zip(ev, ps)
        )
        if L % 2:
            out = tuple(
                jnp.concatenate([o, p[..., -1:]], axis=-1)
                for o, p in zip(out, ps)
            )
        return out

    out = rec(tuple(elems))
    if reverse:
        out = tuple(jnp.flip(t, axis=-1) for t in out)
    return out


def _ec_scan(curve: Curve, elems, axis: int, reverse: bool = False,
             impl: str = "hillis"):
    """Inclusive EC-add scan along `axis` (last axis of every leaf).

    impl="assoc": jax.lax.associative_scan — work-efficient (~2N combines)
    but traces the combine O(log N) times (big XLA graphs: slow compiles).
    impl="hillis": Hillis-Steele under fori_loop — one combine in the
    graph, log N runtime passes of N-wide masked adds (N log N work).
    impl="tree": Ladner-Fischer halving — ~2N combines, 2 log N traced."""
    if impl == "tree":
        return _ec_scan_tree(curve, elems, reverse=reverse)
    if impl == "assoc":
        return jax.lax.associative_scan(
            lambda a, b: curve.add(a, b), elems, axis=axis, reverse=reverse
        )
    n = elems[0].shape[axis]
    idx = jnp.arange(n)

    def level(t, state):
        d = jnp.left_shift(jnp.int32(1), t)
        # prefix: state[i] += state[i-d]  (roll +d), update where i >= d
        # suffix: state[i] += state[i+d]  (roll -d), update where i < n-d
        # jnp.roll wraps, so the validity mask must exclude exactly the
        # wrapped positions or foreign partials leak into the sums
        sh = -1 if reverse else 1
        shifted = tuple(jnp.roll(s, sh * d, axis=axis) for s in state)
        comb = curve.add(shifted, state)
        valid = (idx < n - d) if reverse else (idx >= d)
        vshape = (1,) * (state[0].ndim - 1) + (n,)
        v = valid.reshape(vshape)
        return tuple(jnp.where(v, c, s) for c, s in zip(comb, state))

    from ..utils import op_counts

    with op_counts.loop_scope(_hillis_levels(n)):
        return jax.lax.fori_loop(0, _hillis_levels(n), level, tuple(elems))


def _ec_segmented_scan(curve: Curve, pts, start, impl: str = "hillis"):
    """Inclusive segmented EC-add scan along the last axis.  `start` marks
    segment beginnings; at each position the running sum restarts there."""
    X, Y, Z = pts
    extra = X.ndim - start.ndim
    flag = start.reshape((1,) * extra + start.shape)

    def comb(a, b):
        ax, ay, az, af = a
        bx, by, bz, bf = b
        s = curve.add((ax, ay, az), (bx, by, bz))
        kx = bf.astype(bool)
        return (
            jnp.where(kx, bx, s[0]),
            jnp.where(kx, by, s[1]),
            jnp.where(kx, bz, s[2]),
            af | bf,
        )

    if impl == "assoc":
        sx, sy, sz, _ = jax.lax.associative_scan(
            comb, (X, Y, Z, flag), axis=X.ndim - 1
        )
        return sx, sy, sz

    n = X.shape[-1]
    idx = jnp.arange(n)

    def level(t, state):
        d = jnp.left_shift(jnp.int32(1), t)
        shifted = tuple(jnp.roll(s, d, axis=-1) for s in state)
        combined = comb(shifted, state)
        valid = idx >= d
        out = []
        for c, s in zip(combined, state):
            v = valid.reshape((1,) * (c.ndim - 1) + (n,))
            out.append(jnp.where(v, c, s))
        return tuple(out)

    from ..utils import op_counts

    with op_counts.loop_scope(_hillis_levels(n)):
        state = jax.lax.fori_loop(
            0, _hillis_levels(n), level, (X, Y, Z, jnp.broadcast_to(flag, (1,) * extra + start.shape))
        )
    return state[0], state[1], state[2]


def _bitrev_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation of [0, n) (n a power of two)."""
    k = n.bit_length() - 1
    out = np.zeros(n, np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(k):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[i] = r
    return out


def _ec_excl_scan_bitrev(curve: Curve, elems):
    """EXCLUSIVE EC scan of a (..., n) batch that is already in
    BIT-REVERSED order along the last axis (n = 2^k); output is the
    exclusive scan, also in bit-reversed order.

    Why: in bit-reversed layout, Blelloch's pair (2i, 2i+1) sits at
    (i, i + half) — every up/down-sweep step slices CONTIGUOUS halves.
    The even/odd (stride-2) slicing of the Ladner-Fischer tree forces
    an XLA lane relayout of the 48-limb planes at every level, which
    chip microbenchmarks showed costing as much as the EC kernels
    themselves (PLAN.md round-5)."""
    n = elems[0].shape[-1]
    assert n & (n - 1) == 0, n
    F = curve.F
    ups = [tuple(elems)]
    cur = tuple(elems)
    while cur[0].shape[-1] > 1:
        half = cur[0].shape[-1] // 2
        a = tuple(t[..., :half] for t in cur)
        b = tuple(t[..., half:] for t in cur)
        cur = curve.add(a, b)
        ups.append(cur)
    batch = elems[0].shape[F.elem_ndim : -1] + (1,)
    D = (F.zeros(batch), F.ones(batch), F.zeros(batch))
    # down-sweep: child exclusive scan = [parent, parent + left sums]
    for A in reversed(ups[:-1]):
        m = D[0].shape[-1]
        left = tuple(t[..., :m] for t in A)
        right = curve.add(D, left)
        D = tuple(
            jnp.concatenate([d, r], axis=-1) for d, r in zip(D, right)
        )
    return D


def _segment_totals_bitrev(curve: Curve, pts_brev, start_idx, rev):
    """Segment-inclusive prefix values (bit-reversed order) from
    bit-reversed points + LINEAR-order segment-start indices.

    seg_incl[i] = incl[i] - excl[seg_start(i)] — the exclusive scan
    needs no first-segment special case (excl[0] = identity)."""
    excl = _ec_excl_scan_bitrev(curve, pts_brev)
    incl = curve.add(excl, pts_brev)
    # positions are bit-reversed: slot r holds linear position rev[r];
    # its segment start (linear) maps back into bitrev slot space
    rev_a = jnp.asarray(rev)
    sstart_brev = jnp.take(jnp.take(rev_a, start_idx, axis=-1),
                           rev_a, axis=-1)
    extra = pts_brev[0].ndim - sstart_brev.ndim

    def gather(t):
        gi = jnp.broadcast_to(
            sstart_brev, t.shape[:extra] + sstart_brev.shape
        )
        return jnp.take_along_axis(t, gi, axis=-1)

    base = tuple(gather(t) for t in excl)
    return curve.add(incl, curve.neg(base))


def _segment_totals_subtract(curve: Curve, pts, start, impl: str = "tree"):
    """Segment-inclusive prefix values WITHOUT a segmented monoid: points
    form a group, so seg_incl[i] = pref[i] - pref[seg_start(i) - 1] where
    pref is the plain inclusive scan.  One scan (~2N adds with the tree
    impl) + one negate-add per element, vs the 4-tuple segmented combine.
    The EC subtraction is exact: the complete RCB addition formula is
    exceptional-free, and P + (-P) lands on the identity."""
    X, Y, Z = pts
    pref = _ec_scan(curve, (X, Y, Z), axis=X.ndim - 1, impl=impl)
    n = X.shape[-1]
    idx = jnp.arange(n)
    # index of each position's segment start (start[...,0] is always True)
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, idx, 0), axis=start.ndim - 1
    )
    gather_idx = jnp.maximum(start_idx - 1, 0)
    extra = X.ndim - start.ndim

    def gather(t):
        gi = jnp.broadcast_to(gather_idx, t.shape[:extra] + gather_idx.shape)
        return jnp.take_along_axis(t, gi, axis=-1)

    F = curve.F
    base = (gather(pref[0]), gather(pref[1]), gather(pref[2]))
    first = (start_idx == 0)
    batch = start.shape
    base = (
        F.select(first, F.zeros(batch), base[0]),
        F.select(first, F.ones(batch), base[1]),
        F.select(first, F.zeros(batch), base[2]),
    )
    return curve.add(pref, curve.neg(base))


def msm_multi(curve: Curve, points, scalars_canonical, c: int | None = None,
              window_group: int | None = None, scalar_bits: int = SCALAR_BITS,
              scan_impl: str | None = "hillis"):
    """M independent MSMs over the same curve in one fused program.

    points: projective triple of field arrays with trailing batch (M, N)
    scalars_canonical: (48, M, N) canonical uint32 limb planes
    Returns a projective point batch of shape (M,).
    """
    if scan_impl is None:
        scan_impl = staged_scan_impl()
    F = curve.F
    X, Y, Z = points
    M, N = X.shape[-2], X.shape[-1]
    if c is None:
        c = default_window_bits(N)
    B = 1 << c
    W = (scalar_bits + c - 1) // c

    if window_group is None:
        # keep gathered working set around ~2^22 point-slots
        window_group = max(1, min(W, (1 << 22) // max(1, M * N)))
    Gr = window_group
    W_pad = ((W + Gr - 1) // Gr) * Gr

    digits = window_digits(scalars_canonical, c, scalar_bits)  # (W, M, N)
    if W_pad != W:
        # pad with zero windows at the most-significant end (processed
        # first by the MSB-first Horner scan with zero effect)
        digits = jnp.concatenate(
            [digits, jnp.zeros((W_pad - W, M, N), jnp.int32)], axis=0
        )
    # MSB-first group order
    dig_groups = digits[::-1].reshape(W_pad // Gr, Gr, M, N)

    extra = X.ndim - 2  # leading non-batch dims of the point arrays

    def body(carry, digs):
        # digs: (Gr, M, N)
        idx = jnp.argsort(digs, axis=-1, stable=True).astype(jnp.int32)
        keys = jnp.take_along_axis(digs, idx, axis=-1)
        # gather points per (group-window, msm): X has batch (M, N); we
        # need (Gr, M, N).  Fancy-index the N axis with idx[g, m, :] per
        # (g, m): vmap the take over M then broadcast over Gr.
        def gather(arr):
            # arr: (..., M, N); idx: (Gr, M, N) -> (..., Gr, M, N)
            def take_m(a_m, i_m):  # (..., N), (Gr, N) -> (..., Gr, N)
                return jnp.take(a_m, i_m, axis=-1)

            # vmap over M (arr axis -2, idx axis 1), reinserting M at -2 of
            # the per-m output (..., Gr, N) -> (..., Gr, M, N)
            return jax.vmap(take_m, in_axes=(-2, 1), out_axes=-2)(arr, idx)

        Xs, Ys, Zs = gather(X), gather(Y), gather(Z)
        zero_d = keys == 0
        batch = (Gr, M, N)
        Xs = F.select(zero_d, F.zeros(batch), Xs)
        Ys = F.select(zero_d, F.ones(batch), Ys)
        Zs = F.select(zero_d, F.zeros(batch), Zs)

        # ---- segmented scan along N ----------------------------------
        start = jnp.concatenate(
            [jnp.ones((Gr, M, 1), bool), keys[..., 1:] != keys[..., :-1]], axis=-1
        )
        if scan_impl == "tree":
            # work-efficient path: plain scan + group-subtraction totals
            sx, sy, sz = _segment_totals_subtract(
                curve, (Xs, Ys, Zs), start, impl=scan_impl
            )
        else:
            sx, sy, sz = _ec_segmented_scan(
                curve, (Xs, Ys, Zs), start, impl=scan_impl
            )

        # ---- scatter segment totals into buckets ----------------------
        is_end = jnp.concatenate(
            [keys[..., 1:] != keys[..., :-1], jnp.ones((Gr, M, 1), bool)], axis=-1
        )
        tgt = jnp.where(is_end, keys, B)  # non-ends -> slot B (dropped)
        rows = (
            jnp.arange(Gr)[:, None, None] * (M * (B + 1))
            + jnp.arange(M)[None, :, None] * (B + 1)
        )
        tgt_flat = (rows + tgt).reshape(-1)

        def scatter(vals, init):
            flat = vals.reshape(vals.shape[:extra] + (-1,))
            out = init.at[..., tgt_flat].set(flat)
            return out.reshape(init.shape[:extra] + (Gr, M, B + 1))[..., :B]

        bX = scatter(sx, F.zeros((Gr * M * (B + 1),)))
        bY = scatter(sy, F.ones((Gr * M * (B + 1),)))
        bZ = scatter(sz, F.zeros((Gr * M * (B + 1),)))

        # ---- triangle: sum_b b * bucket_b ------------------------------
        run = _ec_scan(
            curve,
            (bX[..., 1:], bY[..., 1:], bZ[..., 1:]),
            axis=bX.ndim - 1,
            reverse=True,
            impl=scan_impl,
        )
        # only the total of the suffix sums is needed: a tree reduction
        # (B-1 adds) replaces the second full scan (round-1 did a whole
        # Hillis-Steele pass, ~B log B adds, for one element)
        S = _ec_reduce(curve, run)  # (..., Gr, M)

        # ---- Horner within the group (windows already MSB-first) ------
        def dbl(i, P):
            return curve.double(P)

        def horner_step(cr, S_j):
            with op_counts.loop_scope(c):
                cr = jax.lax.fori_loop(0, c, dbl, cr)
            return curve.add(cr, S_j), None

        S_stacked = tuple(jnp.moveaxis(t, -2, 0) for t in S)  # (Gr, ..., M)
        with op_counts.loop_scope(Gr):
            carry, _ = jax.lax.scan(horner_step, carry, S_stacked)
        return carry, None

    from ..utils import op_counts

    init = curve.zero((M,))
    with op_counts.loop_scope(W_pad // Gr):
        out, _ = jax.lax.scan(body, init, dig_groups)
    return out


def msm(curve: Curve, points, scalars_canonical, c: int | None = None,
        window_group: int | None = None, scalar_bits: int = SCALAR_BITS,
        scan_impl: str = "hillis"):
    """Single MSM: points batch (N,), scalars (48, N).  Returns a
    projective point with batch shape (1,)."""
    X, Y, Z = points
    pts = tuple(a[..., None, :] for a in (X, Y, Z))
    return msm_multi(curve, pts, scalars_canonical[:, None, :], c,
                     window_group, scalar_bits, scan_impl)


# ---------------------------------------------------------------------------
# Staged (multi-program) MSM — the TPU execution path.
#
# The monolithic msm_multi faults the TPU worker when the flattened
# (window_group, M, N) lane batch exceeds ~2^16: an XLA->Mosaic codegen
# defect emerges at the bucket-scatter -> bucket-triangle boundary (every
# stage passes in ISOLATION at the faulting shape; see PLAN.md round-3
# root cause and tools/tpu_msm_probe / tpu_msm_bisect / tpu_msm_compose).
# An optimization_barrier does NOT prevent it (probe p4b), so the fix is
# structural: split the pipeline into SEPARATE XLA programs at exactly
# that boundary — a bucket-accumulation program (sort/gather/mask/
# segmented-scan/scatter, + one EC add to fold N-chunks) and a
# triangle+Horner program — orchestrated by a host loop over window
# groups.  Program boundaries cannot fuse.  This is also the shape of the
# reference's own OpenMP chunk split (multiexp.tcc:403-441): partial
# bucket accumulations per chunk, combined before the final walk.
#
# Results are bit-identical to msm_multi: both compute the same group
# element per window and the identical MSB-first Horner recombination.
# ---------------------------------------------------------------------------

_STAGE_CACHE: dict = {}


def msm_lane_cap() -> int:
    """Max flattened (Gr*M*Nc) lanes per bucket-accumulation dispatch.
    2^16 was the monolithic-program fault threshold; the round-5 staged
    + Pallas pipeline probes clean and oracle-exact at 2^18
    (tools/tpu_staged_probe N=4099 Gr=84), and bigger dispatches cut
    host-loop overhead.  Override with SNARK_TPU_MSM_LANES."""
    import os

    return int(os.environ.get("SNARK_TPU_MSM_LANES", str(1 << 18)))


def _bucket_program(curve: Curve, c: int, Gr: int, M: int, Nc: int,
                    scan_impl: str = "hillis"):
    """jit: (acc_buckets, X, Y, Z points chunk, digit chunk) -> acc'.
    Everything of msm_multi's body UP TO the scatter, plus one EC add to
    fold this chunk's bucket partials into the accumulator.

    The (Gr, M) axes merge into ONE row axis R = Gr*M right after the
    gather: a (…, 4, Nc) minor-axis pair leaves the 8-sublane tiles
    half-empty and forces a relayout on every op, which round-5 chip
    microbenchmarks showed costing more than the EC kernels themselves;
    (…, R, Nc) with Nc a 128-multiple keeps every op tile-aligned.
    acc is carried as (48, R, B).

    scan_impl="tree" routes the segment totals through the work-efficient
    plain scan + group-subtraction (_segment_totals_subtract, ~3N EC adds)
    instead of the Hillis-Steele segmented scan (N log2 N adds) — at the
    production Nc=1024-4096 chunk sizes that is 3-4x less EC work."""
    key = ("bkt", id(curve), c, Gr, M, Nc, scan_impl)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    F = curve.F
    B = 1 << c
    R = Gr * M

    def stage(acc, X, Y, Z, digs):
        # digs: (Gr, M, Nc); points: (..., M, Nc) broadcast over Gr
        from .field import pallas_scope

        with pallas_scope():
            return _stage(acc, X, Y, Z, digs)

    def _stage(acc, X, Y, Z, digs):
        digs_m = digs.reshape(R, Nc)
        idx = jnp.argsort(digs_m, axis=-1, stable=True).astype(jnp.int32)
        keys = jnp.take_along_axis(digs_m, idx, axis=-1)  # (R, Nc) linear
        bitrev = scan_impl == "bitrev"
        if bitrev:
            # points land DIRECTLY in bit-reversed sorted order (the
            # permutation composes into the existing data-dependent
            # gather for free); key-derived flags stay in linear order
            # (cheap int ops) and permute as int32 where needed
            rev = _bitrev_perm(Nc)
            rev_a = jnp.asarray(rev)
            idx_pts = jnp.take(idx, rev_a, axis=-1)
        else:
            idx_pts = idx
        idx_g = idx_pts.reshape(Gr, M, Nc)

        def gather(arr):
            def take_m(a_m, i_m):
                return jnp.take(a_m, i_m, axis=-1)

            g = jax.vmap(take_m, in_axes=(-2, 1), out_axes=-2)(arr, idx_g)
            # (..., Gr, M, Nc) -> merged (..., R, Nc)
            return g.reshape(g.shape[:-3] + (R, Nc))

        Xs, Ys, Zs = gather(X), gather(Y), gather(Z)
        zero_d = keys == 0
        if bitrev:
            zero_d = jnp.take(zero_d, rev_a, axis=-1)
        batch = (R, Nc)
        Xs = F.select(zero_d, F.zeros(batch), Xs)
        Ys = F.select(zero_d, F.ones(batch), Ys)
        Zs = F.select(zero_d, F.zeros(batch), Zs)

        start = jnp.concatenate(
            [jnp.ones((R, 1), bool), keys[..., 1:] != keys[..., :-1]],
            axis=-1,
        )
        if bitrev:
            pos = jnp.arange(Nc)
            start_idx = jax.lax.associative_scan(
                jnp.maximum, jnp.where(start, pos, 0), axis=-1
            )
            sx, sy, sz = _segment_totals_bitrev(
                curve, (Xs, Ys, Zs), start_idx, rev
            )
        elif scan_impl == "tree":
            sx, sy, sz = _segment_totals_subtract(
                curve, (Xs, Ys, Zs), start, impl="tree"
            )
        else:
            sx, sy, sz = _ec_segmented_scan(
                curve, (Xs, Ys, Zs), start, impl=scan_impl
            )

        is_end = jnp.concatenate(
            [keys[..., 1:] != keys[..., :-1], jnp.ones((R, 1), bool)],
            axis=-1,
        )
        tgt = jnp.where(is_end, keys, B)  # non-ends -> slot B (dropped)
        if bitrev:
            tgt = jnp.take(tgt, rev_a, axis=-1)  # align with value order
        rows = jnp.arange(R)[:, None] * (B + 1)
        tgt_flat = (rows + tgt).reshape(-1)

        def scatter(vals, init):
            flat = vals.reshape(vals.shape[:-2] + (-1,))
            out = init.at[..., tgt_flat].set(flat)
            return out.reshape(init.shape[:-1] + (R, B + 1))[..., :B]

        bX = scatter(sx, F.zeros((R * (B + 1),)))
        bY = scatter(sy, F.ones((R * (B + 1),)))
        bZ = scatter(sz, F.zeros((R * (B + 1),)))
        return curve.add(acc, (bX, bY, bZ))

    fn = jax.jit(stage)
    _STAGE_CACHE[key] = fn
    return fn


def _triangle_program(curve: Curve, c: int, Gr: int, M: int,
                      scan_impl: str = "hillis"):
    """jit: (carry, buckets) -> carry'.  Bucket triangle (suffix scan +
    reduce) then the MSB-first Horner fold of this group's Gr windows."""
    key = ("tri", id(curve), c, Gr, M, scan_impl)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    from ..utils import op_counts

    def stage(carry, bX, bY, bZ):
        from .field import pallas_scope

        with pallas_scope():
            return _stage(carry, bX, bY, bZ)

    def _stage(carry, bX, bY, bZ):
        # buckets arrive merged as (..., R=Gr*M, B) — tile-aligned (see
        # _bucket_program); the Horner fold unmerges to (Gr, M) after
        # the reduction
        run = _ec_scan(
            curve,
            (bX[..., 1:], bY[..., 1:], bZ[..., 1:]),
            axis=bX.ndim - 1,
            reverse=True,
            impl="tree" if scan_impl == "bitrev" else scan_impl,
        )
        S = _ec_reduce(curve, run)  # (..., R)
        S = tuple(t.reshape(t.shape[:-1] + (Gr, M)) for t in S)

        def dbl(i, P):
            return curve.double(P)

        def horner_step(cr, S_j):
            with op_counts.loop_scope(c):
                cr = jax.lax.fori_loop(0, c, dbl, cr)
            return curve.add(cr, S_j), None

        S_stacked = tuple(jnp.moveaxis(t, -2, 0) for t in S)
        with op_counts.loop_scope(Gr):
            carry, _ = jax.lax.scan(horner_step, carry, S_stacked)
        return carry

    fn = jax.jit(stage)
    _STAGE_CACHE[key] = fn
    return fn


def _digits_program(c: int, scalar_bits: int):
    key = ("dig", c, scalar_bits)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    fn = jax.jit(lambda s: window_digits(s, c, scalar_bits))
    _STAGE_CACHE[key] = fn
    return fn


def staged_scan_impl() -> str:
    """Default segment-scan implementation for the staged MSM programs:
    SNARK_TPU_MSM_SCAN if set, else work-efficient "tree" on TPU; the
    Hillis-Steele fallback elsewhere keeps XLA:CPU compiles small.
    ("bitrev" — bit-reversed contiguous-halves Blelloch — eliminates
    the stride-2 relayout glue but costs ~N extra kernel adds; on-chip
    it measured 5.28 s vs tree's 5.06 s at the probe shape, so tree
    stays the default.)"""
    import os

    env = os.environ.get("SNARK_TPU_MSM_SCAN")
    if env:
        return env
    try:
        if jax.default_backend() == "tpu":
            return "tree"
    except Exception:
        pass
    return "hillis"


def msm_multi_staged(curve: Curve, points, scalars_canonical,
                     c: int | None = None, window_group: int | None = None,
                     scalar_bits: int = SCALAR_BITS,
                     scan_impl: str | None = None):
    """msm_multi computed as a host-orchestrated pipeline of small XLA
    programs (see block comment above) — same results, TPU-safe shapes.

    points: projective triple with trailing batch (M, N)
    scalars_canonical: (48, M, N) canonical uint32 limb planes
    Returns a projective point batch of shape (M,).
    """
    if scan_impl is None:
        scan_impl = staged_scan_impl()
    F = curve.F
    X, Y, Z = points
    M, N = X.shape[-2], X.shape[-1]
    if c is None:
        c = default_window_bits(N)
    B = 1 << c
    W = (scalar_bits + c - 1) // c

    cap = msm_lane_cap()
    if window_group is None:
        # triangle working set Gr*M*B bucket slots <= cap, and the
        # bucket program's Gr*M*Nc lanes <= cap with a useful Nc
        window_group = max(1, min(W, cap // max(1, M * B)))
    Gr = window_group
    # chunk length: lane budget per dispatch, 128-aligned (odd minor
    # dims force XLA relayouts on every op), never far beyond N itself
    Nc = max(128, cap // max(1, Gr * M) // 128 * 128)
    Nc = min(Nc, max(128, (N + 127) // 128 * 128))
    if scan_impl == "bitrev":
        # the bit-reversed Blelloch scan needs a power-of-two chunk
        Nc = 1 << (Nc.bit_length() - 1)
    n_chunks = (N + Nc - 1) // Nc
    Np = n_chunks * Nc
    if Np != N:
        # zero-scalar padding is free (digit-0 lanes are masked out)
        padw = [(0, 0)] * (X.ndim - 1) + [(0, Np - N)]
        X, Y, Z = (jnp.pad(t, padw) for t in (X, Y, Z))
        scalars_canonical = jnp.pad(
            scalars_canonical, [(0, 0), (0, 0), (0, Np - N)]
        )
    W_pad = ((W + Gr - 1) // Gr) * Gr

    digits = _digits_program(c, scalar_bits)(scalars_canonical)  # (W, M, Np)
    if W_pad != W:
        digits = jnp.concatenate(
            [digits, jnp.zeros((W_pad - W, M, Np), jnp.int32)], axis=0
        )
    digits = jnp.flip(digits, axis=0)  # MSB-first group order

    bucket = _bucket_program(curve, c, Gr, M, Nc, scan_impl)
    triangle = _triangle_program(curve, c, Gr, M, scan_impl)

    carry = curve.zero((M,))
    R = Gr * M
    for g in range(W_pad // Gr):
        dg = digits[g * Gr : (g + 1) * Gr]  # (Gr, M, Np)
        acc = (
            F.zeros((R, B)),
            F.ones((R, B)),
            F.zeros((R, B)),
        )
        for k in range(n_chunks):
            sl = slice(k * Nc, (k + 1) * Nc)
            acc = bucket(acc, X[..., sl], Y[..., sl], Z[..., sl], dg[..., sl])
        carry = triangle(carry, *acc)
    return carry


def msm_staged(curve: Curve, points, scalars_canonical, c: int | None = None,
               window_group: int | None = None,
               scalar_bits: int = SCALAR_BITS, scan_impl: str | None = None):
    """Single staged MSM: points batch (N,), scalars (48, N)."""
    X, Y, Z = points
    pts = tuple(a[..., None, :] for a in (X, Y, Z))
    return msm_multi_staged(curve, pts, scalars_canonical[:, None, :], c,
                            window_group, scalar_bits, scan_impl)


def pad_and_stack(F, point_list, scalar_list):
    """Host helper: pad M (points, scalars) pairs to a common length with
    zero scalars / identity points and stack along a new M axis.
    Zero-padded entries contribute nothing (digit-0 masking)."""
    Nmax = max(s.shape[-1] for s in scalar_list)
    pts_out = []
    scal_out = []
    for (x, y, z), s in zip(point_list, scalar_list):
        n = s.shape[-1]
        padn = Nmax - n
        if padn:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padn)])
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, padn)])
            z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, padn)])
            s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, padn)])
        pts_out.append((x, y, z))
        scal_out.append(s)
    X = jnp.stack([p[0] for p in pts_out], axis=-2)
    Y = jnp.stack([p[1] for p in pts_out], axis=-2)
    Z = jnp.stack([p[2] for p in pts_out], axis=-2)
    S = jnp.stack(scal_out, axis=1)
    return (X, Y, Z), S
