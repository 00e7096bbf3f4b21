"""Multi-chip challenge-prover step.

Shards the five MSMs (the dominant cost: ~W*(2N + 2^c) group adds each,
vs the FFTs' ~7*n*log(n)/2 field muls) across the mesh data axis; the
compute_H FFT stack currently runs replicated per device (the distributed
4-step FFT lands in parallel/fft_sharded.py).  This mirrors how the
reference splits only the MSM stream across OpenMP threads
(libsnark/main.cpp:168-186) while FFTs use their own parallel pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import msm as msm_mod
from ..ops.fft import get_evaluation_domain
from ..proof_systems.groth16 import compute_h
from .mesh import DATA_AXIS
from .msm_sharded import msm_multi_sharded


def _pad_to(arrs, mult: int):
    """Pad trailing N axis of every array to a multiple of mult."""
    out = []
    for a in arrs:
        n = a.shape[-1]
        padn = (-n) % mult
        if padn:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, padn)])
        out.append(a)
    return out


def compute_h_sharded(mesh: Mesh, model, ca, cb, cc):
    """compute_H with every FFT pass distributed via the 4-step method
    (parallel/fft_sharded.py): 7 sharded transforms + pointwise ops, the
    TPU analogue of the reference's OpenMP parallel FFT phase
    (basic_radix2_domain_aux.tcc:218-296)."""
    from .fft_sharded import (
        coset_fft_sharded,
        icoset_fft_sharded,
        ifft_sharded,
    )

    F = model.Fr
    n = ca.shape[1]
    a = coset_fft_sharded(mesh, F, ifft_sharded(mesh, F, ca))
    b = coset_fft_sharded(mesh, F, ifft_sharded(mesh, F, cb))
    hab = F.mul(a, b)
    cvals = coset_fft_sharded(mesh, F, ifft_sharded(mesh, F, cc))
    h = F.sub(hab, cvals)
    p = F.p
    g = F.spec.multiplicative_generator
    zinv = pow(pow(g, n, p) - 1, -1, p)
    h = F.mul_const(h, F.const(zinv))
    return icoset_fft_sharded(mesh, F, h)


def prove_step_sharded(mesh: Mesh, model, params_dev, input_dev, d: int, m: int,
                       c: int | None = None, scan_impl: str = "hillis",
                       sharded_fft: bool = False):
    """Jittable distributed prove: same math as ChallengeProver._prove_core
    with the MSMs sharded along the point stream.  With sharded_fft the
    compute_H FFT stack also distributes (requires d+1 >= D^2)."""
    F = model.Fr
    G1, G2 = model.G1, model.G2
    D = mesh.shape[DATA_AXIS]
    domain = get_evaluation_domain(F, d + 1)

    w = input_dev["w"]
    if sharded_fft:
        h = compute_h_sharded(
            mesh, model, input_dev["ca"], input_dev["cb"], input_dev["cc"]
        )
    else:
        h = compute_h(model, domain, input_dev["ca"], input_dev["cb"], input_dev["cc"])

    w_can = F.to_canonical(w)
    h_can = F.to_canonical(h[:, :d])
    r_can = F.to_canonical(input_dev["r"])

    def G1pts(key):
        x, y = params_dev[key]
        return G1.from_affine(x, y)

    pts4, scal4 = msm_mod.pad_and_stack(
        F,
        [G1pts("A"), G1pts("B1"), G1pts("H"), G1pts("L")],
        [w_can, w_can, h_can, w_can[:, 2:]],
    )
    pts4 = tuple(_pad_to(pts4, D))
    (scal4,) = _pad_to([scal4], D)
    g1_res = msm_multi_sharded(mesh, G1, pts4, scal4, c=c, scan_impl=scan_impl)
    At = tuple(t[..., 0:1] for t in g1_res)
    Bt1 = tuple(t[..., 1:2] for t in g1_res)
    Ht = tuple(t[..., 2:3] for t in g1_res)
    Lt = tuple(t[..., 3:4] for t in g1_res)

    x2, y2 = params_dev["B2"]
    pts2 = tuple(
        a[..., None, :] for a in G2.from_affine(x2, y2)
    )
    pts2 = tuple(_pad_to(pts2, D))
    scal2 = w_can[:, None, :]
    (scal2,) = _pad_to([scal2], D)
    # per-shard length sets the G2 window; floored on TPU (ops.msm policy)
    c2 = msm_mod.g2_window_bits(scal2.shape[-1] // D, c)
    Bt2 = msm_multi_sharded(mesh, G2, pts2, scal2, c=c2, scan_impl=scan_impl)

    rBt1 = G1.scalar_mul_limbs(Bt1, r_can)
    C = G1.add(G1.add(Ht, Lt), rBt1)
    # projective outputs: the unique-affine conversion + byte packing is
    # the O(1) host tail (proof_systems.groth16.prove_arrays); keeping it
    # out of the step trims two batch-inversion scans from the graph
    return (At, Bt2, C)


_STAGED_JIT_CACHE: dict = {}


def _staged_programs(mesh: Mesh, model, d: int, c, scan_impl: str,
                     sharded_fft: bool, scalar_bits: int):
    """The four jitted stage programs, memoized so repeated
    prove_step_sharded_staged calls (bench loops) don't retrace."""
    import jax

    key = (tuple(id(dev) for dev in mesh.devices.flat), mesh.axis_names,
           model.name, d, c, scan_impl, sharded_fft, scalar_bits)
    if key in _STAGED_JIT_CACHE:
        return _STAGED_JIT_CACHE[key]

    F = model.Fr
    G1, G2 = model.G1, model.G2
    D = mesh.shape[DATA_AXIS]
    domain = get_evaluation_domain(F, d + 1)

    @jax.jit
    def h_stage(ca, cb, cc, w, r):
        if sharded_fft:
            h = compute_h_sharded(mesh, model, ca, cb, cc)
        else:
            h = compute_h(model, domain, ca, cb, cc)
        return (F.to_canonical(w), F.to_canonical(h[:, :d]),
                F.to_canonical(r))

    @jax.jit
    def g1_stage(A, B1, H, L, w_can, h_can):
        pts4, scal4 = msm_mod.pad_and_stack(
            F,
            [G1.from_affine(*A), G1.from_affine(*B1),
             G1.from_affine(*H), G1.from_affine(*L)],
            [w_can, w_can, h_can, w_can[:, 2:]],
        )
        pts4 = tuple(_pad_to(pts4, D))
        (scal4,) = _pad_to([scal4], D)
        return msm_multi_sharded(mesh, G1, pts4, scal4, c=c,
                                 scalar_bits=scalar_bits,
                                 scan_impl=scan_impl)

    @jax.jit
    def g2_stage(B2, w_can):
        x2, y2 = B2
        pts2 = tuple(a[..., None, :] for a in G2.from_affine(x2, y2))
        pts2 = tuple(_pad_to(pts2, D))
        scal2 = w_can[:, None, :]
        (scal2,) = _pad_to([scal2], D)
        c2 = msm_mod.g2_window_bits(scal2.shape[-1] // D, c)
        return msm_multi_sharded(mesh, G2, pts2, scal2, c=c2,
                                 scalar_bits=scalar_bits,
                                 scan_impl=scan_impl)

    @jax.jit
    def c_stage(g1_res, r_can):
        Ht = tuple(t[..., 2:3] for t in g1_res)
        Lt = tuple(t[..., 3:4] for t in g1_res)
        Bt1 = tuple(t[..., 1:2] for t in g1_res)
        nb = (scalar_bits + 15) // 16 * 16
        rBt1 = G1.scalar_mul_limbs(Bt1, r_can, num_bits=nb)
        return G1.add(G1.add(Ht, Lt), rBt1)

    progs = (h_stage, g1_stage, g2_stage, c_stage)
    _STAGED_JIT_CACHE[key] = progs
    return progs


def prove_step_sharded_staged(mesh: Mesh, model, params_dev, input_dev,
                              d: int, m: int | None = None,
                              c: int | None = None,
                              scan_impl: str | None = None,
                              sharded_fft: bool = False,
                              scalar_bits: int = msm_mod.SCALAR_BITS):
    """The same distributed prove step as prove_step_sharded, compiled
    as four smaller programs instead of one monolith — the partitioning
    the production single-chip prover uses (proof_systems.groth16
    ChallengeProver: h/g1/g2 stages + O(1) assembly).  `m` is accepted
    for signature parity with prove_step_sharded but the shapes carry it.

    Rationale: the monolithic step's XLA:CPU compile OVERFLOWS THE
    COMPILER'S OWN STACK on this image (libjax_common.so segfault ~1 h
    into the compile, reproducible with 8 MB, 256 MB and 2 GB rlimits —
    the crashing pass recurses over the whole-program graph).  The
    staged programs compile in minutes each and cache independently.
    Same math, same shardings, same collectives as the monolith.
    """
    if scan_impl is None:
        # inherit the staged-MSM default (work-efficient "tree" on TPU,
        # small-graph "hillis" on XLA:CPU) instead of pinning hillis
        scan_impl = msm_mod.staged_scan_impl()
    h_stage, g1_stage, g2_stage, c_stage = _staged_programs(
        mesh, model, d, c, scan_impl, sharded_fft, scalar_bits
    )

    w_can, h_can, r_can = h_stage(
        input_dev["ca"], input_dev["cb"], input_dev["cc"],
        input_dev["w"], input_dev["r"],
    )
    g1_res = g1_stage(params_dev["A"], params_dev["B1"], params_dev["H"],
                      params_dev["L"], w_can, h_can)
    Bt2 = g2_stage(params_dev["B2"], w_can)
    C = c_stage(g1_res, r_can)
    At = tuple(t[..., 0:1] for t in g1_res)
    return (At, Bt2, C)
