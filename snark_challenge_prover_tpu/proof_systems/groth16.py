"""Groth16 challenge-prover pipeline.

`ChallengeProver` reproduces the SNARK-challenge pipeline byte-for-byte
(libsnark/main.cpp:188-272):

    H      = compute_H(d, ca, cb, cc)          # 7 FFT passes + pointwise
    At     = MSM_G1(w,        A[0..m])
    Bt1    = MSM_G1(w,        B1[0..m])
    Bt2    = MSM_G2(w,        B2[0..m])
    Ht     = MSM_G1(H[0..d-1], H_query[0..d-1])
    Lt     = MSM_G1(w[2..],   L[0..m-2])        # primary_input_size == 1
    C      = Ht + Lt + r * Bt1
    proof  = (At affine, Bt2 affine, C affine)   # 96-byte Montgomery LE

The numeric path is staged into three jitted programs — the FFT stack,
the fused G1 multi-MSM, and the G2 MSM — rather than one monolith: the
pieces compile an order of magnitude faster (XLA's compile passes are
superlinear in graph size) and cache/reuse independently across d/m
shapes.  The O(1) tail (C = Ht + Lt + r·Bt1, affine conversion, byte
packing) runs on host exact integers, which is bit-identical by
construction: affine coordinates are the unique canonical
representatives either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..host.curves import host_curve
from ..io import serialization as ser
from ..ops import msm as msm_mod
from ..ops.fft import get_evaluation_domain
from ..utils.bigint import limbs_to_int
from ..utils.profiling import enter_block, leave_block


def compute_h(model, domain, ca, cb, cc):
    """The FFT dance (main.cpp:105-163): evaluations of A,B,C on the
    domain -> coefficients of the quotient H.  Returns (48, d+1) planes
    (of which the prover consumes the first d, main.cpp:243)."""
    F = model.Fr
    a = domain.coset_fft(domain.ifft(ca))
    b = domain.coset_fft(domain.ifft(cb))
    hab = F.mul(a, b)
    cvals = domain.coset_fft(domain.ifft(cc))
    h = F.sub(hab, cvals)
    h = domain.divide_by_z_on_coset(h)
    return domain.icoset_fft(h)


def _planes_to_int(spec, planes) -> int:
    return spec.from_mont(limbs_to_int(np.asarray(planes).reshape(48, -1)[:, 0]))


def _g1_proj_to_host(model, P):
    """Projective Montgomery planes (batch (1,)) -> host affine ints/None."""
    q = model.Fq.p
    spec = model.Fq.spec
    X, Y, Z = (_planes_to_int(spec, t) for t in P)
    if Z == 0:
        return None
    zi = pow(Z, -1, q)
    return (X * zi % q, Y * zi % q)


def _g2_proj_to_host(model, P):
    q = model.Fq.p
    spec = model.Fq.spec
    deg = np.asarray(P[0]).shape[0]

    def comp(t):
        arr = np.asarray(t).reshape(deg, 48, -1)[:, :, 0]
        return tuple(spec.from_mont(limbs_to_int(arr[i])) for i in range(deg))

    X, Y, Z = (comp(t) for t in P)
    hc = host_curve(model.name)
    F = hc.g2.F
    if all(c == 0 for c in Z):
        return None
    zi = F.inv(Z)
    return (F.mul(X, zi), F.mul(Y, zi))


class ChallengeProver:
    """One curve's challenge prover; each stage compiles once per
    parameter shape."""

    def __init__(self, model, msm_window: int | None = None):
        self.model = model
        self.msm_window = msm_window
        self._jit_cache = {}

    def _jitted(self, key, fn):
        """One jitted callable per (stage, shape) for the prover's
        lifetime — repeat proofs skip retracing."""
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # ---- staged device programs ----------------------------------------
    def _h_stage(self, ca, cb, cc, w, d: int):
        """compute_H + canonical-scalar conversion, one jit."""
        model = self.model
        F = model.Fr
        domain = get_evaluation_domain(F, d + 1)
        h = compute_h(model, domain, ca, cb, cc)
        return F.to_canonical(h[:, :d]), F.to_canonical(w)

    def _g1_stage(self, A, B1, H, L, w_can, h_can, ips: int = 1):
        """The four G1 MSMs fused into one program (A, B1, H, L share the
        Horner doubling chain; zero-padding is free)."""
        model = self.model
        F, G1 = model.Fr, model.G1

        def pts(pair):
            return G1.from_affine(pair[0], pair[1])

        pts4, scal4 = msm_mod.pad_and_stack(
            F,
            [pts(A), pts(B1), pts(H), pts(L)],
            [w_can, w_can, h_can, w_can[:, 1 + ips :]],
        )
        return msm_mod.msm_multi(G1, pts4, scal4, self.msm_window)

    def _g2_window(self, n: int) -> int:
        """Shared G2 window policy (ops.msm.g2_window_bits): floors the
        window at 8 on TPU backends, where c=4 full-width extension-field
        MSMs fault the runtime worker (tools/tpu_g2_probe.py)."""
        return msm_mod.g2_window_bits(n, self.msm_window)

    def _g2_stage(self, B2, w_can):
        model = self.model
        G2 = model.G2
        return msm_mod.msm(G2, G2.from_affine(B2[0], B2[1]), w_can,
                           self._g2_window(w_can.shape[-1]))

    # ---- staged MSM execution (the TPU path) -------------------------
    # The monolithic fused-MSM program faults the TPU worker above 2^16
    # flattened lanes (async Mosaic codegen defect at the scatter ->
    # triangle boundary; PLAN.md round-3 root cause).  prove_arrays
    # therefore runs the MSMs as a host loop of small programs
    # (msm_multi_staged) by default; SNARK_TPU_STAGED_MSM=0 restores the
    # single-program path (still used by device_step for compile checks).
    @staticmethod
    def _staged_enabled() -> bool:
        import os

        return os.environ.get("SNARK_TPU_STAGED_MSM", "1") == "1"

    def _g1_prep(self, A, B1, H, L, w_can, h_can, ips: int = 1):
        """from_affine + pad/stack only — feeds msm_multi_staged."""
        model = self.model
        F, G1 = model.Fr, model.G1

        def pts(pair):
            return G1.from_affine(pair[0], pair[1])

        return msm_mod.pad_and_stack(
            F,
            [pts(A), pts(B1), pts(H), pts(L)],
            [w_can, w_can, h_can, w_can[:, 1 + ips :]],
        )

    def _g2_prep(self, B2, w_can):
        G2 = self.model.G2
        pts = G2.from_affine(B2[0], B2[1])
        return (
            tuple(a[..., None, :] for a in pts),
            w_can[:, None, :],
        )

    def device_step(self, params_dev, input_dev, d: int, m: int):
        """The full device compute of one prove step as a single jittable
        function (used by the driver's single-chip compile check): FFT
        stack + fused G1 MSMs + G2 MSM, returning projective results."""
        h_can, w_can = self._h_stage(
            input_dev["ca"], input_dev["cb"], input_dev["cc"],
            input_dev["w"], d,
        )
        g1 = self._g1_stage(
            params_dev["A"], params_dev["B1"], params_dev["H"],
            params_dev["L"], w_can, h_can,
        )
        g2 = self._g2_stage(params_dev["B2"], w_can)
        return g1, g2

    # ------------------------------------------------------------------
    def prove_files(self, params_path: str, input_path: str, output_path=None):
        """File -> file pipeline, matching `main <CURVE> compute`
        (main.cpp:274-295)."""
        model = self.model
        deg = 2 if model.name == "MNT4753" else 3

        enter_block("load params")
        params = ser.read_params(params_path, deg)
        leave_block("load params")

        enter_block("load inputs")
        inp = ser.read_input(input_path, params.d, params.m)
        leave_block("load inputs")

        proof = self.prove_arrays(params, inp)

        enter_block("store")
        data = ser.write_proof(
            output_path if output_path else _NullSink(), *proof, g2_deg=deg
        )
        leave_block("store")
        return data

    def prove_arrays(self, params: ser.Groth16Params, inp: ser.Groth16Input):
        """Host numpy params/input -> affine proof tuple (limb planes),
        staged: 3 device programs + O(1) host assembly."""
        model = self.model
        d, m = params.d, params.m
        fqs = model.Fq.spec
        frs = model.Fr.spec

        enter_block("compute H (jit)")
        h_can, w_can = self._jitted(
            ("h", d), functools.partial(self._h_stage, d=d)
        )(
            jnp.asarray(inp.ca), jnp.asarray(inp.cb), jnp.asarray(inp.cc),
            jnp.asarray(inp.w),
        )
        h_can = jax.block_until_ready(h_can)
        leave_block("compute H (jit)")

        staged = self._staged_enabled()
        enter_block("G1 multiexp x4 (jit)")
        g1_args = (
            tuple(jnp.asarray(a) for a in params.A),
            tuple(jnp.asarray(a) for a in params.B1),
            tuple(jnp.asarray(a) for a in params.H),
            tuple(jnp.asarray(a) for a in params.L),
            w_can, h_can,
        )
        if staged:
            pts4, scal4 = self._jitted(("g1prep", d, m), self._g1_prep)(*g1_args)
            g1_res = msm_mod.msm_multi_staged(
                self.model.G1, pts4, scal4, self.msm_window
            )
        else:
            g1_res = self._jitted(("g1", d, m), self._g1_stage)(*g1_args)
        g1_res = jax.block_until_ready(g1_res)
        leave_block("G1 multiexp x4 (jit)")

        enter_block("G2 multiexp (jit)")
        g2_args = (tuple(jnp.asarray(a) for a in params.B2), w_can)
        if staged:
            pts2, scal2 = self._jitted(("g2prep", m), self._g2_prep)(*g2_args)
            g2_res = msm_mod.msm_multi_staged(
                self.model.G2, pts2, scal2,
                self._g2_window(w_can.shape[-1]),
            )
            g2_res = tuple(t[..., 0] for t in g2_res)  # (M=1,) -> scalar batch
        else:
            g2_res = self._jitted(("g2", m), self._g2_stage)(*g2_args)
        g2_res = jax.block_until_ready(g2_res)
        leave_block("G2 multiexp (jit)")

        enter_block("assemble proof (host)")
        hc = host_curve(model.name)
        At, Bt1, Ht, Lt = (
            _g1_proj_to_host(model, tuple(t[..., i : i + 1] for t in g1_res))
            for i in range(4)
        )
        Bt2 = _g2_proj_to_host(model, g2_res)
        r_int = frs.from_mont(limbs_to_int(np.asarray(inp.r).reshape(48, -1)[:, 0]))
        C = hc.g1.add(hc.g1.add(Ht, Lt), hc.g1.mul(r_int, Bt1))
        leave_block("assemble proof (host)")

        # back to Montgomery limb planes for the writer
        from ..utils.bigint import int_to_limbs

        def g1_planes(P):
            if P is None:
                z = np.zeros(48, np.uint32)
                return (z, z, z)
            return (
                int_to_limbs(fqs.to_mont(P[0])),
                int_to_limbs(fqs.to_mont(P[1])),
                int_to_limbs(fqs.to_mont(1)),
            )

        def g2_planes(P):
            deg = 2 if model.name == "MNT4753" else 3
            if P is None:
                z = np.zeros((deg, 48), np.uint32)
                return (z, z, z)
            X = np.stack([int_to_limbs(fqs.to_mont(c)) for c in P[0]])
            Y = np.stack([int_to_limbs(fqs.to_mont(c)) for c in P[1]])
            Z = np.stack(
                [int_to_limbs(fqs.to_mont(1 if i == 0 else 0)) for i in range(deg)]
            )
            return (X, Y, Z)

        return (g1_planes(At), g2_planes(Bt2), g1_planes(C))


class _NullSink:
    def write(self, data):
        self.data = data
