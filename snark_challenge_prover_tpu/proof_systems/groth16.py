"""Groth16 prover pipelines.

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

The whole numeric path is one jitted program per (d, m) shape; I/O and
byte packing stay on the host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..io import serialization as ser
from ..ops import msm as msm_mod
from ..ops.fft import get_evaluation_domain
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


class ChallengeProver:
    """One curve's challenge prover; compile once per parameter shape."""

    def __init__(self, model, msm_window: int | None = None):
        self.model = model
        self.msm_window = msm_window

    # ------------------------------------------------------------------
    def _prove_core(self, params_dev, input_dev, d: int, m: int):
        """Pure jittable function of device arrays."""
        model = self.model
        F = model.Fr
        G1, G2 = model.G1, model.G2
        domain = get_evaluation_domain(F, d + 1)

        w = input_dev["w"]
        h = compute_h(model, domain, input_dev["ca"], input_dev["cb"], input_dev["cc"])

        # canonical scalar values drive the bucket digits
        w_can = F.to_canonical(w)
        h_can = F.to_canonical(h[:, :d])
        r_can = F.to_canonical(input_dev["r"])

        c = self.msm_window

        def G1pts(key):
            x, y = params_dev[key]
            return G1.from_affine(x, y)

        # the four G1 MSMs share one fused program (and its sequential
        # Horner doubling chain); zero-scalar padding is free
        pts4, scal4 = msm_mod.pad_and_stack(
            F,
            [G1pts("A"), G1pts("B1"), G1pts("H"), G1pts("L")],
            [w_can, w_can, h_can, w_can[:, 2:]],
        )
        g1_res = msm_mod.msm_multi(G1, pts4, scal4, c)
        At = tuple(t[..., 0:1] for t in g1_res)
        Bt1 = tuple(t[..., 1:2] for t in g1_res)
        Ht = tuple(t[..., 2:3] for t in g1_res)
        Lt = tuple(t[..., 3:4] for t in g1_res)

        x2, y2 = params_dev["B2"]
        Bt2 = msm_mod.msm(G2, G2.from_affine(x2, y2), w_can, c)

        rBt1 = G1.scalar_mul_limbs(Bt1, r_can)
        C = G1.add(G1.add(Ht, Lt), rBt1)

        return (
            G1.to_affine(At),
            G2.to_affine(Bt2),
            G1.to_affine(C),
        )

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
        """Host numpy params/input -> affine proof tuple (device arrays)."""
        d, m = params.d, params.m
        params_dev = {
            "A": tuple(jnp.asarray(a) for a in params.A),
            "B1": tuple(jnp.asarray(a) for a in params.B1),
            "B2": tuple(jnp.asarray(a) for a in params.B2),
            "L": tuple(jnp.asarray(a) for a in params.L),
            "H": tuple(jnp.asarray(a) for a in params.H),
        }
        input_dev = {
            "w": jnp.asarray(inp.w),
            "ca": jnp.asarray(inp.ca),
            "cb": jnp.asarray(inp.cb),
            "cc": jnp.asarray(inp.cc),
            "r": jnp.asarray(inp.r),
        }
        enter_block("prove (jit)")
        fn = jax.jit(
            functools.partial(self._prove_core, d=d, m=m),
        )
        out = fn(params_dev, input_dev)
        out = jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        leave_block("prove (jit)")
        return out


class _NullSink:
    def write(self, data):
        self.data = data
