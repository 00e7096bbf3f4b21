"""USCS -> SSP (square span program) reduction.

Capability parity with libsnark/reductions/uscs_to_ssp/uscs_to_ssp.tcc:

  * `instance_map_with_evaluation` (tcc:57-101): V_i(t) via Lagrange
    coefficients over a domain of size >= num_constraints, with the
    dummy rows 1^2 = 1 (V_0 += u_k) padding the domain, plus powers of
    t and Z(t);
  * `witness_map` (tcc:104-192): evaluations of V on the domain, then
    the device FFT dance iFFT -> cosetFFT -> (V^2 - 1) -> divide_by_Z
    -> icosetFFT with the ZK patch 2 d V + d^2 Z.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fft import get_domain_of_min_size, get_evaluation_domain
from ..relations.uscs import USCSConstraintSystem
from ..utils.bigint import ints_to_limbs


def ssp_domain_size(cs: USCSConstraintSystem, F) -> int:
    return get_domain_of_min_size(F, max(1, cs.num_constraints)).n


@dataclass
class SSPInstanceEvaluation:
    """ssp_instance_evaluation<FieldT> (ssp/ssp.hpp), exact host ints."""

    domain_size: int
    num_variables: int
    num_inputs: int
    t: int
    Vt: list  # len num_variables + 1
    Ht: list  # powers of t, len domain_size + 1
    Zt: int


def instance_map_with_evaluation(cs: USCSConstraintSystem, t: int, F) -> SSPInstanceEvaluation:
    """uscs_to_ssp_instance_map_with_evaluation (tcc:57-101)."""
    p = cs.p
    domain = get_domain_of_min_size(F, max(1, cs.num_constraints))
    n = domain.n
    Vt = [0] * (cs.num_variables + 1)
    Zt = domain.compute_vanishing_polynomial(t)
    u = [int(v) for v in domain.evaluate_all_lagrange_polynomials(t)]
    for i, lc in enumerate(cs.constraints):
        for idx, coeff in lc.terms:
            Vt[idx] = (Vt[idx] + u[i] * coeff) % p
    for i in range(cs.num_constraints, n):
        Vt[0] = (Vt[0] + u[i]) % p  # dummy constraint 1^2 = 1
    Ht = [1] * (n + 1)
    for i in range(1, n + 1):
        Ht[i] = Ht[i - 1] * t % p
    return SSPInstanceEvaluation(
        domain_size=n,
        num_variables=cs.num_variables,
        num_inputs=cs.primary_input_size,
        t=t,
        Vt=Vt,
        Ht=Ht,
        Zt=Zt,
    )


def assemble_v_evaluations(cs: USCSConstraintSystem, full, F):
    """Evaluations of V on the domain (tcc:124-136)."""
    p = cs.p
    n = ssp_domain_size(cs, F)
    aV = [0] * n
    for i, lc in enumerate(cs.constraints):
        aV[i] = lc.evaluate(full, p)
    for i in range(cs.num_constraints, n):
        aV[i] = 1
    return aV


def witness_map_device(model, cv, d):
    """Device FFT dance (tcc:138-182): H = (V^2 - 1)/Z plus the ZK
    patch 2 d V + d^2 Z.  cv is (48, n) Montgomery planes of the V
    evaluations; d is a (48, 1) Montgomery plane."""
    F = model.Fr
    n = cv.shape[1]
    domain = get_evaluation_domain(F, n)

    V_coeff = domain.ifft(cv)

    patch = F.mul(V_coeff, F.double(d))
    dd = F.mul(d, d)
    z_probe = [0] * (n + 1)
    domain.add_poly_Z(1, z_probe)
    top = F.zeros((1,))
    for deg, zc in enumerate(z_probe):
        if zc % F.p == 0:
            continue
        term = F.mul_const(dd, F.const(zc % F.p))
        if deg == n:
            top = F.add(top, term)
        else:
            patch = patch.at[:, deg : deg + 1].set(
                F.add(patch[:, deg : deg + 1], term)
            )

    v = domain.coset_fft(V_coeff)
    h = F.sub(F.mul(v, v), F.ones((n,)))
    h = domain.divide_by_z_on_coset(h)
    H = domain.icoset_fft(h)  # (48, n)
    H = F.add(H, patch)
    return jnp.concatenate([H, top], axis=1)  # (48, n+1)


@dataclass
class SSPWitness:
    num_variables: int
    degree: int
    num_inputs: int
    d: int
    full_assignment: list  # coefficients_for_Vs
    H_planes: object       # (48, degree+1)


def witness_map(model, cs: USCSConstraintSystem, primary, auxiliary,
                d: int) -> SSPWitness:
    """uscs_to_ssp_witness_map (tcc:104-192)."""
    F = model.Fr
    spec = F.spec
    p = cs.p
    full = [v % p for v in list(primary) + list(auxiliary)]
    aV = assemble_v_evaluations(cs, full, F)
    cv = jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in aV]))
    d_plane = jnp.asarray(ints_to_limbs([spec.to_mont(d % p)]))
    H = jax.jit(partial(witness_map_device, model))(cv, d_plane)
    return SSPWitness(
        num_variables=cs.num_variables,
        degree=len(aV),
        num_inputs=cs.primary_input_size,
        d=d,
        full_assignment=full,
        H_planes=H,
    )
