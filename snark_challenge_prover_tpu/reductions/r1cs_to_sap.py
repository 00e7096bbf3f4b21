"""R1CS -> SAP (square arithmetic program) reduction, for GM17.

Capability parity with libsnark/reductions/r1cs_to_sap/r1cs_to_sap.tcc:

  * each non-square R1CS constraint <a,w>*<b,w> = <c,w> becomes two
    square constraints (tcc:75-135):
        (<a,w> + <b,w>)^2 = 4<c,w> + x'      (x' a fresh variable)
        (<a,w> - <b,w>)^2 = x'
    square-flagged constraints (a == b) pass through unchanged;
  * one extra square constraint per public input (plus one for the
    constant), forcing linear independence of the input polynomials
    (tcc:137-180, [GM17] p.29):
        x_0^2 = x_0
        (x_i + x_0)^2 = 4 x_i + x''_i ; (x_i - x_0)^2 = x''_i
  * `instance_map_with_evaluation` (tcc:196-308): A_i(t), C_i(t), powers
    of t, Z(t) as exact host ints (keygen side);
  * `witness_map` (tcc:310-551): evaluations of A and C on the domain,
    then the same device FFT dance as the QAP witness map but with the
    pointwise square A.A in place of A.B, plus the d1/d2 ZK patch
    (2 d1 A - d2 + d1^2 Z).

Domain size is 2*num_constraints - num_square + 2*num_inputs + 1
(tcc:37-52), so instances match the reference count-for-count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fft import get_domain_of_min_size, get_evaluation_domain
from ..relations.r1cs import R1CSConstraintSystem
from ..utils.bigint import ints_to_limbs


def sap_min_size(cs: R1CSConstraintSystem) -> int:
    """r1cs_to_sap_get_domain's size formula (tcc:48-51)."""
    return (
        2 * cs.num_constraints
        - cs.num_square_constraints
        + 2 * cs.primary_input_size
        + 1
    )


def sap_domain_size(cs: R1CSConstraintSystem, F) -> int:
    return get_domain_of_min_size(F, sap_min_size(cs)).n


def sap_num_variables(cs: R1CSConstraintSystem) -> int:
    """tcc:66: original vars + one per non-square constraint + one per
    public input."""
    return (
        cs.num_variables
        + (cs.num_constraints - cs.num_square_constraints)
        + cs.primary_input_size
    )


@dataclass
class SAPInstanceEvaluation:
    """sap_instance_evaluation<FieldT> (sap/sap.hpp), exact host ints."""

    domain_size: int
    num_variables: int
    num_inputs: int
    t: int
    At: list  # len num_variables + 1
    Ct: list
    Ht: list  # powers of t, len domain_size + 1
    Zt: int


def instance_map_with_evaluation(cs: R1CSConstraintSystem, t: int, F) -> SAPInstanceEvaluation:
    """r1cs_to_sap_instance_map_with_evaluation (tcc:196-308)."""
    p = cs.p
    domain = get_domain_of_min_size(F, sap_min_size(cs))
    n = domain.n
    nvar = sap_num_variables(cs)

    At = [0] * (nvar + 1)
    Ct = [0] * (nvar + 1)
    Zt = domain.compute_vanishing_polynomial(t)
    u = [int(v) for v in domain.evaluate_all_lagrange_polynomials(t)]

    extra_var_offset = cs.num_variables + 1
    k = 0  # next SAP constraint index
    nonsq = 0
    for cons in cs.constraints:
        if cons.is_square:
            for idx, coeff in cons.a.terms:
                At[idx] = (At[idx] + u[k] * coeff) % p
            for idx, coeff in cons.c.terms:
                Ct[idx] = (Ct[idx] + u[k] * coeff) % p
            k += 1
        else:
            for idx, coeff in cons.a.terms:
                At[idx] = (At[idx] + (u[k] + u[k + 1]) * coeff) % p
            for idx, coeff in cons.b.terms:
                At[idx] = (At[idx] + (u[k] - u[k + 1]) * coeff) % p
            for idx, coeff in cons.c.terms:
                Ct[idx] = (Ct[idx] + 4 * u[k] * coeff) % p
            Ct[extra_var_offset + nonsq] = (
                Ct[extra_var_offset + nonsq] + u[k] + u[k + 1]
            ) % p
            nonsq += 1
            k += 2

    ec = k  # extra_constr_offset
    ev2 = cs.num_variables + nonsq  # extra_var_offset2
    At[0] = (At[0] + u[ec]) % p
    Ct[0] = (Ct[0] + u[ec]) % p
    for i in range(1, cs.primary_input_size + 1):
        At[i] = (At[i] + u[ec + 2 * i - 1] + u[ec + 2 * i]) % p
        At[0] = (At[0] + u[ec + 2 * i - 1] - u[ec + 2 * i]) % p
        Ct[i] = (Ct[i] + 4 * u[ec + 2 * i - 1]) % p
        Ct[ev2 + i] = (Ct[ev2 + i] + u[ec + 2 * i - 1] + u[ec + 2 * i]) % p

    Ht = [1] * (n + 1)
    for i in range(1, n + 1):
        Ht[i] = Ht[i - 1] * t % p

    return SAPInstanceEvaluation(
        domain_size=n,
        num_variables=nvar,
        num_inputs=cs.primary_input_size,
        t=t,
        At=At,
        Ct=Ct,
        Ht=Ht,
        Zt=Zt,
    )


def extended_assignment(cs: R1CSConstraintSystem, primary, auxiliary):
    """full_variable_assignment incl. the reduction's extra variables
    (tcc:357-390): x' = (<a,w>-<b,w>)^2 per non-square constraint, then
    x'' = (x_i - 1)^2 per public input."""
    p = cs.p
    full = [v % p for v in list(primary) + list(auxiliary)]
    for cons in cs.constraints:
        if not cons.is_square:
            d = (cons.a.evaluate(full, p) - cons.b.evaluate(full, p)) % p
            full.append(d * d % p)
    for i in range(1, cs.primary_input_size + 1):
        d = (full[i - 1] - 1) % p
        full.append(d * d % p)
    return full


def assemble_ac_evaluations(cs: R1CSConstraintSystem, full, F):
    """Evaluations of A and C over the domain as host ints
    (tcc:392-418 aA and tcc:464-505 aC)."""
    p = cs.p
    n = sap_domain_size(cs, F)
    aA = [0] * n
    aC = [0] * n
    extra_var_offset = cs.num_variables + 1
    k = 0
    nonsq = 0
    for cons in cs.constraints:
        av = cons.a.evaluate(full, p)
        cv = cons.c.evaluate(full, p)
        if cons.is_square:
            aA[k] = (aA[k] + av) % p
            aC[k] = (aC[k] + cv) % p
            k += 1
        else:
            bv = cons.b.evaluate(full, p)
            aA[k] = (aA[k] + av + bv) % p
            aA[k + 1] = (aA[k + 1] + av - bv) % p
            x_extra = full[extra_var_offset + nonsq - 1]
            aC[k] = (aC[k] + 4 * cv + x_extra) % p
            aC[k + 1] = (aC[k + 1] + x_extra) % p
            nonsq += 1
            k += 2
    ec = k
    ev2 = cs.num_variables + nonsq
    aA[ec] = (aA[ec] + 1) % p
    aC[ec] = (aC[ec] + 1) % p
    for i in range(1, cs.primary_input_size + 1):
        xi = full[i - 1]
        xpp = full[ev2 + i - 1]
        aA[ec + 2 * i - 1] = (aA[ec + 2 * i - 1] + xi + 1) % p
        aA[ec + 2 * i] = (aA[ec + 2 * i] + xi - 1) % p
        aC[ec + 2 * i - 1] = (aC[ec + 2 * i - 1] + 4 * xi + xpp) % p
        aC[ec + 2 * i] = (aC[ec + 2 * i] + xpp) % p
    return aA, aC


def witness_map_device(model, ca, cc, d1, d2):
    """Device FFT dance (tcc:421-540): H = (A^2 - C)/Z with the ZK patch
    2 d1 A - d2 + d1^2 Z.  ca/cc are Montgomery planes (48, n); d1/d2
    are (48, 1) Montgomery planes.  Returns (48, n+1) H coefficients."""
    F = model.Fr
    n = ca.shape[1]
    domain = get_evaluation_domain(F, n)

    A_coeff = domain.ifft(ca)

    # ZK patch in coefficient form: 2 d1 A - d2 + d1^2 Z  (tcc:443-456)
    patch = F.mul(A_coeff, F.double(d1))
    patch = patch.at[:, 0:1].set(F.sub(patch[:, 0:1], d2))
    d1d1 = F.mul(d1, d1)
    z_probe = [0] * (n + 1)
    domain.add_poly_Z(1, z_probe)
    top = F.zeros((1,))
    for deg, zc in enumerate(z_probe):
        if zc % F.p == 0:
            continue
        term = F.mul_const(d1d1, F.const(zc % F.p))
        if deg == n:
            top = F.add(top, term)
        else:
            patch = patch.at[:, deg : deg + 1].set(
                F.add(patch[:, deg : deg + 1], term)
            )

    a = domain.coset_fft(A_coeff)
    h = F.mul(a, a)
    cvals = domain.coset_fft(domain.ifft(cc))
    h = F.sub(h, cvals)
    h = domain.divide_by_z_on_coset(h)
    H = domain.icoset_fft(h)  # (48, n)
    H = F.add(H, patch)
    return jnp.concatenate([H, top], axis=1)  # (48, n+1)


@dataclass
class SAPWitness:
    num_variables: int
    degree: int
    num_inputs: int
    d1: int
    d2: int
    full_assignment: list  # coefficients_for_ACs (len num_variables)
    H_planes: object  # (48, degree+1) Montgomery limb planes


def witness_map(model, cs: R1CSConstraintSystem, primary, auxiliary,
                d1: int, d2: int) -> SAPWitness:
    """r1cs_to_sap_witness_map (tcc:310-551): host sparse assembly +
    device FFTs."""
    F = model.Fr
    spec = F.spec
    full = extended_assignment(cs, primary, auxiliary)
    aA, aC = assemble_ac_evaluations(cs, full, F)
    ca = jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in aA]))
    cc = jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in aC]))

    def mont1(v):
        return jnp.asarray(ints_to_limbs([spec.to_mont(v % spec.p)]))

    H = jax.jit(partial(witness_map_device, model))(
        ca, cc, mont1(d1), mont1(d2)
    )
    return SAPWitness(
        num_variables=sap_num_variables(cs),
        degree=len(aA),
        num_inputs=cs.primary_input_size,
        d1=d1,
        d2=d2,
        full_assignment=full,
        H_planes=H,
    )
