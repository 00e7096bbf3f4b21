"""R1CS -> QAP reduction.

Capability parity with libsnark/reductions/r1cs_to_qap/r1cs_to_qap.tcc:

  * `instance_map_with_evaluation` (tcc:105-177, keygen side): evaluate
    every QAP polynomial A_i, B_i, C_i at a secret point t via Lagrange
    coefficients, plus the powers-of-t vector Ht and Z(t).  Host-side
    exact ints — keygen runs once and its cost is dominated by the
    fixed-base exponentiations, which ARE on device (ops.fixed_base).

  * `witness_map` (tcc:206-340, prover side): evaluations of A, B, C on
    the domain (sparse constraint evaluation + the input-consistency
    rows aA[n_c + i] = w_i), then the FFT dance
    iFFT -> cosetFFT -> pointwise -> divide_by_Z -> icosetFFT, all on
    device, returning the H coefficient limb planes.  The d1/d2/d3 ZK
    patch (A d2 + B d1 - d3) + d1 d2 Z is applied on device when
    nonzero (the gg-prover always passes zeros, tcc:409).

Domain size is num_constraints + num_inputs + 1, exactly as the
reference (tcc:119), so proofs stay comparable instance-for-instance.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft import get_domain_of_min_size, get_evaluation_domain
from ..relations.r1cs import R1CSConstraintSystem
from ..utils.bigint import ints_to_limbs


def qap_domain_size(cs: R1CSConstraintSystem, F=None) -> int:
    """Domain size for the QAP: the size of the best evaluation domain
    holding num_constraints + num_inputs + 1 points (r1cs_to_qap.tcc:119
    via get_evaluation_domain).  With F the selection honours the field's
    2-adicity / small-subgroup structure (may be non-power-of-two for
    MNT6753-Fr); without F it falls back to next-power-of-two."""
    n = cs.num_constraints + cs.primary_input_size + 1
    if F is not None:
        return get_domain_of_min_size(F, n).n
    size = 1
    while size < n:
        size *= 2
    return size


@dataclass
class QAPInstanceEvaluation:
    """qap_instance_evaluation<FieldT> (qap.hpp): everything the Groth16
    generator needs, as exact host ints."""

    domain_size: int
    num_variables: int
    num_inputs: int
    t: int
    At: list  # len num_variables + 1
    Bt: list
    Ct: list
    Ht: list  # len domain_size + 1 (powers of t)
    Zt: int


def instance_map_with_evaluation(
    cs: R1CSConstraintSystem, t: int, F
) -> QAPInstanceEvaluation:
    """r1cs_to_qap_instance_map_with_evaluation (tcc:105-177).

    Uses the same domain selection as witness_map (tcc:119's
    get_evaluation_domain) so keygen and prover always agree — the
    round-1 hard-coded Radix2Domain raised for MNT6753-Fr domains
    beyond 2^15."""
    p = cs.p
    nmin = cs.num_constraints + cs.primary_input_size + 1
    domain = get_domain_of_min_size(F, nmin)
    n = domain.n

    nvar = cs.num_variables
    At = [0] * (nvar + 1)
    Bt = [0] * (nvar + 1)
    Ct = [0] * (nvar + 1)

    Zt = domain.compute_vanishing_polynomial(t)
    u = domain.evaluate_all_lagrange_polynomials(t)  # object array of ints

    # input consistency rows: At[i] = u[n_c + i] for i <= num_inputs
    for i in range(cs.primary_input_size + 1):
        At[i] = int(u[cs.num_constraints + i])

    for i, cons in enumerate(cs.constraints):
        ui = int(u[i])
        for idx, coeff in cons.a.terms:
            At[idx] = (At[idx] + ui * coeff) % p
        for idx, coeff in cons.b.terms:
            Bt[idx] = (Bt[idx] + ui * coeff) % p
        for idx, coeff in cons.c.terms:
            Ct[idx] = (Ct[idx] + ui * coeff) % p

    Ht = [1] * (n + 1)
    for i in range(1, n + 1):
        Ht[i] = Ht[i - 1] * t % p

    return QAPInstanceEvaluation(
        domain_size=n,
        num_variables=nvar,
        num_inputs=cs.primary_input_size,
        t=t,
        At=At,
        Bt=Bt,
        Ct=Ct,
        Ht=Ht,
        Zt=Zt,
    )


def assemble_abc_evaluations(cs: R1CSConstraintSystem, primary, auxiliary, F=None):
    """Evaluations of A, B, C over the domain as host int lists
    (tcc:225-238 + the aC loop at :286-291).  Returns (aA, aB, aC),
    each of length qap_domain_size(cs, F)."""
    p = cs.p
    n = qap_domain_size(cs, F)
    assignment = list(primary) + list(auxiliary)
    aA = [0] * n
    aB = [0] * n
    aC = [0] * n
    # input consistency rows
    for i in range(cs.primary_input_size + 1):
        aA[i + cs.num_constraints] = 1 if i == 0 else assignment[i - 1] % p
    for i, cons in enumerate(cs.constraints):
        aA[i] = (aA[i] + cons.a.evaluate(assignment, p)) % p
        aB[i] = (aB[i] + cons.b.evaluate(assignment, p)) % p
        aC[i] = (aC[i] + cons.c.evaluate(assignment, p)) % p
    return aA, aB, aC


def witness_map_device(model, ca, cb, cc, d1=None, d2=None, d3=None):
    """Device FFT dance from domain evaluations (Montgomery limb planes,
    (48, n)) to H coefficients (48, n+1) with optional ZK patch.

    Mirrors r1cs_to_qap_witness_map's steps 2-6 (tcc:243-330); jittable.
    d1/d2/d3 are (48, 1) Montgomery planes or None.
    """
    F = model.Fr
    n = ca.shape[1]
    domain = get_evaluation_domain(F, n)

    A_coeff = domain.ifft(ca)
    B_coeff = domain.ifft(cb)

    a = domain.coset_fft(A_coeff)
    b = domain.coset_fft(B_coeff)
    hab = F.mul(a, b)
    cvals = domain.coset_fft(domain.ifft(cc))
    h = F.sub(hab, cvals)
    h = domain.divide_by_z_on_coset(h)
    H = domain.icoset_fft(h)  # (48, n): coefficients 0..n-1

    # degree-n coefficient: zero unless the ZK patch adds d1*d2 there
    top = F.zeros((1,))

    if d1 is not None or d2 is not None or d3 is not None:
        zeros1 = F.zeros((1,))
        d1 = d1 if d1 is not None else zeros1
        d2 = d2 if d2 is not None else zeros1
        d3 = d3 if d3 is not None else zeros1
        # patch = d2*A + d1*B - d3 (coefficient form), then += d1*d2*Z
        patch = F.add(F.mul(A_coeff, d2), F.mul(B_coeff, d1))
        patch = patch.at[:, 0:1].set(F.sub(patch[:, 0:1], d3))
        d1d2 = F.mul(d1, d2)
        # Z's sparse coefficient structure comes from the domain itself
        # (probe add_poly_Z with coeff=1), so extended/step/mixed domains
        # get their correct vanishing polynomial, not x^n - 1.
        z_probe = [0] * (n + 1)
        domain.add_poly_Z(1, z_probe)
        top = F.zeros((1,))
        for deg, zc in enumerate(z_probe):
            if zc % F.p == 0:
                continue
            term = F.mul_const(d1d2, F.const(zc % F.p))
            if deg == n:
                top = F.add(top, term)
            else:
                patch = patch.at[:, deg : deg + 1].set(
                    F.add(patch[:, deg : deg + 1], term)
                )
        H = F.add(H, patch)
        return jnp.concatenate([H, top], axis=1)  # (48, n+1)

    return jnp.concatenate([H, top], axis=1)  # (48, n+1)


def witness_map(model, cs: R1CSConstraintSystem, primary, auxiliary,
                d1: int = 0, d2: int = 0, d3: int = 0):
    """Full witness map: host sparse assembly + device FFTs.

    Returns (full_assignment ints, H coefficient planes (48, n+1))."""
    F = model.Fr
    spec = F.spec
    aA, aB, aC = assemble_abc_evaluations(cs, primary, auxiliary, F)
    ca = jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in aA]))
    cb = jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in aB]))
    cc = jnp.asarray(ints_to_limbs([spec.to_mont(v) for v in aC]))

    def mont1(v):
        return jnp.asarray(ints_to_limbs([spec.to_mont(v)]))

    if d1 or d2 or d3:
        H = jax.jit(partial(witness_map_device, model))(
            ca, cb, cc, d1=mont1(d1), d2=mont1(d2), d3=mont1(d3)
        )
    else:
        H = jax.jit(partial(witness_map_device, model))(ca, cb, cc)
    full = list(primary) + list(auxiliary)
    return full, H
