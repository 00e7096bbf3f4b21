"""GM17 simulation-extractable SNARK (r1cs_se_ppzksnark).

Capability parity with libsnark/zk_proof_systems/ppzksnark/
r1cs_se_ppzksnark/r1cs_se_ppzksnark.{hpp,tcc}:

  * `generator` (tcc:230-448): evaluates the SAP at a random t
    (reductions.r1cs_to_sap), samples alpha/beta/gamma and random bases
    G in G1, H in G2, then builds
        vk   = (H, G^alpha, H^beta, G^gamma, H^gamma,
                query_i = G^{gamma Ct_i + (alpha+beta) At_i})
        pk   = (A_query_i = G^{gamma At_i},
                B_query_i = H^{gamma At_i},
                C_query_1_i = G^{gamma (gamma Ct_i + (alpha+beta) At_i)}
                                               for i > num_inputs,
                C_query_2_i = G^{2 gamma^2 Z(t) At_i},
                G_gamma_Z, H_gamma_Z, G_ab_gamma_Z, G_gamma2_Z2,
                G_gamma2_Z_t_i = G^{gamma^2 Z(t) t^i})
    with all vector queries on device fixed-base tables
    (ops.fixed_base.batch_exp) sharing one fused G1 program.

  * `prover` (tcc:449-578): SAP witness map (device FFT, A^2 - C), then
    three MSM families (A/B over the witness, C over C1/C2/H) on the
    device Pippenger engine, with the d1/d2/r blinded assembly on host
    exact ints:
        A = G^{gamma(A(t) + (r + d1) Z(t))}
        B = H^{gamma(A(t) + (r + d1) Z(t))}
        C = G^{f(w) + r^2 gamma^2 Z^2 + (r+d1)(alpha+beta) gamma Z
               + 2 r gamma^2 Z A(t) + 2 r d1 gamma^2 Z^2
               + gamma^2 Z (H(t) + d2)}

  * `verifier` (tcc:580-738): the two pairing tests
        e(A G^alpha, B H^beta) = e(G^alpha,H^beta) e(psi,H^gamma) e(C,H)
        e(A, H^gamma) = e(G^gamma, B)
    on the host ate engine (verification is O(1), off the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..host.curves import host_curve
from ..ops import fixed_base, msm as msm_mod
from ..reductions import r1cs_to_sap as sap
from ..relations.r1cs import R1CSConstraintSystem
from ..utils.bigint import ints_to_limbs
from ..utils.profiling import block
from .ate_pairing import AtePairing
from .groth16 import _g1_proj_to_host, _g2_proj_to_host


@dataclass
class ProvingKey:
    """r1cs_se_ppzksnark_proving_key (hpp:77-172)."""

    curve: str
    A_query: tuple       # (x, y) planes (48, m+1)
    B_query: tuple       # G2 (deg, 48, m+1)
    C_query_1: tuple     # (48, m - num_inputs)
    C_query_2: tuple     # (48, m+1)
    G_gamma_Z: tuple     # host affine ints
    H_gamma_Z: tuple
    G_ab_gamma_Z: tuple
    G_gamma2_Z2: tuple
    G_gamma2_Z_t: tuple  # (48, degree+1)
    constraint_system: R1CSConstraintSystem


@dataclass
class VerificationKey:
    """r1cs_se_ppzksnark_verification_key (hpp:174-251)."""

    curve: str
    H: tuple
    G_alpha: tuple
    H_beta: tuple
    G_gamma: tuple
    H_gamma: tuple
    query: list  # host affine G1, len num_inputs + 1


@dataclass
class Proof:
    """pi = (A in G1, B in G2, C in G1) (hpp:253-312)."""

    A: tuple
    B: tuple
    C: tuple


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


def generator(model, cs: R1CSConstraintSystem, rng) -> Keypair:
    """r1cs_se_ppzksnark_generator (tcc:230-448)."""
    hc = host_curve(model.name)
    F = model.Fr
    r_p = F.p

    # t with Z(t) != 0 (tcc:236-244)
    while True:
        t = rng.randrange(1, r_p)
        inst = sap.instance_map_with_evaluation(cs, t, F)
        if inst.Zt % r_p:
            break
    m, deg, l = inst.num_variables, inst.domain_size, inst.num_inputs

    alpha = rng.randrange(1, r_p)
    beta = rng.randrange(1, r_p)
    gamma = rng.randrange(1, r_p)
    g_scalar = rng.randrange(1, r_p)
    h_scalar = rng.randrange(1, r_p)

    with block("gm17 bases"):
        G_base = fixed_base.opt_window_wnaf_exp(
            model.G1, model.g1_generator(), g_scalar
        )
        H_base = fixed_base.opt_window_wnaf_exp(
            model.G2, model.g2_generator(), h_scalar
        )
        H_gamma_base = fixed_base.opt_window_wnaf_exp(model.G2, H_base, gamma)

    # fused G1 queries: verifier query, A, C1, C2, G_gamma2_Z_t share one
    # table and one program (tcc:283-289 G_exp_count)
    ab = (alpha + beta) % r_p
    vq = [(gamma * inst.Ct[i] + ab * inst.At[i]) % r_p for i in range(m + 1)]
    A_exp = [gamma * a % r_p for a in inst.At]
    C1_exp = [gamma * vq[i] % r_p for i in range(l + 1, m + 1)]
    two_g2z = 2 * gamma * gamma % r_p * inst.Zt % r_p
    C2_exp = [two_g2z * a % r_p for a in inst.At]
    g2zt = inst.Zt * gamma * gamma % r_p
    Zt_exp = []
    acc = g2zt
    for i in range(deg + 1):
        Zt_exp.append(acc)
        acc = acc * t % r_p
    all_scalars = vq[: l + 1] + A_exp + C1_exp + C2_exp + Zt_exp
    w1 = fixed_base.get_exp_window_size(len(all_scalars))
    w2 = fixed_base.get_exp_window_size(m + 1)

    with block("gm17 G window table"):
        t1 = fixed_base.get_window_table(model.G1, w1, G_base)
    with block("gm17 H_gamma window table"):
        t2 = fixed_base.get_window_table(model.G2, w2, H_gamma_base)

    splits = np.cumsum([l + 1, m + 1, m - l, m + 1])
    with block("gm17 G1 queries (fused)"):
        g1_all = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G1.to_affine(
                    fixed_base.batch_exp(model.G1, w1, tab, s)
                )
            )(t1, jnp.asarray(ints_to_limbs(all_scalars)))
        )
        parts = [np.split(np.asarray(a), splits, axis=-1) for a in g1_all]
        vq_aff = [p[0] for p in parts]
        A_aff = tuple(p[1] for p in parts)
        C1_aff = tuple(p[2] for p in parts)
        C2_aff = tuple(p[3] for p in parts)
        Zt_aff = tuple(p[4] for p in parts)
    with block("gm17 B query (G2)"):
        B_aff = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G2.to_affine(
                    fixed_base.batch_exp(model.G2, w2, tab, s)
                )
            )(t2, jnp.asarray(ints_to_limbs(list(inst.At))))
        )

    with block("gm17 singles"):
        Gh = _g1_proj_to_host(model, G_base)
        Hh = _g2_proj_to_host(model, H_base)
        G_alpha = hc.g1.mul(alpha, Gh)
        H_beta = hc.g2.mul(beta, Hh)
        G_gamma = hc.g1.mul(gamma, Gh)
        H_gamma = hc.g2.mul(gamma, Hh)
        G_gamma_Z = hc.g1.mul(inst.Zt * gamma % r_p, Gh)
        H_gamma_Z = hc.g2.mul(inst.Zt * gamma % r_p, Hh)
        G_ab_gamma_Z = hc.g1.mul(ab * inst.Zt % r_p * gamma % r_p, Gh)
        G_gamma2_Z2 = hc.g1.mul(
            inst.Zt * inst.Zt % r_p * gamma % r_p * gamma % r_p, Gh
        )
        spec = model.Fq.spec

        def host_g1(i):
            x = np.asarray(vq_aff[0])[:, i]
            y = np.asarray(vq_aff[1])[:, i]
            z = np.asarray(vq_aff[2])[:, i]
            from ..utils.bigint import limbs_to_int

            if not z.any():
                return None
            return (
                spec.from_mont(limbs_to_int(x)),
                spec.from_mont(limbs_to_int(y)),
            )

        query = [host_g1(i) for i in range(l + 1)]

    def np_pair(aff):
        # wire-format affine pairs: identity stores y = 0 so that
        # from_affine (read_g1 semantics) round-trips it — to_affine
        # yields (0, 1, 0) for the identity, which (x, y)-only storage
        # would otherwise corrupt into a non-curve point
        x, y, z = (np.asarray(t) for t in aff)
        alive = z.reshape(-1, z.shape[-1]).any(axis=0)
        return (x, np.where(alive, y, 0).astype(y.dtype))

    pk = ProvingKey(
        curve=model.name,
        A_query=np_pair(A_aff),
        B_query=np_pair(B_aff),
        C_query_1=np_pair(C1_aff),
        C_query_2=np_pair(C2_aff),
        G_gamma_Z=G_gamma_Z,
        H_gamma_Z=H_gamma_Z,
        G_ab_gamma_Z=G_ab_gamma_Z,
        G_gamma2_Z2=G_gamma2_Z2,
        G_gamma2_Z_t=np_pair(Zt_aff),
        constraint_system=cs,
    )
    vk = VerificationKey(
        curve=model.name,
        H=Hh,
        G_alpha=G_alpha,
        H_beta=H_beta,
        G_gamma=G_gamma,
        H_gamma=H_gamma,
        query=query,
    )
    return Keypair(pk, vk)


def prover(model, pk: ProvingKey, primary, auxiliary, rng,
           msm_window: int | None = None) -> Proof:
    """r1cs_se_ppzksnark_prover (tcc:449-578)."""
    F = model.Fr
    G1, G2 = model.G1, model.G2
    cs = pk.constraint_system
    r_p = F.p

    assert cs.is_satisfied(primary, auxiliary), "unsatisfied witness"

    d1 = rng.randrange(r_p)
    d2 = rng.randrange(r_p)
    r = rng.randrange(r_p)

    with block("sap witness map"):
        wit = sap.witness_map(model, cs, primary, auxiliary, d1, d2)
    m, l = wit.num_variables, wit.num_inputs
    w = wit.full_assignment  # len m, variables 1..m

    w_can = jnp.asarray(ints_to_limbs([v % r_p for v in w]))  # (48, m)

    def dev_g1(pair):
        return G1.from_affine(jnp.asarray(pair[0]), jnp.asarray(pair[1]))

    # G1 MSMs fused: A_query[1:] . w, C1 . w[l:], C2[1:] . w, Zt . H
    def msm_g1(A_q, C1_q, C2_q, Zt_q, w_can, H_planes):
        h_can = F.to_canonical(H_planes)
        pts, scal = msm_mod.pad_and_stack(
            F,
            [
                dev_g1(tuple(a[..., 1:] for a in A_q)),
                dev_g1(C1_q),
                dev_g1(tuple(a[..., 1:] for a in C2_q)),
                dev_g1(Zt_q),
            ],
            [w_can, w_can[:, l:], w_can, h_can],
        )
        return msm_mod.msm_multi(G1, pts, scal, msm_window)

    def msm_g2(B_q, w_can):
        pts = G2.from_affine(
            jnp.asarray(B_q[0])[..., 1:], jnp.asarray(B_q[1])[..., 1:]
        )
        return msm_mod.msm(
            G2, pts, w_can, msm_mod.g2_window_bits(w_can.shape[-1], msm_window)
        )

    with block("gm17 G1 multiexps (jit)"):
        res4 = jax.block_until_ready(
            jax.jit(msm_g1)(
                tuple(jnp.asarray(a) for a in pk.A_query),
                tuple(jnp.asarray(a) for a in pk.C_query_1),
                tuple(jnp.asarray(a) for a in pk.C_query_2),
                tuple(jnp.asarray(a) for a in pk.G_gamma2_Z_t),
                w_can,
                wit.H_planes,
            )
        )
    with block("gm17 G2 multiexp (jit)"):
        res2 = jax.block_until_ready(
            jax.jit(msm_g2)(tuple(jnp.asarray(a) for a in pk.B_query), w_can)
        )

    with block("gm17 assemble proof (host)"):
        hc = host_curve(model.name)
        A_msm, C1_msm, C2_msm, H_msm = (
            _g1_proj_to_host(model, tuple(a[..., i : i + 1] for a in res4))
            for i in range(4)
        )
        B_msm = _g2_proj_to_host(model, res2)
        spec = model.Fq.spec
        from ..utils.bigint import limbs_to_int

        def host_aff_g1(pair, i):
            x, y = (np.asarray(a)[:, i] for a in pair)
            if not y.any():  # y == 0 encodes identity (read_g1 semantics)
                return None
            return (spec.from_mont(limbs_to_int(x)), spec.from_mont(limbs_to_int(y)))

        def host_aff_g2(pair, i):
            x, y = (np.asarray(a)[:, :, i] for a in pair)
            if not y.any():
                return None
            dg = x.shape[0]
            return (
                tuple(spec.from_mont(limbs_to_int(x[j])) for j in range(dg)),
                tuple(spec.from_mont(limbs_to_int(y[j])) for j in range(dg)),
            )

        A0 = host_aff_g1(pk.A_query, 0)
        B0 = host_aff_g2(pk.B_query, 0)
        C2_0 = host_aff_g1(pk.C_query_2, 0)

        rd1 = (r + d1) % r_p
        # A = (r + d1) G_gamma_Z + A_query[0] + MSM  (tcc:487-505)
        A = hc.g1.add(
            hc.g1.add(hc.g1.mul(rd1, pk.G_gamma_Z), A0), A_msm
        )
        B = hc.g2.add(
            hc.g2.add(hc.g2.mul(rd1, pk.H_gamma_Z), B0), B_msm
        )
        # C (tcc:525-566)
        C = C1_msm
        C = hc.g1.add(C, hc.g1.mul(r * r % r_p, pk.G_gamma2_Z2))
        C = hc.g1.add(C, hc.g1.mul(rd1, pk.G_ab_gamma_Z))
        C = hc.g1.add(C, hc.g1.mul(r, C2_0))
        C = hc.g1.add(C, hc.g1.mul(2 * r * d1 % r_p, pk.G_gamma2_Z2))
        C = hc.g1.add(C, hc.g1.mul(r, C2_msm))
        C = hc.g1.add(C, hc.g1.mul(d2, host_aff_g1(pk.G_gamma2_Z_t, 0)))
        C = hc.g1.add(C, H_msm)
    return Proof(A=A, B=B, C=C)


def verifier_process_vk(vk: VerificationKey):
    return vk


def online_verifier_weak_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    """tcc:598-688: the two pairing tests."""
    hc = host_curve(vk.curve)
    engine = AtePairing(hc)
    gt = engine.gt

    for P, g in ((proof.A, hc.g1), (proof.C, hc.g1)):
        if P is not None and not g.is_on_curve(P):
            return False
    if proof.B is not None and not hc.g2.is_on_curve(proof.B):
        return False

    psi = vk.query[0]
    for i, v in enumerate(primary):
        psi = hc.g1.add(psi, hc.g1.mul(v % hc.fr_spec.p, vk.query[i + 1]))

    # test 1: e(A + G_alpha, B + H_beta)
    #         = e(G_alpha, H_beta) e(psi, H_gamma) e(C, H)
    lhs = engine.reduced_pairing(
        hc.g1.add(proof.A, vk.G_alpha), hc.g2.add(proof.B, vk.H_beta)
    )
    rhs = gt.mul(
        engine.reduced_pairing(vk.G_alpha, vk.H_beta),
        gt.mul(
            engine.reduced_pairing(psi, vk.H_gamma),
            engine.reduced_pairing(proof.C, vk.H),
        ),
    )
    if lhs != rhs:
        return False

    # test 2: e(A, H_gamma) = e(G_gamma, B)
    return engine.reduced_pairing(proof.A, vk.H_gamma) == engine.reduced_pairing(
        vk.G_gamma, proof.B
    )


def online_verifier_strong_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    if len(vk.query) != len(primary) + 1:
        return False
    return online_verifier_weak_IC(vk, primary, proof)


def verifier_weak_IC(vk, primary, proof):
    return online_verifier_weak_IC(verifier_process_vk(vk), primary, proof)


def verifier_strong_IC(vk, primary, proof):
    return online_verifier_strong_IC(verifier_process_vk(vk), primary, proof)
