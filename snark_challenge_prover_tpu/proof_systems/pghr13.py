"""PGHR13 ppzkSNARK (r1cs_ppzksnark) — the original Pinocchio-style
scheme with knowledge commitments.

Capability parity with libsnark/zk_proof_systems/ppzksnark/
r1cs_ppzksnark/r1cs_ppzksnark.{hpp,tcc}:

  * `generator` (tcc:230-430): QAP at a random t with Z(t) appended to
    At/Bt/Ct (tcc:290-293), samples alphaA/alphaB/alphaC/rA/rB/beta/
    gamma (rC = rA rB), then builds
        A_query_i = (rA At_i G, rA alphaA At_i G)      [kc pair, G1xG1]
        B_query_i = (rB Bt_i H, rB alphaB Bt_i G)      [kc pair, G2xG1]
        C_query_i = (rC Ct_i G, rC alphaC Ct_i G)      [kc pair, G1xG1]
        H_query_i = Ht_i G
        K_query_i = beta (rA At_i + rB Bt_i + rC Ct_i) G   (+3 Zt rows)
        vk = (alphaA H, alphaB G, alphaC H, gamma H, gamma beta G,
              gamma beta H, rC Z(t) H, IC query rA At_{0..l} G)
    with the input prefix of At zeroed out of A_query into the IC
    (tcc:317-325).  All seven G1 query families share one fused device
    batch_exp program; B.g runs on the G2 table.

  * `prover` (tcc:430-545): QAP witness map with the d1/d2/d3 ZK shifts
    (reductions.r1cs_to_qap), then five MSM families on the device
    Pippenger engine and the O(1) blinded assembly on host ints:
        g_A = A_query[0] + d1 A_query[m+1] + <A_query[1..m], w>
        g_B, g_C analogous with d2, d3
        g_H = <H_query, H coeffs>
        g_K = K_query[0] + d1 K[m+1] + d2 K[m+2] + d3 K[m+3]
              + <K_query[1..m], w>

  * `verifier` (tcc:547-720): the five pairing checks (three knowledge
    commitments, QAP divisibility, same-coefficient) on the host ate
    engine.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..host.curves import host_curve
from ..ops import fixed_base, msm as msm_mod
from ..reductions import r1cs_to_qap as qap
from ..relations.r1cs import R1CSConstraintSystem
from ..utils.bigint import ints_to_limbs, limbs_to_int
from ..utils.profiling import block
from .ate_pairing import AtePairing
from .groth16 import _g1_proj_to_host, _g2_proj_to_host


@dataclass
class ProvingKey:
    """r1cs_ppzksnark_proving_key (hpp:77-177).  Queries are affine limb
    planes; kc queries store (g, h) plane pairs."""

    curve: str
    A_query_g: tuple   # (x, y) planes (48, m+2)
    A_query_h: tuple
    B_query_g: tuple   # G2 (deg, 48, m+2)
    B_query_h: tuple   # G1
    C_query_g: tuple
    C_query_h: tuple
    H_query: tuple     # (48, n+1)
    K_query: tuple     # (48, m+4)
    constraint_system: R1CSConstraintSystem


@dataclass
class VerificationKey:
    """r1cs_ppzksnark_verification_key (hpp:179-272), host affine ints."""

    curve: str
    alphaA_g2: tuple
    alphaB_g1: tuple
    alphaC_g2: tuple
    gamma_g2: tuple
    gamma_beta_g1: tuple
    gamma_beta_g2: tuple
    rC_Z_g2: tuple
    encoded_IC_base: tuple
    encoded_IC_values: list


@dataclass
class Proof:
    """pi = (g_A, g_B, g_C knowledge commitments, g_H, g_K)
    (hpp:274-351)."""

    g_A: tuple  # (g in G1, h in G1)
    g_B: tuple  # (g in G2, h in G1)
    g_C: tuple  # (g in G1, h in G1)
    g_H: tuple
    g_K: tuple


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


def _np_pair(aff):
    """Affine (x, y) pair storage; identity stores y = 0 (read_g1
    semantics) so from_affine round-trips it."""
    x, y, z = (np.asarray(t) for t in aff)
    alive = z.reshape(-1, z.shape[-1]).any(axis=0)
    return (x, np.where(alive, y, 0).astype(y.dtype))


def generator(model, cs: R1CSConstraintSystem, rng) -> Keypair:
    """r1cs_ppzksnark_generator (tcc:230-430)."""
    hc = host_curve(model.name)
    F = model.Fr
    r_p = F.p

    t = rng.randrange(1, r_p)
    with block("pghr13 qap instance map"):
        inst = qap.instance_map_with_evaluation(cs, t, F)
    m, n, l = inst.num_variables, inst.domain_size, inst.num_inputs

    # append Zt (tcc:290-293): index m+1 row of each query
    At = list(inst.At) + [inst.Zt]
    Bt = list(inst.Bt) + [inst.Zt]
    Ct = list(inst.Ct) + [inst.Zt]

    alphaA = rng.randrange(1, r_p)
    alphaB = rng.randrange(1, r_p)
    alphaC = rng.randrange(1, r_p)
    rA = rng.randrange(1, r_p)
    rB = rng.randrange(1, r_p)
    beta = rng.randrange(1, r_p)
    gamma = rng.randrange(1, r_p)
    rC = rA * rB % r_p

    # K query exponents BEFORE zeroing the At input prefix (tcc:305-313)
    Kt = [
        beta * (rA * At[i] + rB * Bt[i] + rC * Ct[i]) % r_p
        for i in range(m + 2)
    ]
    Kt += [beta * rA % r_p * inst.Zt % r_p,
           beta * rB % r_p * inst.Zt % r_p,
           beta * rC % r_p * inst.Zt % r_p]
    # NB: the reference's Kt loop covers 0..m (tcc:308) and then appends
    # the three Zt rows, giving m+4 entries; its At[m+1]=Zt row never
    # enters Kt.  Match that exactly:
    Kt = Kt[: m + 1] + Kt[m + 2 :]

    # IC prefix (tcc:317-325)
    IC = [At[i] for i in range(l + 1)]
    for i in range(l + 1):
        At[i] = 0

    # fused G1 exponents: A.g, A.h, B.h, C.g, C.h, H, K, IC
    raa = rA * alphaA % r_p
    rba = rB * alphaB % r_p
    rca = rC * alphaC % r_p
    groups = [
        [rA * v % r_p for v in At],           # A.g        (m+2)
        [raa * v % r_p for v in At],          # A.h        (m+2)
        [rba * v % r_p for v in Bt],          # B.h        (m+2)
        [rC * v % r_p for v in Ct],           # C.g        (m+2)
        [rca * v % r_p for v in Ct],          # C.h        (m+2)
        list(inst.Ht[: n + 1]),               # H          (n+1)
        Kt,                                   # K          (m+4)
        [rA * v % r_p for v in IC],           # IC         (l+1)
    ]
    all_scalars = sum(groups, [])
    w1 = fixed_base.get_exp_window_size(len(all_scalars))
    w2 = fixed_base.get_exp_window_size(m + 2)
    with block("pghr13 G1 window table"):
        t1 = fixed_base.get_window_table(model.G1, w1, model.g1_generator())
    with block("pghr13 G2 window table"):
        t2 = fixed_base.get_window_table(model.G2, w2, model.g2_generator())

    splits = np.cumsum([len(g) for g in groups[:-1]])
    with block("pghr13 G1 queries (fused)"):
        g1_all = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G1.to_affine(
                    fixed_base.batch_exp(model.G1, w1, tab, s)
                )
            )(t1, jnp.asarray(ints_to_limbs(all_scalars)))
        )
        parts = [np.split(np.asarray(a), splits, axis=-1) for a in g1_all]
        Ag, Ah, Bh, Cg, Ch, Hq, Kq, ICq = (
            tuple(p[i] for p in parts) for i in range(8)
        )
    with block("pghr13 B query (G2)"):
        Bg = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G2.to_affine(
                    fixed_base.batch_exp(model.G2, w2, tab, s)
                )
            )(t2, jnp.asarray(ints_to_limbs([rB * v % r_p for v in Bt])))
        )

    with block("pghr13 vk singles"):
        Gh1 = hc.g1_gen
        Hh2 = hc.g2_gen
        spec = model.Fq.spec

        def host_g1_col(pair_xyz, i):
            x, y, z = (np.asarray(a)[:, i] for a in pair_xyz)
            if not z.any():
                return None
            return (
                spec.from_mont(limbs_to_int(x)),
                spec.from_mont(limbs_to_int(y)),
            )

        vk = VerificationKey(
            curve=model.name,
            alphaA_g2=hc.g2.mul(alphaA, Hh2),
            alphaB_g1=hc.g1.mul(alphaB, Gh1),
            alphaC_g2=hc.g2.mul(alphaC, Hh2),
            gamma_g2=hc.g2.mul(gamma, Hh2),
            gamma_beta_g1=hc.g1.mul(gamma * beta % r_p, Gh1),
            gamma_beta_g2=hc.g2.mul(gamma * beta % r_p, Hh2),
            rC_Z_g2=hc.g2.mul(rC * inst.Zt % r_p, Hh2),
            encoded_IC_base=host_g1_col(ICq, 0),
            encoded_IC_values=[host_g1_col(ICq, i) for i in range(1, l + 1)],
        )

    pk = ProvingKey(
        curve=model.name,
        A_query_g=_np_pair(Ag),
        A_query_h=_np_pair(Ah),
        B_query_g=_np_pair(Bg),
        B_query_h=_np_pair(Bh),
        C_query_g=_np_pair(Cg),
        C_query_h=_np_pair(Ch),
        H_query=_np_pair(Hq),
        K_query=_np_pair(Kq),
        constraint_system=cs,
    )
    return Keypair(pk, vk)


def prover(model, pk: ProvingKey, primary, auxiliary, rng,
           msm_window: int | None = None) -> Proof:
    """r1cs_ppzksnark_prover (tcc:430-545)."""
    F = model.Fr
    G1, G2 = model.G1, model.G2
    cs = pk.constraint_system
    r_p = F.p

    assert cs.is_satisfied(primary, auxiliary), "unsatisfied witness"

    d1 = rng.randrange(r_p)
    d2 = rng.randrange(r_p)
    d3 = rng.randrange(r_p)

    with block("pghr13 qap witness map"):
        full, H_planes = qap.witness_map(
            model, cs, primary, auxiliary, d1, d2, d3
        )
    m = cs.num_variables

    w_can = jnp.asarray(ints_to_limbs([v % r_p for v in full]))  # (48, m)

    def dev_g1(pair, lo=None, hi=None):
        x, y = (jnp.asarray(a) for a in pair)
        if lo is not None:
            x, y = x[..., lo:hi], y[..., lo:hi]
        return G1.from_affine(x, y)

    # fused G1 MSMs over variables 1..m: A.g, A.h, B.h, C.g, C.h, K —
    # plus the H query over all n+1 coefficients
    def msm_g1(Ag, Ah, Bh, Cg, Ch, Kq, Hq, w_can, H_planes):
        h_can = F.to_canonical(H_planes)
        pts, scal = msm_mod.pad_and_stack(
            F,
            [
                dev_g1(Ag, 1, m + 1),
                dev_g1(Ah, 1, m + 1),
                dev_g1(Bh, 1, m + 1),
                dev_g1(Cg, 1, m + 1),
                dev_g1(Ch, 1, m + 1),
                dev_g1(Kq, 1, m + 1),
                dev_g1(Hq),
            ],
            [w_can] * 6 + [h_can],
        )
        return msm_mod.msm_multi(G1, pts, scal, msm_window)

    def msm_g2(Bg, w_can):
        x, y = (jnp.asarray(a)[..., 1 : m + 1] for a in Bg)
        return msm_mod.msm(
            G2, G2.from_affine(x, y), w_can,
            msm_mod.g2_window_bits(w_can.shape[-1], msm_window),
        )

    with block("pghr13 G1 multiexps (jit)"):
        res7 = jax.block_until_ready(
            jax.jit(msm_g1)(
                tuple(jnp.asarray(a) for a in pk.A_query_g),
                tuple(jnp.asarray(a) for a in pk.A_query_h),
                tuple(jnp.asarray(a) for a in pk.B_query_h),
                tuple(jnp.asarray(a) for a in pk.C_query_g),
                tuple(jnp.asarray(a) for a in pk.C_query_h),
                tuple(jnp.asarray(a) for a in pk.K_query),
                tuple(jnp.asarray(a) for a in pk.H_query),
                w_can, H_planes,
            )
        )
    with block("pghr13 G2 multiexp (jit)"):
        res2 = jax.block_until_ready(
            jax.jit(msm_g2)(
                tuple(jnp.asarray(a) for a in pk.B_query_g), w_can
            )
        )

    with block("pghr13 assemble proof (host)"):
        hc = host_curve(model.name)
        spec = model.Fq.spec
        msms = [
            _g1_proj_to_host(model, tuple(a[..., i : i + 1] for a in res7))
            for i in range(7)
        ]
        Ag_m, Ah_m, Bh_m, Cg_m, Ch_m, Kq_m, Hq_m = msms
        Bg_m = _g2_proj_to_host(model, res2)

        def host_aff_g1(pair, i):
            x, y = (np.asarray(a)[:, i] for a in pair)
            if not y.any():
                return None
            return (
                spec.from_mont(limbs_to_int(x)),
                spec.from_mont(limbs_to_int(y)),
            )

        def host_aff_g2(pair, i):
            x, y = (np.asarray(a)[:, :, i] for a in pair)
            if not y.any():
                return None
            dg = x.shape[0]
            return (
                tuple(spec.from_mont(limbs_to_int(x[j])) for j in range(dg)),
                tuple(spec.from_mont(limbs_to_int(y[j])) for j in range(dg)),
            )

        def kc_g1(pair_g, pair_h, msm_g, msm_h, d):
            g = hc.g1.add(
                hc.g1.add(host_aff_g1(pair_g, 0),
                          hc.g1.mul(d, host_aff_g1(pair_g, m + 1))),
                msm_g,
            )
            h = hc.g1.add(
                hc.g1.add(host_aff_g1(pair_h, 0),
                          hc.g1.mul(d, host_aff_g1(pair_h, m + 1))),
                msm_h,
            )
            return (g, h)

        g_A = kc_g1(pk.A_query_g, pk.A_query_h, Ag_m, Ah_m, d1)
        g_C = kc_g1(pk.C_query_g, pk.C_query_h, Cg_m, Ch_m, d3)
        gB_g = hc.g2.add(
            hc.g2.add(host_aff_g2(pk.B_query_g, 0),
                      hc.g2.mul(d2, host_aff_g2(pk.B_query_g, m + 1))),
            Bg_m,
        )
        gB_h = hc.g1.add(
            hc.g1.add(host_aff_g1(pk.B_query_h, 0),
                      hc.g1.mul(d2, host_aff_g1(pk.B_query_h, m + 1))),
            Bh_m,
        )
        g_H = Hq_m
        g_K = Kq_m
        for d, off in ((d1, m + 1), (d2, m + 2), (d3, m + 3)):
            g_K = hc.g1.add(g_K, hc.g1.mul(d, host_aff_g1(pk.K_query, off)))
        g_K = hc.g1.add(g_K, host_aff_g1(pk.K_query, 0))
    return Proof(g_A=g_A, g_B=(gB_g, gB_h), g_C=g_C, g_H=g_H, g_K=g_K)


def verifier_process_vk(vk: VerificationKey):
    return vk


def online_verifier_weak_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    """tcc:569-688: the five pairing checks."""
    hc = host_curve(vk.curve)
    engine = AtePairing(hc)
    gt = engine.gt
    p = hc.fr_spec.p

    acc = vk.encoded_IC_base
    for i, v in enumerate(primary):
        acc = hc.g1.add(acc, hc.g1.mul(v % p, vk.encoded_IC_values[i]))

    for P, g in (
        (proof.g_A[0], hc.g1), (proof.g_A[1], hc.g1),
        (proof.g_B[1], hc.g1),
        (proof.g_C[0], hc.g1), (proof.g_C[1], hc.g1),
        (proof.g_H, hc.g1), (proof.g_K, hc.g1),
    ):
        if P is not None and not g.is_on_curve(P):
            return False
    if proof.g_B[0] is not None and not hc.g2.is_on_curve(proof.g_B[0]):
        return False

    one2 = hc.g2_gen
    # kc checks: e(g, alpha_x) == e(h, H_one)  (and mirrored for B)
    if engine.reduced_pairing(proof.g_A[0], vk.alphaA_g2) != \
            engine.reduced_pairing(proof.g_A[1], one2):
        return False
    if engine.reduced_pairing(vk.alphaB_g1, proof.g_B[0]) != \
            engine.reduced_pairing(proof.g_B[1], one2):
        return False
    if engine.reduced_pairing(proof.g_C[0], vk.alphaC_g2) != \
            engine.reduced_pairing(proof.g_C[1], one2):
        return False

    # QAP divisibility: e(A+acc, B) == e(H, rC_Z) e(C, one)
    A_acc = hc.g1.add(proof.g_A[0], acc)
    lhs = engine.reduced_pairing(A_acc, proof.g_B[0])
    rhs = gt.mul(
        engine.reduced_pairing(proof.g_H, vk.rC_Z_g2),
        engine.reduced_pairing(proof.g_C[0], one2),
    )
    if lhs != rhs:
        return False

    # same-coefficient: e(K, gamma) == e(A+acc+C, gamma_beta_2)
    #                                   e(gamma_beta_1, B)
    lhs = engine.reduced_pairing(proof.g_K, vk.gamma_g2)
    rhs = gt.mul(
        engine.reduced_pairing(
            hc.g1.add(A_acc, proof.g_C[0]), vk.gamma_beta_g2
        ),
        engine.reduced_pairing(vk.gamma_beta_g1, proof.g_B[0]),
    )
    return lhs == rhs


def online_verifier_strong_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    if len(vk.encoded_IC_values) != len(primary):
        return False
    return online_verifier_weak_IC(vk, primary, proof)


def verifier_weak_IC(vk, primary, proof):
    return online_verifier_weak_IC(verifier_process_vk(vk), primary, proof)


def verifier_strong_IC(vk, primary, proof):
    return online_verifier_strong_IC(verifier_process_vk(vk), primary, proof)
