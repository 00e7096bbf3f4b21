"""ADSNARK (r1cs_ppzkadsnark): SNARKs over authenticated data.

Capability parity with libsnark/zk_proof_systems/ppzkadsnark/
r1cs_ppzkadsnark (r1cs_ppzkadsnark.{hpp,tcc} — the Backes–Barbosa–
Fiore–Reischuk scheme): a PGHR13-style SNARK whose public inputs are
MAC-authenticated by a data provider, verifiable either with the
secret authentication key (symmetric) or publicly via pairings and
label signatures.

Structure mirrored from the reference:

  * auth layer (tcc:378-446): sak = (i, sig sk, prf seed),
    pak = (-i*G2, sig vk), pap = i*G1.  auth_sign: lambda =
    PRF(seed, label); Lambda = lambda*G2; sigma = Sign(label, Lambda);
    mu = lambda + i*v — a linear MAC on the value v;
  * generator (tcc:452-637): the PGHR13 keygen WITHOUT the IC split —
    input rows stay in the A-query; vk additionally carries
    A0 = A_query[0].g and Ain = A_query[1..l].g; pk carries
    rA_i_Z_g1 = (rA Zt) * pap.I1;
  * prover (tcc:641-820): ZK shifts (d1+dauth, d2, d3); g_A covers the
    AUXILIARY A rows only, g_Aau the INPUT rows (+ dauth Zt term);
    muA = dauth * rA_i_Z_g1 + sum_i mu_i * Ain_i; proof =
    (g_A, g_B, g_C kc pairs, g_H, g_K, g_Aau, muA);
  * symmetric verifier (tcc:843-1035): recompute the lambdas, check
    muA == i*g_Aau.g + sum lambda_i Ain_i, then the five PGHR13
    pairing checks with Aacc = A0 + g_Aau.g + g_A.g;
  * public verifier (tcc:1040-1160): batch label-signature check plus
    the pairing aggregation  prod_i e(Ain_i, Lambda_i) ==
    e(muA, G2) * e(g_Aau.g, -I2)  replacing the secret-key MAC check.

Instantiations (the reference treats these as pluggable examples —
aes_ctr PRF + ed25519 signatures): PRF = HMAC-SHA512 expanded to Fr;
signature = Schnorr over the SNARK curve's G1 (hash = SHA-512 over
label || Lambda bytes).

The heavy lifting (fused fixed-base keygen, 7-way G1 MSM + G2 MSM in
the prover) runs on the same device engines as proof_systems.pghr13.
"""

from __future__ import annotations

import hashlib
import hmac
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
from .pghr13 import _np_pair


# ---------------------------------------------------------------------------
# authentication layer
# ---------------------------------------------------------------------------

@dataclass
class PubAuthPrms:
    I1: tuple  # i * G1


@dataclass
class SecAuthKey:
    i: int
    sig_sk: int
    prf_seed: bytes


@dataclass
class PubAuthKey:
    minus_i2: tuple  # -i * G2
    sig_vk: tuple    # Schnorr public key (G1)


@dataclass
class AuthKeys:
    pap: PubAuthPrms
    pak: PubAuthKey
    sak: SecAuthKey


@dataclass
class AuthData:
    mu: int
    Lambda: tuple  # lambda * G2
    sigma: tuple   # Schnorr signature (s, e)


def _prf(seed: bytes, label: bytes, r_p: int) -> int:
    """HMAC-SHA512 expanded to 1024 bits, reduced mod r (the
    reference's prfCompute contract: deterministic label -> Fr)."""
    h1 = hmac.new(seed, b"\x00" + label, hashlib.sha512).digest()
    h2 = hmac.new(seed, b"\x01" + label, hashlib.sha512).digest()
    return int.from_bytes(h1 + h2, "little") % r_p


def _sig_hash(label: bytes, Lambda, r_pt, r_p: int) -> int:
    enc = label
    for comp in (Lambda[0] + Lambda[1] if Lambda else ()):  # G2 coords
        enc += int(comp).to_bytes(96, "little")
    enc += int(r_pt[0]).to_bytes(96, "little")
    return int.from_bytes(hashlib.sha512(enc).digest(), "little") % r_p


class _Schnorr:
    """Label signatures over the SNARK curve's G1 (sigGen/sigSign/
    sigVerif/sigBatchVerif contract)."""

    def __init__(self, hc):
        self.hc = hc
        self.r = hc.fr_spec.p

    def keygen(self, rng):
        sk = rng.randrange(1, self.r)
        return sk, self.hc.g1.mul(sk, self.hc.g1_gen)

    def sign(self, sk: int, label: bytes, Lambda, rng):
        k = rng.randrange(1, self.r)
        R = self.hc.g1.mul(k, self.hc.g1_gen)
        e = _sig_hash(label, Lambda, R, self.r)
        s = (k - sk * e) % self.r
        return (s, e)

    def verify(self, vk, label: bytes, Lambda, sig) -> bool:
        s, e = sig
        R = self.hc.g1.add(
            self.hc.g1.mul(s, self.hc.g1_gen), self.hc.g1.mul(e, vk)
        )
        return _sig_hash(label, Lambda, R, self.r) == e

    def batch_verify(self, vk, labels, Lambdas, sigs) -> bool:
        return all(
            self.verify(vk, lb, L, sg)
            for lb, L, sg in zip(labels, Lambdas, sigs)
        )


def auth_generator(model, rng) -> AuthKeys:
    """r1cs_ppzkadsnark_auth_generator (tcc:378-390)."""
    hc = host_curve(model.name)
    sch = _Schnorr(hc)
    sig_sk, sig_vk = sch.keygen(rng)
    seed = rng.randrange(1 << 256).to_bytes(32, "little")
    i = rng.randrange(1, hc.fr_spec.p)
    return AuthKeys(
        pap=PubAuthPrms(I1=hc.g1.mul(i, hc.g1_gen)),
        pak=PubAuthKey(
            minus_i2=hc.g2.neg(hc.g2.mul(i, hc.g2_gen)), sig_vk=sig_vk
        ),
        sak=SecAuthKey(i=i, sig_sk=sig_sk, prf_seed=seed),
    )


def auth_sign(model, values, sak: SecAuthKey, labels, rng):
    """tcc:392-411: per value, mu = lambda + i*v with Lambda and a
    label signature."""
    hc = host_curve(model.name)
    sch = _Schnorr(hc)
    r_p = hc.fr_spec.p
    out = []
    for v, label in zip(values, labels):
        lam = _prf(sak.prf_seed, label, r_p)
        Lambda = hc.g2.mul(lam, hc.g2_gen)
        sigma = sch.sign(sak.sig_sk, label, Lambda, rng)
        out.append(AuthData(mu=(lam + sak.i * v) % r_p, Lambda=Lambda,
                            sigma=sigma))
    return out


def auth_verify_sym(model, values, auth_data, sak: SecAuthKey,
                    labels) -> bool:
    """tcc:415-429 (symmetric)."""
    r_p = host_curve(model.name).fr_spec.p
    return all(
        ad.mu == (_prf(sak.prf_seed, lb, r_p) + sak.i * v) % r_p
        for v, ad, lb in zip(values, auth_data, labels)
    )


def auth_verify_pub(model, values, auth_data, pak: PubAuthKey,
                    labels) -> bool:
    """tcc:433-447 (public): Lambda - v*(-I2) must equal mu*G2, plus
    the label signature."""
    hc = host_curve(model.name)
    sch = _Schnorr(hc)
    ok = True
    for v, ad, lb in zip(values, auth_data, labels):
        Mup = hc.g2.add(ad.Lambda, hc.g2.neg(hc.g2.mul(v, pak.minus_i2)))
        ok &= hc.g2.mul(ad.mu, hc.g2_gen) == Mup
        ok &= sch.verify(pak.sig_vk, lb, ad.Lambda, ad.sigma)
    return ok


# ---------------------------------------------------------------------------
# SNARK keys / proof
# ---------------------------------------------------------------------------

@dataclass
class ProvingKey:
    curve: str
    A_query_g: tuple
    A_query_h: tuple
    B_query_g: tuple
    B_query_h: tuple
    C_query_g: tuple
    C_query_h: tuple
    H_query: tuple
    K_query: tuple
    rA_i_Z_g1: tuple
    constraint_system: R1CSConstraintSystem


@dataclass
class VerificationKey:
    curve: str
    alphaA_g2: tuple
    alphaB_g1: tuple
    alphaC_g2: tuple
    gamma_g2: tuple
    gamma_beta_g1: tuple
    gamma_beta_g2: tuple
    rC_Z_g2: tuple
    A0: tuple
    Ain: list


@dataclass
class Proof:
    g_A: tuple
    g_B: tuple
    g_C: tuple
    g_H: tuple
    g_K: tuple
    g_Aau: tuple
    muA: tuple


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


def generator(model, cs: R1CSConstraintSystem, prms: PubAuthPrms,
              rng) -> Keypair:
    """tcc:452-637: PGHR13 keygen without the IC split; input A rows
    surface in the vk as A0/Ain."""
    hc = host_curve(model.name)
    F = model.Fr
    r_p = F.p

    t = rng.randrange(1, r_p)
    with block("adsnark qap instance map"):
        inst = qap.instance_map_with_evaluation(cs, t, F)
    m, n, l = inst.num_variables, inst.domain_size, inst.num_inputs

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

    Kt = [
        beta * (rA * At[i] + rB * Bt[i] + rC * Ct[i]) % r_p
        for i in range(m + 1)
    ]
    Kt += [beta * rA % r_p * inst.Zt % r_p,
           beta * rB % r_p * inst.Zt % r_p,
           beta * rC % r_p * inst.Zt % r_p]

    raa = rA * alphaA % r_p
    rba = rB * alphaB % r_p
    rca = rC * alphaC % r_p
    groups = [
        [rA * v % r_p for v in At],
        [raa * v % r_p for v in At],
        [rba * v % r_p for v in Bt],
        [rC * v % r_p for v in Ct],
        [rca * v % r_p for v in Ct],
        list(inst.Ht[: n + 1]),
        Kt,
    ]
    all_scalars = sum(groups, [])
    w1 = fixed_base.get_exp_window_size(len(all_scalars))
    w2 = fixed_base.get_exp_window_size(m + 2)
    with block("adsnark G1 window table"):
        t1 = fixed_base.get_window_table(model.G1, w1, model.g1_generator())
    with block("adsnark G2 window table"):
        t2 = fixed_base.get_window_table(model.G2, w2, model.g2_generator())

    splits = np.cumsum([len(g) for g in groups[:-1]])
    with block("adsnark G1 queries (fused)"):
        g1_all = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G1.to_affine(
                    fixed_base.batch_exp(model.G1, w1, tab, s)
                )
            )(t1, jnp.asarray(ints_to_limbs(all_scalars)))
        )
        parts = [np.split(np.asarray(a), splits, axis=-1) for a in g1_all]
        Ag, Ah, Bh, Cg, Ch, Hq, Kq = (
            tuple(p[i] for p in parts) for i in range(7)
        )
    with block("adsnark B query (G2)"):
        Bg = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G2.to_affine(
                    fixed_base.batch_exp(model.G2, w2, tab, s)
                )
            )(t2, jnp.asarray(ints_to_limbs([rB * v % r_p for v in Bt])))
        )

    with block("adsnark vk singles"):
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
            alphaA_g2=hc.g2.mul(alphaA, hc.g2_gen),
            alphaB_g1=hc.g1.mul(alphaB, hc.g1_gen),
            alphaC_g2=hc.g2.mul(alphaC, hc.g2_gen),
            gamma_g2=hc.g2.mul(gamma, hc.g2_gen),
            gamma_beta_g1=hc.g1.mul(gamma * beta % r_p, hc.g1_gen),
            gamma_beta_g2=hc.g2.mul(gamma * beta % r_p, hc.g2_gen),
            rC_Z_g2=hc.g2.mul(rC * inst.Zt % r_p, hc.g2_gen),
            A0=host_g1_col(Ag, 0),
            Ain=[host_g1_col(Ag, i) for i in range(1, l + 1)],
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
        rA_i_Z_g1=hc.g1.mul(rA * inst.Zt % r_p, prms.I1),
        constraint_system=cs,
    )
    return Keypair(pk, vk)


def prover(model, pk: ProvingKey, primary, auxiliary, auth_data, rng,
           msm_window: int | None = None) -> Proof:
    """tcc:641-820."""
    F = model.Fr
    G1, G2 = model.G1, model.G2
    cs = pk.constraint_system
    r_p = F.p
    l = cs.primary_input_size
    m = cs.num_variables

    assert cs.is_satisfied(primary, auxiliary), "unsatisfied witness"

    d1 = rng.randrange(r_p)
    d2 = rng.randrange(r_p)
    d3 = rng.randrange(r_p)
    dauth = rng.randrange(r_p)

    with block("adsnark qap witness map"):
        full, H_planes = qap.witness_map(
            model, cs, primary, auxiliary, (d1 + dauth) % r_p, d2, d3
        )

    w_can_all = [v % r_p for v in full]
    w_aux = jnp.asarray(
        ints_to_limbs([0] * l + w_can_all[l:])
    )  # aux rows (input prefix zeroed)
    w_in = jnp.asarray(
        ints_to_limbs(w_can_all[:l] + [0] * (m - l))
    )  # input rows only
    w_all = jnp.asarray(ints_to_limbs(w_can_all))

    def dev_g1(pair, lo=None, hi=None):
        x, y = (jnp.asarray(a) for a in pair)
        if lo is not None:
            x, y = x[..., lo:hi], y[..., lo:hi]
        return G1.from_affine(x, y)

    # nine G1 MSMs in one fused program: A.g/A.h split into aux + input
    # halves, B.h, C.g, C.h, K over all variables, H over coefficients
    def msm_g1(Ag, Ah, Bh, Cg, Ch, Kq, Hq, w_aux, w_in, w_all, H_planes):
        h_can = F.to_canonical(H_planes)
        pts, scal = msm_mod.pad_and_stack(
            F,
            [
                dev_g1(Ag, 1, m + 1),
                dev_g1(Ah, 1, m + 1),
                dev_g1(Ag, 1, m + 1),
                dev_g1(Ah, 1, m + 1),
                dev_g1(Bh, 1, m + 1),
                dev_g1(Cg, 1, m + 1),
                dev_g1(Ch, 1, m + 1),
                dev_g1(Kq, 1, m + 1),
                dev_g1(Hq),
            ],
            [w_aux, w_aux, w_in, w_in, w_all, w_all, w_all, w_all, h_can],
        )
        return msm_mod.msm_multi(G1, pts, scal, msm_window)

    def msm_g2(Bg, w_all):
        x, y = (jnp.asarray(a)[..., 1 : m + 1] for a in Bg)
        return msm_mod.msm(
            G2, G2.from_affine(x, y), w_all,
            msm_mod.g2_window_bits(w_all.shape[-1], msm_window),
        )

    with block("adsnark G1 multiexps (jit)"):
        res9 = jax.block_until_ready(
            jax.jit(msm_g1)(
                tuple(jnp.asarray(a) for a in pk.A_query_g),
                tuple(jnp.asarray(a) for a in pk.A_query_h),
                tuple(jnp.asarray(a) for a in pk.B_query_h),
                tuple(jnp.asarray(a) for a in pk.C_query_g),
                tuple(jnp.asarray(a) for a in pk.C_query_h),
                tuple(jnp.asarray(a) for a in pk.K_query),
                tuple(jnp.asarray(a) for a in pk.H_query),
                w_aux, w_in, w_all, H_planes,
            )
        )
    with block("adsnark G2 multiexp (jit)"):
        res2 = jax.block_until_ready(
            jax.jit(msm_g2)(
                tuple(jnp.asarray(a) for a in pk.B_query_g), w_all
            )
        )

    with block("adsnark assemble proof (host)"):
        hc = host_curve(model.name)
        spec = model.Fq.spec
        msms = [
            _g1_proj_to_host(model, tuple(a[..., i : i + 1] for a in res9))
            for i in range(9)
        ]
        (Aaux_g, Aaux_h, Ain_g, Ain_h, Bh_m, Cg_m, Ch_m, Kq_m,
         Hq_m) = msms
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

        AZg = host_aff_g1(pk.A_query_g, m + 1)
        AZh = host_aff_g1(pk.A_query_h, m + 1)
        # g_A: aux rows + d1 * Zt row (NO [0] base term, tcc:659)
        g_A = (
            hc.g1.add(hc.g1.mul(d1, AZg), Aaux_g),
            hc.g1.add(hc.g1.mul(d1, AZh), Aaux_h),
        )
        # g_Aau: input rows + dauth * Zt row
        g_Aau = (
            hc.g1.add(hc.g1.mul(dauth, AZg), Ain_g),
            hc.g1.add(hc.g1.mul(dauth, AZh), Ain_h),
        )
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
        g_C = (
            hc.g1.add(
                hc.g1.add(host_aff_g1(pk.C_query_g, 0),
                          hc.g1.mul(d3, host_aff_g1(pk.C_query_g, m + 1))),
                Cg_m,
            ),
            hc.g1.add(
                hc.g1.add(host_aff_g1(pk.C_query_h, 0),
                          hc.g1.mul(d3, host_aff_g1(pk.C_query_h, m + 1))),
                Ch_m,
            ),
        )
        g_H = Hq_m
        g_K = Kq_m
        for d, off in ((d1, m + 1), (d2, m + 2), (d3, m + 3)):
            g_K = hc.g1.add(g_K, hc.g1.mul(d, host_aff_g1(pk.K_query, off)))
        g_K = hc.g1.add(g_K, host_aff_g1(pk.K_query, 0))

        # muA = dauth * rA_i_Z_g1 + sum_i mu_i * Ain_i (tcc:795-807)
        muA = hc.g1.mul(dauth, pk.rA_i_Z_g1)
        for ad, Ain_i in zip(auth_data, _vk_ain(model, pk)):
            muA = hc.g1.add(muA, hc.g1.mul(ad.mu, Ain_i))

    return Proof(g_A=g_A, g_B=(gB_g, gB_h), g_C=g_C, g_H=g_H, g_K=g_K,
                 g_Aau=g_Aau, muA=muA)


def _vk_ain(model, pk: ProvingKey):
    """The input rows of the A query as host points (== vk.Ain)."""
    spec = model.Fq.spec
    l = pk.constraint_system.primary_input_size
    out = []
    x, y = (np.asarray(a) for a in pk.A_query_g)
    for i in range(1, l + 1):
        xi, yi = x[:, i], y[:, i]
        if not yi.any():
            out.append(None)
        else:
            out.append(
                (spec.from_mont(limbs_to_int(xi)),
                 spec.from_mont(limbs_to_int(yi)))
            )
    return out


# ---------------------------------------------------------------------------
# verifiers
# ---------------------------------------------------------------------------

def _kc_check(engine, gt, g, h, alpha_partner, g1_side: bool) -> bool:
    """e(g, alpha_g2) == e(h, G2one)  (or the G1-side alphaB variant)."""
    hc = engine.hc
    if g is None and h is None:
        return True
    if g1_side:
        lhs = engine.reduced_pairing(alpha_partner, g)  # e(alphaB_g1, B.g)
    else:
        lhs = engine.reduced_pairing(g, alpha_partner)
    rhs = engine.reduced_pairing(h, hc.g2_gen)
    return lhs == rhs


def _snark_checks(model, vk: VerificationKey, proof: Proof) -> bool:
    """The five PGHR13-style checks with Aacc = A0 + Aau.g + A.g
    (tcc:897-1030)."""
    hc = host_curve(model.name)
    engine = AtePairing(hc)
    gt = engine.gt

    ok = _kc_check(engine, gt, proof.g_Aau[0], proof.g_Aau[1],
                   vk.alphaA_g2, False)
    ok &= _kc_check(engine, gt, proof.g_A[0], proof.g_A[1],
                    vk.alphaA_g2, False)
    # B: e(alphaB_g1, B.g) == e(B.h, G2one)
    lhsB = engine.reduced_pairing(vk.alphaB_g1, proof.g_B[0])
    rhsB = engine.reduced_pairing(proof.g_B[1], hc.g2_gen)
    ok &= lhsB == rhsB
    ok &= _kc_check(engine, gt, proof.g_C[0], proof.g_C[1],
                    vk.alphaC_g2, False)

    Aacc = hc.g1.add(hc.g1.add(vk.A0, proof.g_Aau[0]), proof.g_A[0])
    # QAP: e(Aacc, B.g) == e(H, rC_Z_g2) e(C.g, G2one)
    lhs = engine.reduced_pairing(Aacc, proof.g_B[0])
    rhs = gt.mul(
        engine.reduced_pairing(proof.g_H, vk.rC_Z_g2),
        engine.reduced_pairing(proof.g_C[0], hc.g2_gen),
    )
    ok &= lhs == rhs
    # K: e(K, gamma_g2) == e(Aacc + C.g, gamma_beta_g2) e(gamma_beta_g1, B.g)
    lhs = engine.reduced_pairing(proof.g_K, vk.gamma_g2)
    rhs = gt.mul(
        engine.reduced_pairing(hc.g1.add(Aacc, proof.g_C[0]),
                               vk.gamma_beta_g2),
        engine.reduced_pairing(vk.gamma_beta_g1, proof.g_B[0]),
    )
    ok &= lhs == rhs
    return ok


def verifier_sym(model, vk: VerificationKey, proof: Proof,
                 sak: SecAuthKey, labels) -> bool:
    """Symmetric verifier (tcc:843-1035): MAC check with the secret key
    + the SNARK checks."""
    hc = host_curve(model.name)
    r_p = hc.fr_spec.p
    lambdas = [_prf(sak.prf_seed, lb, r_p) for lb in labels]
    prodA = hc.g1.mul(sak.i, proof.g_Aau[0])
    for lam, Ain_i in zip(lambdas, vk.Ain):
        prodA = hc.g1.add(prodA, hc.g1.mul(lam, Ain_i))
    if prodA != proof.muA:
        return False
    return _snark_checks(model, vk, proof)


def verifier_pub(model, vk: VerificationKey, proof: Proof, auth_data,
                 pak: PubAuthKey, labels) -> bool:
    """Public verifier (tcc:1040-1160): label signatures + the pairing
    aggregation  prod e(Ain_i, Lambda_i) == e(muA, G2) e(Aau.g, -I2)."""
    hc = host_curve(model.name)
    engine = AtePairing(hc)
    gt = engine.gt
    sch = _Schnorr(hc)
    if not sch.batch_verify(
        pak.sig_vk, labels, [ad.Lambda for ad in auth_data],
        [ad.sigma for ad in auth_data]
    ):
        return False
    lhs = gt.one
    for Ain_i, ad in zip(vk.Ain, auth_data):
        lhs = gt.mul(lhs, engine.reduced_pairing(Ain_i, ad.Lambda))
    rhs = gt.mul(
        engine.reduced_pairing(proof.muA, hc.g2_gen),
        engine.reduced_pairing(proof.g_Aau[0], pak.minus_i2),
    )
    if lhs != rhs:
        return False
    return _snark_checks(model, vk, proof)
