"""USCS ppzkSNARK (SSP-based, [DFGK14] style).

Capability parity with libsnark/zk_proof_systems/ppzksnark/
uscs_ppzksnark/uscs_ppzksnark.{hpp,tcc}:

  * `generator` (tcc:205-340): SSP at a random t; Vt_table = Vt ++ [Zt];
    the input prefix Xt goes to the vk IC query, the rest to
        V_g1_query_i       = Vt_i G           (i > num_inputs, + Zt row)
        alpha_V_g1_query_i = alpha Vt_i G
        H_g1_query_i       = Ht_i G
        V_g2_query_i       = Vt_i H           (all, + Zt row)
        vk = (tilde H, alpha tilde H, Zt H, IC = Xt G)

  * `prover` (tcc:343-432): SSP witness map (device FFT, V^2 - 1), then
    four MSMs on the device engine and the d-blinded assembly:
        V_g1 = d Zt G + <V_query, w[l+1..m]>
        alpha_V_g1 analogous
        H_g1 = <H_query, H coeffs>
        V_g2 = V_0 H + d Zt H + <V_g2_query[1..m], w>

  * `verifier` (tcc:434-530): the three pairing checks
        e(V_g1 + acc, H_one) = e(G_one, V_g2)
        e(V_g1 + acc, V_g2) = e(H_g1, Z H) e(G_one, H_one)
        e(V_g1, alpha tilde H) = e(alpha_V_g1, tilde H)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..host.curves import host_curve
from ..ops import fixed_base, msm as msm_mod
from ..reductions import uscs_to_ssp as ssp
from ..relations.uscs import USCSConstraintSystem
from ..utils.bigint import ints_to_limbs, limbs_to_int
from ..utils.profiling import block
from .ate_pairing import AtePairing
from .groth16 import _g1_proj_to_host, _g2_proj_to_host
from .pghr13 import _np_pair


@dataclass
class ProvingKey:
    """uscs_ppzksnark_proving_key (hpp:74-157)."""

    curve: str
    V_g1_query: tuple        # (48, m-l+1) incl. the Zt row
    alpha_V_g1_query: tuple
    H_g1_query: tuple        # (48, n+1)
    V_g2_query: tuple        # G2 (deg, 48, m+2)
    constraint_system: USCSConstraintSystem


@dataclass
class VerificationKey:
    """uscs_ppzksnark_verification_key (hpp:159-230)."""

    curve: str
    tilde_g2: tuple
    alpha_tilde_g2: tuple
    Z_g2: tuple
    encoded_IC_base: tuple
    encoded_IC_values: list


@dataclass
class Proof:
    """pi = (V_g1, alpha_V_g1, H_g1, V_g2) (hpp:232-303)."""

    V_g1: tuple
    alpha_V_g1: tuple
    H_g1: tuple
    V_g2: tuple


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


def generator(model, cs: USCSConstraintSystem, rng) -> Keypair:
    """uscs_ppzksnark_generator (tcc:205-340)."""
    hc = host_curve(model.name)
    F = model.Fr
    r_p = F.p

    t = rng.randrange(1, r_p)
    inst = ssp.instance_map_with_evaluation(cs, t, F)
    m, n, l = inst.num_variables, inst.domain_size, inst.num_inputs

    Vt_table = list(inst.Vt) + [inst.Zt]          # m + 2
    Xt = Vt_table[: l + 1]
    V_rest = Vt_table[l + 1 :]                    # m + 1 - l entries

    alpha = rng.randrange(1, r_p)
    tilde = rng.randrange(1, r_p)

    # fused G1 exponents: V_rest, alpha*V_rest, Ht, Xt[1:]
    groups = [
        V_rest,
        [alpha * v % r_p for v in V_rest],
        list(inst.Ht[: n + 1]),
        Xt[1:],
    ]
    all_scalars = sum(groups, [])
    w1 = fixed_base.get_exp_window_size(len(all_scalars))
    w2 = fixed_base.get_exp_window_size(m + 2)
    with block("uscs G1 window table"):
        t1 = fixed_base.get_window_table(model.G1, w1, model.g1_generator())
    with block("uscs G2 window table"):
        t2 = fixed_base.get_window_table(model.G2, w2, model.g2_generator())

    splits = np.cumsum([len(g) for g in groups[:-1]])
    with block("uscs G1 queries (fused)"):
        g1_all = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G1.to_affine(
                    fixed_base.batch_exp(model.G1, w1, tab, s)
                )
            )(t1, jnp.asarray(ints_to_limbs(all_scalars)))
        )
        parts = [np.split(np.asarray(a), splits, axis=-1) for a in g1_all]
        Vq, aVq, Hq, ICq = (tuple(p[i] for p in parts) for i in range(4))
    with block("uscs V query (G2)"):
        V2q = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G2.to_affine(
                    fixed_base.batch_exp(model.G2, w2, tab, s)
                )
            )(t2, jnp.asarray(ints_to_limbs(Vt_table)))
        )

    with block("uscs vk singles"):
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
            tilde_g2=hc.g2.mul(tilde, hc.g2_gen),
            alpha_tilde_g2=hc.g2.mul(alpha * tilde % r_p, hc.g2_gen),
            Z_g2=hc.g2.mul(inst.Zt, hc.g2_gen),
            encoded_IC_base=hc.g1.mul(Xt[0], hc.g1_gen),
            encoded_IC_values=[host_g1_col(ICq, i) for i in range(l)],
        )

    pk = ProvingKey(
        curve=model.name,
        V_g1_query=_np_pair(Vq),
        alpha_V_g1_query=_np_pair(aVq),
        H_g1_query=_np_pair(Hq),
        V_g2_query=_np_pair(V2q),
        constraint_system=cs,
    )
    return Keypair(pk, vk)


def prover(model, pk: ProvingKey, primary, auxiliary, rng,
           msm_window: int | None = None) -> Proof:
    """uscs_ppzksnark_prover (tcc:343-432)."""
    F = model.Fr
    G1, G2 = model.G1, model.G2
    cs = pk.constraint_system
    r_p = F.p

    assert cs.is_satisfied(primary, auxiliary), "unsatisfied witness"

    d = rng.randrange(r_p)
    with block("ssp witness map"):
        wit = ssp.witness_map(model, cs, primary, auxiliary, d)
    m, l = wit.num_variables, wit.num_inputs
    w = wit.full_assignment

    w_can = jnp.asarray(ints_to_limbs([v % r_p for v in w]))  # (48, m)
    nv = m - l  # number of non-input variables

    def dev_g1(pair, lo=None, hi=None):
        x, y = (jnp.asarray(a) for a in pair)
        if lo is not None:
            x, y = x[..., lo:hi], y[..., lo:hi]
        return G1.from_affine(x, y)

    def msm_g1(Vq, aVq, Hq, w_can, H_planes):
        h_can = F.to_canonical(H_planes)
        pts, scal = msm_mod.pad_and_stack(
            F,
            [dev_g1(Vq, 0, nv), dev_g1(aVq, 0, nv), dev_g1(Hq)],
            [w_can[:, l:], w_can[:, l:], h_can],
        )
        return msm_mod.msm_multi(G1, pts, scal, msm_window)

    def msm_g2(V2q, w_can):
        x, y = (jnp.asarray(a)[..., 1 : m + 1] for a in V2q)
        return msm_mod.msm(
            G2, G2.from_affine(x, y), w_can,
            msm_mod.g2_window_bits(w_can.shape[-1], msm_window),
        )

    with block("uscs G1 multiexps (jit)"):
        res3 = jax.block_until_ready(
            jax.jit(msm_g1)(
                tuple(jnp.asarray(a) for a in pk.V_g1_query),
                tuple(jnp.asarray(a) for a in pk.alpha_V_g1_query),
                tuple(jnp.asarray(a) for a in pk.H_g1_query),
                w_can, wit.H_planes,
            )
        )
    with block("uscs G2 multiexp (jit)"):
        res2 = jax.block_until_ready(
            jax.jit(msm_g2)(
                tuple(jnp.asarray(a) for a in pk.V_g2_query), w_can
            )
        )

    with block("uscs assemble proof (host)"):
        hc = host_curve(model.name)
        spec = model.Fq.spec
        V_m, aV_m, H_m = (
            _g1_proj_to_host(model, tuple(a[..., i : i + 1] for a in res3))
            for i in range(3)
        )
        V2_m = _g2_proj_to_host(model, res2)

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

        last = pk.V_g1_query[0].shape[-1] - 1  # Zt row index (== nv)
        V_g1 = hc.g1.add(hc.g1.mul(d, host_aff_g1(pk.V_g1_query, last)), V_m)
        alpha_V_g1 = hc.g1.add(
            hc.g1.mul(d, host_aff_g1(pk.alpha_V_g1_query, last)), aV_m
        )
        H_g1 = H_m
        last2 = pk.V_g2_query[0].shape[-1] - 1  # == m + 1
        V_g2 = hc.g2.add(
            hc.g2.add(
                host_aff_g2(pk.V_g2_query, 0),
                hc.g2.mul(d, host_aff_g2(pk.V_g2_query, last2)),
            ),
            V2_m,
        )
    return Proof(V_g1=V_g1, alpha_V_g1=alpha_V_g1, H_g1=H_g1, V_g2=V_g2)


def verifier_process_vk(vk: VerificationKey):
    return vk


def online_verifier_weak_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    """uscs_ppzksnark_online_verifier_weak_IC (tcc:447-530)."""
    hc = host_curve(vk.curve)
    engine = AtePairing(hc)
    gt = engine.gt
    p = hc.fr_spec.p

    acc = vk.encoded_IC_base
    for i, v in enumerate(primary):
        acc = hc.g1.add(acc, hc.g1.mul(v % p, vk.encoded_IC_values[i]))

    for P in (proof.V_g1, proof.alpha_V_g1, proof.H_g1):
        if P is not None and not hc.g1.is_on_curve(P):
            return False
    if proof.V_g2 is not None and not hc.g2.is_on_curve(proof.V_g2):
        return False

    one1, one2 = hc.g1_gen, hc.g2_gen
    V_acc = hc.g1.add(proof.V_g1, acc)

    # (1) e(V_g1 + acc, H_one) == e(G_one, V_g2)
    if engine.reduced_pairing(V_acc, one2) != engine.reduced_pairing(
        one1, proof.V_g2
    ):
        return False

    # (2) V^2 = H Z + 1: e(V+acc, V_g2) == e(H, Z_g2) e(G_one, H_one)
    lhs = engine.reduced_pairing(V_acc, proof.V_g2)
    rhs = gt.mul(
        engine.reduced_pairing(proof.H_g1, vk.Z_g2),
        engine.reduced_pairing(one1, one2),
    )
    if lhs != rhs:
        return False

    # (3) e(V_g1, alpha tilde H) == e(alpha_V_g1, tilde H)
    return engine.reduced_pairing(
        proof.V_g1, vk.alpha_tilde_g2
    ) == engine.reduced_pairing(proof.alpha_V_g1, vk.tilde_g2)


def online_verifier_strong_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    if len(vk.encoded_IC_values) != len(primary):
        return False
    return online_verifier_weak_IC(vk, primary, proof)


def verifier_weak_IC(vk, primary, proof):
    return online_verifier_weak_IC(verifier_process_vk(vk), primary, proof)


def verifier_strong_IC(vk, primary, proof):
    return online_verifier_strong_IC(verifier_process_vk(vk), primary, proof)
