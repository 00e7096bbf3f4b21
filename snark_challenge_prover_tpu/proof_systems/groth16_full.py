"""Full Groth16 (r1cs_gg_ppzksnark): generator, blinded prover, verifier.

Capability parity with libsnark/zk_proof_systems/ppzksnark/
r1cs_gg_ppzksnark/r1cs_gg_ppzksnark.{hpp,tcc}:

  * `generator` (tcc:207-380): samples t, alpha, beta, delta; evaluates
    the QAP at t (reductions.r1cs_to_qap.instance_map_with_evaluation);
    builds the A/B/H/L queries with device fixed-base window tables
    (ops.fixed_base.batch_exp — the same algorithm as multiexp.tcc:615,
    vectorized); vk carries e(alpha_g1, beta_g2), delta_g2 and the ABC
    accumulation vector.  Note this scheme variant has no gamma — ABC
    pairs with the plain G2 generator (tcc:506 vk_generator_g2_precomp).

  * `prover` (tcc:382-497): QAP witness map (device FFT dance) + 4 MSMs
    (A, B as a knowledge commitment over G2xG1, H, L — device Pippenger)
    + the r/s blinding assembly
        A = alpha + Sum a_i A_i(t) + r delta
        B = beta  + Sum a_i B_i(t) + s delta     (in G1 and G2)
        C = Ht + Lt + s A + r B - rs delta.

  * `verifier` (tcc:499-672): weak/strong-IC x online/offline variants;
    host-side ate pairings (proof_systems.ate_pairing.AtePairing — the
    reference's precompute/Miller/final-exp structure) since
    verification is O(1) per proof and off the hot path (SURVEY §2.1).
    proof_systems.pairing's Tate engine remains as an independent
    cross-check.

Proof bytes serialize exactly like the challenge wire format
(io.serialization); proving/verification keys get a framework binary
format (the reference's key format is libsnark-iostream-internal and not
part of the challenge's byte-exactness contract, README.md:46-58).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..host.curves import host_curve
from ..io import serialization as ser
from ..ops import fixed_base, msm as msm_mod
from ..reductions import r1cs_to_qap as qap
from ..relations.r1cs import R1CSConstraintSystem
from ..utils.bigint import int_to_limbs, ints_to_limbs, limbs_to_int
from ..utils.profiling import block
from .ate_pairing import AtePairing
from .pairing import PairingEngine  # Tate cross-check engine


# ---------------------------------------------------------------------------
# host <-> device element conversion helpers
# ---------------------------------------------------------------------------

def _mont_planes(spec, values) -> np.ndarray:
    return ints_to_limbs([spec.to_mont(v) for v in values])


def _g1_to_ints(model, P):
    """Affine device planes (x, y, z) batch () or (1,) -> host (x, y) or None."""
    x, y, z = (np.asarray(t).reshape(48, -1)[:, 0] for t in P)
    if not z.any():
        return None
    spec = model.Fq.spec
    return (spec.from_mont(limbs_to_int(x)), spec.from_mont(limbs_to_int(y)))


def _g2_to_ints(model, P):
    x, y, z = (np.asarray(t).reshape(t.shape[0], 48, -1)[:, :, 0] for t in P)
    if not z.any():
        return None
    spec = model.Fq.spec
    deg = x.shape[0]
    return (
        tuple(spec.from_mont(limbs_to_int(x[i])) for i in range(deg)),
        tuple(spec.from_mont(limbs_to_int(y[i])) for i in range(deg)),
    )


def _g1_from_ints(model, P, batch1=False):
    """Host affine (x,y)/None -> device projective planes (batch ())."""
    spec = model.Fq.spec
    if P is None:
        x = y = 0
        z = 0
    else:
        x, y = P
        z = 1
    shape = (48, 1) if batch1 else (48,)
    mk = lambda v: jnp.asarray(int_to_limbs(spec.to_mont(v))).reshape(shape)
    return (mk(x), mk(y), mk(z))


def _g2_from_ints(model, P, deg, batch1=False):
    spec = model.Fq.spec
    if P is None:
        xs = ys = (0,) * deg
        z = (0,) * deg
    else:
        xs, ys = P
        z = (1,) + (0,) * (deg - 1)
    shape = (deg, 48, 1) if batch1 else (deg, 48)

    def mk(comps):
        return jnp.asarray(
            np.stack([int_to_limbs(spec.to_mont(c)) for c in comps])
        ).reshape(shape)

    return (mk(xs), mk(ys), mk(z))


# ---------------------------------------------------------------------------
# key / proof containers
# ---------------------------------------------------------------------------

@dataclass
class ProvingKey:
    """r1cs_gg_ppzksnark_proving_key (hpp:70-165): single points as host
    affine ints, queries as affine limb planes ready for device MSM."""

    curve: str
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    A_query: tuple        # (x, y) planes (48, m+1)
    B_query_g2: tuple     # (x, y) planes (deg, 48, m+1)
    B_query_g1: tuple
    H_query: tuple        # (48, n-1)
    L_query: tuple        # (48, m - num_inputs)
    constraint_system: R1CSConstraintSystem


@dataclass
class VerificationKey:
    """r1cs_gg_ppzksnark_verification_key (hpp:167-260)."""

    curve: str
    alpha_g1_beta_g2: tuple  # GT element: pair of Fq^e component tuples
    delta_g2: tuple          # host affine ints
    ABC_g1: list             # [ABC_0, ABC_1, ..., ABC_num_inputs] host affine


@dataclass
class Proof:
    """pi = (g_A in G1, g_B in G2, g_C in G1), host affine ints
    (hpp:262-320)."""

    g_A: tuple
    g_B: tuple
    g_C: tuple

    def to_bytes(self, model) -> bytes:
        deg = 2 if model.name == "MNT4753" else 3
        w = ser.Writer()
        w.g1(*_g1_from_ints(model, self.g_A))
        w.g2(*_g2_from_ints(model, self.g_B, deg))
        w.g1(*_g1_from_ints(model, self.g_C))
        return w.bytes()


@dataclass
class Keypair:
    pk: ProvingKey
    vk: VerificationKey


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def generator(model, cs: R1CSConstraintSystem, rng) -> Keypair:
    """r1cs_gg_ppzksnark_generator (tcc:207-380).  Randomness from the
    caller's rng (the reference reads /dev/urandom; keeping the sampler
    outside the jitted graph preserves reproducibility, SURVEY §7)."""
    hc = host_curve(model.name)
    F = model.Fr
    r_p = F.p
    deg2 = 2 if model.name == "MNT4753" else 3

    cs.swap_AB_if_beneficial()

    t = rng.randrange(1, r_p)
    alpha = rng.randrange(1, r_p)
    beta = rng.randrange(1, r_p)
    delta = rng.randrange(1, r_p)
    delta_inv = pow(delta, -1, r_p)

    with block("qap instance map"):
        inst = qap.instance_map_with_evaluation(cs, t, F)
    n, m = inst.domain_size, inst.num_variables

    # vk ABC and pk L scalars (host ints; tcc:253-276)
    ABC = [
        (beta * inst.At[i] + alpha * inst.Bt[i] + inst.Ct[i]) % r_p
        for i in range(m + 1)
    ]
    Lt = [ABC[i] * delta_inv % r_p for i in range(inst.num_inputs + 1, m + 1)]

    # H query scalars: Z(t)/delta * t^i for i <= n-2 (tcc:281,340)
    Ht = inst.Ht[: n - 1]

    # ---- device fixed-base exponentiation ------------------------------
    g1_scalar = rng.randrange(1, r_p)  # random G1 base (tcc:290)
    with block("g1 base wnaf"):
        g1_base = fixed_base.opt_window_wnaf_exp(
            model.G1, model.g1_generator(), g1_scalar
        )
    g2_base = model.g2_generator()

    num_scalars = 2 * (m + 1) + len(Lt) + len(Ht)
    w1 = fixed_base.get_exp_window_size(num_scalars)
    w2 = fixed_base.get_exp_window_size(m + 1)
    with block("G1 window table"):
        t1 = fixed_base.get_window_table(model.G1, w1, g1_base)
    with block("G2 window table"):
        t2 = fixed_base.get_window_table(model.G2, w2, g2_base)

    # the four G1 queries (A, B1, L, and H pre-scaled by Zt/delta) share
    # one table and one program: concatenate, exponentiate, split — a
    # single compile instead of four (the H coefficient Zt*delta^{-1} is
    # folded into its scalars on host, exactly batch_exp_with_coeff's
    # semantics, multiexp.tcc:649)
    zdt_int = inst.Zt * delta_inv % r_p
    all_scalars = (
        list(inst.At)
        + list(inst.Bt)
        + list(Lt)
        + [zdt_int * h % r_p for h in Ht]
    )
    splits = np.cumsum([len(inst.At), len(inst.Bt), len(Lt)])
    with block("G1 queries (fused)"):
        g1_all = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G1.to_affine(
                    fixed_base.batch_exp(model.G1, w1, tab, s)
                )
            )(t1, jnp.asarray(ints_to_limbs(all_scalars)))
        )
        parts = [np.split(np.asarray(t), splits, axis=-1) for t in g1_all]
        A_aff = tuple(p[0] for p in parts)
        Bg1_aff = tuple(p[1] for p in parts)
        L_aff = tuple(p[2] for p in parts)
        H_aff = tuple(p[3] for p in parts)
    with block("B query G2"):
        Bg2_aff = jax.block_until_ready(
            jax.jit(
                lambda tab, s: model.G2.to_affine(
                    fixed_base.batch_exp(model.G2, w2, tab, s)
                )
            )(t2, jnp.asarray(ints_to_limbs(list(inst.Bt))))
        )

    # single elements (tcc:312-316) — tiny host muls
    with block("vk singles + pairing"):
        from .groth16 import _g1_proj_to_host

        g1b = _g1_proj_to_host(model, g1_base)
        g2b = hc.g2_gen
        alpha_g1 = hc.g1.mul(alpha, g1b)
        beta_g1 = hc.g1.mul(beta, g1b)
        beta_g2 = hc.g2.mul(beta, g2b)
        delta_g1 = hc.g1.mul(delta, g1b)
        delta_g2 = hc.g2.mul(delta, g2b)

        # vk (tcc:352-366)
        engine = AtePairing(hc)
        alpha_g1_beta_g2 = engine.reduced_pairing(alpha_g1, beta_g2)
        ABC_host = [hc.g1.mul(ABC[i], g1b) for i in range(inst.num_inputs + 1)]

    def np_pair(aff):
        # wire-format affine pairs: identity stores y = 0 so from_affine
        # (read_g1 semantics) round-trips it — to_affine yields (0, 1, 0)
        # for the identity, which (x, y)-only storage would corrupt
        x, y, z = (np.asarray(t) for t in aff)
        alive = z.reshape(-1, z.shape[-1]).any(axis=0)
        return (x, np.where(alive, y, 0).astype(y.dtype))

    pk = ProvingKey(
        curve=model.name,
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        beta_g2=beta_g2,
        delta_g1=delta_g1,
        delta_g2=delta_g2,
        A_query=np_pair(A_aff),
        B_query_g2=np_pair(Bg2_aff),
        B_query_g1=np_pair(Bg1_aff),
        H_query=np_pair(H_aff),
        L_query=np_pair(L_aff),
        constraint_system=cs,
    )
    vk = VerificationKey(
        curve=model.name,
        alpha_g1_beta_g2=alpha_g1_beta_g2,
        delta_g2=delta_g2,
        ABC_g1=ABC_host,
    )
    return Keypair(pk, vk)


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------

def prover(model, pk: ProvingKey, primary, auxiliary, rng,
           msm_window: int | None = None) -> Proof:
    """r1cs_gg_ppzksnark_prover (tcc:382-497), blinding included.

    Staged like the challenge prover (proof_systems.groth16): the heavy
    MSMs are separate jitted programs; the O(1) blinded assembly
    (alpha/beta/delta terms, r/s multiples) runs on host exact ints —
    r and s are host randomness anyway (tcc:409-410)."""
    from .groth16 import _g1_proj_to_host, _g2_proj_to_host

    F = model.Fr
    G1, G2 = model.G1, model.G2
    cs = pk.constraint_system
    r_p = F.p

    assert cs.is_satisfied(primary, auxiliary), "unsatisfied witness"

    with block("witness map"):
        full, H_planes = qap.witness_map(model, cs, primary, auxiliary)
    n = qap.qap_domain_size(cs, F)

    r = rng.randrange(r_p)
    s = rng.randrange(r_p)

    const_padded = [1] + [v % r_p for v in full]
    w_can = jnp.asarray(ints_to_limbs(const_padded))  # (48, m+1)

    def dev_g1(pair):
        return G1.from_affine(pair[0], pair[1])

    def msm_g1(A_q, B1_q, H_q, L_q, w_can, H_planes):
        h_can = F.to_canonical(H_planes[:, : n - 1])
        pts4, scal4 = msm_mod.pad_and_stack(
            F,
            [dev_g1(A_q), dev_g1(B1_q), dev_g1(H_q), dev_g1(L_q)],
            [w_can, w_can, h_can, w_can[:, cs.primary_input_size + 1 :]],
        )
        return msm_mod.msm_multi(G1, pts4, scal4, msm_window)

    def msm_g2(B2_q, w_can):
        return msm_mod.msm(
            G2, G2.from_affine(B2_q[0], B2_q[1]), w_can,
            msm_mod.g2_window_bits(w_can.shape[-1], msm_window),
        )

    with block("G1 multiexps (jit)"):
        res4 = jax.block_until_ready(
            jax.jit(msm_g1)(
                tuple(jnp.asarray(a) for a in pk.A_query),
                tuple(jnp.asarray(a) for a in pk.B_query_g1),
                tuple(jnp.asarray(a) for a in pk.H_query),
                tuple(jnp.asarray(a) for a in pk.L_query),
                w_can, H_planes,
            )
        )
    with block("G2 multiexp (jit)"):
        res2 = jax.block_until_ready(
            jax.jit(msm_g2)(
                tuple(jnp.asarray(a) for a in pk.B_query_g2), w_can
            )
        )

    with block("assemble proof (host)"):
        hc = host_curve(model.name)
        At, Bt1, Ht, Lt = (
            _g1_proj_to_host(model, tuple(t[..., i : i + 1] for t in res4))
            for i in range(4)
        )
        Bt2 = _g2_proj_to_host(model, res2)

        # A = alpha + At + r*delta ; B = beta + Bt + s*delta (G1 and G2)
        g1_A = hc.g1.add(
            hc.g1.add(pk.alpha_g1, At), hc.g1.mul(r, pk.delta_g1)
        )
        g1_B = hc.g1.add(
            hc.g1.add(pk.beta_g1, Bt1), hc.g1.mul(s, pk.delta_g1)
        )
        g2_B = hc.g2.add(
            hc.g2.add(pk.beta_g2, Bt2), hc.g2.mul(s, pk.delta_g2)
        )
        # C = Ht + Lt + s*A + r*B - rs*delta
        HtLt = hc.g1.add(Ht, Lt)
        g1_C = hc.g1.add(
            hc.g1.add(HtLt, hc.g1.mul(s, g1_A)),
            hc.g1.add(
                hc.g1.mul(r, g1_B),
                hc.g1.neg(hc.g1.mul(r * s % r_p, pk.delta_g1)),
            ),
        )
    proof = Proof(g_A=g1_A, g_B=g2_B, g_C=g1_C)
    # blinding internals for delta-randomizing wrappers (proof_systems.bg
    # re-derives C over delta' = d*delta from these O(1) host values)
    proof._extras = (HtLt, r, s, g1_A, g1_B, pk.delta_g1)
    return proof


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------

def verifier_process_vk(vk: VerificationKey):
    """Host 'processed vk' — the engine reuses precomputations implicitly
    (tcc:499-512 caches pairing precomps; our host pairing is already
    O(1) per proof)."""
    return vk


def online_verifier_weak_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    """tcc:515-566: accumulate inputs, well-formedness, the 3-pairing QAP
    divisibility check e(A,B) = e(alpha,beta) e(acc, G2one) e(C, delta)."""
    hc = host_curve(vk.curve)
    engine = AtePairing(hc)
    gt = engine.gt

    assert len(vk.ABC_g1) - 1 >= len(primary)
    acc = vk.ABC_g1[0]
    for i, v in enumerate(primary):
        acc = hc.g1.add(acc, hc.g1.mul(v % hc.fr_spec.p, vk.ABC_g1[i + 1]))

    # well-formedness (tcc:528-538)
    for P, g in ((proof.g_A, hc.g1), (proof.g_B, hc.g2), (proof.g_C, hc.g1)):
        if not g.is_on_curve(P):
            return False

    lhs = engine.reduced_pairing(proof.g_A, proof.g_B)
    rhs = gt.mul(
        vk.alpha_g1_beta_g2,
        gt.mul(
            engine.reduced_pairing(acc, hc.g2_gen),
            engine.reduced_pairing(proof.g_C, vk.delta_g2),
        ),
    )
    return lhs == rhs


def online_verifier_strong_IC(vk: VerificationKey, primary, proof: Proof) -> bool:
    """tcc:583-607: require the input length to match exactly."""
    if len(vk.ABC_g1) - 1 != len(primary):
        return False
    return online_verifier_weak_IC(vk, primary, proof)


def verifier_weak_IC(vk, primary, proof):
    return online_verifier_weak_IC(verifier_process_vk(vk), primary, proof)


def verifier_strong_IC(vk, primary, proof):
    return online_verifier_strong_IC(verifier_process_vk(vk), primary, proof)


# affine variants (tcc:609-672) differ only in pairing internals; the
# host engine has a single code path, so these are aliases kept for API
# parity with the reference.
affine_verifier_weak_IC = verifier_weak_IC
affine_verifier_strong_IC = verifier_strong_IC
