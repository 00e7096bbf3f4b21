"""BG (Bowe-Gabizon 2017) SNARK: r1cs_bg_ppzksnark.

Capability parity with libsnark/zk_proof_systems/ppzksnark/
r1cs_bg_ppzksnark/r1cs_bg_ppzksnark.{hpp,tcc} — the Groth16 variant the
reference fork carries for Mina/Coda (its caml surface exposes it as the
camlsnark_*_bg_* family, caml_mnt4753.cpp:900-1077).  BG adds prover-
side delta randomization for subversion resistance:

  * keys are EXACTLY Groth16 keys — the BG generator (tcc:200-394) is
    the gg generator verbatim, so `generator` here re-exports
    groth16_full.generator and the pk/vk containers are shared.

  * `prover(pk, d, ...)` (tcc:394-514) takes an extra field element d
    supplied by the CALLER (Mina samples it per proof) and blinds with
    delta' = d*delta:
        A  = alpha + Sum a_i A_i(t) + (r*d) delta
        B  = beta  + Sum a_i B_i(t) + (s*d) delta   (G1 and G2)
        C  = d^{-1} (Ht + Lt) + s A + r B - (r*s*d) delta
        delta_prime = d * delta_g2
    i.e. the Groth16 proof one would get from a pk whose delta was
    d*delta.  z / y_s ship as identity placeholders exactly like the
    reference prover (tcc:505-510 "return dummy values for z and y_s");
    Mina fills them caller-side before component verification.

  * `verifier` (tcc:516-647): the Groth16 3-pairing QAP check with the
    proof's OWN delta_prime standing in for vk.delta in the C pairing
    — d*C pairs with delta exactly as C pairs with delta_prime — plus
    the BG consistency check
        e(y_s, delta_prime) * e(-z, delta) == 1
    (tcc:579-584), which holds trivially for the identity placeholders
    and binds z = d*y_s when the caller populates them.

    NOTE the reference's online_verifier_weak_IC as written (tcc:564-566)
    pairs g_C against vk.delta_g2, under which only d == 1 proofs close
    (its own test harness never calls the BG prover — examples/
    run_r1cs_gg_ppzksnark.tcc is a verbatim gg copy); Mina's production
    verifier pairs against delta_prime, which is what we implement.  A
    `reference_literal_qap_check` knob reproduces the fork's literal
    behavior for bug-for-bug comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..host.curves import host_curve
from .ate_pairing import AtePairing
from .groth16_full import (
    Keypair,
    Proof,
    ProvingKey,
    VerificationKey,
    generator,  # noqa: F401  (BG generator == gg generator, tcc:200-394)
    prover as _gg_prover,
)

__all__ = [
    "BGProof",
    "generator",
    "prover",
    "online_verifier_weak_IC",
    "online_verifier_strong_IC",
    "verifier_weak_IC",
    "verifier_strong_IC",
    "verify_components",
]


@dataclass
class BGProof:
    """r1cs_bg_ppzksnark_proof (hpp:120-200): Groth16 (A, B, C) plus the
    randomized delta_prime = d*delta_g2 and the Mina-side z/y_s pair."""

    g_A: tuple
    g_B: tuple
    g_C: tuple
    delta_prime: tuple  # G2, host affine ints
    z: tuple | None = None    # G1 (identity placeholder, tcc:508)
    y_s: tuple | None = None  # G1 (identity placeholder, tcc:508)


def prover(model, pk: ProvingKey, d: int, primary, auxiliary, rng,
           msm_window: int | None = None) -> BGProof:
    """r1cs_bg_ppzksnark_prover (tcc:394-514).

    Implemented as the Groth16 device prover against a delta'-shifted
    view of the SAME pk: with r' = r*d, s' = s*d drawn implicitly, the
    gg assembly over (delta_g1, delta_g2) scaled by d produces exactly
    the BG formulas — A gains (r d) delta, B gains (s d) delta, and
      C_bg = d^{-1}(Ht+Lt) + sA + rB - (r s d) delta
           = the gg C computed over delta' with scalars r, s
    so the heavy path (witness map + 4 G1 MSMs + G2 MSM) is the shared
    jitted program and only the O(1) host blinding differs."""
    hc = host_curve(model.name)
    r_p = model.Fr.p
    d = d % r_p
    if d == 0:
        raise ValueError("BG randomizer d must be nonzero")
    d_inv = pow(d, -1, r_p)

    # delta'-shifted single points (host O(1) — queries are untouched)
    pk_shift = ProvingKey(
        curve=pk.curve,
        alpha_g1=pk.alpha_g1,
        beta_g1=pk.beta_g1,
        beta_g2=pk.beta_g2,
        delta_g1=hc.g1.mul(d, pk.delta_g1),
        delta_g2=hc.g2.mul(d, pk.delta_g2),
        A_query=pk.A_query,
        B_query_g2=pk.B_query_g2,
        B_query_g1=pk.B_query_g1,
        H_query=pk.H_query,
        L_query=pk.L_query,
        constraint_system=pk.constraint_system,
    )

    gg: Proof = _gg_prover(model, pk_shift, primary, auxiliary, rng,
                           msm_window=msm_window)
    # gg C was built from (Ht+Lt)/delta; BG wants the d^{-1} scaling of
    # that term only — equivalently scale the whole H/L contribution.
    # _gg_prover computed C = (Ht+Lt) + sA + rB - rs*delta'; the BG C
    # divides the FIRST term by d.  Rather than re-run MSMs, note
    #   C_bg = C_gg - (1 - d^{-1})(Ht + Lt)
    # still needs Ht+Lt — so the clean formulation is to scale the H/L
    # query contribution inside the gg assembly.  We instead exploit
    # that the gg prover over pk_shift with H/L queries PRE-divided by d
    # yields C_bg directly; dividing the queries means scaling their
    # MSM *results*, which the gg prover does not expose.  Hence: redo
    # only the O(1) host C assembly here via the exposed extras.
    return BGProof(
        g_A=gg.g_A,
        g_B=gg.g_B,
        g_C=_rescale_C(model, pk, gg, d_inv),
        delta_prime=pk_shift.delta_g2,
        z=None,
        y_s=None,
    )


def _rescale_C(model, pk, gg_proof, d_inv):
    """The gg prover returns C with extras stashed (see groth16_full);
    fall back to recomputing from the stashed Ht+Lt if available."""
    extras = getattr(gg_proof, "_extras", None)
    if extras is None:
        raise RuntimeError(
            "gg prover did not stash Ht+Lt; BG prover requires "
            "groth16_full.prover extras"
        )
    hc = host_curve(model.name)
    r_p = model.Fr.p
    HtLt, r, s, g1_A, g1_B, delta_prime_g1 = extras
    # C = d^{-1}(Ht+Lt) + sA + rB - rs * (d*delta)
    return hc.g1.add(
        hc.g1.add(
            hc.g1.mul(d_inv, HtLt),
            hc.g1.mul(s, g1_A),
        ),
        hc.g1.add(
            hc.g1.mul(r, g1_B),
            hc.g1.neg(hc.g1.mul(r * s % r_p, delta_prime_g1)),
        ),
    )


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------

def online_verifier_weak_IC(vk: VerificationKey, primary, proof: BGProof,
                            reference_literal_qap_check: bool = False) -> bool:
    """tcc:532-590: input accumulation, well-formedness, QAP divisibility
    with delta_prime, and the z/y_s consistency pairing."""
    hc = host_curve(vk.curve)
    engine = AtePairing(hc)
    gt = engine.gt
    r_p = hc.fr_spec.p

    assert len(vk.ABC_g1) - 1 >= len(primary)
    acc = vk.ABC_g1[0]
    for i, v in enumerate(primary):
        acc = hc.g1.add(acc, hc.g1.mul(v % r_p, vk.ABC_g1[i + 1]))

    # is_well_formed (tcc:544-556)
    for P, g in (
        (proof.g_A, hc.g1),
        (proof.g_B, hc.g2),
        (proof.g_C, hc.g1),
        (proof.delta_prime, hc.g2),
    ):
        if not g.is_on_curve(P):
            return False

    c_partner = vk.delta_g2 if reference_literal_qap_check else proof.delta_prime
    lhs = engine.reduced_pairing(proof.g_A, proof.g_B)
    rhs = gt.mul(
        vk.alpha_g1_beta_g2,
        gt.mul(
            engine.reduced_pairing(acc, hc.g2_gen),
            engine.reduced_pairing(proof.g_C, c_partner),
        ),
    )
    if lhs != rhs:
        return False

    # bg_test (tcc:579-584): e(y_s, delta') e(-z, delta) == 1
    if proof.y_s is None and proof.z is None:
        return True  # identity placeholders satisfy it trivially
    one = gt.one
    t1 = (
        one
        if proof.y_s is None
        else engine.reduced_pairing(proof.y_s, proof.delta_prime)
    )
    t2 = (
        one
        if proof.z is None
        else engine.reduced_pairing(hc.g1.neg(proof.z), vk.delta_g2)
    )
    return gt.mul(t1, t2) == one


def online_verifier_strong_IC(vk, primary, proof, **kw) -> bool:
    """tcc:606-626: exact input-length match."""
    if len(vk.ABC_g1) - 1 != len(primary):
        return False
    return online_verifier_weak_IC(vk, primary, proof, **kw)


def verifier_weak_IC(vk, primary, proof, **kw):
    return online_verifier_weak_IC(vk, primary, proof, **kw)


def verifier_strong_IC(vk, primary, proof, **kw):
    return online_verifier_strong_IC(vk, primary, proof, **kw)


def verify_components(a, b, c, delta_prime, z, y_s, vk, primary) -> bool:
    """camlsnark_*_bg_proof_verify_components (caml_mnt4753.cpp:1038-1055):
    assemble a proof from caller-held components and strong-verify."""
    return verifier_strong_IC(
        vk, primary,
        BGProof(g_A=a, g_B=b, g_C=c, delta_prime=delta_prime, z=z, y_s=y_s),
    )
