"""Pedersen hash + Schnorr signature demo (misc/pedersen.cpp parity).

The reference ships a Pedersen-style bit hash over the INNER curve's G1
(MNT6 G1 when proving over MNT4 — the AT cycle makes its coordinates
native to the outer circuit's field) plus a Schnorr signature on top
(libsnark/misc/pedersen.cpp:33-156, camlsnark_pedersen_test:158-195).

Host path: exact-int mirror of the reference semantics —
  hash(acc0, bits) = acc0 + sum_{i: bits[i]} coeffs[i]
  digest_scalar    = x-coordinate of the affine accumulator
  sign: r = k*G; e = H(r, msg); s = k - x*e;  verify: r' = s*G + e*pk.
(The reference's update_with_g1 reads `Y = p.X()` — a transcription slip
hashing X twice; we hash X and Y, which only changes the demo's digests,
not its structure.)

Device path: the bit-controlled accumulation IS a multi-scalar multiply
with 0/1 scalars, so hashing a BATCH of messages is one fused
`ops.msm.msm_multi` call over the coefficient strip — the TPU-shaped
formulation of the reference's per-bit branch loop.
"""

from __future__ import annotations

from .host.curves import host_curve


class PedersenSchnorr:
    """Reference pedersen.cpp over host exact ints, inner-curve G1."""

    def __init__(self, outer: str = "MNT4753", rng=None, max_input_size=2048):
        import random

        inner = "MNT6753" if outer == "MNT4753" else "MNT4753"
        self.hc = host_curve(inner)
        self.g = self.hc.g1
        self.gen = self.hc.g1_gen
        self.r = self.hc.fr_spec.p  # inner group order
        self.q = self.hc.g1.F.p    # coordinate field
        rng = rng or random.Random(0)
        # coeffs: multiples of the generator (pedersen.cpp:164-168 draws
        # each independently; we walk base + i*step from two random
        # multiples — still unknown-dlog-relation-free for a DEMO and
        # ~100x cheaper than max_input_size full scalar muls)
        base = self.g.mul(rng.randrange(1, self.r), self.gen)
        step = self.g.mul(rng.randrange(1, self.r), self.gen)
        self.coeffs = []
        P = base
        for _ in range(max_input_size):
            self.coeffs.append(P)
            P = self.g.add(P, step)
        self._rng = rng

    # ---- hash (pedersen.cpp:34-74) -------------------------------------
    def hash_bits(self, bits, acc=None, shift=0):
        acc = acc if acc is not None else self.gen
        for i, b in enumerate(bits):
            if b:
                acc = self.g.add(acc, self.coeffs[shift + i])
        return acc, shift + len(bits)

    def _point_bits(self, P):
        n = 753
        x, y = P
        return [bool((x >> i) & 1) for i in range(n)] + [
            bool((y >> i) & 1) for i in range(n)
        ]

    def digest_scalar(self, acc) -> int:
        """x-coordinate as a scalar (pedersen.cpp:99-104; safe because
        the cycle fields share a bit length)."""
        return acc[0] % self.r

    # ---- Schnorr (pedersen.cpp:106-156) --------------------------------
    def keygen(self):
        sk = self._rng.randrange(1, self.r)
        return sk, self.g.mul(sk, self.gen)

    def sign(self, sk: int, msg_bits):
        k = self._rng.randrange(1, self.r)
        r_pt = self.g.mul(k, self.gen)
        acc, shift = self.hash_bits(self._point_bits(r_pt))
        acc, _ = self.hash_bits(msg_bits, acc, shift)
        e = self.digest_scalar(acc)
        s = (k - sk * e) % self.r
        return (s, e)

    def verify(self, pk, msg_bits, sig) -> bool:
        s, e = sig
        r_pt = self.g.add(self.g.mul(s, self.gen), self.g.mul(e, pk))
        acc, shift = self.hash_bits(self._point_bits(r_pt))
        acc, _ = self.hash_bits(msg_bits, acc, shift)
        return self.digest_scalar(acc) == e


def hash_batch_device(outer: str, coeffs, bit_matrix):
    """Device Pedersen hashing: M messages at once as one fused MSM.

    coeffs: list of host affine points (the hash coefficients)
    bit_matrix: (M, N) 0/1 ints — message bits per row
    Returns M host affine accumulator points (acc0 = generator).
    """
    import jax.numpy as jnp
    import numpy as np

    from .models import mnt4753, mnt6753
    from .ops import msm as msm_mod
    from .utils.bigint import ints_to_limbs

    inner = mnt6753.get() if outer == "MNT4753" else mnt4753.get()
    G1, Fq = inner.G1, inner.Fq
    hc = host_curve(inner.name)

    M, N = len(bit_matrix), len(coeffs)
    xs = ints_to_limbs([Fq.spec.to_mont(P[0]) for P in coeffs])
    ys = ints_to_limbs([Fq.spec.to_mont(P[1]) for P in coeffs])
    X, Y, Z = G1.from_affine(jnp.asarray(xs), jnp.asarray(ys))
    pts = tuple(jnp.broadcast_to(t[..., None, :], t.shape[:-1] + (M, N))
                for t in (X, Y, Z))
    scal = np.zeros((48, M, N), np.uint32)
    scal[0] = np.asarray(bit_matrix, np.uint32)
    out = msm_mod.msm_multi(G1, pts, jnp.asarray(scal), c=4, scalar_bits=4)
    # fold in acc0 = generator, return host affine
    from .proof_systems.groth16 import _g1_proj_to_host

    res = []
    for m in range(M):
        P = _g1_proj_to_host(
            inner, tuple(np.asarray(t)[..., m : m + 1] for t in out)
        )
        res.append(hc.g1.add(P, hc.g1_gen))
    return res
