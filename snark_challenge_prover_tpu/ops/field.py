"""Montgomery prime-field arithmetic over 16-bit limb planes.

Elements live in Montgomery form x·R mod p with R = 2^768, the same R as
the reference's 12x64-limb representation (libff fp.tcc:159-188), so the
challenge's raw Montgomery wire format (libsnark/serialization.hpp:22-32)
maps 1:1 onto our limbs with no conversion.

Reduction is textbook Montgomery REDC built from three limb convolutions
(t = a·b; m = t·n' mod R; u = (t + m·p)/R) — the vector-lane analogue of
cuda-fixnum's CIOS splice (modnum_monty_cios.cu:85-127), restructured so
each step is a full-width VPU op instead of a per-thread carry chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.primes import PrimeSpec, N_LIMBS
from ..utils.bigint import int_to_limbs
from . import limbs as lb


# ---------------------------------------------------------------------------
# Pallas dispatch scope.  The fused Montgomery-mul kernel is proven safe
# (and 5.9x faster) inside the SMALL staged MSM programs but faulted the
# TPU runtime when fused into the monolithic composite prover graphs
# (BENCH_r01; PLAN.md).  Stage builders enter this scope at trace time so
# field muls traced under them auto-route to the kernel; everything else
# stays on the XLA path unless SNARK_TPU_PALLAS=1 forces it globally.
# ---------------------------------------------------------------------------
_PALLAS_SCOPE_DEPTH = 0


class pallas_scope:
    """Context manager marking a trace region as Pallas-kernel-safe."""

    def __enter__(self):
        global _PALLAS_SCOPE_DEPTH
        _PALLAS_SCOPE_DEPTH += 1

    def __exit__(self, *exc):
        global _PALLAS_SCOPE_DEPTH
        _PALLAS_SCOPE_DEPTH -= 1
        return False


def pallas_scope_active() -> bool:
    return _PALLAS_SCOPE_DEPTH > 0


class Fp:
    """A prime field bound to one modulus; methods are jit-safe pure fns
    over uint32 arrays of shape (48, *batch) in Montgomery form."""

    elem_ndim = 1  # (48,) limb planes per element

    def __init__(self, spec: PrimeSpec, name: str = "Fp"):
        self.spec = spec
        self.name = name
        self.p = spec.p
        self.L = N_LIMBS
        # Constants stay HOST numpy: jnp.asarray would commit them to the
        # default device eagerly, and on the tunneled axon TPU every MLIR
        # constant lowering then fetches them back at ~0.4 s (first touch
        # ~100 s) — a large hidden share of round-1's compile times.
        # numpy lowers to inline constants with zero device traffic.
        self.p_limbs = int_to_limbs(spec.p)
        self.nprime_limbs = int_to_limbs(spec.n_prime)
        self._mxu_mats = None  # lazily-built Toeplitz REDC matrices
        self.mont_one = int_to_limbs(spec.R % spec.p)
        self.zero_limbs = np.zeros(self.L, np.uint32)
        # multiplicative generator, in Montgomery form
        g = spec.multiplicative_generator
        self.mont_generator = int_to_limbs(spec.to_mont(g))

    # ---- constructors -------------------------------------------------
    def const(self, value: int):
        """Montgomery-form constant (shape (48,), host numpy) from an
        integer value."""
        return int_to_limbs(self.spec.to_mont(value))

    def const_raw(self, mont_value: int):
        """Constant already in Montgomery form."""
        return int_to_limbs(mont_value)

    def zeros(self, batch_shape):
        return jnp.zeros((self.L,) + tuple(batch_shape), jnp.uint32)

    def ones(self, batch_shape):
        return jnp.broadcast_to(
            lb.bcast_const(self.mont_one, self.zeros(batch_shape)),
            (self.L,) + tuple(batch_shape),
        )

    # ---- op counting (PROFILE_OP_COUNTS parity, fp.hpp:46-52) ----------
    def _count(self, key: str, *arrs):
        from ..utils import op_counts

        if op_counts.active() is None:
            return
        import math

        batch = jnp.broadcast_shapes(*(a.shape[1:] for a in arrs))
        op_counts.record(f"{self.name}.{key}", math.prod(batch) if batch else 1)

    # ---- ring ops ------------------------------------------------------
    def add(self, a, b):
        self._count("add", a, b)
        s = lb.normalize(a + b)  # < 2p < 2^754 fits in 48 limbs
        return lb.cond_sub(s, self.p_limbs)

    def sub(self, a, b):
        # a - b mod p == (a + p) - b, both canonical
        self._count("sub", a, b)
        s = lb.normalize(a + lb.bcast_const(self.p_limbs, a))
        d, _ = lb.sub_borrow(s, jnp.broadcast_to(b, s.shape))
        return lb.cond_sub(d, self.p_limbs)

    def neg(self, a):
        d, _ = lb.sub_borrow(
            jnp.broadcast_to(lb.bcast_const(self.p_limbs, a), a.shape), a
        )
        return lb.select(lb.is_zero(a), a, d)

    def _redc(self, t):
        """t (96 redundant limbs, value < R*p) -> t*R^{-1} mod p canonical."""
        t = lb.normalize(t)
        m = lb.mul_low(t[: self.L], lb.bcast_const(self.nprime_limbs, t), self.L)
        m = lb.normalize(m)
        u = t + lb.mul_wide(m, lb.bcast_const(self.p_limbs, m))
        u = lb.normalize(u)  # low 48 limbs are now zero
        return lb.cond_sub(u[self.L :], self.p_limbs)

    # ---- MXU Toeplitz REDC ---------------------------------------------
    # The two constant-operand convolutions of REDC (m = t*n' mod R and
    # m*p) are matmuls against banded constant matrices.  On 8-bit limb
    # planes every product (<= 255*255) is exact in bfloat16 inputs and
    # every <=96-term accumulation (< 2^23) is exact in float32 — so both
    # convolutions run on the MXU systolic array bit-exactly, leaving only
    # the variable a*b convolution on the VPU.  This is the TPU answer to
    # cuda-fixnum's digit-serial CIOS splice (modnum_monty_cios.cu:85-127):
    # the constant half of the reduction becomes dense matrix math at MXU
    # rates instead of a carry chain.  Enable with SNARK_TPU_MXU=1.
    def _mxu_matrices(self):
        if self._mxu_mats is None:
            L8 = 2 * self.L  # 96 byte limbs
            npb = np.zeros(L8, np.float32)
            pb = np.zeros(L8, np.float32)
            npv, pv = self.spec.n_prime, self.spec.p
            for i in range(L8):
                npb[i] = (npv >> (8 * i)) & 0xFF
                pb[i] = (pv >> (8 * i)) & 0xFF
            # m[k] = sum_{i+j=k, k<96} t_lo[i] * n'[j]   (low-half Toeplitz)
            k = np.arange(L8)[:, None]
            i = np.arange(L8)[None, :]
            d = k - i
            np_mat = np.where((d >= 0) & (d < L8), npb[np.clip(d, 0, L8 - 1)], 0.0)
            # (m*p)[k] = sum_{j} m[j] * p[k-j],  k in [0, 192)
            k2 = np.arange(2 * L8)[:, None]
            d2 = k2 - i
            p_mat = np.where((d2 >= 0) & (d2 < L8), pb[np.clip(d2, 0, L8 - 1)], 0.0)
            self._mxu_mats = (np_mat, p_mat)
        return self._mxu_mats

    @staticmethod
    def _to_bytes(x16):
        """Canonical 16-bit limbs (L, *batch) -> byte limbs (2L, *batch)."""
        lo = x16 & jnp.uint32(0xFF)
        hi = x16 >> 8
        return jnp.stack([lo, hi], axis=1).reshape((2 * x16.shape[0],) + x16.shape[1:])

    @staticmethod
    def _mxu_matmul(mat, xb):
        """Exact banded matmul: f32 constant matrix x byte-limb planes.
        Inputs cast to bf16 (exact for ints <= 255), f32 accumulation
        (exact: sums < 96*255^2 < 2^23) -> MXU on TPU, plain f32 elsewhere."""
        batch = xb.shape[1:]
        x2 = xb.reshape(xb.shape[0], -1).astype(jnp.bfloat16)
        m = jnp.asarray(mat, jnp.bfloat16)
        out = jax.lax.dot_general(
            m, x2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return out.astype(jnp.uint32).reshape((mat.shape[0],) + batch)

    def _redc_mxu(self, t):
        """t (96 redundant 16-bit limbs, value < R*p) -> t*R^{-1} mod p.
        Bit-identical to _redc; the constant convolutions ride the MXU."""
        np_mat, p_mat = self._mxu_matrices()
        t = lb.normalize(t)                    # canonical 16-bit, 96 rows
        tb = self._to_bytes(t)                 # canonical bytes, 192 rows
        m_red = self._mxu_matmul(np_mat, tb[: 2 * self.L])   # (96,*b) < 2^23
        # redundant bytes -> canonical 16-bit limbs of m  (pairs: < 2^32)
        m16 = m_red[0::2] + (m_red[1::2] << 8)
        m16 = lb.normalize(m16)
        mb = self._to_bytes(m16)               # canonical bytes of m
        mp = self._mxu_matmul(p_mat, mb)       # (192,*b) < 2^23
        u = tb + mp
        u16 = u[0::2] + (u[1::2] << 8)         # < 2^32, 96 rows
        u16 = lb.normalize(u16)                # low 48 limbs now zero
        return lb.cond_sub(u16[self.L :], self.p_limbs)

    @staticmethod
    def _mxu_enabled() -> bool:
        import os

        return os.environ.get("SNARK_TPU_MXU", "0") == "1"

    # Batches at least this large route to the fused Pallas TPU kernel
    # (ops.pallas_field): one VMEM-resident program instead of the XLA
    # fori/dynamic-update-slice convolutions (33x standalone at 2^20).
    # Default policy: ON inside the staged MSM programs (pallas_scope —
    # probes at the round-3 faulting shape show the kernel is SAFE there
    # and 5.9x faster, tools/tpu_staged_probe), OFF inside monolithic
    # composite graphs, where auto-dispatch faulted the TPU at d+1=2^12
    # (BENCH_r01).  SNARK_TPU_PALLAS=1/0 forces either way.
    PALLAS_MIN_BATCH = 4096

    def _pallas_eligible(self, batch_shape) -> int:
        import math
        import os

        env = os.environ.get("SNARK_TPU_PALLAS")
        if env == "0":
            return 0
        if env != "1" and not pallas_scope_active():
            return 0
        total = math.prod(batch_shape) if batch_shape else 1
        if total < self.PALLAS_MIN_BATCH:
            return 0
        try:
            import jax

            # jax.default_backend() is process-global; a CPU-mesh run on a
            # TPU-default host must not route into the TPU-only pallas_call.
            if jax.default_backend() != "tpu":
                return 0
            if jax.devices()[0].platform != "tpu":
                return 0
        except Exception:
            return 0
        return total

    def _mul_dispatch(self, a, b):
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        total = self._pallas_eligible(batch)
        if total:
            from .pallas_field import mont_mul_pallas

            A = jnp.broadcast_to(a, (self.L,) + batch).reshape(self.L, total)
            B = jnp.broadcast_to(b, (self.L,) + batch).reshape(self.L, total)
            # pad the lane axis to the tile size (e.g. the 2^c - 1 bucket
            # triangles are odd-width); <=0.5% waste at these batches
            tile = 256 if total % 256 == 0 else 128
            padded = ((total + tile - 1) // tile) * tile
            if padded != total:
                A = jnp.pad(A, [(0, 0), (0, padded - total)])
                B = jnp.pad(B, [(0, 0), (0, padded - total)])
            out = mont_mul_pallas(self.spec, A, B, tile)[:, :total]
            return out.reshape((self.L,) + batch)
        if len(batch) > 1:
            # Flatten the batch to ONE axis so every REDC step (the
            # mul_wide fori bodies, carry scans, cond_sub) lowers as a
            # rank-2 loop nest.  The stacked-mul tower/group formulas
            # otherwise feed rank-6 tensors into the limb kernels, whose
            # deep loop nests send XLA:CPU's LLVM codegen superlinear
            # (the G2 dryrun program compiled for >30 min on the 1-core
            # driver host; rank-2 G1 equivalents take ~1 min).  mul_wide
            # broadcasts both operands internally anyway, so the
            # broadcast_to adds no work — values are bit-identical.
            A = jnp.broadcast_to(a, (self.L,) + batch).reshape(self.L, -1)
            B = jnp.broadcast_to(b, (self.L,) + batch).reshape(self.L, -1)
            out = (
                self._redc_mxu(lb.mul_wide(A, B))
                if self._mxu_enabled()
                else self._redc(lb.mul_wide(A, B))
            )
            return out.reshape((self.L,) + batch)
        if self._mxu_enabled():
            return self._redc_mxu(lb.mul_wide(a, b))
        return self._redc(lb.mul_wide(a, b))

    def mul(self, a, b):
        self._count("mul", a, b)
        return self._mul_dispatch(a, b)

    def sqr(self, a):
        self._count("sqr", a)
        return self._mul_dispatch(a, a)

    def mul_const(self, a, c):
        """a * const where c is a (48,) Montgomery-form constant."""
        self._count("mul", a)
        return self._mul_dispatch(a, lb.bcast_const(c, a))

    def mul_small(self, a, k: int):
        """a * k for a small integer k (NOT Montgomery: plain scaling).
        Used for extension-field non-residues (fp2.tcc:81-135)."""
        t = lb.normalize(lb.mul_small(a, k))
        # t < k*p; binary conditional-subtract chain of k_bits rounds
        kk = 1
        while kk * 2 < k:
            kk *= 2
        while kk >= 1:
            t = lb.cond_sub(t, int_to_limbs(kk * self.p))
            kk //= 2
        return t

    def double(self, a):
        return self.add(a, a)

    # ---- predicates ----------------------------------------------------
    def is_zero(self, a):
        return lb.is_zero(a)

    def eq(self, a, b):
        return lb.eq(a, b)

    def select(self, mask, a, b):
        return lb.select(mask, a, b)

    # ---- exponentiation / inversion -------------------------------------
    def pow_int(self, a, e: int):
        """a^e for a fixed Python-int exponent (lax.scan over bits)."""
        from ..utils import op_counts

        bits = [(e >> i) & 1 for i in range(e.bit_length())][::-1]  # MSB first
        bits_arr = jnp.asarray(np.array(bits, dtype=np.bool_))

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = self.select(bit, self.mul(acc, a), acc)
            return acc, None

        init = self.ones(a.shape[1:])
        with op_counts.loop_scope(len(bits)):
            out, _ = jax.lax.scan(body, init, bits_arr)
        return out

    def inv(self, a):
        """Batch inversion via Fermat: a^(p-2).  0 maps to 0."""
        self._count("inv", a)
        return self.pow_int(a, self.p - 2)

    def batch_inv(self, a):
        """Montgomery's trick along the last axis — O(3N) muls + one inv,
        log-depth via prefix products (associative_scan).  Zero entries
        map to zero (matching batch_to_special's semantics for Z=0,
        multiexp.tcc:684)."""
        zero_mask = self.is_zero(a)
        safe = self.select(zero_mask, self.ones(a.shape[1:]), a)
        # inclusive prefix products along the batch (last) axis
        pref = jax.lax.associative_scan(self.mul, safe, axis=safe.ndim - 1)
        total_inv = self.inv(pref[..., -1:])
        # suffix walk: inv(a_i) = pref_{i-1} * suffprod_inv_i, where
        # suffprod_inv_i = total_inv * prod_{j>i} a_j ... compute via
        # reversed inclusive scan of inverses: simpler exact route below.
        rev = jnp.flip(safe, axis=-1)
        suff = jnp.flip(jax.lax.associative_scan(self.mul, rev, axis=rev.ndim - 1), axis=-1)
        # inv(a_i) = pref_{i-1} * (suff_{i+1}) * total_inv
        ones = self.ones(a.shape[1:-1] + (1,))
        pref_shift = jnp.concatenate([ones, pref[..., :-1]], axis=-1)
        suff_shift = jnp.concatenate([suff[..., 1:], ones], axis=-1)
        out = self.mul(self.mul(pref_shift, suff_shift), total_inv)
        return self.select(zero_mask, self.zeros(a.shape[1:]), out)

    # ---- Montgomery conversions (device) --------------------------------
    def to_canonical(self, a):
        """Montgomery form -> canonical integer limbs (value mod p)."""
        batch = a.shape[1:]
        if len(batch) > 1:  # rank-2 lowering (see _mul_dispatch)
            a = a.reshape(self.L, -1)
        one = jnp.zeros_like(a).at[0].set(1)
        out = self._redc(lb.mul_wide(a, one))
        return out.reshape((self.L,) + batch)

    def from_canonical(self, a):
        """Canonical integer limbs -> Montgomery form (mul by R^2)."""
        return self.mul_const(a, int_to_limbs(self.spec.R2))

    # ---- host conversions ------------------------------------------------
    def host_to_mont_limbs(self, values) -> np.ndarray:
        from ..utils.bigint import ints_to_limbs

        return ints_to_limbs([self.spec.to_mont(v) for v in values])
