"""Branch-free projective short-Weierstrass group law, generic over the
coordinate field (Fq for G1, Fq2/Fq3 for G2).

Coordinates are projective (X:Y:Z) — NOT Jacobian, since the MNT curves
have a != 0 (mnt4753_g1.cpp uses add-1998-cmo-2 / dbl-2007-bl over
plain projective coordinates).  The identity is (0:1:0) and is_zero is
X==0 && Z==0 (mnt4753_g1.cpp:96-98).

Where the reference branches on is_zero/equality (mnt4753_g1.cpp:222-240)
we evaluate the generic add *and* the doubling formula and blend the
results with masked selects — the intermediate projective representatives
differ from the CPU code's, but the represented group elements (and hence
the unique affine outputs) are identical, which is all byte-exactness
needs (libsnark/serialization.hpp:44-54 serializes affine form).

A point batch is a pytree (X, Y, Z) of field arrays; for G1 each array is
uint32[48, *batch]; for G2 over Fq2, uint32[2, 48, *batch].
"""

from __future__ import annotations

import jax.numpy as jnp


def _mulsb(F, xs, ys):
    """[x_i * y_i] via ONE batched F.mul along a fresh stacked axis.

    Bit-identical to separate multiplies (the limb REDC graph is applied
    lane-wise) but the XLA graph holds a single multiply — the group-law
    graphs shrink ~4x, which is the difference between minutes and hours
    of XLA:CPU compile on the G2 (tower) curve, and the wider lanes help
    VPU utilization at runtime."""
    k = F.elem_ndim
    shape = jnp.broadcast_shapes(*(x.shape for x in xs), *(y.shape for y in ys))
    A = jnp.stack([jnp.broadcast_to(x, shape) for x in xs], axis=k)
    B = jnp.stack([jnp.broadcast_to(y, shape) for y in ys], axis=k)
    V = F.mul(A, B)
    return [jnp.take(V, i, axis=k) for i in range(len(xs))]


class Curve:
    """One short-Weierstrass curve y^2 z = x^3 + a x z^2 + b z^3 over a
    field object F (ops.field.Fp or ops.towers.Fp2/Fp3)."""

    def __init__(self, F, coeff_a, coeff_b, name: str):
        import numpy as np

        self.F = F
        self.a = np.asarray(coeff_a)  # host constants: component/limb planes
        self.b = np.asarray(coeff_b)
        # 3b (used by the complete addition formula), computed with HOST
        # ints — an eager F.add here would place the result on the default
        # device and every later lowering would fetch it back (slow on the
        # tunneled axon TPU).  Montgomery form is linear so 3b_mont =
        # (3 * b_mont) mod p componentwise.
        from ..utils.bigint import int_to_limbs, limbs_to_int

        p = F.spec.p if hasattr(F, "spec") else F._prime_field.spec.p
        flat = self.b.reshape(-1, self.b.shape[-1])
        self.b3 = np.stack(
            [int_to_limbs(3 * limbs_to_int(row) % p) for row in flat]
        ).reshape(self.b.shape)
        self.name = name

    # ---- constructors ---------------------------------------------------
    def zero(self, batch_shape=()):
        F = self.F
        return (F.zeros(batch_shape), F.ones(batch_shape), F.zeros(batch_shape))

    def from_affine(self, x, y):
        """(x, y) field arrays -> projective with Z=1; (0, 0) -> identity
        (read_g1 semantics, libsnark/serialization.hpp:84-92: y==0 => zero)."""
        F = self.F
        batch = x.shape[F.elem_ndim :]
        zero_mask = F.is_zero(y)
        z = F.select(zero_mask, F.zeros(batch), F.ones(batch))
        yy = F.select(zero_mask, F.ones(batch), y)
        xx = F.select(zero_mask, F.zeros(batch), x)
        return (xx, yy, z)

    def is_zero(self, P):
        X, _, Z = P
        return jnp.logical_and(self.F.is_zero(X), self.F.is_zero(Z))

    def select(self, mask, P, Q):
        F = self.F
        return tuple(F.select(mask, p, q) for p, q in zip(P, Q))

    # ---- group law -------------------------------------------------------
    def _a_const(self, like):
        # broadcast the curve constant under the batch dims of `like`
        extra = like.ndim - self.a.ndim
        return self.a.reshape(self.a.shape + (1,) * extra)

    def _count(self, key: str, like):
        """Group-op counters (mnt4753_g1.cpp:19-20 add_cnt/dbl_cnt)."""
        from ..utils import op_counts

        if op_counts.active() is None:
            return
        import math

        batch = like.shape[self.F.elem_ndim :]
        op_counts.record(f"{self.name}.{key}", math.prod(batch) if batch else 1)

    def _flatten_pts(self, *pts):
        """Collapse multi-axis point batches to ONE trailing axis for the
        duration of a group-law evaluation: the limb kernels then lower
        as rank-2/3 loop nests instead of rank-6 (deep nests send
        XLA:CPU's LLVM codegen superlinear — the G2 dryrun program was
        a >30 min compile before this).  Returns (flat_pts, batch) where
        batch is () sentinel for 'already flat'."""
        k = self.F.elem_ndim
        batch = jnp.broadcast_shapes(*(t.shape[k:] for P in pts for t in P))
        if len(batch) <= 1:
            return pts, None
        flat = tuple(
            tuple(
                jnp.broadcast_to(t, t.shape[:k] + batch).reshape(
                    t.shape[:k] + (-1,)
                )
                for t in P
            )
            for P in pts
        )
        return flat, batch

    def _unflatten_pts(self, P, batch):
        if batch is None:
            return P
        k = self.F.elem_ndim
        return tuple(t.reshape(t.shape[:k] + batch) for t in P)

    def double(self, P):
        """dbl-2007-bl over projective coords (mnt4753_g1.cpp:315-347),
        with independent multiplies stacked into batched stages (_mulsb).
        Identity doubles to identity via masking.

        Inside Pallas-safe regions on TPU the whole formula runs as ONE
        fused VMEM kernel (ops.pallas_group) — bit-identical outputs."""
        F = self.F
        self._count("dbl", P[0])
        (P,), batch = self._flatten_pts(P)
        out = self._pallas_or(P, None)
        if out is None:
            out = self._double_flat(P)
        return self._unflatten_pts(out, batch)

    def _pallas_or(self, P, Q):
        """Route to the fused EC kernel when eligible; None otherwise."""
        from .pallas_group import ec_op_pallas, ec_pallas_eligible

        k = self.F.elem_ndim
        pts = (P,) if Q is None else (P, Q)
        bshape = jnp.broadcast_shapes(*(t.shape[k:] for T in pts for t in T))
        if not ec_pallas_eligible(self, bshape):
            return None
        return ec_op_pallas(self, "dbl" if Q is None else "add", *pts)

    def _double_flat(self, P):
        F = self.F
        X1, Y1, Z1 = P
        XX, ZZ, Y1Z1 = _mulsb(F, [X1, Z1, Y1], [X1, Z1, Z1])
        s = F.double(Y1Z1)
        aZZ, ss, R = _mulsb(F, [self._a_const(ZZ), s, Y1], [ZZ, s, s])
        w = F.add(aZZ, F.add(XX, F.add(XX, XX)))
        XR = F.add(X1, R)
        sss, RR, XR2 = _mulsb(F, [s, R, XR], [ss, R, XR])
        B = F.sub(F.sub(XR2, XX), RR)
        h = F.sub(F.sqr(w), F.double(B))
        X3, Y3w = _mulsb(F, [h, w], [s, F.sub(B, h)])
        Y3 = F.sub(Y3w, F.double(RR))
        Z3 = sss
        return self.select(self.is_zero(P), P, (X3, Y3, Z3))

    def add(self, P, Q):
        """Complete projective addition (Renes-Costello-Batina 2015,
        Algorithm 1 for arbitrary a): 12M + 3m_a + 2m_3b + 23 add/sub,
        no case distinctions at all — identity, doubling, and inverse
        pairs all fall out of the one formula, which is exceptional-free
        on odd-order subgroups (both MNT G1 and the r-order G2 subgroup).

        This replaces the reference's branchy add-1998-cmo-2
        (mnt4753_g1.cpp:220-264): its is_zero/equality branches would
        need masked evaluation of BOTH the generic add and the doubling
        formula (kept below as add_masked), doubling the already huge
        vectorized-bignum graph.  Group elements produced are identical
        (different projective representatives, same affine point)."""
        F = self.F
        self._count("add", P[0])
        (P, Q), batch = self._flatten_pts(P, Q)
        out = self._pallas_or(P, Q)
        if out is None:
            out = self._add_flat(P, Q)
        return self._unflatten_pts(out, batch)

    def _add_flat(self, P, Q):
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        a = self._a_const(X1)
        b3 = self._b3_const(X1)

        # stage 1: the six independent cross products
        t0, t1, t2, t3, t4, t5 = _mulsb(
            F,
            [X1, Y1, Z1, F.add(X1, Y1), F.add(X1, Z1), F.add(Y1, Z1)],
            [X2, Y2, Z2, F.add(X2, Y2), F.add(X2, Z2), F.add(Y2, Z2)],
        )
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.sub(t4, F.add(t0, t2))
        t5 = F.sub(t5, F.add(t1, t2))
        # stage 2: the four curve-constant products (need only t2, t4)
        b3t2, at4, t2a, t4b = _mulsb(F, [b3, a, a, b3], [t2, t4, t2, t4])
        Z3 = F.add(b3t2, at4)
        X3 = F.sub(t1, Z3)
        Z3 = F.add(t1, Z3)
        t1 = F.add(F.add(t0, t0), t0)          # 3*t0
        t1 = F.add(t1, t2a)
        # stage 3: X3*Z3 and a*(t0 - t2a)
        Y3, t2 = _mulsb(F, [X3, a], [Z3, F.sub(t0, t2a)])
        t4 = F.add(t4b, t2)
        # stage 4: the four combination products
        m0, m1, m2, m3, m4 = _mulsb(
            F, [t1, t3, t5, t5, t3], [t4, X3, t4, Z3, t1]
        )
        Y3 = F.add(Y3, m0)
        X3 = F.sub(m1, m2)
        Z3 = F.add(m3, m4)
        return (X3, Y3, Z3)

    def _b3_const(self, like):
        extra = like.ndim - self.b3.ndim
        return self.b3.reshape(self.b3.shape + (1,) * extra)

    def add_masked(self, P, Q):
        """The reference-shaped masked addition: generic add-1998-cmo-2
        (mnt4753_g1.cpp:220-264) blended with doubling and the
        zero/inverse degeneracies.  Kept as a cross-check oracle for
        the complete formula (tests) — ~2x the graph of add()."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Y1Z2 = F.mul(Y1, Z2)
        X1Z2 = F.mul(X1, Z2)
        Z1Z2 = F.mul(Z1, Z2)
        u = F.sub(F.mul(Y2, Z1), Y1Z2)
        v = F.sub(F.mul(X2, Z1), X1Z2)
        uu = F.sqr(u)
        vv = F.sqr(v)
        vvv = F.mul(v, vv)
        R = F.mul(vv, X1Z2)
        A = F.sub(F.sub(F.mul(uu, Z1Z2), vvv), F.double(R))
        X3 = F.mul(v, A)
        Y3 = F.sub(F.mul(u, F.sub(R, A)), F.mul(vvv, Y1Z2))
        Z3 = F.mul(vvv, Z1Z2)
        generic = (X3, Y3, Z3)

        p_zero = self.is_zero(P)
        q_zero = self.is_zero(Q)
        u_zero = F.is_zero(u)
        v_zero = F.is_zero(v)
        # same x: doubling if same y, inverse (-> identity) otherwise
        dbl_case = jnp.logical_and(v_zero, u_zero)
        inf_case = jnp.logical_and(v_zero, jnp.logical_not(u_zero))

        batch = X3.shape[self.F.elem_ndim :]
        out = self.select(inf_case, self.zero(batch), generic)
        out = self.select(dbl_case, self.double(P), out)
        out = self.select(q_zero, P, out)
        out = self.select(p_zero, Q, out)
        return out

    def add_unified_nonzero(self, P, Q):
        """Cheaper masked add for callers that guarantee neither operand is
        a doubling of the other is NOT possible — still handles identity
        operands and inverse pairs (used where keys are distinct)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Y1Z2 = F.mul(Y1, Z2)
        X1Z2 = F.mul(X1, Z2)
        Z1Z2 = F.mul(Z1, Z2)
        u = F.sub(F.mul(Y2, Z1), Y1Z2)
        v = F.sub(F.mul(X2, Z1), X1Z2)
        uu = F.sqr(u)
        vv = F.sqr(v)
        vvv = F.mul(v, vv)
        R = F.mul(vv, X1Z2)
        A = F.sub(F.sub(F.mul(uu, Z1Z2), vvv), F.double(R))
        X3 = F.mul(v, A)
        Y3 = F.sub(F.mul(u, F.sub(R, A)), F.mul(vvv, Y1Z2))
        Z3 = F.mul(vvv, Z1Z2)
        generic = (X3, Y3, Z3)
        p_zero = self.is_zero(P)
        q_zero = self.is_zero(Q)
        inf_case = jnp.logical_and(F.is_zero(v), jnp.logical_not(F.is_zero(u)))
        out = self.select(inf_case, self.zero(p_zero.shape), generic)
        out = self.select(q_zero, P, out)
        out = self.select(p_zero, Q, out)
        return out

    def neg(self, P):
        X, Y, Z = P
        return (X, self.F.neg(Y), Z)

    def eq(self, P, Q):
        """Projective equality: X1Z2==X2Z1 and Y1Z2==Y2Z1, with identity
        handled (mnt4753_g1.cpp:100-127)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        pz, qz = self.is_zero(P), self.is_zero(Q)
        same = jnp.logical_and(
            F.eq(F.mul(X1, Z2), F.mul(X2, Z1)), F.eq(F.mul(Y1, Z2), F.mul(Y2, Z1))
        )
        return jnp.where(pz, qz, jnp.where(qz, pz, same))

    # ---- conversions ------------------------------------------------------
    def to_affine(self, P):
        """Batch affine conversion via batched field inversion
        (to_affine_coordinates, mnt4753_g1.cpp:68-83; batch_to_special,
        multiexp.tcc:684).  Identity -> (0, 1, 0)."""
        F = self.F
        X, Y, Z = P
        zero_mask = self.is_zero(P)
        Zi = F.batch_inv(Z) if X.ndim > F.elem_ndim else F.inv(Z)
        x = F.mul(X, Zi)
        y = F.mul(Y, Zi)
        batch = zero_mask.shape
        x = F.select(zero_mask, F.zeros(batch), x)
        y = F.select(zero_mask, F.ones(batch), y)
        z = F.select(zero_mask, F.zeros(batch), F.ones(batch))
        return (x, y, z)

    def is_well_formed(self, P):
        """y^2 z == x^3 + a x z^2 + b z^3 for non-identity
        (mnt4753_g1.cpp:348-377)."""
        F = self.F
        X, Y, Z = P
        lhs = F.mul(F.sqr(Y), Z)
        ZZ = F.sqr(Z)
        rhs = F.add(
            F.mul(F.sqr(X), X),
            F.add(
                F.mul(self._a_const(X), F.mul(X, ZZ)),
                F.mul(self._b_const(X), F.mul(Z, ZZ)),
            ),
        )
        return jnp.where(self.is_zero(P), True, F.eq(lhs, rhs))

    def _b_const(self, like):
        extra = like.ndim - self.b.ndim
        return self.b.reshape(self.b.shape + (1,) * extra)

    # ---- scalar multiplication -------------------------------------------
    def scalar_mul_int(self, P, e: int):
        """Fixed Python-int scalar multiple (double-and-add, MSB first)."""
        import jax
        import numpy as np

        if e == 0:
            batch = self.is_zero(P).shape
            return self.zero(batch)
        bits = [(e >> i) & 1 for i in range(e.bit_length())][::-1]
        bits_arr = jnp.asarray(np.array(bits, dtype=np.bool_))
        batch = self.is_zero(P).shape

        def body(acc, bit):
            acc = self.double(acc)
            acc = self.select(bit, self.add(acc, P), acc)
            return acc, None

        from ..utils import op_counts

        with op_counts.loop_scope(len(bits)):
            out, _ = jax.lax.scan(body, self.zero(batch), bits_arr)
        return out

    def scalar_mul_limbs(self, P, scalar_canonical, num_bits: int = 768):
        """Variable scalar multiple: scalar given as canonical 16-bit limb
        planes (48, *batch).  Masked double-and-add over all limb bits —
        the r * evaluation_Bt1 term of the proof's C (libsnark/main.cpp:253)."""
        import jax

        batch = self.is_zero(P).shape

        def body(carry, i):
            acc = carry
            acc = self.double(acc)
            limb = scalar_canonical[(num_bits - 1 - i) // 16]
            bit = (limb >> ((num_bits - 1 - i) % 16).astype(limb.dtype)) & 1
            acc = self.select(bit.astype(jnp.bool_), self.add(acc, P), acc)
            return acc, None

        idx = jnp.arange(num_bits)
        from ..utils import op_counts

        with op_counts.loop_scope(num_bits):
            out, _ = jax.lax.scan(body, self.zero(batch), idx)
        return out
