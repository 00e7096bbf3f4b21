"""libsnark iostream-format (de)serialization for keypairs and proofs —
the byte layout behind the caml string entry points
(caml_mnt4753.cpp:644-660 proving_key_to_string/of_string,
verification_key_to_string/of_string, proof_to_string/of_string).

The reference build defines BINARY_OUTPUT + MONTGOMERY_OUTPUT and
disables point compression (build.sh: -DUSE_PT_COMPRESSION=OFF), so
libsnark's operator<< chain produces:

  * bigint / Fp: 12x8 raw little-endian Montgomery bytes
    (libff bigint.tcc operator<< BINARY_OUTPUT branch; fp.tcc:779-790
    MONTGOMERY_OUTPUT keeps mont_repr);
  * Fp2/Fp3/Fp4/Fp6: component concatenation (OUTPUT_SEPARATOR is
    empty under BINARY_OUTPUT, libff serialization.hpp:64-65);
  * G1/G2: is_zero as ASCII '0'/'1' + affine X + Y
    (mnt4753_g1.cpp:389-403 NO_PT_COMPRESSION branch);
  * vector<T>: ASCII decimal size + "\n" + elements
    (mnt4753_g1.cpp:452-461);
  * sparse_vector<T>: domain_size "\n" #indices "\n" indices... then a
    value vector (libsnark sparse_vector.tcc:272-288);
  * accumulation_vector<T>: first + rest-sparse-vector
    (accumulation_vector.tcc:63-69);
  * knowledge_commitment<T1,T2>: g + h (knowledge_commitment.tcc:121);
  * r1cs_constraint_system: sizes "\n" + per-constraint a,b,c linear
    combinations (#terms "\n" + (index "\n" + coeff)...) + is_square
    char (r1cs.tcc:67-76, 254-264; variable.tcc:411-421 — this fork
    carries the swap_AB is_square flag);
  * proving key: alpha_g1 beta_g1 beta_g2 delta_g1 delta_g2 A_query
    B_query(kc sparse) H_query L_query constraint_system
    (r1cs_gg_ppzksnark.tcc:52-97);
  * verification key: alpha_g1_beta_g2 delta_g2 ABC_g1(accumulation)
    (tcc:99-119); proof: g_A g_B g_C (tcc:165-185).

Our B_query is dense ((deg,48,N) planes), so it serializes as a sparse
vector with the identity entries dropped — exactly what libsnark's
generator emits (kc_batch_exp skips zero coefficients).
"""

from __future__ import annotations

import io as _io

import numpy as np

from ..relations.r1cs import (
    LinearCombination,
    R1CSConstraint,
    R1CSConstraintSystem,
)

FQ_BYTES = 96


class Writer:
    def __init__(self):
        self.buf = _io.BytesIO()

    def size(self, n: int):
        self.buf.write(str(int(n)).encode() + b"\n")

    def fq_mont(self, spec, v_canonical: int):
        self.buf.write(spec.to_mont(v_canonical).to_bytes(FQ_BYTES, "little"))

    def fq_raw_mont(self, mont_int: int):
        self.buf.write(int(mont_int).to_bytes(FQ_BYTES, "little"))

    def ext(self, spec, comps):
        for c in comps:
            self.fq_mont(spec, c)

    def g1(self, spec, P):
        x, y = P if P is not None else (0, 1)
        zero = P is None or (x == 0 and y == 0)
        if zero:
            x, y = 0, 1
        self.buf.write(b"1" if zero else b"0")
        self.fq_mont(spec, x)
        self.fq_mont(spec, y)

    def g2(self, spec, P, deg: int):
        if P is None:
            comps_x, comps_y = (0,) * deg, (1,) + (0,) * (deg - 1)
            zero = True
        else:
            comps_x = list(P[0]) if deg > 1 else [P[0]]
            comps_y = list(P[1]) if deg > 1 else [P[1]]
            zero = all(c == 0 for c in comps_x) and all(
                c == 0 for c in comps_y
            )
        self.buf.write(b"1" if zero else b"0")
        self.ext(spec, comps_x)
        self.ext(spec, comps_y)

    def bytes(self) -> bytes:
        return self.buf.getvalue()


class Reader:
    def __init__(self, data: bytes):
        self.buf = _io.BytesIO(data)

    def size(self) -> int:
        out = b""
        while True:
            c = self.buf.read(1)
            if c in (b"\n", b""):
                break
            out += c
        return int(out)

    def fq_canonical(self, spec) -> int:
        raw = int.from_bytes(self.buf.read(FQ_BYTES), "little")
        return spec.from_mont(raw)

    def ext(self, spec, deg: int):
        return tuple(self.fq_canonical(spec) for _ in range(deg))

    def g1(self, spec):
        zero = self.buf.read(1) == b"1"
        x = self.fq_canonical(spec)
        y = self.fq_canonical(spec)
        return None if zero else (x, y)

    def g2(self, spec, deg: int):
        zero = self.buf.read(1) == b"1"
        x = self.ext(spec, deg)
        y = self.ext(spec, deg)
        if deg == 1:
            x, y = x[0], y[0]
        return None if zero else (x, y)


# ---------------------------------------------------------------------------
# linear combinations / constraint systems (variable.tcc, r1cs.tcc)
# ---------------------------------------------------------------------------


def _write_lc(w: Writer, spec, lc: LinearCombination):
    terms = list(lc.terms)
    w.size(len(terms))
    for idx, coeff in terms:
        w.size(idx)
        w.fq_mont(spec, coeff % spec.p)


def _read_lc(r: Reader, spec) -> LinearCombination:
    n = r.size()
    lc = LinearCombination()
    for _ in range(n):
        idx = r.size()
        coeff = r.fq_canonical(spec)
        lc = lc + LinearCombination.of_var(idx, coeff)
    return lc


def write_constraint_system(w: Writer, spec, cs: R1CSConstraintSystem):
    w.size(cs.primary_input_size)
    w.size(cs.auxiliary_input_size)
    w.size(len(cs.constraints))
    for c in cs.constraints:
        _write_lc(w, spec, c.a)
        _write_lc(w, spec, c.b)
        _write_lc(w, spec, c.c)
        w.buf.write(b"1" if getattr(c, "is_square", False) else b"0")


def read_constraint_system(r: Reader, spec) -> R1CSConstraintSystem:
    primary = r.size()
    aux = r.size()
    n = r.size()
    cs = R1CSConstraintSystem(spec.p, primary_input_size=primary,
                              auxiliary_input_size=aux)
    for _ in range(n):
        a = _read_lc(r, spec)
        b = _read_lc(r, spec)
        c = _read_lc(r, spec)
        sq = r.buf.read(1) == b"1"
        cs.add_constraint(R1CSConstraint(a, b, c, is_square=sq))
    return cs


# ---------------------------------------------------------------------------
# pk / vk / proof (r1cs_gg_ppzksnark.tcc:52-185)
# ---------------------------------------------------------------------------


def _planes_to_points(planes, spec, deg=1):
    """(deg?,48,N) affine limb planes -> list of host points (or None)."""
    from ..utils.bigint import limbs_to_int

    x, y = planes
    x = np.asarray(x)
    y = np.asarray(y)
    n = x.shape[-1]
    out = []
    for i in range(n):
        if deg == 1:
            xi = spec.from_mont(limbs_to_int(x[:, i]))
            yi = spec.from_mont(limbs_to_int(y[:, i]))
            out.append(None if (xi == 0 and yi == 0) else (xi, yi))
        else:
            xs = tuple(spec.from_mont(limbs_to_int(x[j, :, i]))
                       for j in range(deg))
            ys = tuple(spec.from_mont(limbs_to_int(y[j, :, i]))
                       for j in range(deg))
            zero = all(v == 0 for v in xs) and all(v == 0 for v in ys)
            out.append(None if zero else (xs, ys))
    return out


def _points_to_planes(points, spec, deg=1):
    from ..utils.bigint import int_to_limbs

    n = len(points)
    if deg == 1:
        x = np.zeros((48, n), np.uint32)
        y = np.zeros((48, n), np.uint32)
        for i, P in enumerate(points):
            if P is None:
                continue
            x[:, i] = int_to_limbs(spec.to_mont(P[0]))
            y[:, i] = int_to_limbs(spec.to_mont(P[1]))
        return x, y
    x = np.zeros((deg, 48, n), np.uint32)
    y = np.zeros((deg, 48, n), np.uint32)
    for i, P in enumerate(points):
        if P is None:
            continue
        for j in range(deg):
            x[j, :, i] = int_to_limbs(spec.to_mont(P[0][j]))
            y[j, :, i] = int_to_limbs(spec.to_mont(P[1][j]))
    return x, y


def _model_for(curve: str):
    from ..models import mnt4753, mnt6753

    return mnt4753.get() if curve == "MNT4753" else mnt6753.get()


def proving_key_to_bytes(pk) -> bytes:
    model = _model_for(pk.curve)
    spec = model.Fq.spec
    deg = 2 if pk.curve == "MNT4753" else 3
    w = Writer()
    w.g1(spec, pk.alpha_g1)
    w.g1(spec, pk.beta_g1)
    w.g2(spec, pk.beta_g2, deg)
    w.g1(spec, pk.delta_g1)
    w.g2(spec, pk.delta_g2, deg)
    # A_query: dense vector<G1>
    A = _planes_to_points(pk.A_query, spec)
    w.size(len(A))
    for P in A:
        w.g1(spec, P)
    # B_query: sparse_vector of knowledge_commitment<G2, G1>
    Bg2 = _planes_to_points(pk.B_query_g2, spec, deg)
    Bg1 = _planes_to_points(pk.B_query_g1, spec)
    present = [i for i in range(len(Bg2))
               if Bg2[i] is not None or Bg1[i] is not None]
    w.size(len(Bg2))       # domain_size
    w.size(len(present))   # indices
    for i in present:
        w.size(i)
    w.size(len(present))   # values
    for i in present:
        w.g2(spec, Bg2[i], deg)
        w.g1(spec, Bg1[i])
    for name in ("H_query", "L_query"):
        pts = _planes_to_points(getattr(pk, name), spec)
        w.size(len(pts))
        for P in pts:
            w.g1(spec, P)
    write_constraint_system(w, model.Fr.spec, pk.constraint_system)
    return w.bytes()


def proving_key_from_bytes(curve: str, data: bytes):
    from ..proof_systems.groth16_full import ProvingKey

    model = _model_for(curve)
    spec = model.Fq.spec
    deg = 2 if curve == "MNT4753" else 3
    r = Reader(data)
    alpha_g1 = r.g1(spec)
    beta_g1 = r.g1(spec)
    beta_g2 = r.g2(spec, deg)
    delta_g1 = r.g1(spec)
    delta_g2 = r.g2(spec, deg)
    nA = r.size()
    A = [r.g1(spec) for _ in range(nA)]
    domain = r.size()
    n_idx = r.size()
    idxs = [r.size() for _ in range(n_idx)]
    n_vals = r.size()
    assert n_vals == n_idx
    Bg2 = [None] * domain
    Bg1 = [None] * domain
    for i in idxs:
        Bg2[i] = r.g2(spec, deg)
        Bg1[i] = r.g1(spec)
    nH = r.size()
    H = [r.g1(spec) for _ in range(nH)]
    nL = r.size()
    L = [r.g1(spec) for _ in range(nL)]
    cs = read_constraint_system(r, model.Fr.spec)
    return ProvingKey(
        curve=curve, alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2,
        A_query=_points_to_planes(A, spec),
        B_query_g2=_points_to_planes(Bg2, spec, deg),
        B_query_g1=_points_to_planes(Bg1, spec),
        H_query=_points_to_planes(H, spec),
        L_query=_points_to_planes(L, spec),
        constraint_system=cs,
    )


def verification_key_to_bytes(vk) -> bytes:
    model = _model_for(vk.curve)
    spec = model.Fq.spec
    deg = 2 if vk.curve == "MNT4753" else 3
    w = Writer()
    # GT element: component concatenation (fp4/fp6 operator<<)
    for half in vk.alpha_g1_beta_g2:
        comps = list(half) if deg > 1 else [half]
        w.ext(spec, [c for c in comps])
    w.g2(spec, vk.delta_g2, deg)
    # ABC_g1: accumulation_vector = first + sparse rest (dense here)
    w.g1(spec, vk.ABC_g1[0])
    rest = vk.ABC_g1[1:]
    w.size(len(rest))       # domain_size
    w.size(len(rest))
    for i in range(len(rest)):
        w.size(i)
    w.size(len(rest))
    for P in rest:
        w.g1(spec, P)
    return w.bytes()


def verification_key_from_bytes(curve: str, data: bytes):
    from ..proof_systems.groth16_full import VerificationKey

    model = _model_for(curve)
    spec = model.Fq.spec
    deg = 2 if curve == "MNT4753" else 3
    r = Reader(data)
    c0 = r.ext(spec, deg)
    c1 = r.ext(spec, deg)
    delta_g2 = r.g2(spec, deg)
    first = r.g1(spec)
    domain = r.size()
    n_idx = r.size()
    idxs = [r.size() for _ in range(n_idx)]
    n_vals = r.size()
    rest = [None] * domain
    vals = [r.g1(spec) for _ in range(n_vals)]
    for i, v in zip(idxs, vals):
        rest[i] = v
    return VerificationKey(
        curve=curve,
        alpha_g1_beta_g2=(c0 if deg > 1 else c0[0],
                          c1 if deg > 1 else c1[0]),
        delta_g2=delta_g2,
        ABC_g1=[first] + rest,
    )


def proof_to_bytes_caml(curve: str, proof) -> bytes:
    model = _model_for(curve)
    spec = model.Fq.spec
    deg = 2 if curve == "MNT4753" else 3
    w = Writer()
    w.g1(spec, proof.g_A)
    w.g2(spec, proof.g_B, deg)
    w.g1(spec, proof.g_C)
    return w.bytes()


def proof_from_bytes_caml(curve: str, data: bytes):
    from ..proof_systems.groth16_full import Proof

    model = _model_for(curve)
    spec = model.Fq.spec
    deg = 2 if curve == "MNT4753" else 3
    r = Reader(data)
    return Proof(g_A=r.g1(spec), g_B=r.g2(spec, deg), g_C=r.g1(spec))
