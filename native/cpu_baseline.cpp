// Measured CPU comparator for the TPU prover benchmarks.
//
// The reference libsnark binary cannot be built in this image (no GMP
// headers), so this is an honest standalone C++ reimplementation of the
// reference's CPU hot path with the same algorithmic structure:
//   * 12x64-limb Montgomery arithmetic, CIOS multiply
//     (libff fp.tcc:159-188 generic path / cuda-fixnum
//     modnum_monty_cios.cu:85-127)
//   * projective add-1998-cmo-2 / dbl-2007-bl with the reference's
//     branches (mnt4753_g1.cpp:220-347)
//   * BDLO12/Pippenger bucket MSM with the reference's window rule
//     (multiexp.tcc:166-283), OpenMP chunking (multiexp.tcc:403-441)
//   * iterative radix-2 FFT + coset transforms (basic_radix2_domain_aux.tcc)
//   * the challenge pipeline: compute_H + 5 MSMs + C assembly
//     (libsnark/main.cpp:105-272), same file formats
//     (libsnark/serialization.hpp:22-127)
//
// Usage: cpu_baseline <MNT4753|MNT6753> compute <params> <input> <output>
// Prints the same phase timings as main.cpp:201-270 plus one JSON line
// with the measured cpu seconds (consumed by bench.py as vs_baseline).
//
// Build: make -C native cpu  (g++ -O3 -march=native -fopenmp)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "algebra753.hpp"

// ---------------------------------------------------------------------------
// extension fields (Fq2 for MNT4753 G2, Fq3 for MNT6753 G2)
// ---------------------------------------------------------------------------
struct Ext {
  Big c[3];  // up to cubic
};

struct ExtCtx {
  const FieldCtx* F;
  int deg;
  u64 nr;  // small non-residue (13 or 11)
};

static inline void ext_mul_nr(const ExtCtx& E, Big& r, const Big& a) {
  // multiply by small non-residue via repeated additions (log2(nr) adds)
  Big acc = a;                      // a * 1
  Big out{};
  bool any = false;
  u64 k = E.nr;
  while (k) {
    if (k & 1) {
      if (!any) {
        out = acc;
        any = true;
      } else {
        field_add(*E.F, out, out, acc);
      }
    }
    field_add(*E.F, acc, acc, acc);
    k >>= 1;
  }
  r = out;
}

static void ext_add(const ExtCtx& E, Ext& r, const Ext& a, const Ext& b) {
  for (int i = 0; i < E.deg; ++i) field_add(*E.F, r.c[i], a.c[i], b.c[i]);
}
static void ext_sub(const ExtCtx& E, Ext& r, const Ext& a, const Ext& b) {
  for (int i = 0; i < E.deg; ++i) field_sub(*E.F, r.c[i], a.c[i], b.c[i]);
}
static void ext_neg(const ExtCtx& E, Ext& r, const Ext& a) {
  for (int i = 0; i < E.deg; ++i) field_neg(*E.F, r.c[i], a.c[i]);
}
static bool ext_is_zero(const ExtCtx& E, const Ext& a) {
  for (int i = 0; i < E.deg; ++i)
    if (!big_is_zero(a.c[i])) return false;
  return true;
}
static bool ext_eq(const ExtCtx& E, const Ext& a, const Ext& b) {
  for (int i = 0; i < E.deg; ++i)
    if (big_cmp(a.c[i], b.c[i]) != 0) return false;
  return true;
}

static void ext_mul(const ExtCtx& E, Ext& r, const Ext& a, const Ext& b) {
  const FieldCtx& F = *E.F;
  if (E.deg == 1) {
    field_mul(F, r.c[0], a.c[0], b.c[0]);
    return;
  }
  if (E.deg == 2) {
    // Karatsuba (fp2.tcc:81-104)
    Big v0, v1, t0, t1, s;
    field_mul(F, v0, a.c[0], b.c[0]);
    field_mul(F, v1, a.c[1], b.c[1]);
    ext_mul_nr(E, s, v1);
    Big c0;
    field_add(F, c0, v0, s);
    field_add(F, t0, a.c[0], a.c[1]);
    field_add(F, t1, b.c[0], b.c[1]);
    Big t;
    field_mul(F, t, t0, t1);
    field_sub(F, t, t, v0);
    field_sub(F, t, t, v1);
    r.c[0] = c0;
    r.c[1] = t;
    return;
  }
  // deg 3 (fp3.tcc schedule)
  Big v0, v1, v2, t01, t02, t12, tmp1, tmp2;
  field_mul(F, v0, a.c[0], b.c[0]);
  field_mul(F, v1, a.c[1], b.c[1]);
  field_mul(F, v2, a.c[2], b.c[2]);
  field_add(F, tmp1, a.c[0], a.c[1]);
  field_add(F, tmp2, b.c[0], b.c[1]);
  field_mul(F, t01, tmp1, tmp2);
  field_add(F, tmp1, a.c[0], a.c[2]);
  field_add(F, tmp2, b.c[0], b.c[2]);
  field_mul(F, t02, tmp1, tmp2);
  field_add(F, tmp1, a.c[1], a.c[2]);
  field_add(F, tmp2, b.c[1], b.c[2]);
  field_mul(F, t12, tmp1, tmp2);
  Big c0, c1, c2, s;
  field_sub(F, s, t12, v1);
  field_sub(F, s, s, v2);
  ext_mul_nr(E, s, s);
  field_add(F, c0, v0, s);
  field_sub(F, s, t01, v0);
  field_sub(F, s, s, v1);
  ext_mul_nr(E, tmp1, v2);
  field_add(F, c1, s, tmp1);
  field_sub(F, s, t02, v0);
  field_sub(F, s, s, v2);
  field_add(F, c2, s, v1);
  r.c[0] = c0;
  r.c[1] = c1;
  r.c[2] = c2;
}

static void ext_inv(const ExtCtx& E, Ext& r, const Ext& a) {
  const FieldCtx& F = *E.F;
  if (E.deg == 1) {
    field_inv(F, r.c[0], a.c[0]);
    return;
  }
  if (E.deg == 2) {
    Big t0, t1, norm, ni;
    field_sqr(F, t0, a.c[0]);
    field_sqr(F, t1, a.c[1]);
    ext_mul_nr(E, t1, t1);
    field_sub(F, norm, t0, t1);
    field_inv(F, ni, norm);
    field_mul(F, r.c[0], a.c[0], ni);
    Big n1;
    field_mul(F, n1, a.c[1], ni);
    field_neg(F, r.c[1], n1);
    return;
  }
  // deg 3 classical formula (fp3.tcc invert)
  Big t0, t1, t2, t3, t4, t5, c0, c1, c2, norm, ni, s;
  field_sqr(F, t0, a.c[0]);
  field_sqr(F, t1, a.c[1]);
  field_sqr(F, t2, a.c[2]);
  field_mul(F, t3, a.c[0], a.c[1]);
  field_mul(F, t4, a.c[0], a.c[2]);
  field_mul(F, t5, a.c[1], a.c[2]);
  ext_mul_nr(E, s, t5);
  field_sub(F, c0, t0, s);
  ext_mul_nr(E, s, t2);
  field_sub(F, c1, s, t3);
  field_sub(F, c2, t1, t4);
  Big u1, u2;
  field_mul(F, u1, a.c[2], c1);
  field_mul(F, u2, a.c[1], c2);
  field_add(F, u1, u1, u2);
  ext_mul_nr(E, u1, u1);
  field_mul(F, u2, a.c[0], c0);
  field_add(F, norm, u2, u1);
  field_inv(F, ni, norm);
  field_mul(F, r.c[0], c0, ni);
  field_mul(F, r.c[1], c1, ni);
  field_mul(F, r.c[2], c2, ni);
}

// ---------------------------------------------------------------------------
// projective short-Weierstrass group over Ext (mnt4753_g1.cpp formulas)
// ---------------------------------------------------------------------------
struct GroupCtx {
  ExtCtx E;
  Ext a;  // curve coefficients in Montgomery form
  Ext b;
};

struct Pt {
  Ext X, Y, Z;
};

static Pt pt_zero(const GroupCtx& G) {
  Pt r{};
  r.Y.c[0] = G.E.F->one;
  return r;
}
static bool pt_is_zero(const GroupCtx& G, const Pt& P) {
  return ext_is_zero(G.E, P.X) && ext_is_zero(G.E, P.Z);
}

static void pt_double(const GroupCtx& G, Pt& r, const Pt& P);

// add-1998-cmo-2 with the reference's branches (mnt4753_g1.cpp:220-264)
static void pt_add(const GroupCtx& G, Pt& r, const Pt& P, const Pt& Q) {
  const ExtCtx& E = G.E;
  if (pt_is_zero(G, P)) {
    r = Q;
    return;
  }
  if (pt_is_zero(G, Q)) {
    r = P;
    return;
  }
  Ext Y1Z2, X1Z2, Z1Z2, u, v;
  ext_mul(E, Y1Z2, P.Y, Q.Z);
  ext_mul(E, X1Z2, P.X, Q.Z);
  ext_mul(E, Z1Z2, P.Z, Q.Z);
  Ext t;
  ext_mul(E, t, Q.Y, P.Z);
  ext_sub(E, u, t, Y1Z2);
  ext_mul(E, t, Q.X, P.Z);
  ext_sub(E, v, t, X1Z2);
  if (ext_is_zero(E, v)) {
    if (ext_is_zero(E, u)) {
      pt_double(G, r, P);
      return;
    }
    r = pt_zero(G);
    return;
  }
  Ext uu, vv, vvv, R, A;
  ext_mul(E, uu, u, u);
  ext_mul(E, vv, v, v);
  ext_mul(E, vvv, v, vv);
  ext_mul(E, R, vv, X1Z2);
  Ext t2;
  ext_mul(E, t2, uu, Z1Z2);
  ext_sub(E, t2, t2, vvv);
  Ext twoR;
  ext_add(E, twoR, R, R);
  ext_sub(E, A, t2, twoR);
  ext_mul(E, r.X, v, A);
  Ext s1, s2;
  ext_sub(E, s1, R, A);
  ext_mul(E, s1, u, s1);
  ext_mul(E, s2, vvv, Y1Z2);
  ext_sub(E, r.Y, s1, s2);
  ext_mul(E, r.Z, vvv, Z1Z2);
}

// dbl-2007-bl (mnt4753_g1.cpp:315-347)
static void pt_double(const GroupCtx& G, Pt& r, const Pt& P) {
  const ExtCtx& E = G.E;
  if (pt_is_zero(G, P)) {
    r = P;
    return;
  }
  Ext XX, ZZ, w, t;
  ext_mul(E, XX, P.X, P.X);
  ext_mul(E, ZZ, P.Z, P.Z);
  ext_mul(E, w, G.a, ZZ);
  ext_add(E, t, XX, XX);
  ext_add(E, t, t, XX);
  ext_add(E, w, w, t);
  Ext Y1Z1, s, ss, sss, R, RR, B, h;
  ext_mul(E, Y1Z1, P.Y, P.Z);
  ext_add(E, s, Y1Z1, Y1Z1);
  ext_mul(E, ss, s, s);
  ext_mul(E, sss, s, ss);
  ext_mul(E, R, P.Y, s);
  ext_mul(E, RR, R, R);
  Ext XR;
  ext_add(E, XR, P.X, R);
  ext_mul(E, B, XR, XR);
  ext_sub(E, B, B, XX);
  ext_sub(E, B, B, RR);
  Ext w2, twoB;
  ext_mul(E, w2, w, w);
  ext_add(E, twoB, B, B);
  ext_sub(E, h, w2, twoB);
  ext_mul(E, r.X, h, s);
  Ext bh, twoRR;
  ext_sub(E, bh, B, h);
  ext_mul(E, bh, w, bh);
  ext_add(E, twoRR, RR, RR);
  ext_sub(E, r.Y, bh, twoRR);
  r.Z = sss;
}

static void pt_mixed_add(const GroupCtx& G, Pt& r, const Pt& P, const Ext& qx,
                         const Ext& qy, bool q_zero) {
  // Q affine (Z=1) — mnt4753_g1.cpp:265-314 semantics
  if (q_zero) {
    r = P;
    return;
  }
  Pt Q;
  Q.X = qx;
  Q.Y = qy;
  Q.Z.c[0] = G.E.F->one;
  for (int i = 1; i < G.E.deg; ++i) Q.Z.c[i] = Big{};
  pt_add(G, r, P, Q);
}

// ---------------------------------------------------------------------------
// scalar digits + Pippenger MSM (multiexp.tcc:166-283)
// ---------------------------------------------------------------------------
struct AffinePt {
  Ext x, y;
  bool zero;
};

static Pt msm_pippenger(const GroupCtx& G, const std::vector<AffinePt>& pts,
                        const std::vector<Big>& scalars /* canonical */) {
  const size_t n = pts.size();
  int c = 4;
  {
    size_t t = n;
    int lg = 0;
    while (t > 1) {
      t >>= 1;
      ++lg;
    }
    c = lg > 6 ? lg - 3 : 3;  // ~ get_exp_window_size flavour
    if (c < 3) c = 3;
    if (c > 16) c = 16;
  }
  const int W = (753 + c - 1) / c;
  const u64 mask = ((u64)1 << c) - 1;
  Pt result = pt_zero(G);
  std::vector<Pt> buckets((size_t)1 << c);
  for (int w = W - 1; w >= 0; --w) {
    for (int i = 0; i < c; ++i) pt_double(G, result, result);
    for (auto& b : buckets) b = pt_zero(G);
    const int bit = w * c;
    for (size_t i = 0; i < n; ++i) {
      if (pts[i].zero) continue;
      const int limb = bit / 64, off = bit % 64;
      u64 d = scalars[i].v[limb] >> off;
      if (off + c > 64 && limb + 1 < NL) d |= scalars[i].v[limb + 1] << (64 - off);
      d &= mask;
      if (!d) continue;
      Pt t;
      pt_mixed_add(G, t, buckets[d], pts[i].x, pts[i].y, false);
      buckets[d] = t;
    }
    // triangle sum: sum_b b * bucket_b via running/suffix accumulation
    Pt run = pt_zero(G), sum = pt_zero(G);
    for (size_t b = buckets.size() - 1; b >= 1; --b) {
      Pt t;
      pt_add(G, t, run, buckets[b]);
      run = t;
      pt_add(G, t, sum, run);
      sum = t;
    }
    Pt t;
    pt_add(G, t, result, sum);
    result = t;
  }
  return result;
}

// OpenMP chunk split over the stream (multiexp.tcc:403-441)
static Pt msm(const GroupCtx& G, const std::vector<AffinePt>& pts,
              const std::vector<Big>& scalars) {
#ifdef _OPENMP
  const int nt = omp_get_max_threads();
#else
  const int nt = 1;
#endif
  if (nt <= 1 || pts.size() < 1024) return msm_pippenger(G, pts, scalars);
  std::vector<Pt> partials(nt);
  const size_t chunk = (pts.size() + nt - 1) / nt;
#pragma omp parallel for schedule(static, 1)
  for (int t = 0; t < nt; ++t) {
    const size_t lo = t * chunk;
    const size_t hi = std::min(pts.size(), lo + chunk);
    std::vector<AffinePt> p(pts.begin() + lo, pts.begin() + hi);
    std::vector<Big> s(scalars.begin() + lo, scalars.begin() + hi);
    partials[t] = msm_pippenger(G, p, s);
  }
  Pt acc = pt_zero(G);
  for (auto& p : partials) {
    Pt t2;
    pt_add(G, t2, acc, p);
    acc = t2;
  }
  return acc;
}

// ---------------------------------------------------------------------------
// radix-2 FFT over Fr (basic_radix2_domain_aux.tcc:168-205)
// ---------------------------------------------------------------------------
static void fft_inplace(const FieldCtx& F, std::vector<Big>& a, const Big& omega) {
  const size_t n = a.size();
  // bit-reverse permutation
  size_t logn = 0;
  while (((size_t)1 << logn) < n) ++logn;
  for (size_t i = 0; i < n; ++i) {
    size_t r = 0;
    for (size_t b = 0; b < logn; ++b)
      if (i & ((size_t)1 << b)) r |= (size_t)1 << (logn - 1 - b);
    if (i < r) std::swap(a[i], a[r]);
  }
  for (size_t s = 1; s <= logn; ++s) {
    const size_t m = (size_t)1 << s;
    // wm = omega^(n/m)
    Big wm = F.one;
    {
      u64 k = (u64)(n / m);
      Big base = omega;
      while (k) {
        if (k & 1) field_mul(F, wm, wm, base);
        field_mul(F, base, base, base);
        k >>= 1;
      }
    }
    for (size_t j = 0; j < n; j += m) {
      Big w = F.one;
      for (size_t i = 0; i < m / 2; ++i) {
        Big t, u;
        field_mul(F, t, w, a[j + i + m / 2]);
        u = a[j + i];
        field_add(F, a[j + i], u, t);
        field_sub(F, a[j + i + m / 2], u, t);
        field_mul(F, w, w, wm);
      }
    }
  }
}

struct Domain {
  const FieldCtx* F;
  size_t n;
  Big omega, omega_inv, n_inv, g, g_inv;
};

static Big field_pow_u64(const FieldCtx& F, const Big& a, u64 e) {
  Big acc = F.one, base = a;
  while (e) {
    if (e & 1) field_mul(F, acc, acc, base);
    field_mul(F, base, base, base);
    e >>= 1;
  }
  return acc;
}

static void ifft_inplace(const Domain& D, std::vector<Big>& a) {
  fft_inplace(*D.F, a, D.omega_inv);
  for (auto& x : a) field_mul(*D.F, x, x, D.n_inv);
}

static void coset_fft(const Domain& D, std::vector<Big>& a) {
  Big gi = D.F->one;
  for (auto& x : a) {
    field_mul(*D.F, x, x, gi);
    field_mul(*D.F, gi, gi, D.g);
  }
  fft_inplace(*D.F, a, D.omega);
}

static void icoset_fft(const Domain& D, std::vector<Big>& a) {
  ifft_inplace(D, a);
  Big gi = D.F->one;
  for (auto& x : a) {
    field_mul(*D.F, x, x, gi);
    field_mul(*D.F, gi, gi, D.g_inv);
  }
}

// ---------------------------------------------------------------------------
// curve setup
// ---------------------------------------------------------------------------
static const char* DEC_R4 =
    "41898490967918953402344214791240637128170709919953949071783502921025352"
    "81257110677305889376379033892141807097188845847732317305749159385506969"
    "62418547963961657214163253500644414704181378463984696119357190599081642"
    "20784476160001";
static const char* DEC_Q4 =
    "41898490967918953402344214791240637128170709919953949071783502921025352"
    "81257110677305889376379033892141807097188825378611435372652958438520159"
    "16057220131264689314043479498405430079863277434628537206280516921412653"
    "03114721689601";
static const char* DEC_B4 =
    "28798803903456388891410036793299405764940372360099938340752576406393880"
    "37212697006842138331248285354157278008736393844237793370686525205350707"
    "75434205343804864927866265562690832556571250259638256108402225686941371"
    "38741554679540";
static const char* DEC_B6 =
    "11625908999541321152027340224010374716841167701783584648338908235410859"
    "26706007981972274793926792538906261106215660193816601009874792037873892"
    "78326581336254542601154090758161875550558594902533757047280279443155011"
    "22723426879114";

struct CurveSetup {
  FieldCtx Fq, Fr;
  GroupCtx g1, g2;
  int g2_deg;
  Big fr_root_base;  // multiplicative generator of Fr (for omega derivation)
};

static Big to_mont(const FieldCtx& F, u64 small) {
  Big t{};
  t.v[0] = small;
  Big r;
  field_mul(F, r, t, F.R2);
  return r;
}

static CurveSetup make_curve(const std::string& name) {
  CurveSetup C{};
  const bool is4 = (name == "MNT4753");
  C.Fq = make_ctx(is4 ? DEC_Q4 : DEC_R4);
  C.Fr = make_ctx(is4 ? DEC_R4 : DEC_Q4);
  C.g2_deg = is4 ? 2 : 3;
  const u64 nr = is4 ? 13 : 11;
  const u64 a_small = is4 ? 2 : 11;
  Big b_raw = big_from_dec(is4 ? DEC_B4 : DEC_B6);
  Big b_mont;
  field_mul(C.Fq, b_mont, b_raw, C.Fq.R2);

  C.g1.E = ExtCtx{&C.Fq, 1, nr};
  C.g1.a.c[0] = to_mont(C.Fq, a_small);
  C.g1.b.c[0] = b_mont;

  C.g2.E = ExtCtx{&C.Fq, C.g2_deg, nr};
  if (is4) {
    // a2 = (a*nr, 0); b2 = (0, b*nr)  (mnt4753_init.cpp:122-126)
    Big anr = to_mont(C.Fq, a_small * nr);
    C.g2.a.c[0] = anr;
    Big bnr;
    ext_mul_nr(C.g2.E, bnr, b_mont);
    C.g2.b.c[1] = bnr;
  } else {
    // a3 = (0,0,a); b3 = (b*nr,0,0)  (mnt6753_init.cpp:132-136)
    C.g2.a.c[2] = to_mont(C.Fq, a_small);
    Big bnr;
    ext_mul_nr(C.g2.E, bnr, b_mont);
    C.g2.b.c[0] = bnr;
  }
  return C;
}

// omega for size-n domain: generator^((p-1)/n); generator = 17 for both Fr's
static Big domain_omega(const FieldCtx& F, size_t n) {
  // e = (p-1)/n  (n is a power of two dividing p-1 for bench configs)
  Big e{};
  // divide p-1 by n via limb shift (n = 2^k)
  Big pm1;
  Big one{};
  one.v[0] = 1;
  big_sub(pm1, F.p, one);
  size_t k = 0;
  while (((size_t)1 << k) < n) ++k;
  for (int i = 0; i < NL; ++i) {
    u64 lo = pm1.v[i] >> k;
    u64 hi = (i + 1 < NL && k) ? (pm1.v[i + 1] << (64 - k)) : 0;
    e.v[i] = k ? (lo | hi) : pm1.v[i];
  }
  Big g = to_mont(F, 17);
  Big r;
  field_pow(F, r, g, e);
  return r;
}

// ---------------------------------------------------------------------------
// serialization (libsnark/serialization.hpp): raw LE Montgomery bytes
// ---------------------------------------------------------------------------
static Big read_big(FILE* f) {
  Big r;
  if (std::fread(r.v, 8, NL, f) != NL) {
    std::fprintf(stderr, "short read\n");
    std::exit(2);
  }
  return r;
}
static void write_big(FILE* f, const Big& b) { std::fwrite(b.v, 8, NL, f); }

static AffinePt read_g1(FILE* f, const CurveSetup& C) {
  AffinePt p{};
  p.x.c[0] = read_big(f);
  p.y.c[0] = read_big(f);
  p.zero = big_is_zero(p.y.c[0]);
  return p;
}

static AffinePt read_g2(FILE* f, const CurveSetup& C) {
  AffinePt p{};
  for (int i = 0; i < C.g2_deg; ++i) p.x.c[i] = read_big(f);
  for (int i = 0; i < C.g2_deg; ++i) p.y.c[i] = read_big(f);
  p.zero = true;
  for (int i = 0; i < C.g2_deg; ++i)
    if (!big_is_zero(p.y.c[i])) p.zero = false;
  return p;
}

static void write_affine(FILE* f, const GroupCtx& G, const Pt& P) {
  if (pt_is_zero(G, P)) {
    Big z{};
    for (int i = 0; i < 2 * G.E.deg; ++i) write_big(f, z);
    return;
  }
  Ext zi, x, y;
  ext_inv(G.E, zi, P.Z);
  ext_mul(G.E, x, P.X, zi);
  ext_mul(G.E, y, P.Y, zi);
  for (int i = 0; i < G.E.deg; ++i) write_big(f, x.c[i]);
  for (int i = 0; i < G.E.deg; ++i) write_big(f, y.c[i]);
}

// Montgomery wire value -> canonical bigint (for scalar digit slicing)
static Big from_mont(const FieldCtx& F, const Big& a) {
  Big one{};
  one.v[0] = 1;
  Big r;
  field_mul(F, r, a, one);
  return r;
}

// ---------------------------------------------------------------------------
// the challenge pipeline (libsnark/main.cpp:105-272)
// ---------------------------------------------------------------------------
int main(int argc, char** argv) {
  if (argc != 6 || std::string(argv[2]) != "compute") {
    std::fprintf(stderr,
                 "usage: %s <MNT4753|MNT6753> compute <params> <input> <output>\n",
                 argv[0]);
    return 1;
  }
  using clock = std::chrono::steady_clock;
  auto ms = [](clock::time_point a, clock::time_point b) {
    return std::chrono::duration<double>(b - a).count();
  };
  const std::string curve = argv[1];
  CurveSetup C = make_curve(curve);

  auto t0 = clock::now();
  FILE* pf = std::fopen(argv[3], "rb");
  if (!pf) {
    std::perror("params");
    return 1;
  }
  u64 d, m;
  if (std::fread(&d, 8, 1, pf) != 1 || std::fread(&m, 8, 1, pf) != 1) return 2;
  std::vector<AffinePt> A(m + 1), B1(m + 1), B2(m + 1), L(m - 1), H(d);
  for (auto& p : A) p = read_g1(pf, C);
  for (auto& p : B1) p = read_g1(pf, C);
  for (auto& p : B2) p = read_g2(pf, C);
  for (auto& p : L) p = read_g1(pf, C);
  for (auto& p : H) p = read_g1(pf, C);
  std::fclose(pf);
  auto t1 = clock::now();
  std::fprintf(stderr, "load params: %.3fs\n", ms(t0, t1));

  FILE* inf = std::fopen(argv[4], "rb");
  if (!inf) {
    std::perror("input");
    return 1;
  }
  std::vector<Big> w(m + 1), ca(d + 1), cb(d + 1), cc(d + 1);
  for (auto& x : w) x = read_big(inf);
  for (auto& x : ca) x = read_big(inf);
  for (auto& x : cb) x = read_big(inf);
  for (auto& x : cc) x = read_big(inf);
  Big r_mont = read_big(inf);
  std::fclose(inf);
  auto t2 = clock::now();
  std::fprintf(stderr, "load inputs: %.3fs\n", ms(t1, t2));

  // ---- compute_H (main.cpp:105-163) ---------------------------------
  Domain D;
  D.F = &C.Fr;
  D.n = d + 1;
  D.omega = domain_omega(C.Fr, D.n);
  {
    Big nM = to_mont(C.Fr, (u64)D.n);
    field_inv(C.Fr, D.n_inv, nM);
    field_inv(C.Fr, D.omega_inv, D.omega);
    D.g = to_mont(C.Fr, 17);
    field_inv(C.Fr, D.g_inv, D.g);
  }
  ifft_inplace(D, ca);
  coset_fft(D, ca);
  ifft_inplace(D, cb);
  coset_fft(D, cb);
  std::vector<Big> Hv(d + 1);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (long i = 0; i <= (long)d; ++i) field_mul(C.Fr, Hv[i], ca[i], cb[i]);
  ifft_inplace(D, cc);
  coset_fft(D, cc);
  for (size_t i = 0; i <= d; ++i) field_sub(C.Fr, Hv[i], Hv[i], cc[i]);
  // divide by Z on coset: Z(g x) = g^n - 1 constant
  {
    Big gn = field_pow_u64(C.Fr, D.g, (u64)D.n);
    Big z;
    field_sub(C.Fr, z, gn, C.Fr.one);
    Big zi;
    field_inv(C.Fr, zi, z);
    for (auto& x : Hv) field_mul(C.Fr, x, x, zi);
  }
  icoset_fft(D, Hv);
  auto t3 = clock::now();
  std::fprintf(stderr, "compute_H: %.3fs\n", ms(t2, t3));

  // ---- 5 MSMs (main.cpp:227-251) ------------------------------------
  std::vector<Big> w_can(w.size()), h_can(d);
  for (size_t i = 0; i < w.size(); ++i) w_can[i] = from_mont(C.Fr, w[i]);
  for (size_t i = 0; i < d; ++i) h_can[i] = from_mont(C.Fr, Hv[i]);

  Pt At = msm(C.g1, A, w_can);
  Pt Bt1 = msm(C.g1, B1, w_can);
  Pt Bt2 = msm(C.g2, B2, w_can);
  Pt Ht = msm(C.g1, H, h_can);
  std::vector<Big> w2(w_can.begin() + 2, w_can.end());
  Pt Lt = msm(C.g1, L, w2);

  // C = Ht + Lt + r * Bt1
  Big r_can = from_mont(C.Fr, r_mont);
  Pt rB = pt_zero(C.g1);
  for (int i = NL * 64 - 1; i >= 0; --i) {
    Pt t;
    pt_double(C.g1, t, rB);
    rB = t;
    if ((r_can.v[i / 64] >> (i % 64)) & 1) {
      pt_add(C.g1, t, rB, Bt1);
      rB = t;
    }
  }
  Pt Cpt;
  pt_add(C.g1, Cpt, Ht, Lt);
  {
    Pt t;
    pt_add(C.g1, t, Cpt, rB);
    Cpt = t;
  }
  auto t4 = clock::now();
  std::fprintf(stderr, "msm+assembly: %.3fs\n", ms(t3, t4));

  FILE* of = std::fopen(argv[5], "wb");
  if (!of) {
    std::perror("output");
    return 1;
  }
  write_affine(of, C.g1, At);
  write_affine(of, C.g2, Bt2);
  write_affine(of, C.g1, Cpt);
  std::fclose(of);
  auto t5 = clock::now();
  std::fprintf(stderr, "store: %.3fs\n", ms(t4, t5));
  std::fprintf(stderr, "Total time from input to output: %.3fs\n", ms(t0, t5));
  // machine-readable line for bench.py
  std::printf("{\"cpu_baseline_s\": %.6f, \"compute_s\": %.6f}\n", ms(t0, t5),
              ms(t2, t4));
  return 0;
}
