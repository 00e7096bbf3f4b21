// camlsnark_* C ABI: the OCaml-facing FFI surface of the reference
// (libsnark/caml/caml_mnt4753.cpp, caml_mnt6753.cpp — ~200 extern "C"
// entry points per curve used by Mina/snarky to build circuits, drive
// field/bigint arithmetic, and manage R1CS constraint systems), rebuilt
// over this framework's own native algebra core (algebra753.hpp).
//
// Scope: the circuit-construction layer — protoboard, pb variables and
// variable arrays, linear combinations/terms, R1CS constraints and
// constraint systems (add/check/digest/is_satisfied/renumber/iter),
// field arithmetic over Fr (add/mul/inv/sqrt/rng/...), bigint_r /
// bigint_q (decimal + numeral parse, raw-limb marshal, div, compare,
// test_bit, find_wnaf), and field vectors.  These are exactly the calls
// snarky makes while SYNTHESIZING a circuit — pure host bookkeeping, so
// they live natively.  The prove/verify families (camlsnark_*_keypair_*,
// *_proof_*, *_gm_*, *_bg_*) are served by the TPU prover through the
// ctypes bridge (snark_challenge_prover_tpu/io/caml_ffi.py), which walks
// constraint systems out of this library via r1cs_constraint_system_iter
// and hands them to proof_systems.{groth16_full,gm17,bg} — proofs are
// the framework's device path, not a host reimplementation.
//
// The constraint-system MD5 digest matches the reference byte-for-byte:
// MD5 over (size_t index, 12x8-byte canonical coeff limbs) per linear
// term (caml_mnt4753.cpp:493-524); MD5 per RFC 1321, implemented here
// to avoid an OpenSSL dependency.
//
// Build: make -C native caml  ->  build/libcamlsnark.so

#include "algebra753.hpp"

#include <cinttypes>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// compact MD5 (RFC 1321) for constraint-system digests
// ---------------------------------------------------------------------------
namespace md5 {
struct Ctx {
  uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe, d = 0x10325476;
  uint64_t bits = 0;
  unsigned char buf[64];
  size_t buflen = 0;
};

static const uint32_t K[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
static const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                          7, 12, 17, 22, 5, 9,  14, 20, 5, 9,  14, 20,
                          5, 9,  14, 20, 5, 9,  14, 20, 4, 11, 16, 23,
                          4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                          6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
                          6, 10, 15, 21};

static inline uint32_t rotl(uint32_t x, int c) {
  return (x << c) | (x >> (32 - c));
}

static void compress(Ctx& ctx, const unsigned char* p) {
  uint32_t M[16];
  for (int i = 0; i < 16; ++i)
    M[i] = (uint32_t)p[4 * i] | ((uint32_t)p[4 * i + 1] << 8) |
           ((uint32_t)p[4 * i + 2] << 16) | ((uint32_t)p[4 * i + 3] << 24);
  uint32_t A = ctx.a, B = ctx.b, C = ctx.c, D = ctx.d;
  for (int i = 0; i < 64; ++i) {
    uint32_t F;
    int g;
    if (i < 16) {
      F = (B & C) | (~B & D);
      g = i;
    } else if (i < 32) {
      F = (D & B) | (~D & C);
      g = (5 * i + 1) % 16;
    } else if (i < 48) {
      F = B ^ C ^ D;
      g = (3 * i + 5) % 16;
    } else {
      F = C ^ (B | ~D);
      g = (7 * i) % 16;
    }
    uint32_t tmp = D;
    D = C;
    C = B;
    B = B + rotl(A + F + K[i] + M[g], S[i]);
    A = tmp;
  }
  ctx.a += A;
  ctx.b += B;
  ctx.c += C;
  ctx.d += D;
}

static void update(Ctx& ctx, const void* data, size_t len) {
  const unsigned char* p = (const unsigned char*)data;
  ctx.bits += (uint64_t)len * 8;
  while (len) {
    size_t take = 64 - ctx.buflen;
    if (take > len) take = len;
    std::memcpy(ctx.buf + ctx.buflen, p, take);
    ctx.buflen += take;
    p += take;
    len -= take;
    if (ctx.buflen == 64) {
      compress(ctx, ctx.buf);
      ctx.buflen = 0;
    }
  }
}

static void final(Ctx& ctx, unsigned char out[16]) {
  uint64_t bits = ctx.bits;
  unsigned char pad = 0x80;
  update(ctx, &pad, 1);
  unsigned char z = 0;
  while (ctx.buflen != 56) update(ctx, &z, 1);
  unsigned char lb[8];
  for (int i = 0; i < 8; ++i) lb[i] = (unsigned char)(bits >> (8 * i));
  update(ctx, lb, 8);
  uint32_t regs[4] = {ctx.a, ctx.b, ctx.c, ctx.d};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) out[4 * i + j] = (unsigned char)(regs[i] >> (8 * j));
}
}  // namespace md5

// ---------------------------------------------------------------------------
// shared circuit-construction object model (libsnark variable.hpp /
// protoboard.hpp semantics: index 0 is the constant ONE, allocated
// variables start at 1)
// ---------------------------------------------------------------------------
struct LinTerm {
  size_t index;
  Big coeff;  // Montgomery form
};
struct LinComb {
  std::vector<LinTerm> terms;
};
struct Constraint {
  LinComb a, b, c;
  bool is_square = false;
};
struct ConstraintSystem {
  std::vector<Constraint> constraints;
  std::vector<std::string> annotations;
  size_t primary_input_size = 0;
  size_t auxiliary_input_size = 0;
  size_t num_variables() const {
    return primary_input_size + auxiliary_input_size;
  }
};
struct Protoboard {
  const FieldCtx* F;
  std::vector<Big> values;  // full assignment, [0] = one (Montgomery)
  ConstraintSystem cs;
  size_t input_sizes = 0;

  explicit Protoboard(const FieldCtx* f) : F(f) { values.push_back(f->one); }
  size_t num_variables() const { return values.size() - 1; }
};
struct Var {
  size_t index;
};
struct VarArray {
  std::vector<size_t> indices;
};

// LC evaluation over a full assignment (r1cs.tcc evaluate semantics)
static Big lc_eval(const FieldCtx& F, const LinComb& lc,
                   const std::vector<Big>& w) {
  Big acc{};
  for (const LinTerm& t : lc.terms) {
    if (t.index >= w.size()) continue;
    Big prod;
    field_mul(F, prod, t.coeff, w[t.index]);
    field_add(F, acc, acc, prod);
  }
  return acc;
}

static bool cs_is_satisfied(const FieldCtx& F, const ConstraintSystem& cs,
                            const std::vector<Big>& primary,
                            const std::vector<Big>& aux) {
  std::vector<Big> w;
  w.reserve(1 + primary.size() + aux.size());
  w.push_back(F.one);
  w.insert(w.end(), primary.begin(), primary.end());
  w.insert(w.end(), aux.begin(), aux.end());
  for (const Constraint& c : cs.constraints) {
    Big a = lc_eval(F, c.a, w), b = lc_eval(F, c.b, w), cc = lc_eval(F, c.c, w);
    Big ab;
    field_mul(F, ab, a, b);
    if (big_cmp(ab, cc) != 0) return false;
  }
  return true;
}

// find_wnaf (libff wnaf.tcc semantics): windowed NAF digits, LSB first
static std::vector<long>* find_wnaf(size_t window, const Big& scalar) {
  auto* res = new std::vector<long>();
  // work on a widened copy (digit borrow can push one limb of carry)
  u64 c[NL + 1] = {0};
  std::memcpy(c, scalar.v, sizeof(scalar.v));
  auto is_zero = [&]() {
    for (int i = 0; i <= NL; ++i)
      if (c[i]) return false;
    return true;
  };
  const long two_pow = 1L << (window + 1);
  while (!is_zero()) {
    long u;
    if (c[0] & 1) {
      u = (long)(c[0] & (u64)(two_pow - 1));
      if (u > two_pow / 2) u -= two_pow;
      if (u >= 0) {
        // subtract u
        u128 borrow = (u64)u;
        for (int i = 0; i <= NL && borrow; ++i) {
          u128 d = (u128)c[i] - borrow;
          c[i] = (u64)d;
          borrow = (d >> 64) ? 1 : 0;
        }
      } else {
        // add -u
        u128 carry = (u64)(-u);
        for (int i = 0; i <= NL && carry; ++i) {
          carry += c[i];
          c[i] = (u64)carry;
          carry >>= 64;
        }
      }
    } else {
      u = 0;
    }
    res->push_back(u);
    // c >>= 1
    for (int i = 0; i < NL; ++i) c[i] = (c[i] >> 1) | (c[i + 1] << 63);
    c[NL] >>= 1;
  }
  return res;
}

// decimal print (repeated division by 10^19)
static std::string big_to_dec(const Big& a) {
  Big t = a;
  if (big_is_zero(t)) return "0";
  std::string out;
  const u64 chunk = 10000000000000000000ULL;  // 10^19
  while (!big_is_zero(t)) {
    u128 rem = 0;
    for (int i = NL - 1; i >= 0; --i) {
      u128 cur = (rem << 64) | t.v[i];
      t.v[i] = (u64)(cur / chunk);
      rem = cur % chunk;
    }
    char seg[24];
    std::snprintf(seg, sizeof seg, "%019" PRIu64, (u64)rem);
    out = std::string(seg) + out;
  }
  size_t nz = out.find_first_not_of('0');
  return nz == std::string::npos ? "0" : out.substr(nz);
}

// binary long division: q = x / y (y != 0)
static Big big_div(const Big& x, const Big& y) {
  Big q{}, r{};
  for (int i = NL * 64 - 1; i >= 0; --i) {
    // r = (r << 1) | bit_i(x)
    u64 carry = 0;
    for (int j = 0; j < NL; ++j) {
      u64 nc = r.v[j] >> 63;
      r.v[j] = (r.v[j] << 1) | carry;
      carry = nc;
    }
    if (big_test_bit(x, i)) r.v[0] |= 1;
    if (big_cmp(r, y) >= 0) {
      Big t;
      big_sub(t, r, y);
      r = t;
      q.v[i / 64] |= (u64)1 << (i % 64);
    }
  }
  return q;
}

// Tonelli–Shanks square root (p odd prime), fp.tcc sqrt semantics
struct SqrtCtx {
  Big t;       // odd part of p-1  (canonical)
  size_t s;    // 2-adicity
  Big z_mont;  // nonresidue^t in Montgomery form (order 2^s generator)
  Big t_minus_1_over_2;
};

static bool field_is_square(const FieldCtx& F, const Big& a_mont) {
  if (big_is_zero(a_mont)) return true;
  // Euler criterion: a^((p-1)/2) == 1
  Big e = F.p;
  Big one{};
  one.v[0] = 1;
  big_sub(e, F.p, one);
  // e >>= 1
  for (int i = 0; i < NL - 1; ++i) e.v[i] = (e.v[i] >> 1) | (e.v[i + 1] << 63);
  e.v[NL - 1] >>= 1;
  Big r;
  field_pow(F, r, a_mont, e);
  return big_cmp(r, F.one) == 0;
}

static SqrtCtx make_sqrt_ctx(const FieldCtx& F) {
  SqrtCtx S{};
  Big one{};
  one.v[0] = 1;
  Big t;
  big_sub(t, F.p, one);  // p-1
  size_t s = 0;
  while (!(t.v[0] & 1)) {
    for (int i = 0; i < NL - 1; ++i) t.v[i] = (t.v[i] >> 1) | (t.v[i + 1] << 63);
    t.v[NL - 1] >>= 1;
    ++s;
  }
  S.t = t;
  S.s = s;
  // find a quadratic nonresidue by scanning small integers
  for (u64 g = 2;; ++g) {
    Big gm{};
    gm.v[0] = g;
    Big gmont;
    field_to_mont(F, gmont, gm);
    if (!field_is_square(F, gmont)) {
      field_pow(F, S.z_mont, gmont, t);
      break;
    }
  }
  Big tm1;
  big_sub(tm1, t, one);
  for (int i = 0; i < NL - 1; ++i)
    tm1.v[i] = (tm1.v[i] >> 1) | (tm1.v[i + 1] << 63);
  tm1.v[NL - 1] >>= 1;
  S.t_minus_1_over_2 = tm1;
  return S;
}

static bool field_sqrt(const FieldCtx& F, const SqrtCtx& S, Big& out,
                       const Big& a) {
  if (big_is_zero(a)) {
    out = a;
    return true;
  }
  if (!field_is_square(F, a)) return false;
  Big w;
  field_pow(F, w, a, S.t_minus_1_over_2);  // a^((t-1)/2)
  Big x;
  field_mul(F, x, a, w);  // a^((t+1)/2)
  Big b;
  field_mul(F, b, x, w);  // a^t
  Big g = S.z_mont;
  size_t v = S.s;
  while (big_cmp(b, F.one) != 0) {
    // find least m with b^(2^m) == 1
    size_t m = 0;
    Big t2 = b;
    while (big_cmp(t2, F.one) != 0) {
      field_sqr(F, t2, t2);
      ++m;
    }
    // x *= g^(2^(v-m-1)); b *= g^(2^(v-m)); g = g^(2^(v-m))
    Big gp = g;
    for (size_t i = 0; i < v - m - 1; ++i) field_sqr(F, gp, gp);
    field_mul(F, x, x, gp);
    field_sqr(F, gp, gp);
    field_mul(F, b, b, gp);
    g = gp;
    v = m;
  }
  out = x;
  return true;
}

// ---------------------------------------------------------------------------
// per-curve contexts.  MNT4753 r == MNT6753 q and vice versa (the AT
// cycle); the primes are built from canonical little-endian 64-bit
// limbs identical to models/primes.py FIELD_A/FIELD_B, which
// tests/test_models.py pins against the reference's decimal strings
// (mnt4753_init.cpp:62-266) — and tests/test_caml_ffi.py re-checks the
// moduli through this ABI.
// ---------------------------------------------------------------------------
struct CurveCtx {
  FieldCtx Fr;
  FieldCtx Fq;
  SqrtCtx Sr;
  bool init = false;
};

static CurveCtx g_mnt4, g_mnt6;
static const u64 MNT4_R_LIMBS[NL] = {
    0xD90776E240000001ULL, 0x4EA099170FA13A4FULL, 0xD6C381BC3F005797ULL,
    0xB9DFF97634993AA4ULL, 0x3EEBCA9429212636ULL, 0xB26C5C28C859A99BULL,
    0x99D124D9A15AF79DULL, 0x07FDB925E8A0ED8DULL, 0x5EB7E8F96C97D873ULL,
    0xB7F997505B8FAFEDULL, 0x10229022EEE2CDADULL, 0x01C4C62D92C411ULL};
static const u64 MNT4_Q_LIMBS[NL] = {
    0x5E9063DE245E8001ULL, 0xE39D54522CDD119FULL, 0x638810719AC425F0ULL,
    0x685ACCE9767254A4ULL, 0xB80F0DA5CB537E38ULL, 0xB117E776F218059DULL,
    0x99D124D9A15AF79DULL, 0x07FDB925E8A0ED8DULL, 0x5EB7E8F96C97D873ULL,
    0xB7F997505B8FAFEDULL, 0x10229022EEE2CDADULL, 0x01C4C62D92C411ULL};

static FieldCtx make_ctx_limbs(const u64* limbs) {
  // same as make_ctx but from limbs
  FieldCtx F{};
  for (int i = 0; i < NL; ++i) F.p.v[i] = limbs[i];
  u64 pinv = F.p.v[0];
  for (int i = 0; i < 6; ++i) pinv *= 2 - F.p.v[0] * pinv;
  F.inv = ~pinv + 1;
  Big t{};
  t.v[0] = 1;
  for (int i = 0; i < 768; ++i) field_add(F, t, t, t);
  F.one = t;
  Big t2 = t;
  for (int i = 0; i < 768; ++i) field_add(F, t2, t2, t2);
  F.R2 = t2;
  return F;
}

static void ctx_init(CurveCtx& C, const u64* r_limbs, const u64* q_limbs) {
  if (C.init) return;
  C.Fr = make_ctx_limbs(r_limbs);
  C.Fq = make_ctx_limbs(q_limbs);
  C.Sr = make_sqrt_ctx(C.Fr);
  C.init = true;
}

// ---------------------------------------------------------------------------
// the extern "C" API, stamped per curve
// ---------------------------------------------------------------------------
typedef std::vector<Big> FieldVector;
typedef std::vector<LinTerm> TermVector;
typedef std::vector<LinComb> LcVector;
typedef std::vector<long> LongVector;

// opaque byte-blob handle for serialized keys/proofs (see the
// keypair/proof string entry points at the end of DEFINE_CAML_API)
struct KeyBlob {
  std::string data;
};

#define DEFINE_CAML_API(PFX, CTX, R_LIMBS, Q_LIMBS)                            \
  extern "C" {                                                                 \
  void PFX##_init_public_params() { ctx_init(CTX, R_LIMBS, Q_LIMBS); }         \
  /* ---- field (Fr) ---- */                                                   \
  int PFX##_field_size_in_bits() { return 753; }                               \
  Big* PFX##_field_size() { /* modulus as bigint */                            \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    return new Big(CTX.Fr.p);                                                  \
  }                                                                            \
  Big* PFX##_field_of_int(long n) {                                            \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    Big v{};                                                                   \
    Big* r = new Big;                                                          \
    if (n >= 0) {                                                              \
      v.v[0] = (u64)n;                                                         \
      field_to_mont(CTX.Fr, *r, v);                                            \
    } else {                                                                   \
      v.v[0] = (u64)(-n);                                                      \
      field_to_mont(CTX.Fr, *r, v);                                            \
      field_neg(CTX.Fr, *r, *r);                                               \
    }                                                                          \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_field_add(Big* a, Big* b) {                                       \
    Big* r = new Big;                                                          \
    field_add(CTX.Fr, *r, *a, *b);                                             \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_field_sub(Big* a, Big* b) {                                       \
    Big* r = new Big;                                                          \
    field_sub(CTX.Fr, *r, *a, *b);                                             \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_field_mul(Big* a, Big* b) {                                       \
    Big* r = new Big;                                                          \
    field_mul(CTX.Fr, *r, *a, *b);                                             \
    return r;                                                                  \
  }                                                                            \
  void PFX##_field_mut_add(Big* a, Big* b) { field_add(CTX.Fr, *a, *a, *b); }  \
  void PFX##_field_mut_sub(Big* a, Big* b) { field_sub(CTX.Fr, *a, *a, *b); }  \
  void PFX##_field_mut_mul(Big* a, Big* b) { field_mul(CTX.Fr, *a, *a, *b); }  \
  Big* PFX##_field_inv(Big* a) {                                               \
    Big* r = new Big;                                                          \
    field_inv(CTX.Fr, *r, *a);                                                 \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_field_square(Big* a) {                                            \
    Big* r = new Big;                                                          \
    field_sqr(CTX.Fr, *r, *a);                                                 \
    return r;                                                                  \
  }                                                                            \
  bool PFX##_field_is_square(Big* a) { return field_is_square(CTX.Fr, *a); }   \
  Big* PFX##_field_sqrt(Big* a) {                                              \
    Big* r = new Big;                                                          \
    if (!field_sqrt(CTX.Fr, CTX.Sr, *r, *a)) *r = Big{};                       \
    return r;                                                                  \
  }                                                                            \
  bool PFX##_field_equal(Big* a, Big* b) { return big_cmp(*a, *b) == 0; }      \
  Big* PFX##_field_copy(Big* a) { return new Big(*a); }                        \
  Big* PFX##_field_random() {                                                  \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    static std::mt19937_64 gen{std::random_device{}()};                        \
    Big v;                                                                     \
    do {                                                                       \
      for (int i = 0; i < NL; ++i) v.v[i] = gen();                             \
      v.v[NL - 1] &= (1ULL << (753 - 64 * (NL - 1))) - 1;                      \
    } while (big_cmp(v, CTX.Fr.p) >= 0);                                       \
    Big* r = new Big;                                                          \
    field_to_mont(CTX.Fr, *r, v);                                              \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_field_rng(int i) {                                                \
    /* deterministic int -> element (reference: SHA512_rng; here a */          \
    /* seeded splitmix/mt expansion with rejection — same contract: */         \
    /* stable across calls and processes for a given i) */                     \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    std::mt19937_64 gen((u64)i * 0x9E3779B97F4A7C15ULL + 1);                   \
    Big v;                                                                     \
    do {                                                                       \
      for (int j = 0; j < NL; ++j) v.v[j] = gen();                             \
      v.v[NL - 1] &= (1ULL << (753 - 64 * (NL - 1))) - 1;                      \
    } while (big_cmp(v, CTX.Fr.p) >= 0);                                       \
    Big* r = new Big;                                                          \
    field_to_mont(CTX.Fr, *r, v);                                              \
    return r;                                                                  \
  }                                                                            \
  void PFX##_field_print(Big* a) {                                             \
    Big c;                                                                     \
    field_from_mont(CTX.Fr, c, *a);                                            \
    std::printf("%s\n", big_to_dec(c).c_str());                                \
  }                                                                            \
  void PFX##_field_delete(Big* a) { delete a; }                                \
  /* ---- field vectors ---- */                                                \
  FieldVector* PFX##_field_vector_create() { return new FieldVector(); }       \
  int PFX##_field_vector_length(FieldVector* v) { return (int)v->size(); }     \
  void PFX##_field_vector_emplace_back(FieldVector* v, Big* x) {               \
    v->push_back(*x);                                                          \
  }                                                                            \
  Big* PFX##_field_vector_get(FieldVector* v, int i) {                         \
    return new Big((*v)[i]);                                                   \
  }                                                                            \
  void PFX##_field_vector_delete(FieldVector* v) { delete v; }                 \
  /* ---- bigint_r ---- */                                                     \
  Big* PFX##_bigint_r_of_field(Big* x) {                                       \
    Big* r = new Big;                                                          \
    field_from_mont(CTX.Fr, *r, *x);                                           \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_bigint_r_of_decimal_string(char* s) {                             \
    return new Big(big_from_dec(s));                                           \
  }                                                                            \
  int PFX##_bigint_r_num_limbs() { return NL; }                                \
  int PFX##_bigint_r_bytes_per_limb() { return 8; }                            \
  char* PFX##_bigint_r_to_data(Big* x) { return (char*)x->v; }                 \
  Big* PFX##_bigint_r_of_data(char* s) {                                       \
    Big* r = new Big;                                                          \
    std::memcpy(r->v, s, sizeof(r->v));                                        \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_bigint_r_of_numeral(const unsigned char* s, int len, int base) {  \
    Big* r = new Big{};                                                        \
    for (int i = 0; i < len; ++i) {                                            \
      u128 carry = s[i]; /* digit VALUES, mpn_set_str semantics */             \
      for (int j = 0; j < NL; ++j) {                                           \
        u128 t = (u128)r->v[j] * (unsigned)base + carry;                       \
        r->v[j] = (u64)t;                                                      \
        carry = t >> 64;                                                       \
      }                                                                        \
    }                                                                          \
    return r;                                                                  \
  }                                                                            \
  Big* PFX##_bigint_r_div(Big* x, Big* y) { return new Big(big_div(*x, *y)); } \
  Big* PFX##_bigint_r_to_field(Big* n) {                                       \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    Big* r = new Big;                                                          \
    field_to_mont(CTX.Fr, *r, *n);                                             \
    return r;                                                                  \
  }                                                                            \
  int PFX##_bigint_r_compare(Big* a, Big* b) { return big_cmp(*a, *b); }       \
  bool PFX##_bigint_r_test_bit(Big* a, int i) { return big_test_bit(*a, i); }  \
  LongVector* PFX##_bigint_r_find_wnaf(size_t w, Big* s) {                     \
    return find_wnaf(w, *s);                                                   \
  }                                                                            \
  void PFX##_bigint_r_print(Big* a) {                                          \
    std::printf("%s\n", big_to_dec(*a).c_str());                               \
  }                                                                            \
  void PFX##_bigint_r_delete(Big* a) { delete a; }                             \
  /* ---- bigint_q ---- */                                                     \
  bool PFX##_bigint_q_test_bit(Big* a, int i) { return big_test_bit(*a, i); }  \
  LongVector* PFX##_bigint_q_find_wnaf(size_t w, Big* s) {                     \
    return find_wnaf(w, *s);                                                   \
  }                                                                            \
  void PFX##_bigint_q_print(Big* a) {                                          \
    std::printf("%s\n", big_to_dec(*a).c_str());                               \
  }                                                                            \
  void PFX##_bigint_q_delete(Big* a) { delete a; }                             \
  /* ---- vars / variable arrays ---- */                                       \
  Var* PFX##_var_create(int i) { return new Var{(size_t)i}; }                  \
  void PFX##_var_delete(Var* v) { delete v; }                                  \
  size_t PFX##_var_index(Var* v) { return v->index; }                          \
  /* ---- linear combination terms ---- */                                     \
  LinTerm* PFX##_linear_combination_term_create(Big* coeff, Var* v) {          \
    return new LinTerm{v->index, *coeff};                                      \
  }                                                                            \
  void PFX##_linear_combination_term_delete(LinTerm* t) { delete t; }          \
  int PFX##_linear_combination_term_index(LinTerm* t) { return (int)t->index; }\
  Big* PFX##_linear_combination_term_coeff(LinTerm* t) {                       \
    return new Big(t->coeff);                                                  \
  }                                                                            \
  TermVector* PFX##_linear_combination_term_vector_create() {                  \
    return new TermVector();                                                   \
  }                                                                            \
  void PFX##_linear_combination_term_vector_delete(TermVector* v) {            \
    delete v;                                                                  \
  }                                                                            \
  int PFX##_linear_combination_term_vector_length(TermVector* v) {             \
    return (int)v->size();                                                     \
  }                                                                            \
  void PFX##_linear_combination_term_vector_emplace_back(TermVector* v,        \
                                                         LinTerm* t) {         \
    v->push_back(*t);                                                          \
  }                                                                            \
  LinTerm* PFX##_linear_combination_term_vector_get(TermVector* v, int i) {    \
    return new LinTerm((*v)[i]);                                               \
  }                                                                            \
  /* ---- linear combinations ---- */                                          \
  LinComb* PFX##_linear_combination_create() { return new LinComb(); }         \
  void PFX##_linear_combination_delete(LinComb* lc) { delete lc; }             \
  void PFX##_linear_combination_add_term(LinComb* lc, Big* coeff, Var* v) {    \
    lc->terms.push_back(LinTerm{v->index, *coeff});                            \
  }                                                                            \
  LinComb* PFX##_linear_combination_of_var(Var* v) {                           \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    auto* lc = new LinComb();                                                  \
    lc->terms.push_back(LinTerm{v->index, CTX.Fr.one});                        \
    return lc;                                                                 \
  }                                                                            \
  LinComb* PFX##_linear_combination_of_int(int n) {                            \
    auto* lc = new LinComb();                                                  \
    Big* f = PFX##_field_of_int(n);                                            \
    lc->terms.push_back(LinTerm{0, *f});                                       \
    delete f;                                                                  \
    return lc;                                                                 \
  }                                                                            \
  LinComb* PFX##_linear_combination_of_field(Big* f) {                         \
    auto* lc = new LinComb();                                                  \
    lc->terms.push_back(LinTerm{0, *f});                                       \
    return lc;                                                                 \
  }                                                                            \
  LinComb* PFX##_linear_combination_of_terms(TermVector* v) {                  \
    auto* lc = new LinComb();                                                  \
    lc->terms = *v;                                                            \
    return lc;                                                                 \
  }                                                                            \
  TermVector* PFX##_linear_combination_terms(LinComb* lc) {                    \
    return new TermVector(lc->terms);                                          \
  }                                                                            \
  LinComb* PFX##_linear_combination_var_add(Var* v, LinComb* other) {          \
    LinComb* r = PFX##_linear_combination_of_var(v);                           \
    r->terms.insert(r->terms.end(), other->terms.begin(),                      \
                    other->terms.end());                                       \
    return r;                                                                  \
  }                                                                            \
  LinComb* PFX##_linear_combination_var_sub(Var* v, LinComb* other) {          \
    LinComb* r = PFX##_linear_combination_of_var(v);                           \
    for (const LinTerm& t : other->terms) {                                    \
      Big nc;                                                                  \
      field_neg(CTX.Fr, nc, t.coeff);                                          \
      r->terms.push_back(LinTerm{t.index, nc});                                \
    }                                                                          \
    return r;                                                                  \
  }                                                                            \
  bool PFX##_linear_combination_check(size_t total_input_size, LinComb* lc) {  \
    for (const LinTerm& t : lc->terms)                                         \
      if (t.index > total_input_size) return false;                            \
    return true;                                                               \
  }                                                                            \
  void PFX##_linear_combination_print(LinComb* lc) {                           \
    for (const LinTerm& t : lc->terms) {                                       \
      Big c;                                                                   \
      field_from_mont(CTX.Fr, c, t.coeff);                                     \
      std::printf("%zu * %s\n", t.index, big_to_dec(c).c_str());               \
    }                                                                          \
  }                                                                            \
  LcVector* PFX##_linear_combination_vector_create() { return new LcVector(); }\
  void PFX##_linear_combination_vector_delete(LcVector* v) { delete v; }       \
  void PFX##_linear_combination_vector_emplace_back(LcVector* v, LinComb* x) { \
    v->push_back(*x);                                                          \
  }                                                                            \
  /* ---- r1cs constraints ---- */                                             \
  Constraint* PFX##_r1cs_constraint_create(LinComb* a, LinComb* b,             \
                                           LinComb* c) {                       \
    return new Constraint{*a, *b, *c, false};                                  \
  }                                                                            \
  void PFX##_r1cs_constraint_delete(Constraint* c) { delete c; }               \
  void PFX##_r1cs_constraint_set_is_square(Constraint* c, bool b) {            \
    c->is_square = b;                                                          \
  }                                                                            \
  LinComb* PFX##_r1cs_constraint_a(Constraint* c) { return new LinComb(c->a); }\
  LinComb* PFX##_r1cs_constraint_b(Constraint* c) { return new LinComb(c->b); }\
  LinComb* PFX##_r1cs_constraint_c(Constraint* c) { return new LinComb(c->c); }\
  /* ---- r1cs constraint system ---- */                                       \
  ConstraintSystem* PFX##_r1cs_constraint_system_create() {                    \
    return new ConstraintSystem();                                             \
  }                                                                            \
  void PFX##_r1cs_constraint_system_delete(ConstraintSystem* s) { delete s; }  \
  void PFX##_r1cs_constraint_system_clear(ConstraintSystem* s) {               \
    s->constraints.clear();                                                    \
    s->annotations.clear();                                                    \
  }                                                                            \
  void PFX##_r1cs_constraint_system_add_constraint(ConstraintSystem* s,        \
                                                   Constraint* c) {            \
    s->constraints.push_back(*c);                                              \
    s->annotations.emplace_back();                                             \
  }                                                                            \
  void PFX##_r1cs_constraint_system_add_constraint_with_annotation(            \
      ConstraintSystem* s, Constraint* c, char* a) {                           \
    s->constraints.push_back(*c);                                              \
    s->annotations.emplace_back(a);                                            \
  }                                                                            \
  void PFX##_r1cs_constraint_system_set_primary_input_size(                    \
      ConstraintSystem* s, int n) {                                            \
    s->primary_input_size = (size_t)n;                                         \
  }                                                                            \
  void PFX##_r1cs_constraint_system_set_auxiliary_input_size(                  \
      ConstraintSystem* s, int n) {                                            \
    s->auxiliary_input_size = (size_t)n;                                       \
  }                                                                            \
  size_t PFX##_r1cs_constraint_system_get_primary_input_size(                  \
      ConstraintSystem* s) {                                                   \
    return s->primary_input_size;                                              \
  }                                                                            \
  size_t PFX##_r1cs_constraint_system_get_auxiliary_input_size(                \
      ConstraintSystem* s) {                                                   \
    return s->auxiliary_input_size;                                            \
  }                                                                            \
  size_t PFX##_r1cs_constraint_system_num_constraints(ConstraintSystem* s) {   \
    return s->constraints.size();                                              \
  }                                                                            \
  void PFX##_r1cs_constraint_system_report_statistics(ConstraintSystem* s) {   \
    std::printf("constraints: %zu, primary: %zu, auxiliary: %zu\n",            \
                s->constraints.size(), s->primary_input_size,                  \
                s->auxiliary_input_size);                                      \
  }                                                                            \
  bool PFX##_r1cs_constraint_system_check(ConstraintSystem* s) {               \
    size_t total = s->num_variables();                                         \
    for (const Constraint& c : s->constraints) {                               \
      LinComb a = c.a, b = c.b, cc = c.c;                                      \
      if (!PFX##_linear_combination_check(total, &a)) return false;            \
      if (!PFX##_linear_combination_check(total, &b)) return false;            \
      if (!PFX##_linear_combination_check(total, &cc)) return false;           \
    }                                                                          \
    return true;                                                               \
  }                                                                            \
  bool PFX##_r1cs_constraint_system_is_satisfied(ConstraintSystem* s,          \
                                                 FieldVector* primary,         \
                                                 FieldVector* aux) {           \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    return cs_is_satisfied(CTX.Fr, *s, *primary, *aux);                        \
  }                                                                            \
  void PFX##_r1cs_constraint_system_iter(                                      \
      ConstraintSystem* s, void (*f)(const Constraint*)) {                     \
    for (const Constraint& c : s->constraints) f(&c);                          \
  }                                                                            \
  std::string* PFX##_r1cs_constraint_system_digest(ConstraintSystem* s) {      \
    md5::Ctx ctx;                                                              \
    for (const Constraint& c : s->constraints) {                               \
      for (const LinComb* lc : {&c.a, &c.b, &c.c}) {                           \
        for (const LinTerm& t : lc->terms) {                                   \
          size_t index = t.index;                                              \
          Big canon;                                                           \
          field_from_mont(CTX.Fr, canon, t.coeff);                             \
          md5::update(ctx, &index, sizeof index);                              \
          md5::update(ctx, canon.v, sizeof canon.v);                           \
        }                                                                      \
      }                                                                        \
    }                                                                          \
    auto* out = new std::string(16, '\0');                                     \
    md5::final(ctx, (unsigned char*)out->data());                              \
    return out;                                                                \
  }                                                                            \
  /* ---- protoboard ---- */                                                   \
  Protoboard* PFX##_protoboard_create() {                                      \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    return new Protoboard(&CTX.Fr);                                            \
  }                                                                            \
  void PFX##_protoboard_delete(Protoboard* pb) { delete pb; }                  \
  void PFX##_protoboard_set_input_sizes(Protoboard* pb, int n) {               \
    pb->input_sizes = (size_t)n;                                               \
    pb->cs.primary_input_size = (size_t)n;                                     \
  }                                                                            \
  int PFX##_protoboard_num_variables(Protoboard* pb) {                         \
    return (int)pb->num_variables();                                           \
  }                                                                            \
  Var* PFX##_protoboard_allocate_variable(Protoboard* pb) {                    \
    pb->values.push_back(Big{});                                               \
    return new Var{pb->values.size() - 1};                                     \
  }                                                                            \
  VarArray* PFX##_protoboard_allocate_variable_array(Protoboard* pb, int n) {  \
    auto* arr = new VarArray();                                                \
    for (int i = 0; i < n; ++i) {                                              \
      pb->values.push_back(Big{});                                             \
      arr->indices.push_back(pb->values.size() - 1);                           \
    }                                                                          \
    return arr;                                                                \
  }                                                                            \
  Var* PFX##_protoboard_variable_of_int(int i) { return new Var{(size_t)i}; }  \
  void PFX##_protoboard_variable_delete(Var* v) { delete v; }                  \
  int PFX##_protoboard_variable_index(Var* v) { return (int)v->index; }        \
  VarArray* PFX##_protoboard_variable_array_create() {                         \
    return new VarArray();                                                     \
  }                                                                            \
  void PFX##_protoboard_variable_array_delete(VarArray* a) { delete a; }       \
  void PFX##_protoboard_variable_array_emplace_back(VarArray* a, Var* v) {     \
    a->indices.push_back(v->index);                                            \
  }                                                                            \
  Var* PFX##_protoboard_variable_array_get(VarArray* a, int i) {               \
    return new Var{a->indices[i]};                                             \
  }                                                                            \
  void PFX##_protoboard_set_variable(Protoboard* pb, Var* x, Big* y) {         \
    pb->values[x->index] = *y;                                                 \
  }                                                                            \
  Big* PFX##_protoboard_get_variable(Protoboard* pb, Var* x) {                 \
    return new Big(pb->values[x->index]);                                      \
  }                                                                            \
  FieldVector* PFX##_protoboard_auxiliary_input(Protoboard* pb) {              \
    auto* out = new FieldVector();                                             \
    for (size_t i = pb->input_sizes + 1; i < pb->values.size(); ++i)           \
      out->push_back(pb->values[i]);                                           \
    return out;                                                                \
  }                                                                            \
  FieldVector* PFX##_protoboard_primary_input(Protoboard* pb) {                \
    auto* out = new FieldVector();                                             \
    for (size_t i = 1; i <= pb->input_sizes && i < pb->values.size(); ++i)     \
      out->push_back(pb->values[i]);                                           \
    return out;                                                                \
  }                                                                            \
  void PFX##_protoboard_augment_variable_annotation(Protoboard* pb, Var* v,    \
                                                    char* ann) {               \
    (void)pb;                                                                  \
    (void)v;                                                                   \
    (void)ann; /* annotations tracked per constraint only */                   \
  }                                                                            \
  void PFX##_protoboard_add_r1cs_constraint(Protoboard* pb, Constraint* c) {   \
    pb->cs.constraints.push_back(*c);                                          \
    pb->cs.annotations.emplace_back();                                         \
    pb->cs.auxiliary_input_size =                                              \
        pb->num_variables() - pb->input_sizes;                                 \
  }                                                                            \
  ConstraintSystem* PFX##_protoboard_constraint_system(Protoboard* pb) {       \
    auto* s = new ConstraintSystem(pb->cs);                                    \
    s->primary_input_size = pb->input_sizes;                                   \
    s->auxiliary_input_size = pb->num_variables() - pb->input_sizes;           \
    return s;                                                                  \
  }                                                                            \
  /* renumber-and-append (caml_mnt4753.cpp:79-139): substitute the */          \
  /* first |changes| variables by linear combinations, shift the rest */       \
  void PFX##_protoboard_renumber_and_append_constraints(                       \
      Protoboard* pb, ConstraintSystem* target, LcVector* changes,             \
      int aux_shift) {                                                         \
    ctx_init(CTX, R_LIMBS, Q_LIMBS);                                           \
    auto renumber = [&](const LinComb& lc) {                                   \
      LinComb result;                                                          \
      for (const LinTerm& term : lc.terms) {                                   \
        long term_index = (long)term.index - 1;                                \
        if (term_index >= 0) {                                                 \
          if (term_index < (long)changes->size()) {                            \
            const LinComb& subst = (*changes)[term_index];                     \
            for (const LinTerm& st : subst.terms) {                            \
              Big nc;                                                          \
              field_mul(CTX.Fr, nc, term.coeff, st.coeff);                     \
              result.terms.push_back(LinTerm{st.index, nc});                   \
            }                                                                  \
          } else {                                                             \
            result.terms.push_back(                                            \
                LinTerm{term.index + (size_t)aux_shift, term.coeff});          \
          }                                                                    \
        } else {                                                               \
          result.terms.push_back(term);                                        \
        }                                                                      \
      }                                                                        \
      return result;                                                           \
    };                                                                         \
    for (const Constraint& c : pb->cs.constraints) {                           \
      Constraint nc;                                                           \
      nc.a = renumber(c.a);                                                    \
      nc.b = renumber(c.b);                                                    \
      nc.c = renumber(c.c);                                                    \
      nc.is_square = c.is_square;                                              \
      target->constraints.push_back(std::move(nc));                            \
      target->annotations.emplace_back();                                      \
    }                                                                          \
  }                                                                            \
  /* ---- misc vectors ---- */                                                 \
  int PFX##_long_vector_length(LongVector* v) { return (int)v->size(); }       \
  long PFX##_long_vector_get(LongVector* v, int i) { return (*v)[i]; }         \
  void PFX##_long_vector_delete(LongVector* v) { delete v; }                   \
  /* ---- strings (digest results) ---- */                                     \
  int PFX##_string_length(std::string* s) { return (int)s->size(); }           \
  const char* PFX##_string_data(std::string* s) { return s->data(); }          \
  void PFX##_string_delete(std::string* s) { delete s; }                       \
  std::string* PFX##_string_of_bytes(const char* p, int len) {                 \
    return new std::string(p, (size_t)len);                                    \
  }                                                                            \
  /* ---- keypair/proof string serialization (caml_mnt4753.cpp:644-693)        \
     The pk/vk/proof handles are opaque byte blobs in libsnark's                \
     iostream layout (io/caml_serialization.py encodes/decodes them;           \
     the device prover owns the actual key material).  to_string /             \
     of_string round the same ABI shape as the reference. ---- */              \
  KeyBlob* PFX##_proving_key_of_string(std::string* s) {                       \
    return new KeyBlob{*s};                                                    \
  }                                                                            \
  std::string* PFX##_proving_key_to_string(KeyBlob* k) {                       \
    return new std::string(k->data);                                           \
  }                                                                            \
  void PFX##_proving_key_delete(KeyBlob* k) { delete k; }                      \
  KeyBlob* PFX##_verification_key_of_string(std::string* s) {                  \
    return new KeyBlob{*s};                                                    \
  }                                                                            \
  std::string* PFX##_verification_key_to_string(KeyBlob* k) {                  \
    return new std::string(k->data);                                           \
  }                                                                            \
  void PFX##_verification_key_delete(KeyBlob* k) { delete k; }                 \
  int PFX##_verification_key_size_in_bits(KeyBlob* k) {                        \
    return (int)(k->data.size() * 8);                                          \
  }                                                                            \
  KeyBlob* PFX##_proof_of_string(std::string* s) { return new KeyBlob{*s}; }   \
  std::string* PFX##_proof_to_string(KeyBlob* k) {                             \
    return new std::string(k->data);                                           \
  }                                                                            \
  void PFX##_proof_delete(KeyBlob* k) { delete k; }                            \
  } /* extern "C" */

static const u64 MNT6_R_LIMBS[NL] = {
    0x5E9063DE245E8001ULL, 0xE39D54522CDD119FULL, 0x638810719AC425F0ULL,
    0x685ACCE9767254A4ULL, 0xB80F0DA5CB537E38ULL, 0xB117E776F218059DULL,
    0x99D124D9A15AF79DULL, 0x07FDB925E8A0ED8DULL, 0x5EB7E8F96C97D873ULL,
    0xB7F997505B8FAFEDULL, 0x10229022EEE2CDADULL, 0x01C4C62D92C411ULL};
static const u64 MNT6_Q_LIMBS[NL] = {
    0xD90776E240000001ULL, 0x4EA099170FA13A4FULL, 0xD6C381BC3F005797ULL,
    0xB9DFF97634993AA4ULL, 0x3EEBCA9429212636ULL, 0xB26C5C28C859A99BULL,
    0x99D124D9A15AF79DULL, 0x07FDB925E8A0ED8DULL, 0x5EB7E8F96C97D873ULL,
    0xB7F997505B8FAFEDULL, 0x10229022EEE2CDADULL, 0x01C4C62D92C411ULL};

DEFINE_CAML_API(camlsnark_mnt4753, g_mnt4, MNT4_R_LIMBS, MNT4_Q_LIMBS)
DEFINE_CAML_API(camlsnark_mnt6753, g_mnt6, MNT6_R_LIMBS, MNT6_Q_LIMBS)
