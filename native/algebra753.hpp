// Shared 753-bit host algebra core: 12x64-limb bigint + Montgomery field
// (R = 2^768, CIOS multiply — the same generic path as libff
// fp.tcc:159-188 / cuda-fixnum modnum_monty_cios.cu:85-127, re-derived).
// Used by cpu_baseline.cpp (the measured CPU comparator) and
// caml_ffi.cpp (the camlsnark_* C ABI surface).
#pragma once

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef __uint128_t u128;

static constexpr int NL = 12;  // 64-bit limbs per 753-bit element

// ---------------------------------------------------------------------------
// bigint layer
// ---------------------------------------------------------------------------
struct Big {
  u64 v[NL];
};

static inline bool big_is_zero(const Big& a) {
  for (int i = 0; i < NL; ++i)
    if (a.v[i]) return false;
  return true;
}

static inline int big_cmp(const Big& a, const Big& b) {
  for (int i = NL - 1; i >= 0; --i) {
    if (a.v[i] < b.v[i]) return -1;
    if (a.v[i] > b.v[i]) return 1;
  }
  return 0;
}

static inline u64 big_add(Big& r, const Big& a, const Big& b) {
  u128 c = 0;
  for (int i = 0; i < NL; ++i) {
    c += (u128)a.v[i] + b.v[i];
    r.v[i] = (u64)c;
    c >>= 64;
  }
  return (u64)c;
}

static inline u64 big_sub(Big& r, const Big& a, const Big& b) {
  u128 borrow = 0;
  for (int i = 0; i < NL; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  return (u64)borrow;
}

static inline Big big_from_dec(const char* s) {
  Big r{};
  for (const char* p = s; *p; ++p) {
    // r = r*10 + digit
    u128 carry = (u64)(*p - '0');
    for (int i = 0; i < NL; ++i) {
      u128 t = (u128)r.v[i] * 10 + carry;
      r.v[i] = (u64)t;
      carry = t >> 64;
    }
  }
  return r;
}

static inline bool big_test_bit(const Big& a, int i) {
  return (a.v[i / 64] >> (i % 64)) & 1;
}

// ---------------------------------------------------------------------------
// Montgomery field (R = 2^768)
// ---------------------------------------------------------------------------
struct FieldCtx {
  Big p;
  u64 inv;   // -p^{-1} mod 2^64
  Big one;   // R mod p
  Big R2;    // R^2 mod p
};

static inline void field_add(const FieldCtx& F, Big& r, const Big& a, const Big& b) {
  u64 carry = big_add(r, a, b);
  if (carry || big_cmp(r, F.p) >= 0) {
    Big t;
    big_sub(t, r, F.p);
    r = t;
  }
}

static inline void field_sub(const FieldCtx& F, Big& r, const Big& a, const Big& b) {
  Big t;
  if (big_sub(t, a, b)) {
    big_add(r, t, F.p);
  } else {
    r = t;
  }
}

static inline void field_neg(const FieldCtx& F, Big& r, const Big& a) {
  if (big_is_zero(a)) {
    r = a;
  } else {
    big_sub(r, F.p, a);
  }
}

// CIOS Montgomery multiply (fp.tcc:159-188 / modnum_monty_cios.cu:85-127)
static inline void field_mul(const FieldCtx& F, Big& r, const Big& a, const Big& b) {
  u64 t[NL + 2] = {0};
  for (int i = 0; i < NL; ++i) {
    // t += a * b[i]
    u128 c = 0;
    for (int j = 0; j < NL; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[j] * b.v[i] + c;
      t[j] = (u64)s;
      c = s >> 64;
    }
    u128 s = (u128)t[NL] + c;
    t[NL] = (u64)s;
    t[NL + 1] = (u64)(s >> 64);
    // m = t[0] * inv mod 2^64; t += m*p; t >>= 64
    u64 m = t[0] * F.inv;
    c = ((u128)t[0] + (u128)m * F.p.v[0]) >> 64;
    for (int j = 1; j < NL; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * F.p.v[j] + c;
      t[j - 1] = (u64)s2;
      c = s2 >> 64;
    }
    s = (u128)t[NL] + c;
    t[NL - 1] = (u64)s;
    t[NL] = t[NL + 1] + (u64)(s >> 64);
    t[NL + 1] = 0;
  }
  Big out;
  std::memcpy(out.v, t, sizeof(out.v));
  if (t[NL] || big_cmp(out, F.p) >= 0) {
    Big tt;
    big_sub(tt, out, F.p);
    out = tt;
  }
  r = out;
}

static inline void field_sqr(const FieldCtx& F, Big& r, const Big& a) {
  field_mul(F, r, a, a);
}

static inline void field_pow(const FieldCtx& F, Big& r, const Big& a, const Big& e) {
  Big acc = F.one;
  int top = NL * 64 - 1;
  while (top >= 0 && !((e.v[top / 64] >> (top % 64)) & 1)) --top;
  for (int i = top; i >= 0; --i) {
    field_sqr(F, acc, acc);
    if ((e.v[i / 64] >> (i % 64)) & 1) field_mul(F, acc, acc, a);
  }
  r = acc;
}

static inline void field_inv(const FieldCtx& F, Big& r, const Big& a) {
  Big pm2 = F.p;
  // p - 2
  Big two{};
  two.v[0] = 2;
  big_sub(pm2, F.p, two);
  field_pow(F, r, a, pm2);
}

static inline FieldCtx make_ctx(const char* p_dec) {
  FieldCtx F{};
  F.p = big_from_dec(p_dec);
  // inv = -p^{-1} mod 2^64 via Newton iteration
  u64 pinv = F.p.v[0];  // p odd: start x = p (3 bits correct)
  for (int i = 0; i < 6; ++i) pinv *= 2 - F.p.v[0] * pinv;
  F.inv = ~pinv + 1;  // negate
  // one = R mod p: compute 2^768 mod p by repeated doubling of 2^767... simpler:
  // start with t = 1, double 768 times with reduction
  Big t{};
  t.v[0] = 1;
  for (int i = 0; i < 768; ++i) field_add(F, t, t, t);
  // field_add on non-Montgomery values is plain mod-p doubling: OK
  F.one = t;
  // R2 = R * R mod p: double one 768 more times
  Big t2 = t;
  for (int i = 0; i < 768; ++i) field_add(F, t2, t2, t2);
  F.R2 = t2;
  return F;
}

// to/from Montgomery form
static inline void field_to_mont(const FieldCtx& F, Big& r, const Big& a) {
  field_mul(F, r, a, F.R2);
}

static inline void field_from_mont(const FieldCtx& F, Big& r, const Big& a) {
  Big one{};
  one.v[0] = 1;
  field_mul(F, r, a, one);
}
