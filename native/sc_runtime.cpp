// Native runtime for the TPU SNARK-challenge prover: byte-stream <->
// limb-plane repacking and file loaders behind a C ABI.
//
// Role parity with the reference's native harness layer: the raw-fread
// parameter/input loaders in libsnark/main.cpp:50-83 plus the C-like
// opaque facade of libsnark/prover_reference_functions.cpp (the "pImpl"
// wrapper whose whole point is letting a non-C++ driver own the data
// flow).  Python binds these via ctypes (snark_challenge_prover_tpu/
// io/native.py); everything degrades gracefully to the pure-numpy path
// when the shared object is absent.
//
// Wire format (libsnark/serialization.hpp:22-32): one field element =
// 96 bytes of little-endian Montgomery representation (12 x u64).  The
// device layout is uint32 planes of 16-bit limbs, plane-major:
// out[limb * n + elem], 48 limbs per element.
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

constexpr size_t kLimbs = 48;      // 16-bit limbs per element
constexpr size_t kElemBytes = 96;  // 753-bit element, zero-padded to 768

// Repack one element: 96 LE bytes -> 48 uint32 planes with stride n.
inline void repack_one(const uint8_t* src, uint32_t* dst, size_t n) {
  for (size_t l = 0; l < kLimbs; ++l) {
    dst[l * n] = static_cast<uint32_t>(src[2 * l]) |
                 (static_cast<uint32_t>(src[2 * l + 1]) << 8);
  }
}

inline void pack_one(const uint32_t* src, size_t n, uint8_t* dst) {
  for (size_t l = 0; l < kLimbs; ++l) {
    const uint32_t v = src[l * n];
    dst[2 * l] = static_cast<uint8_t>(v & 0xff);
    dst[2 * l + 1] = static_cast<uint8_t>((v >> 8) & 0xff);
  }
}

}  // namespace

extern "C" {

// n_out elements at base, base+byte_stride, ... -> planes out[48 * n_out].
void sc_repack_fq_strided(const uint8_t* base, size_t n_out,
                          size_t byte_stride, uint32_t* out) {
#pragma omp parallel for schedule(static)
  for (long j = 0; j < static_cast<long>(n_out); ++j) {
    repack_one(base + static_cast<size_t>(j) * byte_stride,
               out + static_cast<size_t>(j), n_out);
  }
}

// Contiguous convenience wrapper.
void sc_repack_fq(const uint8_t* buf, size_t n, uint32_t* out) {
  sc_repack_fq_strided(buf, n, kElemBytes, out);
}

// planes[48 * n] -> n contiguous 96-byte little-endian elements.
void sc_pack_fq(const uint32_t* planes, size_t n, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (long j = 0; j < static_cast<long>(n); ++j) {
    pack_one(planes + static_cast<size_t>(j), n,
             out + static_cast<size_t>(j) * kElemBytes);
  }
}

// ---------------------------------------------------------------------------
// Whole-file loaders (libsnark/main.cpp:50-83 layouts).  Two-phase
// protocol: sc_params_header reads {d, m}; the caller allocates plane
// buffers and calls sc_read_params_file once.  Returns 0 on success.
// ---------------------------------------------------------------------------

int sc_params_header(const char* path, uint64_t* d, uint64_t* m) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  const bool ok = std::fread(d, 8, 1, f) == 1 && std::fread(m, 8, 1, f) == 1;
  std::fclose(f);
  return ok ? 0 : 2;
}

// g2_deg = 2 (MNT4753) or 3 (MNT6753).  Buffers, all plane-major uint32:
//   A_x/A_y/B1_x/B1_y: 48*(m+1);  L_x/L_y: 48*(m-1);  H_x/H_y: 48*d;
//   B2_x/B2_y: g2_deg*48*(m+1) with component-major layout
//   [comp][limb][elem] matching numpy (deg, 48, n).
int sc_read_params_file(const char* path, int g2_deg, uint32_t* A_x,
                        uint32_t* A_y, uint32_t* B1_x, uint32_t* B1_y,
                        uint32_t* B2_x, uint32_t* B2_y, uint32_t* L_x,
                        uint32_t* L_y, uint32_t* H_x, uint32_t* H_y) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(fsize));
  if (!buf) {
    std::fclose(f);
    return 3;
  }
  const bool ok = std::fread(buf, 1, fsize, f) == static_cast<size_t>(fsize);
  std::fclose(f);
  if (!ok) {
    std::free(buf);
    return 2;
  }

  // Validate the full layout size up front (before any repack) so a
  // truncated or corrupt file can never cause out-of-bounds reads —
  // same policy as sc_read_input_file below.
  if (fsize < 16) {
    std::free(buf);
    return 4;
  }
  uint64_t d, m;
  std::memcpy(&d, buf, 8);
  std::memcpy(&m, buf + 8, 8);
  const uint8_t* p = buf + 16;

  const size_t n1 = m + 1;
  if (m < 1) {
    std::free(buf);
    return 4;
  }
  const size_t expect =
      16 + (2 * n1                      // A
            + 2 * n1                    // B1
            + 2 * static_cast<size_t>(g2_deg) * n1  // B2
            + 2 * (m - 1)               // L
            + 2 * d) *                  // H
               kElemBytes;
  if (static_cast<size_t>(fsize) != expect) {
    std::free(buf);
    return 4;
  }
  // A: n1 points, interleaved (x, y)
  sc_repack_fq_strided(p, n1, 2 * kElemBytes, A_x);
  sc_repack_fq_strided(p + kElemBytes, n1, 2 * kElemBytes, A_y);
  p += n1 * 2 * kElemBytes;
  // B1
  sc_repack_fq_strided(p, n1, 2 * kElemBytes, B1_x);
  sc_repack_fq_strided(p + kElemBytes, n1, 2 * kElemBytes, B1_y);
  p += n1 * 2 * kElemBytes;
  // B2: per point, g2_deg x-components then g2_deg y-components
  const size_t g2_point = 2 * g2_deg * kElemBytes;
  for (int c = 0; c < g2_deg; ++c) {
    sc_repack_fq_strided(p + c * kElemBytes, n1, g2_point,
                         B2_x + static_cast<size_t>(c) * kLimbs * n1);
    sc_repack_fq_strided(p + (g2_deg + c) * kElemBytes, n1, g2_point,
                         B2_y + static_cast<size_t>(c) * kLimbs * n1);
  }
  p += n1 * g2_point;
  // L: m - 1 points
  sc_repack_fq_strided(p, m - 1, 2 * kElemBytes, L_x);
  sc_repack_fq_strided(p + kElemBytes, m - 1, 2 * kElemBytes, L_y);
  p += (m - 1) * 2 * kElemBytes;
  // H: d points
  sc_repack_fq_strided(p, d, 2 * kElemBytes, H_x);
  sc_repack_fq_strided(p + kElemBytes, d, 2 * kElemBytes, H_y);
  p += d * 2 * kElemBytes;

  const int rc = (p == buf + fsize) ? 0 : 4;  // trailing-byte check
  std::free(buf);
  return rc;
}

// input file: w[m+1], ca[d+1], cb[d+1], cc[d+1], r  (main.cpp:70-83)
int sc_read_input_file(const char* path, uint64_t d, uint64_t m,
                       uint32_t* w, uint32_t* ca, uint32_t* cb, uint32_t* cc,
                       uint32_t* r) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const size_t expect = ((m + 1) + 3 * (d + 1) + 1) * kElemBytes;
  if (static_cast<size_t>(fsize) != expect) {
    std::fclose(f);
    return 4;
  }
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(fsize));
  if (!buf) {
    std::fclose(f);
    return 3;
  }
  const bool ok = std::fread(buf, 1, fsize, f) == static_cast<size_t>(fsize);
  std::fclose(f);
  if (!ok) {
    std::free(buf);
    return 2;
  }
  const uint8_t* p = buf;
  sc_repack_fq(p, m + 1, w);
  p += (m + 1) * kElemBytes;
  sc_repack_fq(p, d + 1, ca);
  p += (d + 1) * kElemBytes;
  sc_repack_fq(p, d + 1, cb);
  p += (d + 1) * kElemBytes;
  sc_repack_fq(p, d + 1, cc);
  p += (d + 1) * kElemBytes;
  sc_repack_fq(p, 1, r);
  std::free(buf);
  return 0;
}

}  // extern "C"
