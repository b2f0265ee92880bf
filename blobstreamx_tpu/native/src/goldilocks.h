// Goldilocks field GF(p), p = 2^64 - 2^32 + 1 — host-side native arithmetic.
//
// Native counterpart of blobstreamx_tpu/field/goldilocks.py (SURVEY.md D1):
// the TPU path uses 2xu32 limbs; the host has a 64x64->128 multiplier, so
// this uses the classic reduction 2^64 = 2^32 - 1 (mod p), 2^96 = -1 (mod p).
#pragma once
#include <cstdint>

namespace gl {

constexpr uint64_t P = 0xFFFFFFFF00000001ULL;
constexpr uint64_t EPSILON = 0xFFFFFFFFULL;  // 2^64 mod p

static inline uint64_t canon(uint64_t x) { return x >= P ? x - P : x; }

static inline uint64_t add(uint64_t a, uint64_t b) {
  uint64_t s = a + b;
  if (s < a) s += EPSILON;  // wrapped past 2^64
  return canon(s);
}

static inline uint64_t sub(uint64_t a, uint64_t b) {
  return a >= b ? a - b : a + (P - b);
}

// reduce a 128-bit product mod p
static inline uint64_t reduce128(unsigned __int128 t) {
  uint64_t lo = (uint64_t)t;
  uint64_t hi = (uint64_t)(t >> 64);
  uint64_t hi_hi = hi >> 32;
  uint64_t hi_lo = hi & EPSILON;
  uint64_t t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= EPSILON;  // borrow
  uint64_t t1 = hi_lo * EPSILON;  // = (hi_lo << 32) - hi_lo, fits u64
  uint64_t r = t0 + t1;
  if (r < t0) r += EPSILON;
  return canon(r);
}

static inline uint64_t mul(uint64_t a, uint64_t b) {
  return reduce128((unsigned __int128)a * b);
}

}  // namespace gl
