// blobstreamx_tpu native runtime kernels (host side).
//
// The reference stack's runtime is native Rust (plonky2 prover/challenger;
// SURVEY.md D2/D5): the challenger duplex, FRI proof-of-work grind, and
// verifier Merkle-path checks all run on the host. Here those run as C++
// (loaded via ctypes, python fallback in ops/poseidon.py): the device
// (TPU) does the batched trace/LDE/tree work, the host does the
// sequential transcript-bound work at native speed.
//
// Poseidon instance parameters (round constants + Cauchy MDS) are the
// framework's own — generated into poseidon_constants.inc from
// ops/poseidon.py by native/build.py, so C++ and python/JAX are one
// instance by construction.

#include <cstdint>
#include <cstring>

#include "goldilocks.h"
#include "poseidon_constants.inc"  // RC[N_ROUNDS][12], MDS[12][12]

namespace {

constexpr int WIDTH = 12;
constexpr int RATE = 8;
constexpr int FULL_ROUNDS = 8;
constexpr int PARTIAL_ROUNDS = 22;
constexpr int N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS;

static inline uint64_t sbox7(uint64_t x) {
  uint64_t x2 = gl::mul(x, x);
  uint64_t x3 = gl::mul(x2, x);
  uint64_t x6 = gl::mul(x3, x3);
  return gl::mul(x6, x);
}

static inline void mds_layer(uint64_t s[WIDTH]) {
  uint64_t out[WIDTH];
  for (int i = 0; i < WIDTH; i++) {
    // accumulate 12 products in 128 bits: each product < p^2 < 2^128/16,
    // so sum of 12 still fits with the running reduction below.
    unsigned __int128 acc = 0;
    for (int j = 0; j < WIDTH; j++) {
      acc += (unsigned __int128)MDS[i][j] * s[j];
      // p^2 ~ 2^127.9; two raw products could overflow 128 bits, so
      // fold the high part eagerly every step via a cheap partial
      // reduction: keep acc < 2^96 by reducing when the top 32 bits set.
      if ((uint64_t)(acc >> 96) != 0) {
        acc = (unsigned __int128)gl::reduce128(acc);
      }
    }
    out[i] = gl::reduce128(acc);
  }
  std::memcpy(s, out, sizeof(out));
}

static inline void permute(uint64_t s[WIDTH]) {
  int r = 0;
  for (; r < FULL_ROUNDS / 2; r++) {
    for (int i = 0; i < WIDTH; i++) s[i] = sbox7(gl::add(s[i], RC[r][i]));
    mds_layer(s);
  }
  for (; r < FULL_ROUNDS / 2 + PARTIAL_ROUNDS; r++) {
    for (int i = 0; i < WIDTH; i++) s[i] = gl::add(s[i], RC[r][i]);
    s[0] = sbox7(s[0]);
    mds_layer(s);
  }
  for (; r < N_ROUNDS; r++) {
    for (int i = 0; i < WIDTH; i++) s[i] = sbox7(gl::add(s[i], RC[r][i]));
    mds_layer(s);
  }
}

}  // namespace

extern "C" {

void bsx_poseidon_permute(uint64_t* state) { permute(state); }

void bsx_poseidon_permute_batch(uint64_t* states, uint64_t n) {
  for (uint64_t k = 0; k < n; k++) permute(states + k * WIDTH);
}

// sponge-hash n field elements (no padding) -> 4-element digest
void bsx_poseidon_hash_no_pad(const uint64_t* in, uint64_t n, uint64_t* out) {
  uint64_t s[WIDTH] = {0};
  for (uint64_t off = 0; off < n; off += RATE) {
    uint64_t c = n - off < RATE ? n - off : RATE;
    for (uint64_t i = 0; i < c; i++) s[i] = in[off + i];
    permute(s);
  }
  std::memcpy(out, s, 4 * sizeof(uint64_t));
}

void bsx_poseidon_two_to_one(const uint64_t* l, const uint64_t* r,
                             uint64_t* out) {
  uint64_t s[WIDTH] = {0};
  std::memcpy(s, l, 4 * sizeof(uint64_t));
  std::memcpy(s + 4, r, 4 * sizeof(uint64_t));
  permute(s);
  std::memcpy(out, s, 4 * sizeof(uint64_t));
}

// FRI proof-of-work grind (proof/fri.py:114-121 semantics): per nonce, fork
// the duplex challenger [state, k pending inputs], absorb the nonce, run one
// permutation and test the top pow_bits of the last rate lane (state[7] —
// challenges pop from the back of state[:RATE]). Returns the first nonce
// whose challenge has pow_bits leading zeros.
uint64_t bsx_grind(const uint64_t* state, const uint64_t* pending,
                   uint64_t n_pending, uint64_t pow_bits) {
  uint64_t s[WIDTH];
  for (uint64_t nonce = 0;; nonce++) {
    std::memcpy(s, state, sizeof(s));
    for (uint64_t i = 0; i < n_pending; i++) s[i] = pending[i];
    s[n_pending] = nonce;
    permute(s);
    if (pow_bits == 0 || (s[RATE - 1] >> (64 - pow_bits)) == 0) return nonce;
  }
}

// hash n rows of w field elements each (leaf layer), then build the
// binary tree for n_levels halvings. layers_out layout: layer 0 digests
// (n*4), then layer 1 (n/2*4), ..., down to the cap layer
// ((n>>n_levels)*4). Caller provides the full buffer. This is the host
// prover's Merkle-cap commitment path (proof/merkle_cap.py) — the batched
// XLA path stays on TPU, where the compiler is fast and the MXU does the
// MDS.
void bsx_merkle_tree(const uint64_t* rows, uint64_t n, uint64_t w,
                     uint64_t n_levels, uint64_t* layers_out) {
  for (uint64_t k = 0; k < n; k++) {
    uint64_t s[WIDTH] = {0};
    const uint64_t* row = rows + k * w;
    for (uint64_t off = 0; off < w; off += RATE) {
      uint64_t c = w - off < RATE ? w - off : RATE;
      for (uint64_t i = 0; i < c; i++) s[i] = row[off + i];
      permute(s);
    }
    std::memcpy(layers_out + k * 4, s, 4 * sizeof(uint64_t));
  }
  uint64_t* prev = layers_out;
  uint64_t prev_n = n;
  for (uint64_t lvl = 0; lvl < n_levels; lvl++) {
    uint64_t* cur = prev + prev_n * 4;
    uint64_t cur_n = prev_n / 2;
    for (uint64_t k = 0; k < cur_n; k++) {
      uint64_t s[WIDTH] = {0};
      std::memcpy(s, prev + (2 * k) * 4, 4 * sizeof(uint64_t));
      std::memcpy(s + 4, prev + (2 * k + 1) * 4, 4 * sizeof(uint64_t));
      permute(s);
      std::memcpy(cur + k * 4, s, 4 * sizeof(uint64_t));
    }
    prev = cur;
    prev_n = cur_n;
  }
}

// verify a Merkle path of two-to-one hashes: digest(4) + siblings(depth*4)
// + index bits (LSB-first: bit set => current node is the right child).
// Writes the resulting root digest (4) to out.
void bsx_merkle_climb(const uint64_t* leaf_digest, const uint64_t* siblings,
                      uint64_t depth, uint64_t index, uint64_t* out) {
  uint64_t cur[4];
  std::memcpy(cur, leaf_digest, sizeof(cur));
  for (uint64_t d = 0; d < depth; d++) {
    const uint64_t* sib = siblings + d * 4;
    uint64_t nxt[4];
    if ((index >> d) & 1) {
      bsx_poseidon_two_to_one(sib, cur, nxt);
    } else {
      bsx_poseidon_two_to_one(cur, sib, nxt);
    }
    std::memcpy(cur, nxt, sizeof(cur));
  }
  std::memcpy(out, cur, sizeof(cur));
}

}  // extern "C"
