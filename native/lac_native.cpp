// Native host runtime for the lac_tpu byte path.
//
// Implements the shift-to-target CDF model + rANS-32/16 coder with EXACTLY
// the arithmetic of the Pallas kernels (ops/pallas_rans.py) and the NumPy
// spec (coder/rans.py): same init, same adaptive-rate schedule, same coder
// renormalization — so host- and TPU-produced containers are bit-identical
// and interchangeable (asserted in tests/test_native.py).
//
// This is the framework's CPU fast path (the reference's only native code
// was the external llama.cpp inference engine; here the native runtime is
// the block coder itself). OpenMP parallelizes across blocks.
//
// Build: g++ -O3 -fopenmp -shared -fPIC -o liblac_native.so lac_native.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int V = 256;

inline int rate_at(int base, int t) {
  return base + (t >= 16) + (t >= 32) + (t >= 64) + (t >= 128);
}

// The model state lives pre-scaled in the coder domain [0, M = 2^pb - V];
// coder cdf boundary of symbol k is st[k] + k (matches models.functional
// and ops/pallas_rans after the pre-scaled-state spec change).
struct Model {
  int32_t st[V];  // st[0] == 0 always; implicit st[V] == M
  void init(int32_t M) {
    for (int k = 0; k < V; k++) st[k] = (int32_t)(((int64_t)k * M) / V);
  }
  void update(int sym, int r, int32_t M) {
    for (int k = 0; k <= sym; k++) st[k] -= st[k] >> r;
    for (int k = sym + 1; k < V; k++) st[k] += (M - st[k]) >> r;
  }
};

inline void interval_of(const Model& m, int sym, int32_t M, int pb,
                        int32_t* lo, int32_t* fr) {
  int32_t l = m.st[sym] + sym;
  int32_t h = (sym + 1 >= V) ? (int32_t)(1 << pb) : (m.st[sym + 1] + sym + 1);
  *lo = l;
  *fr = h - l;
}

}  // namespace

extern "C" {

// Encode one block. words must have capacity n + 2. Returns word count
// (decode order: x_hi, x_lo, then emitted words by ascending position).
int o0c_encode_block(const uint8_t* data, int n, int rate, int pb,
                     uint16_t* words) {
  const int32_t M = (int32_t)((1 << pb) - V);
  std::vector<int32_t> lo(n), fr(n);
  Model m;
  m.init(M);
  for (int t = 0; t < n; t++) {
    interval_of(m, data[t], M, pb, &lo[t], &fr[t]);
    m.update(data[t], rate_at(rate, t), M);
  }
  // reverse-order rANS-32/16
  std::vector<uint16_t> emitted;  // emission order (t descending)
  emitted.reserve(n / 2 + 4);
  uint32_t x = 1u << 16;
  for (int t = n - 1; t >= 0; t--) {
    uint32_t f = (uint32_t)fr[t];
    uint32_t x_max = f << (32 - pb);
    if (x >= x_max) {
      emitted.push_back((uint16_t)(x & 0xFFFF));
      x >>= 16;
    }
    x = ((x / f) << pb) + (x % f) + (uint32_t)lo[t];
  }
  words[0] = (uint16_t)(x >> 16);
  words[1] = (uint16_t)(x & 0xFFFF);
  int nw = 2;
  for (int i = (int)emitted.size() - 1; i >= 0; i--) words[nw++] = emitted[i];
  return nw;
}

// Decode one block of n symbols from decode-ordered words.
void o0c_decode_block(const uint16_t* words, int n, int rate, int pb,
                      uint8_t* out) {
  const int32_t M = (int32_t)((1 << pb) - V);
  const uint32_t mask = (1u << pb) - 1;
  Model m;
  m.init(M);
  uint32_t x = ((uint32_t)words[0] << 16) | words[1];
  int pos = 2;
  for (int t = 0; t < n; t++) {
    int32_t slot = (int32_t)(x & mask);
    // binary search: largest s in [0, V-1] with eff(s) <= slot
    int lo_k = 0, hi_k = V;  // invariant: eff(lo_k) <= slot < eff(hi_k)
    while (hi_k - lo_k > 1) {
      int mid = (lo_k + hi_k) >> 1;
      int32_t eff = m.st[mid] + mid;
      if (eff <= slot)
        lo_k = mid;
      else
        hi_k = mid;
    }
    int s = lo_k;
    int32_t l, f;
    interval_of(m, s, M, pb, &l, &f);
    x = (uint32_t)f * (x >> pb) + (uint32_t)(slot - l);
    if (x < (1u << 16)) x = (x << 16) | words[pos++];
    out[t] = (uint8_t)s;
    m.update(s, rate_at(rate, t), M);
  }
}

// Batched, OpenMP-parallel over blocks. lengths[i] symbols per block;
// words_out is [nblocks, block_size + 2] row-major; nwords_out per block.
void o0c_encode_blocks(const uint8_t* data, const int32_t* offsets,
                       const int32_t* lengths, int nblocks, int cap, int rate,
                       int pb, uint16_t* words_out, int32_t* nwords_out) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < nblocks; i++) {
    nwords_out[i] = o0c_encode_block(data + offsets[i], lengths[i], rate, pb,
                                     words_out + (int64_t)i * cap);
  }
}

void o0c_decode_blocks(const uint16_t* words, const int32_t* lengths,
                       int nblocks, int cap, int rate, int pb,
                       const int32_t* out_offsets, uint8_t* out) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < nblocks; i++) {
    o0c_decode_block(words + (int64_t)i * cap, lengths[i], rate, pb,
                     out + out_offsets[i]);
  }
}

}  // extern "C"
