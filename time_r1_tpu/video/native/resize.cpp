// Banded separable bicubic-antialias resize (host hot path of the video
// pipeline). Tap weights/starts come from Python (video/resize.py
// resize_taps — the same values as the dense torchvision-semantics matrix),
// so this computes the identical float32 single-rounding sum with ~2·support
// terms per output instead of a dense in_size-wide contraction. The eval
// host is FLOP/bandwidth-poor (1 vCPU); dense BLAS or numpy banded passes
// are 2-10× slower than this cache-resident per-frame loop.
//
// Pass order matches video/resize._resize_device: vertical (H) first, then
// horizontal (W), one final round-half-even (nearbyint, default FE mode —
// numpy/jax round semantics) + clip to uint8.
//
// Built on first use by video/resize.py with g++ -O3 (no dependencies).

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" int t1_resize_frames(
    const uint8_t* in, int64_t T, int64_t H, int64_t W, int64_t C,
    uint8_t* out, int64_t OH, int64_t OW,
    const int32_t* starts_h, const float* taps_h, int64_t Kh,
    const int32_t* starts_w, const float* taps_w, int64_t Kw) {
  const int64_t WC = W * C;
  std::vector<float> tmp(static_cast<size_t>(OH) * WC);  // one frame's h-pass
  std::vector<float> acc(static_cast<size_t>(C));
  for (int64_t t = 0; t < T; ++t) {
    const uint8_t* fin = in + t * H * WC;
    for (int64_t o = 0; o < OH; ++o) {  // vertical pass
      float* row = tmp.data() + o * WC;
      for (int64_t j = 0; j < WC; ++j) row[j] = 0.f;
      for (int64_t k = 0; k < Kh; ++k) {
        const float w = taps_h[o * Kh + k];
        if (w == 0.f) continue;  // zero-padded band edge: exact no-op
        const uint8_t* src = fin + static_cast<int64_t>(starts_h[o] + k) * WC;
        for (int64_t j = 0; j < WC; ++j) row[j] += w * static_cast<float>(src[j]);
      }
    }
    uint8_t* fout = out + t * OH * OW * C;
    for (int64_t o = 0; o < OH; ++o) {  // horizontal pass + round/clip/store
      const float* row = tmp.data() + o * WC;
      uint8_t* orow = fout + o * OW * C;
      for (int64_t p = 0; p < OW; ++p) {
        for (int64_t c = 0; c < C; ++c) acc[c] = 0.f;
        for (int64_t k = 0; k < Kw; ++k) {
          const float w = taps_w[p * Kw + k];
          if (w == 0.f) continue;
          const float* src = row + static_cast<int64_t>(starts_w[p] + k) * C;
          for (int64_t c = 0; c < C; ++c) acc[c] += w * src[c];
        }
        for (int64_t c = 0; c < C; ++c) {
          float v = nearbyintf(acc[c]);
          v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
          orow[p * C + c] = static_cast<uint8_t>(v);
        }
      }
    }
  }
  return 0;
}
