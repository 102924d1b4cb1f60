// Native host-side data-pipeline kernels for MichiGAN-TPU.
//
// The per-sample noise pyramid (reference base_dataset.py:387-396) is the
// host pipeline's hottest op: ~7 full-resolution bilinear upsamples plus
// Gaussian sampling per sample.  This C++ implementation (counter-based
// splitmix64 RNG + Box-Muller, half-pixel bilinear matching cv2
// INTER_LINEAR) replaces a chain of numpy/cv2 calls with one pass, is
// deterministic in the seed, and has no Python-object overhead.
//
// Build: g++ -O3 -shared -fPIC -o libmichigan_native.so michigan_native.cpp
// Bound via ctypes (michigan_tpu/native/__init__.py); pure fallback exists.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97f4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

inline double uniform01(uint64_t bits) {
  // 53-bit mantissa uniform in (0,1)
  return ((bits >> 11) + 0.5) * (1.0 / 9007199254740992.0);
}

// Fill `n` deterministic N(mu, sigma) samples; one Box-Muller pair yields
// two outputs (sin + cos), halving the transcendental count.
inline void gauss_fill(float* dst, size_t n, uint64_t seed, float mu,
                       float sigma) {
  for (size_t i = 0; i < n; i += 2) {
    const uint64_t a = splitmix64(seed ^ i);
    const uint64_t b = splitmix64(seed ^ (i + 1) ^ 0xA5A5A5A5A5A5A5A5ULL);
    const float u1 = static_cast<float>(uniform01(a));
    const float u2 = static_cast<float>(uniform01(b));
    const float r = std::sqrt(-2.0f * std::log(u1));
    const float t = 6.2831853f * u2;
    dst[i] = mu + sigma * r * std::cos(t);
    if (i + 1 < n) dst[i + 1] = mu + sigma * r * std::sin(t);
  }
}

// Half-pixel bilinear sample (cv2 INTER_LINEAR / torch align_corners=False).
inline float bilinear_at(const float* src, int sh, int sw, int c, int ch,
                         float y, float x) {
  int y0 = static_cast<int>(std::floor(y));
  int x0 = static_cast<int>(std::floor(x));
  float fy = y - y0;
  float fx = x - x0;
  int y1 = y0 + 1;
  int x1 = x0 + 1;
  if (y0 < 0) { y0 = 0; }
  if (x0 < 0) { x0 = 0; }
  if (y1 > sh - 1) { y1 = sh - 1; }
  if (x1 > sw - 1) { x1 = sw - 1; }
  if (y0 > sh - 1) { y0 = sh - 1; }
  if (x0 > sw - 1) { x0 = sw - 1; }
  const float v00 = src[(y0 * sw + x0) * c + ch];
  const float v01 = src[(y0 * sw + x1) * c + ch];
  const float v10 = src[(y1 * sw + x0) * c + ch];
  const float v11 = src[(y1 * sw + x1) * c + ch];
  return v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
         v10 * fy * (1 - fx) + v11 * fy * fx;
}

}  // namespace

extern "C" {

// dst (dh,dw,c) <- bilinear(src (sh,sw,c)), half-pixel mapping.  The x-axis
// interpolation tables are hoisted out of the row loop.
void bilinear_resize_f32(const float* src, int sh, int sw, int c, float* dst,
                         int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> fxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    fxs[x] = fx - x0;
    x0s[x] = x0 < 0 ? 0 : (x0 > sw - 1 ? sw - 1 : x0);
    x1s[x] = x0 + 1 < 0 ? 0 : (x0 + 1 > sw - 1 ? sw - 1 : x0 + 1);
  }
  for (int y = 0; y < dh; ++y) {
    const float fy0 = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy0));
    const float wy = fy0 - y0;
    const int y1 = (y0 + 1 < 0) ? 0 : (y0 + 1 > sh - 1 ? sh - 1 : y0 + 1);
    y0 = y0 < 0 ? 0 : (y0 > sh - 1 ? sh - 1 : y0);
    const float* r0 = src + static_cast<int64_t>(y0) * sw * c;
    const float* r1 = src + static_cast<int64_t>(y1) * sw * c;
    float* drow = dst + static_cast<int64_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const int xa = x0s[x] * c, xb = x1s[x] * c;
      const float wx = fxs[x];
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int ch = 0; ch < c; ++ch) {
        drow[x * c + ch] = r0[xa + ch] * w00 + r0[xb + ch] * w01 +
                           r1[xa + ch] * w10 + r1[xb + ch] * w11;
      }
    }
  }
}

// Multi-octave background noise (reference base_dataset.py:387-396):
// octaves of N(0.5, 0.25) from (h,w) halving down to >=8, each bilinear-
// upsampled to (h,w), equally weighted, normalized.  out is (h, w, 3).
void noise_pyramid(float* out, int height, int width, uint64_t seed) {
  const int64_t total = static_cast<int64_t>(height) * width * 3;
  std::memset(out, 0, total * sizeof(float));
  std::vector<float> octave;
  std::vector<float> up(total);
  int w = width, h = height;
  int n_oct = 0;
  uint64_t oct_idx = 0;
  while (w >= 8 && h >= 8) {
    octave.resize(static_cast<size_t>(h) * w * 3);
    const uint64_t oseed = splitmix64(seed + 0x1000 * (oct_idx + 1));
    gauss_fill(octave.data(), octave.size(), oseed, 0.5f, 0.25f);
    if (h == height && w == width) {
      for (int64_t i = 0; i < total; ++i) out[i] += octave[i];
    } else {
      bilinear_resize_f32(octave.data(), h, w, 3, up.data(), height, width);
      for (int64_t i = 0; i < total; ++i) out[i] += up[i];
    }
    ++n_oct;
    ++oct_idx;
    w /= 2;
    h /= 2;
  }
  if (n_oct > 0) {
    const float inv = 1.0f / n_oct;
    for (int64_t i = 0; i < total; ++i) out[i] *= inv;
  }
}

// Circular-hole rasterization (reference base_dataset.py:335-361 inner
// loop): hole = orient_mask * [dist^2 < rr] + (mask - orient_mask).
void rasterize_hole(const float* mask, const float* orient_mask, int h, int w,
                    int ch_, int cw_, float rr, float* out) {
  for (int y = 0; y < h; ++y) {
    const float dy = static_cast<float>(y - ch_);
    for (int x = 0; x < w; ++x) {
      const float dx = static_cast<float>(x - cw_);
      const float inside = (dy * dy + dx * dx) < rr ? 1.0f : 0.0f;
      const int64_t i = static_cast<int64_t>(y) * w + x;
      out[i] = orient_mask[i] * inside + (mask[i] - orient_mask[i]);
    }
  }
}

}  // extern "C"
