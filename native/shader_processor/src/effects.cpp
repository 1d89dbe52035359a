#include "effects.h"

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

inline uint8_t clamp_u8(double v) {
  return static_cast<uint8_t>(std::min(255.0, std::max(0.0, v)));
}

inline double param(const Params& p, const std::string& k, double dflt) {
  auto it = p.find(k);
  return it == p.end() ? dflt : it->second;
}

// depth sample in [0, 1]; out-of-range coords clamp to edge.
inline double depth_at(const Image& d, int x, int y) {
  x = std::min(std::max(x, 0), d.width - 1);
  y = std::min(std::max(y, 0), d.height - 1);
  return d.row(y)[x * d.channels] / 255.0;
}

Image fx_passthrough(const Image& rgb, const Image&, const Params&) { return rgb; }

// Toon: GLSL semantics from the reference's depth-aware toon shader
// (reference: shader_processor/build/shaders/toon.glsl:10-30, embedded at
// src/shader_system.py:75-104): color = floor(c * levels) / levels, edge =
// step(threshold, |d - d_right| + |d - d_bottom|), color *= (1 - edge).
Image fx_toon(const Image& rgb, const Image& depth, const Params& p) {
  double levels = param(p, "levels", 4.0);
  double edge_threshold = param(p, "edge_threshold", 0.1);
  Image out = rgb;
  for (int y = 0; y < rgb.height; ++y) {
    const uint8_t* src = rgb.row(y);
    uint8_t* dst = out.row(y);
    for (int x = 0; x < rgb.width; ++x) {
      double edge = 0.0;
      if (!depth.empty()) {
        double d = depth_at(depth, x, y);
        double dr = depth_at(depth, x + 1, y);
        double db = depth_at(depth, x, y + 1);
        edge = (std::fabs(d - dr) + std::fabs(d - db)) >= edge_threshold ? 1.0 : 0.0;
      }
      for (int c = 0; c < 3; ++c) {
        double v = src[x * 3 + c] / 255.0;
        v = std::floor(v * levels) / levels;
        v *= (1.0 - edge);
        dst[x * 3 + c] = clamp_u8(v * 255.0);
      }
    }
  }
  return out;
}

// Fog: the reference PostProcessor formula (src/post_processor.py:479-492):
// adj = clip((d - start) / (1 - start), 0, 1) ^ exponent * visibility;
// out = rgb * adj + fog_color * (1 - adj).
Image fx_fog(const Image& rgb, const Image& depth, const Params& p) {
  double start = param(p, "fog_start", 0.1);
  double expo = param(p, "fog_exponent", 3.0);
  double vis = param(p, "fog_visibility", 0.3);
  double fr = param(p, "fog_color_r", 255.0);
  double fg = param(p, "fog_color_g", 255.0);
  double fb = param(p, "fog_color_b", 255.0);
  Image out = rgb;
  for (int y = 0; y < rgb.height; ++y) {
    const uint8_t* src = rgb.row(y);
    uint8_t* dst = out.row(y);
    for (int x = 0; x < rgb.width; ++x) {
      double adj;
      if (depth.empty()) {
        adj = 0.05;  // uniform heavy fog fallback (src/post_processor.py:465-470)
      } else {
        double d = depth_at(depth, x, y);
        adj = std::min(std::max((d - start) / (1.0 - start), 0.0), 1.0);
        adj = std::pow(adj, expo) * vis;
      }
      double fog[3] = {fr, fg, fb};
      for (int c = 0; c < 3; ++c)
        dst[x * 3 + c] = clamp_u8(src[x * 3 + c] * adj + fog[c] * (1.0 - adj));
    }
  }
  return out;
}

// Sepia: 3x3 color matrix (src/post_processor.py:133-137).
Image fx_sepia(const Image& rgb, const Image&, const Params&) {
  static const double m[3][3] = {{0.393, 0.769, 0.189},
                                 {0.349, 0.686, 0.168},
                                 {0.272, 0.534, 0.131}};
  Image out = rgb;
  for (int y = 0; y < rgb.height; ++y) {
    const uint8_t* src = rgb.row(y);
    uint8_t* dst = out.row(y);
    for (int x = 0; x < rgb.width; ++x) {
      double r = src[x * 3], g = src[x * 3 + 1], b = src[x * 3 + 2];
      for (int c = 0; c < 3; ++c)
        dst[x * 3 + c] = clamp_u8(m[c][0] * r + m[c][1] * g + m[c][2] * b);
    }
  }
  return out;
}

// Vignette: radial falloff normalized by the half-diagonal
// (src/post_processor.py:163-186).
Image fx_vignette(const Image& rgb, const Image&, const Params& p) {
  double strength = param(p, "vignette_strength", 0.5);
  int cy = rgb.height / 2, cx = rgb.width / 2;
  double max_dist = std::sqrt(double(cx) * cx + double(cy) * cy);
  Image out = rgb;
  for (int y = 0; y < rgb.height; ++y) {
    const uint8_t* src = rgb.row(y);
    uint8_t* dst = out.row(y);
    for (int x = 0; x < rgb.width; ++x) {
      double dist = std::sqrt(double(x - cx) * (x - cx) + double(y - cy) * (y - cy))
                    / max_dist;
      double v = std::min(std::max(1.0 - dist * strength, 0.0), 1.0);
      for (int c = 0; c < 3; ++c) dst[x * 3 + c] = clamp_u8(src[x * 3 + c] * v);
    }
  }
  return out;
}

// Posterize: per-channel quantization (src/post_processor.py:304-306).
Image fx_posterize(const Image& rgb, const Image&, const Params& p) {
  double levels = param(p, "levels", 4.0);
  Image out = rgb;
  for (size_t i = 0; i < rgb.data.size(); ++i) {
    double v = rgb.data[i] / 255.0;
    out.data[i] = clamp_u8(std::floor(v * levels) / levels * 255.0);
  }
  return out;
}

Image fx_grayscale(const Image& rgb, const Image&, const Params&) {
  Image out = rgb;
  for (int y = 0; y < rgb.height; ++y) {
    const uint8_t* src = rgb.row(y);
    uint8_t* dst = out.row(y);
    for (int x = 0; x < rgb.width; ++x) {
      double g = 0.299 * src[x * 3] + 0.587 * src[x * 3 + 1] + 0.114 * src[x * 3 + 2];
      dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = clamp_u8(g);
    }
  }
  return out;
}

Image fx_invert(const Image& rgb, const Image&, const Params&) {
  Image out = rgb;
  for (size_t i = 0; i < rgb.data.size(); ++i) out.data[i] = 255 - rgb.data[i];
  return out;
}

// ---------------------------------------------------------------------------
// Float image-op layer for the compound effects.  Semantics mirror the
// framework's jitted fx path (danerf_tpu/fx/imageops.py), which itself
// re-derives the OpenCV calls of the reference PostProcessor
// (reference: src/post_processor.py) — reflect-101 borders, cv2's
// sigma-from-ksize Gaussian rule, cv2 uint8 HSV conventions — so the native
// CLI and the on-device path produce matching pixels (tests/test_native.py).
// ---------------------------------------------------------------------------

struct FImg {
  int w = 0, h = 0, c = 0;
  std::vector<float> v;  // row-major interleaved
  FImg() = default;
  FImg(int w_, int h_, int c_) : w(w_), h(h_), c(c_), v(size_t(w_) * h_ * c_, 0.f) {}
  float& at(int y, int x, int ch) { return v[(size_t(y) * w + x) * c + ch]; }
  float at(int y, int x, int ch) const { return v[(size_t(y) * w + x) * c + ch]; }
};

FImg to_f(const Image& img) {  // u8 -> float, values stay in [0, 255]
  FImg f(img.width, img.height, img.channels);
  for (size_t i = 0; i < img.data.size(); ++i) f.v[i] = float(img.data[i]);
  return f;
}

FImg depth_f(const Image& d) {  // gray u8 -> float in [0, 1], first channel
  FImg f(d.width, d.height, 1);
  for (int y = 0; y < d.height; ++y)
    for (int x = 0; x < d.width; ++x) f.at(y, x, 0) = d.row(y)[x * d.channels] / 255.f;
  return f;
}

Image to_u8(const FImg& f) {
  Image img;
  img.width = f.w;
  img.height = f.h;
  img.channels = f.c;
  img.data.resize(f.v.size());
  for (size_t i = 0; i < f.v.size(); ++i) img.data[i] = clamp_u8(f.v[i]);
  return img;
}

// cv2 BORDER_REFLECT_101: index -1 -> 1, n -> n-2 (edge not repeated).
inline int reflect101(int i, int n) {
  if (n == 1) return 0;
  int period = 2 * (n - 1);
  i = ((i % period) + period) % period;
  return i < n ? i : period - i;
}

// Separable 1-D convolution along x or y with reflect-101 borders.
FImg conv1d(const FImg& img, const std::vector<float>& k, bool horizontal) {
  int r = int(k.size()) / 2;
  FImg out(img.w, img.h, img.c);
  for (int y = 0; y < img.h; ++y)
    for (int x = 0; x < img.w; ++x)
      for (int ch = 0; ch < img.c; ++ch) {
        double acc = 0.0;
        for (int t = -r; t <= r; ++t) {
          int xs = horizontal ? reflect101(x + t, img.w) : x;
          int ys = horizontal ? y : reflect101(y + t, img.h);
          acc += k[t + r] * img.at(ys, xs, ch);
        }
        out.at(y, x, ch) = float(acc);
      }
  return out;
}

// cv2.getGaussianKernel: sigma<=0 => 0.3*((ksize-1)*0.5 - 1) + 0.8.
std::vector<float> gaussian_kernel1d(int ksize, double sigma) {
  if (sigma <= 0) sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8;
  std::vector<float> k(ksize);
  double sum = 0;
  for (int i = 0; i < ksize; ++i) {
    double t = i - (ksize - 1) / 2.0;
    k[i] = float(std::exp(-t * t / (2 * sigma * sigma)));
    sum += k[i];
  }
  for (auto& x : k) x = float(x / sum);
  return k;
}

FImg gaussian_blur(const FImg& img, int ksize, double sigma = 0.0) {
  auto k = gaussian_kernel1d(ksize, sigma);
  return conv1d(conv1d(img, k, false), k, true);
}

// Generic 3x3 correlation with reflect-101 borders (single channel).
FImg conv3x3(const FImg& img, const float k[3][3]) {
  FImg out(img.w, img.h, 1);
  for (int y = 0; y < img.h; ++y)
    for (int x = 0; x < img.w; ++x) {
      double acc = 0.0;
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx)
          acc += k[dy + 1][dx + 1] *
                 img.at(reflect101(y + dy, img.h), reflect101(x + dx, img.w), 0);
      out.at(y, x, 0) = float(acc);
    }
  return out;
}

const float SOBEL_X[3][3] = {{-1, 0, 1}, {-2, 0, 2}, {-1, 0, 1}};
const float SOBEL_Y[3][3] = {{-1, -2, -1}, {0, 0, 0}, {1, 2, 1}};
const float LAPLACIAN[3][3] = {{0, 1, 0}, {1, -4, 1}, {0, 1, 0}};

FImg sobel_magnitude(const FImg& gray) {
  FImg gx = conv3x3(gray, SOBEL_X), gy = conv3x3(gray, SOBEL_Y);
  FImg out(gray.w, gray.h, 1);
  for (size_t i = 0; i < out.v.size(); ++i)
    out.v[i] = std::sqrt(gx.v[i] * gx.v[i] + gy.v[i] * gy.v[i]);
  return out;
}

// 3x3 max dilation; edge pixels take the max of available neighbors.
FImg dilate3(const FImg& m) {
  FImg out(m.w, m.h, 1);
  for (int y = 0; y < m.h; ++y)
    for (int x = 0; x < m.w; ++x) {
      float mx = -1e30f;
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          int yy = y + dy, xx = x + dx;
          if (yy >= 0 && yy < m.h && xx >= 0 && xx < m.w)
            mx = std::max(mx, m.at(yy, xx, 0));
        }
      out.at(y, x, 0) = mx;
    }
  return out;
}

FImg rgb_to_gray(const FImg& img) {  // cv2 RGB2GRAY weights
  FImg g(img.w, img.h, 1);
  for (int y = 0; y < img.h; ++y)
    for (int x = 0; x < img.w; ++x)
      g.at(y, x, 0) = 0.299f * img.at(y, x, 0) + 0.587f * img.at(y, x, 1) +
                      0.114f * img.at(y, x, 2);
  return g;
}

// cv2 uint8 HSV conventions: H in [0, 180), S/V in [0, 255].
void rgb_to_hsv_u8(float r, float g, float b, float& h, float& s, float& v) {
  v = std::max(r, std::max(g, b));
  float mn = std::min(r, std::min(g, b));
  float diff = v - mn;
  if (diff == 0.f) {
    h = 0.f;
  } else if (v == r) {
    h = 60.f * (g - b) / diff;
  } else if (v == g) {
    h = 120.f + 60.f * (b - r) / diff;
  } else {
    h = 240.f + 60.f * (r - g) / diff;
  }
  if (h < 0) h += 360.f;
  h *= 0.5f;  // cv2 packs H/2 into u8
  s = (v == 0.f) ? 0.f : 255.f * diff / v;
}

void hsv_to_rgb_u8(float h, float s, float v, float& r, float& g, float& b) {
  h *= 2.f;  // back to degrees
  s /= 255.f;
  float c = v * s;
  float hp = h / 60.f;
  float xval = c * (1.f - std::fabs(std::fmod(hp, 2.f) - 1.f));
  float m = v - c;
  int idx = int(std::floor(hp)) % 6;
  if (idx < 0) idx += 6;
  float rr = 0, gg = 0, bb = 0;
  switch (idx) {
    case 0: rr = c; gg = xval; break;
    case 1: rr = xval; gg = c; break;
    case 2: gg = c; bb = xval; break;
    case 3: gg = xval; bb = c; break;
    case 4: rr = xval; bb = c; break;
    case 5: rr = c; bb = xval; break;
  }
  r = rr + m;
  g = gg + m;
  b = bb + m;
}

// cv2.equalizeHist on a float image holding u8 values.
FImg equalize_hist_u8(const FImg& gray) {
  double hist[256] = {0};
  for (float x : gray.v) {
    int g = int(std::lround(std::min(255.f, std::max(0.f, x))));
    hist[g] += 1.0;
  }
  double cdf[256], run = 0;
  for (int i = 0; i < 256; ++i) {
    run += hist[i];
    cdf[i] = run;
  }
  double nz_min = 0;
  for (int i = 0; i < 256; ++i)
    if (hist[i] > 0) {
      nz_min = cdf[i];
      break;
    }
  double total = double(gray.v.size());
  double denom = std::max(total - nz_min, 1.0);
  float lut[256];
  for (int i = 0; i < 256; ++i)
    lut[i] = float(std::min(255.0, std::max(0.0, std::round((cdf[i] - nz_min) / denom * 255.0))));
  FImg out(gray.w, gray.h, 1);
  for (size_t i = 0; i < gray.v.size(); ++i) {
    int g = int(std::lround(std::min(255.f, std::max(0.f, gray.v[i]))));
    out.v[i] = lut[g];
  }
  return out;
}

// Simplified Canny matching imageops.canny_simple: Gaussian 5x5 -> Sobel ->
// non-max suppression -> double threshold with one-pass hysteresis.
FImg canny_simple(const FImg& gray_u8, float low, float high) {
  FImg g = gaussian_blur(gray_u8, 5);
  FImg gx = conv3x3(g, SOBEL_X), gy = conv3x3(g, SOBEL_Y);
  int w = gray_u8.w, h = gray_u8.h;
  FImg mag(w, h, 1), thin(w, h, 1);
  std::vector<uint8_t> dir(size_t(w) * h);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float m = std::sqrt(gx.at(y, x, 0) * gx.at(y, x, 0) +
                          gy.at(y, x, 0) * gy.at(y, x, 0));
      mag.at(y, x, 0) = m;
      float ang = std::atan2(gy.at(y, x, 0), gx.at(y, x, 0)) * 180.f / 3.14159265358979f;
      ang = std::fmod(ang, 180.f);
      if (ang < 0) ang += 180.f;
      uint8_t d = 3;  // 135
      if (ang < 22.5f || ang >= 157.5f) d = 0;
      else if (ang < 67.5f) d = 1;   // 45
      else if (ang < 112.5f) d = 2;  // 90
      dir[size_t(y) * w + x] = d;
    }
  auto nb = [&](int y, int x) {  // zero outside (matches the jnp.pad(0) form)
    return (y >= 0 && y < h && x >= 0 && x < w) ? mag.at(y, x, 0) : 0.f;
  };
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      float n1, n2;
      switch (dir[size_t(y) * w + x]) {
        case 0: n1 = nb(y, x + 1); n2 = nb(y, x - 1); break;
        case 1: n1 = nb(y - 1, x + 1); n2 = nb(y + 1, x - 1); break;
        case 2: n1 = nb(y - 1, x); n2 = nb(y + 1, x); break;
        default: n1 = nb(y - 1, x - 1); n2 = nb(y + 1, x + 1); break;
      }
      float m = mag.at(y, x, 0);
      thin.at(y, x, 0) = (m >= n1 && m >= n2) ? m : 0.f;
    }
  FImg strong(w, h, 1);
  for (size_t i = 0; i < thin.v.size(); ++i) strong.v[i] = thin.v[i] >= high ? 1.f : 0.f;
  FImg grown = dilate3(strong);
  FImg edges(w, h, 1);
  for (size_t i = 0; i < thin.v.size(); ++i) {
    bool s = thin.v[i] >= high;
    bool wk = thin.v[i] >= low && !s;
    edges.v[i] = (s || (wk && grown.v[i] > 0.f)) ? 255.f : 0.f;
  }
  return edges;
}

// Linear-interpolation percentile (numpy default), q in [0, 100].
float percentile(std::vector<float> vals, double q) {
  if (vals.empty()) return 0.f;
  std::sort(vals.begin(), vals.end());
  double idx = q / 100.0 * (vals.size() - 1);
  size_t lo = size_t(std::floor(idx)), hi = size_t(std::ceil(idx));
  double t = idx - lo;
  return float(vals[lo] * (1 - t) + vals[hi] * t);
}

// Deterministic normal noise: splitmix64 + Box-Muller, seeded via --param seed.
// (The Python path uses jax.random; parity tests treat noise statistically.)
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed + 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  double normal() {
    double u1 = std::max(uniform(), 1e-12), u2 = uniform();
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * 3.14159265358979 * u2);
  }
  int randint(int lo, int hi) {  // [lo, hi)
    return lo + int(next() % uint64_t(hi - lo));
  }
};

// Radial distance-squared map normalized by (w/2)^2 — the normalization
// several reference effects use (src/post_processor.py night vision / cross
// processing vignette masks; fx/effects.py _radial "w2").
inline float radial_w2(int x, int y, int w, int h) {
  float cx = float(w / 2), cy = float(h / 2);
  float d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy);
  float half = w / 2.0f;
  return d2 / (half * half);
}

// ------------------------------------------------------------ new effects
// Formulas cite the reference PostProcessor (src/post_processor.py) and match
// the framework's fx/effects.py implementations pixel-for-pixel (deterministic
// effects) or statistically (noise-bearing ones).

// Color Boost: HSV saturation scale (src/post_processor.py:119-129).
Image fx_color_boost(const Image& rgb, const Image&, const Params& p) {
  float sat = float(param(p, "color_saturation", 1.5));
  FImg f = to_f(rgb);
  FImg out(f.w, f.h, 3);
  for (int y = 0; y < f.h; ++y)
    for (int x = 0; x < f.w; ++x) {
      float h, s, v;
      rgb_to_hsv_u8(f.at(y, x, 0), f.at(y, x, 1), f.at(y, x, 2), h, s, v);
      s = std::min(255.f, std::max(0.f, s * sat));
      hsv_to_rgb_u8(h, s, v, out.at(y, x, 0), out.at(y, x, 1), out.at(y, x, 2));
    }
  return to_u8(out);
}

// Bloom: Gaussian blur added back (src/post_processor.py:146-159).
Image fx_bloom(const Image& rgb, const Image&, const Params& p) {
  int size = int(param(p, "bloom_size", 15));
  if (size % 2 == 0) size += 1;
  float strength = float(param(p, "bloom_strength", 0.3));
  FImg f = to_f(rgb);
  FImg blur = gaussian_blur(f, size);
  for (size_t i = 0; i < f.v.size(); ++i) f.v[i] += blur.v[i] * strength;
  return to_u8(f);
}

// Night Vision: equalized gray -> green + noise + vignette
// (src/post_processor.py:188-212).
Image fx_night_vision(const Image& rgb, const Image&, const Params& p) {
  FImg f = to_f(rgb);
  FImg green = equalize_hist_u8(rgb_to_gray(f));
  Rng rng(uint64_t(param(p, "seed", 0)));
  FImg out(f.w, f.h, 3);
  for (int y = 0; y < f.h; ++y)
    for (int x = 0; x < f.w; ++x) {
      float g = green.at(y, x, 0) + 15.f * float(rng.normal());
      g = std::min(255.f, std::max(0.f, g));
      float mask = std::min(1.f, std::max(0.f, 2.f - radial_w2(x, y, f.w, f.h) * 1.5f));
      out.at(y, x, 1) = std::floor(g) * mask;  // R and B stay 0
    }
  return to_u8(out);
}

// Film Grain: additive Gaussian noise (src/post_processor.py:214-224).
Image fx_film_grain(const Image& rgb, const Image&, const Params& p) {
  float amount = float(param(p, "film_grain_amount", 0.2));
  Rng rng(uint64_t(param(p, "seed", 0)));
  FImg f = to_f(rgb);
  for (size_t i = 0; i < f.v.size(); ++i)
    f.v[i] += 50.f * float(rng.normal()) * amount;
  return to_u8(f);
}

// Pencil Sketch: gray/inv-blur divide; depth-percentile mask fades background
// (src/post_processor.py:226-269).
Image fx_pencil_sketch(const Image& rgb, const Image& depth, const Params& p) {
  float strength = float(param(p, "sketch_strength", 1.0));
  FImg f = to_f(rgb);
  FImg gray = rgb_to_gray(f);
  FImg inv(gray.w, gray.h, 1);
  for (size_t i = 0; i < gray.v.size(); ++i) inv.v[i] = 255.f - gray.v[i];
  FImg inv_blur = gaussian_blur(inv, 21);
  FImg d = depth.empty() ? FImg() : depth_f(depth);
  float thresh = 0.f;
  if (!d.v.empty()) thresh = percentile(d.v, 70.0);
  FImg out(f.w, f.h, 3);
  for (int y = 0; y < f.h; ++y)
    for (int x = 0; x < f.w; ++x) {
      float ib = 255.f - inv_blur.at(y, x, 0);
      float sk = std::min(255.f, std::max(0.f, gray.at(y, x, 0) /
                                                   std::max(ib, 1e-6f) * 256.f));
      float mask = 1.f;
      if (!d.v.empty())
        mask = 1.f - std::min(1.f, std::max(0.f, (d.at(y, x, 0) - thresh) * 5.f));
      for (int c = 0; c < 3; ++c) {
        float blend = (1.f - strength) * f.at(y, x, c) + strength * sk;
        out.at(y, x, c) = blend * mask + f.at(y, x, c) * (1.f - mask);
      }
    }
  return to_u8(out);
}

// Cross Processing: per-channel gains + contrast + vignette
// (src/post_processor.py:271-298).
Image fx_cross_processing(const Image& rgb, const Image&, const Params&) {
  FImg f = to_f(rgb);
  FImg out(f.w, f.h, 3);
  const float gains[3] = {1.1f, 1.3f, 0.8f};
  for (int y = 0; y < f.h; ++y)
    for (int x = 0; x < f.w; ++x) {
      float mask = std::min(1.f, std::max(0.f, 1.2f - radial_w2(x, y, f.w, f.h) * 0.4f));
      for (int c = 0; c < 3; ++c) {
        float v = std::min(1.f, std::max(0.f, f.at(y, x, c) / 255.f * gains[c]));
        v = (v - 0.5f) * 1.4f + 0.5f;
        v = std::min(255.f, std::max(0.f, v * 255.f));
        // the reference casts to u8 before the vignette multiply (:286-296)
        out.at(y, x, c) = std::floor(v) * mask;
      }
    }
  return to_u8(out);
}

// Neon Glow: Canny on depth (fallback: gray), hue-shifted edges, Gaussian
// glow blend (src/post_processor.py:320-371).
Image fx_neon_glow(const Image& rgb, const Image& depth, const Params& p) {
  float intensity = float(param(p, "neon_glow_intensity", 0.7));
  int radius = int(param(p, "neon_glow_radius", 10));
  FImg f = to_f(rgb);
  FImg src(f.w, f.h, 1);
  if (!depth.empty()) {
    FImg d = depth_f(depth);
    for (size_t i = 0; i < src.v.size(); ++i)
      src.v[i] = std::min(1.f, std::max(0.f, d.v[i])) * 255.f;
  } else {
    src = rgb_to_gray(f);
  }
  FImg edges = dilate3(canny_simple(src, 50.f, 150.f));
  FImg edge_rgb(f.w, f.h, 3);
  for (int y = 0; y < f.h; ++y)
    for (int x = 0; x < f.w; ++x) {
      float h, s, v;
      rgb_to_hsv_u8(f.at(y, x, 0), f.at(y, x, 1), f.at(y, x, 2), h, s, v);
      float hue = std::fmod(h + 120.f, 180.f);
      float e = std::min(edges.at(y, x, 0), 255.f);
      hsv_to_rgb_u8(hue, 255.f, e, edge_rgb.at(y, x, 0), edge_rgb.at(y, x, 1),
                    edge_rgb.at(y, x, 2));
    }
  FImg glow = gaussian_blur(edge_rgb, radius * 2 + 1);
  for (size_t i = 0; i < f.v.size(); ++i)
    f.v[i] = std::min(255.f, std::max(0.f, f.v[i] * 0.7f + glow.v[i] * intensity));
  return to_u8(f);
}

// Hologram: tint + scanlines + noise + depth-edge glow + CRT streaks
// (src/post_processor.py:373-449).  The reference's channel gains (0.8, 1.0,
// 0.2) contradict its own "cyan" comment; the code is authoritative.
Image fx_hologram(const Image& rgb, const Image& depth, const Params& p) {
  int num_lines = int(param(p, "hologram_lines", 50));
  Rng rng(uint64_t(param(p, "seed", 0)));
  FImg f = to_f(rgb);
  int w = f.w, h = f.h;
  // int-truncated scanline bands (src/post_processor.py:385-393)
  std::vector<float> scan(size_t(h), 1.f);
  double lh = double(h) / num_lines;
  for (int i = 0; i < num_lines; ++i) {
    int y0 = int(i * lh);
    int y1 = int(std::min((i + 0.7) * lh, double(h)));
    for (int y = y0; y < y1; ++y) scan[y] *= 0.85f;
  }
  FImg edge(w, h, 1);
  bool have_depth = !depth.empty();
  if (have_depth) {
    FImg d = depth_f(depth);
    edge = sobel_magnitude(d);
    float mx = 1e-12f;
    for (float e : edge.v) mx = std::max(mx, e);
    for (auto& e : edge.v) e /= mx;
  }
  const float tint[3] = {0.8f, 1.0f, 0.2f};
  const float glow_gain[3] = {0.1f, 0.6f, 0.3f};
  FImg out(w, h, 3);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      for (int c = 0; c < 3; ++c) {
        float v = f.at(y, x, c) / 255.f * tint[c] * scan[y];
        if (have_depth) v += edge.at(y, x, 0) * glow_gain[c];
        v += 0.03f * float(rng.normal());
        out.at(y, x, c) = v;
      }
  // 3 random vertical CRT streaks brightened 1.5x (:443-447)
  for (int i = 0; i < 3; ++i) {
    int x0 = rng.randint(0, w);
    int x1 = std::min(x0 + rng.randint(2, 6), w);
    for (int y = 0; y < h; ++y)
      for (int x = x0; x < x1; ++x)
        for (int c = 0; c < 3; ++c) out.at(y, x, c) *= 1.5f;
  }
  for (auto& v : out.v) v = std::min(255.f, std::max(0.f, v * 255.f));
  return to_u8(out);
}

}  // namespace

const std::map<std::string, EffectFn>& effect_registry() {
  // All 13 reference effects (src/post_processor.py:60-493) + Original
  // (passthrough/default/original aliases) + grayscale/invert extras.
  static const std::map<std::string, EffectFn> registry = {
      {"passthrough", fx_passthrough},
      {"default", fx_passthrough},
      {"original", fx_passthrough},
      {"toon", fx_toon},
      {"toon_shader", fx_toon},
      {"color_boost", fx_color_boost},
      {"sepia", fx_sepia},
      {"bloom", fx_bloom},
      {"vignette", fx_vignette},
      {"night_vision", fx_night_vision},
      {"film_grain", fx_film_grain},
      {"pencil_sketch", fx_pencil_sketch},
      {"cross_processing", fx_cross_processing},
      {"posterize", fx_posterize},
      {"neon_glow", fx_neon_glow},
      {"hologram", fx_hologram},
      {"fog", fx_fog},
      {"grayscale", fx_grayscale},
      {"invert", fx_invert},
  };
  return registry;
}

bool has_effect(const std::string& name) {
  return effect_registry().count(name) > 0;
}

Image apply_effect(const std::string& name, const Image& rgb, const Image& depth,
                   const Params& params) {
  auto& reg = effect_registry();
  auto it = reg.find(name);
  if (it == reg.end()) return rgb;  // callers should gate on has_effect()
  return it->second(rgb, depth, params);
}
