#include "effects.h"

#include <algorithm>
#include <cmath>

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

}  // namespace

const std::map<std::string, EffectFn>& effect_registry() {
  static const std::map<std::string, EffectFn> registry = {
      {"passthrough", fx_passthrough}, {"default", fx_passthrough},
      {"toon", fx_toon},               {"fog", fx_fog},
      {"sepia", fx_sepia},             {"vignette", fx_vignette},
      {"posterize", fx_posterize},     {"grayscale", fx_grayscale},
      {"invert", fx_invert},
  };
  return registry;
}

Image apply_effect(const std::string& name, const Image& rgb, const Image& depth,
                   const Params& params) {
  auto& reg = effect_registry();
  auto it = reg.find(name);
  if (it == reg.end()) return rgb;
  return it->second(rgb, depth, params);
}
