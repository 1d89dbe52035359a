// Depth-aware image effects, CPU implementation.
//
// The reference's native path runs user GLSL fragment shaders on an offscreen
// GL framebuffer (reference: shader_processor/main.cpp:101-148).  This
// environment is headless (no GPU/GL), so the equivalent capability is a
// fixed-function effect library selected by the shader file (see
// shader_parse.h): each effect reproduces the corresponding GLSL/Python
// semantics pixel-for-pixel.
#pragma once

#include <map>
#include <string>
#include <vector>

#include "image.h"

using Params = std::map<std::string, double>;

// depth may be empty; when present it is a gray8 image resized semantics-free
// (caller guarantees matching dims, as the reference pipeline does).
using EffectFn = Image (*)(const Image& rgb, const Image& depth, const Params& p);

// Registered effects (lower_snake names): all 13 reference effects — toon,
// color_boost, sepia, bloom, vignette, night_vision, film_grain,
// pencil_sketch, cross_processing, posterize, neon_glow, hologram, fog —
// plus passthrough/default/original aliases and grayscale/invert extras.
const std::map<std::string, EffectFn>& effect_registry();

// True when ``name`` is a registered effect.
bool has_effect(const std::string& name);

// Apply by name.  Unknown names return the input unchanged; callers should
// gate on has_effect() and report the error (main.cpp exits nonzero).
Image apply_effect(const std::string& name, const Image& rgb, const Image& depth,
                   const Params& params);
