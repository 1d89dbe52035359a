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

// Registered effects (lower_snake names): passthrough, toon, fog, sepia,
// vignette, posterize, grayscale, invert.
const std::map<std::string, EffectFn>& effect_registry();

// Apply by name; falls back to passthrough for unknown names.
Image apply_effect(const std::string& name, const Image& rgb, const Image& depth,
                   const Params& params);
