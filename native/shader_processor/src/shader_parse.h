// Shader-file interpretation.
//
// The reference compiles arbitrary GLSL fragment shaders
// (reference: shader_processor/src/shader.cpp:3-62); with no GL available,
// this tool resolves a .frag/.glsl file in priority order:
//
// 1. Explicit directive (preferred, written by the Python bridge):
//      // effect: toon
//      // param: levels=5
//    -> fixed-function effect from the registry (effects.cpp).
// 2. Heuristics over the GLSL body for the reference's stock shaders:
//    "u_levels" + "u_depth" -> toon; filename containing fog/sepia/... ->
//    that effect.  (Fast path: the C++ effects are ~100x faster than the
//    per-pixel interpreter.)
// 3. Anything with a `void main()` -> the GLSL-subset INTERPRETER (glsl.h):
//    arbitrary user fragment shaders of the reference's single-texture
//    pattern actually execute, matching the reference capability.
// 4. Otherwise -> error (main.cpp reports and exits nonzero).
#pragma once

#include <string>

#include "effects.h"

struct ShaderSpec {
  enum class Mode { Effect, Glsl, Invalid };
  Mode mode = Mode::Invalid;
  std::string effect;   // Mode::Effect
  std::string source;   // Mode::Glsl — full shader text
  Params params;        // effect params / uniform overrides
  std::string error;    // Mode::Invalid
};

// Parse the shader file at `path`.
ShaderSpec parse_shader_file(const std::string& path);
