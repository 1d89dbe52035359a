// Shader-file interpretation.
//
// The reference compiles arbitrary GLSL fragment shaders
// (reference: shader_processor/src/shader.cpp:3-62); with no GL available,
// this tool maps a .frag/.glsl file to a registered effect + parameters:
//
// 1. Explicit directive (preferred, written by the Python bridge):
//      // effect: toon
//      // param: levels=5
// 2. Heuristics over the GLSL body for the reference's stock shaders:
//    "floor(color.rgb * u_levels)" + "u_depth"  -> toon
//    filename containing fog/sepia/... -> that effect
// 3. Anything else -> passthrough (matching the reference's default.frag).
#pragma once

#include <string>

#include "effects.h"

struct ShaderSpec {
  std::string effect = "passthrough";
  Params params;
};

// Parse the shader file at `path`. Missing/unreadable file -> passthrough.
ShaderSpec parse_shader_file(const std::string& path);
