// shader_processor — headless depth-aware image-effect CLI.
//
// API-compatible with the reference's native tool
// (reference: shader_processor/src/main.cpp:17-33):
//   shader_processor --input in.png [--depth d.png] --shader fx.frag --output out.png
// plus:
//   --effect <name>        bypass shader parsing and name the effect directly
//   --param k=v            repeatable parameter overrides
//   --list-effects         print registered effects and exit
//
// The reference renders through GLFW/GLAD/OpenGL (main.cpp:36-148); this
// environment has no GPU or display, so the pipeline is pure CPU: libpng in,
// fixed-function effect (effects.cpp) keyed off the shader file
// (shader_parse.cpp) — or, for arbitrary user GLSL, the fragment-shader
// interpreter (glsl.cpp) — libpng out.
// Exit codes: 0 ok, 1 usage, 2 io error, 3 unknown effect / shader error.

#include <cstdio>
#include <cstring>
#include <string>

#include "effects.h"
#include "glsl.h"
#include "image.h"
#include "shader_parse.h"

static void usage() {
  std::fprintf(stderr,
               "Usage: shader_processor --input <image.png> [--depth <depth.png>]\n"
               "                        --shader <file.frag> | --effect <name>\n"
               "                        --output <out.png> [--param k=v ...]\n");
}

int main(int argc, char* argv[]) {
  std::string input_path, depth_path, shader_path, output_path, effect_name;
  Params overrides;

  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto next = [&](std::string& dst) {
      if (i + 1 < argc) dst = argv[++i];
    };
    if (arg == "--input") next(input_path);
    else if (arg == "--depth") next(depth_path);
    else if (arg == "--shader") next(shader_path);
    else if (arg == "--output") next(output_path);
    else if (arg == "--effect") next(effect_name);
    else if (arg == "--param") {
      std::string kv;
      next(kv);
      size_t eq = kv.find('=');
      if (eq != std::string::npos) {
        try {
          overrides[kv.substr(0, eq)] = std::stod(kv.substr(eq + 1));
        } catch (...) {
        }
      }
    } else if (arg == "--list-effects") {
      for (const auto& e : effect_registry()) std::printf("%s\n", e.first.c_str());
      return 0;
    }
  }

  if (input_path.empty() || output_path.empty() ||
      (shader_path.empty() && effect_name.empty())) {
    usage();
    return 1;
  }

  Image rgb = load_image(input_path);
  if (rgb.empty()) {
    std::fprintf(stderr, "error: cannot read %s\n", input_path.c_str());
    return 2;
  }
  if (rgb.channels == 1) {  // promote gray input to rgb
    Image c;
    c.width = rgb.width;
    c.height = rgb.height;
    c.channels = 3;
    c.data.resize(static_cast<size_t>(rgb.width) * rgb.height * 3);
    for (size_t i = 0; i < rgb.data.size(); ++i)
      c.data[i * 3] = c.data[i * 3 + 1] = c.data[i * 3 + 2] = rgb.data[i];
    rgb = std::move(c);
  }

  Image depth;
  if (!depth_path.empty()) {
    depth = load_image(depth_path);
    if (depth.empty())
      std::fprintf(stderr, "warning: cannot read depth %s, continuing without\n",
                   depth_path.c_str());
  }

  ShaderSpec spec;
  if (!effect_name.empty()) {
    spec.mode = ShaderSpec::Mode::Effect;
    spec.effect = effect_name;
  } else {
    spec = parse_shader_file(shader_path);
  }
  for (const auto& kv : overrides) spec.params[kv.first] = kv.second;

  Image out;
  switch (spec.mode) {
    case ShaderSpec::Mode::Effect: {
      if (!has_effect(spec.effect)) {
        std::fprintf(stderr, "error: unknown effect '%s'; --list-effects shows options\n",
                     spec.effect.c_str());
        return 3;
      }
      out = apply_effect(spec.effect, rgb, depth, spec.params);
      break;
    }
    case ShaderSpec::Mode::Glsl: {
      GlslResult res = run_glsl_shader(spec.source, rgb, depth, spec.params);
      if (!res.ok) {
        std::fprintf(stderr, "error: %s: %s\n", shader_path.c_str(),
                     res.error.c_str());
        return 3;
      }
      out = std::move(res.image);
      break;
    }
    case ShaderSpec::Mode::Invalid:
      std::fprintf(stderr, "error: %s\n", spec.error.c_str());
      return 3;
  }

  if (!save_image(output_path, out)) {
    std::fprintf(stderr, "error: cannot write %s\n", output_path.c_str());
    return 2;
  }
  return 0;
}
