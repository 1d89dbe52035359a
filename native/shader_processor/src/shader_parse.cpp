#include "shader_parse.h"

#include <algorithm>
#include <cctype>
#include <fstream>
#include <sstream>

#include "glsl.h"

namespace {

std::string lower(std::string s) {
  std::transform(s.begin(), s.end(), s.begin(),
                 [](unsigned char c) { return std::tolower(c); });
  return s;
}

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

std::string basename_of(const std::string& path) {
  size_t slash = path.find_last_of("/\\");
  return slash == std::string::npos ? path : path.substr(slash + 1);
}

}  // namespace

ShaderSpec parse_shader_file(const std::string& path) {
  ShaderSpec spec;
  std::ifstream f(path);
  if (!f) {
    spec.error = "cannot read shader file " + path;
    return spec;
  }

  std::string body, line;
  bool have_directive = false;
  while (std::getline(f, line)) {
    body += line + "\n";
    std::string t = trim(line);
    if (t.rfind("// effect:", 0) == 0) {
      spec.effect = lower(trim(t.substr(10)));
      have_directive = true;
    } else if (t.rfind("// param:", 0) == 0) {
      std::string kv = trim(t.substr(9));
      size_t eq = kv.find('=');
      if (eq != std::string::npos) {
        try {
          spec.params[trim(kv.substr(0, eq))] = std::stod(kv.substr(eq + 1));
        } catch (...) {
        }
      }
    }
  }
  if (have_directive) {
    spec.mode = ShaderSpec::Mode::Effect;
    return spec;
  }

  // Heuristics for stock shaders written by the reference's shader system
  // (src/shader_system.py:59-104): the toon shader quantizes with u_levels and
  // samples u_depth; the default shader just samples u_texture.  These hit the
  // fast fixed-function path; novel shaders fall through to the interpreter.
  std::string lbody = lower(body);
  std::string name = lower(basename_of(path));
  auto name_has = [&](const char* s) { return name.find(s) != std::string::npos; };

  if (lbody.find("u_levels") != std::string::npos &&
      lbody.find("u_depth") != std::string::npos) {
    spec.mode = ShaderSpec::Mode::Effect;
    spec.effect = "toon";
    return spec;
  }
  for (const auto& kv : effect_registry()) {
    if (kv.first != "passthrough" && kv.first != "default" &&
        name_has(kv.first.c_str())) {
      spec.mode = ShaderSpec::Mode::Effect;
      spec.effect = kv.first;
      return spec;
    }
  }

  // Arbitrary user GLSL: run it through the interpreter.
  if (looks_like_glsl(body)) {
    spec.mode = ShaderSpec::Mode::Glsl;
    spec.source = body;
    return spec;
  }

  spec.error = path + " is neither a directive shader nor GLSL with a main()";
  return spec;
}
