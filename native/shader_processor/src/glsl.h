// GLSL-subset fragment-shader interpreter (CPU).
//
// The reference's native tool compiles and runs ARBITRARY user fragment
// shaders on an offscreen GL framebuffer (reference:
// shader_processor/src/shader.cpp:3-62, main.cpp:126-148).  This environment
// is headless, so the equivalent capability is a small interpreter for the
// single-texture fragment pattern those shaders use: GLSL 330 with uniforms
// (incl. default initializers), vec2/3/4 and mat2/3/4 arithmetic (mat*vec,
// vec*mat, mat*mat, transpose(), m[i] column access), swizzles, texture()
// sampling of u_texture/u_depth (bilinear, clamp-to-edge), the common
// builtins (floor/step/mix/clamp/smoothstep/...), if/else, for/while loops
// with break/continue (capped at 1e6 iterations per pixel — runaway loops
// error loudly instead of hanging), user-defined helper functions (value
// returns, by-value
// params incl. arrays, no recursion — as in GLSL), i++/i--, arrays
// (`float k[9] = float[](...)`, element read/assign, `.length()`, dynamic
// vec component indexing `v[i]`, top-level const arrays), object-like
// `#define NAME value` macros (token substitution; `#version` et al are
// ignored), function-like `#define F(a, b) body` macros (C rules: expanded
// only when followed by '(', arguments nest, bare names left alone),
// preprocessor conditionals (`#ifdef`/`#ifndef`/`#else`/`#endif`,
// `#if`/`#elif` with full C integer constant expressions — arithmetic,
// shifts, bitwise &/^/|/~, comparisons, &&/||/!, `?:`, defined(NAME),
// object-like AND function-like macro expansion (`#if MAX(A, 2) > 1`),
// undefined identifiers = 0 per ISO C 6.10.1 — and
// `#undef`), user `struct` types
// (definition, constructor initializer, field read/write incl. swizzled
// components and compound ops, instance copy/assign, by-value struct
// function parameters AND return values (consumed by a declaration, an
// assignment, a struct-typed argument slot like shade(makeLight()), or a
// field-chain read at any depth with optional trailing swizzle —
// makeLight().power, makeScene().key.color.xy), NESTED
// struct fields (deep reads/writes/copies at any depth, incl. through
// struct-array elements: `arr[i].inner.field = v`) — and
// struct ARRAYS:
// `Light ls[3]` with per-field/swizzled element writes, whole-element
// assignment, loop-indexed reads, elements as function arguments, and
// by-value struct-array parameters),
// plus assignment to the declared `out vec4` variable.  Genuinely invalid
// GLSL still fails loudly: a whole struct used as a value (vec4(inst), a
// struct result bound to a non-struct parameter), and a function declared
// with a non-struct return type that executes `return structInstance;`,
// each produce a parse/eval error naming the construct.
// Int literals, int() casts, and `int`-declared variables
// carry GLSL int semantics: int-int {+,-,*,/,%} stays int with truncating /
// and %, ivec swizzles/component reads and abs/sign/min/max/clamp preserve
// int-ness, and declared types coerce (float k = 1, float[](1, 2), float
// parameters bound from int arguments, --param overrides of int uniforms
// truncate).  Everything mixed promotes to float (real GLSL would reject
// the mix; this subset forgives).
//
// Semantics notes:
// - texcoord origin is top-left with v increasing downward, so
//   `coord + vec2(0, eps)` samples BELOW — matching the reference toon
//   shader's depth_bottom naming.  `gl_FragCoord` is bound per pixel with
//   the same orientation: (x+0.5, y+0.5, 0, 1) with y=0 the top row.
// - a declared `uniform vec2 u_resolution` with no initializer is auto-bound
//   to (width, height); scalar uniforms can be set via --param (name with or
//   without the `u_` prefix).
#pragma once

#include <string>

#include "effects.h"  // Params
#include "image.h"

struct GlslResult {
  bool ok = false;
  std::string error;
  Image image;
};

// Interpret `source` over the rgb (+ optional depth) images.  `uniforms`
// override the shader's own default values.  On failure, `ok` is false and
// `error` holds a parse/eval diagnostic.
GlslResult run_glsl_shader(const std::string& source, const Image& rgb,
                           const Image& depth, const Params& uniforms);

// Quick check: does the source look like a runnable fragment shader
// (has a `void main`)?
bool looks_like_glsl(const std::string& source);
