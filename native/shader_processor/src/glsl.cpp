#include "glsl.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <map>
#include <memory>
#include <set>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------- values

struct Val {
  int n = 1;                     // component count: 1..4 (scalar/vec),
                                 // rows (== cols) when mat > 0
  float v[16] = {0};             // matrices stored column-major, GLSL-style
  // GLSL int/float distinction, carried so int arithmetic truncates the way
  // a real GLSL compiler's does (3 / 2 == 1, not 1.5).  Everything except
  // int literals, int() casts, and int-int {+,-,*,/,%} is float.
  bool is_int = false;
  int mat = 0;                   // 0 = scalar/vec; N = NxN matrix
  static Val scalar(float x) { return Val{1, {x, 0, 0, 0}}; }
  static Val iscalar(int x) {
    Val s = scalar(float(x));
    s.is_int = true;
    return s;
  }
};

struct EvalError : std::runtime_error {
  using std::runtime_error::runtime_error;
};

Val broadcast_op(const Val& a, const Val& b, float (*f)(float, float),
                 const char* op) {
  if (a.mat || b.mat)
    throw EvalError(std::string("'") + op + "' does not accept a matrix here");
  if (a.n != b.n && a.n != 1 && b.n != 1)
    throw EvalError(std::string("size mismatch in '") + op + "'");
  Val out;
  out.n = std::max(a.n, b.n);
  for (int i = 0; i < out.n; ++i)
    out.v[i] = f(a.v[a.n == 1 ? 0 : i], b.v[b.n == 1 ? 0 : i]);
  return out;
}

// Coerce a value to a declared scalar/vector type: int/ivecN truncates and
// keeps integer semantics; any other declared type makes it float, mirroring
// GLSL's implicit int->float conversion at declarations, parameter binding,
// array construction, and uniform overrides.
void coerce_to_type(Val& v, const std::string& type) {
  if (type.empty()) return;
  if (type == "int" || type.rfind("ivec", 0) == 0) {
    for (int k = 0; k < v.n; ++k) v.v[k] = float(long(v.v[k]));
    v.is_int = true;
  } else {
    v.is_int = false;
  }
}

Val map1(const Val& a, float (*f)(float)) {
  if (a.mat) throw EvalError("componentwise builtins do not accept matrices");
  Val out = a;
  out.is_int = false;
  for (int i = 0; i < a.n; ++i) out.v[i] = f(a.v[i]);
  return out;
}

// matrix arithmetic: linear-algebra '*' (mat*mat, mat*vec, vec*mat),
// componentwise +/- between same-size matrices, and scalar scaling
Val mat_arith(const Val& a, const Val& b, const std::string& op) {
  auto comp = [&](const Val& m, const Val& s, bool s_left) {
    Val out = m;
    out.is_int = false;
    for (int i = 0; i < m.mat * m.mat; ++i) {
      float x = s_left ? s.v[0] : m.v[i], y = s_left ? m.v[i] : s.v[0];
      out.v[i] = op == "+" ? x + y : op == "-" ? x - y
               : op == "*" ? x * y : x / y;
    }
    return out;
  };
  if (op == "*") {
    if (a.mat && b.mat) {  // mat * mat
      if (a.mat != b.mat) throw EvalError("mat size mismatch in '*'");
      int N = a.mat;
      Val out = a;
      out.is_int = false;
      for (int c = 0; c < N; ++c)
        for (int r = 0; r < N; ++r) {
          float s = 0;
          for (int k = 0; k < N; ++k) s += a.v[k * N + r] * b.v[c * N + k];
          out.v[c * N + r] = s;
        }
      return out;
    }
    if (a.mat && b.n == a.mat && !b.is_int) {  // mat * column-vec
      int N = a.mat;
      Val out;
      out.n = N;
      for (int r = 0; r < N; ++r) {
        float s = 0;
        for (int c = 0; c < N; ++c) s += a.v[c * N + r] * b.v[c];
        out.v[r] = s;
      }
      return out;
    }
    if (b.mat && a.n == b.mat && !a.is_int) {  // row-vec * mat
      int N = b.mat;
      Val out;
      out.n = N;
      for (int c = 0; c < N; ++c) {
        float s = 0;
        for (int r = 0; r < N; ++r) s += a.v[r] * b.v[c * N + r];
        out.v[c] = s;
      }
      return out;
    }
    if (a.mat && b.n == 1) return comp(a, b, false);  // mat * scalar
    if (b.mat && a.n == 1) return comp(b, a, true);   // scalar * mat
    throw EvalError("invalid matrix '*' operand sizes");
  }
  if (op == "+" || op == "-") {
    if (a.mat && b.mat && a.mat == b.mat) {
      Val out = a;
      out.is_int = false;
      for (int i = 0; i < a.mat * a.mat; ++i)
        out.v[i] = op == "+" ? a.v[i] + b.v[i] : a.v[i] - b.v[i];
      return out;
    }
    throw EvalError("matrix '" + op + "' needs two equal-size matrices");
  }
  if (op == "/" && a.mat && b.n == 1 && !b.mat) return comp(a, b, false);
  throw EvalError("unsupported matrix operation '" + op + "'");
}

// {+,-,*,/,%} with GLSL's int semantics: int op int stays int, and int
// division/modulo truncate.  Mixed operands promote to float (GLSL proper
// would reject the mix; this subset is forgiving there, as elsewhere).
Val arith(const Val& a, const Val& b, const std::string& op) {
  if (a.mat || b.mat) return mat_arith(a, b, op);
  if (a.is_int && b.is_int) {
    if (a.n != b.n && a.n != 1 && b.n != 1)
      throw EvalError("size mismatch in '" + op + "'");
    Val out;
    out.n = std::max(a.n, b.n);
    out.is_int = true;
    for (int i = 0; i < out.n; ++i) {
      long x = long(a.v[a.n == 1 ? 0 : i]);
      long y = long(b.v[b.n == 1 ? 0 : i]);
      long r;
      if (op == "+") r = x + y;
      else if (op == "-") r = x - y;
      else if (op == "*") r = x * y;
      else {
        if (y == 0)
          throw EvalError("integer " + std::string(op == "%" ? "modulo" : "division") +
                          " by zero");
        r = op == "/" ? x / y : x % y;
      }
      out.v[i] = float(r);
    }
    return out;
  }
  if (op == "%")
    throw EvalError("'%' requires integer operands (use mod() for floats)");
  if (op == "+") return broadcast_op(a, b, [](float x, float y) { return x + y; }, "+");
  if (op == "-") return broadcast_op(a, b, [](float x, float y) { return x - y; }, "-");
  if (op == "*") return broadcast_op(a, b, [](float x, float y) { return x * y; }, "*");
  return broadcast_op(a, b, [](float x, float y) { return x / y; }, "/");
}

// ------------------------------------------------------------------ lexer

enum class Tok { Ident, Num, Punct, End };

struct Token {
  Tok kind = Tok::End;
  std::string text;
  double num = 0;
};

// function-like `#define F(a, b) body` macro: parameter names + body text
struct FnMacro {
  std::vector<std::string> params;
  std::string body;
};

struct Lexer {
  const std::string& s;
  size_t i = 0;
  // object-like `#define NAME tokens` macros: substituted at the token level
  std::map<std::string, std::string>* defines = nullptr;
  // function-like `#define F(x) ...` macros: expanded when the name is
  // followed by '(' (C preprocessor rule: a bare F is left alone)
  std::map<std::string, FnMacro>* fn_defines = nullptr;

  explicit Lexer(const std::string& src) : s(src) {}

  // #if/#ifdef nesting: (this branch active, any branch taken yet)
  std::vector<std::pair<bool, bool>> cond_stack;
  bool active() const {
    for (const auto& p : cond_stack)
      if (!p.first) return false;
    return true;
  }

  // evaluate a #if / #elif condition with C-preprocessor semantics:
  // integer constant expressions over literals, (object-like) macro
  // expansion, defined(NAME), !, unary -, * / %, + -, comparisons,
  // == !=, && ||, parentheses.  Undefined identifiers evaluate to 0
  // (ISO C 6.10.1, which is what a real GL compiler's preprocessor does);
  // malformed syntax still errors loudly.
  struct CondParser {
    const std::string& s;
    size_t i = 0;
    const Lexer* lx;
    int* depth;  // shared across nested macro-body parsers (recursion guard)
    CondParser(const std::string& str, const Lexer* l, int* d)
        : s(str), lx(l), depth(d) {}

    [[noreturn]] void fail(const std::string& m) {
      throw EvalError("glsl: bad #if condition '" + s + "': " + m);
    }
    void ws() { while (i < s.size() && std::isspace((unsigned char)s[i])) ++i; }
    bool eat(const char* tok) {
      ws();
      size_t n = std::strlen(tok);
      if (s.compare(i, n, tok) == 0) {
        // don't split "<=" into "<" etc. — longest tokens tried first below
        i += n;
        return true;
      }
      return false;
    }
    bool is_defined(const std::string& name) const {
      return (lx->defines && lx->defines->count(name)) ||
             (lx->fn_defines && lx->fn_defines->count(name));
    }
    std::string ident() {
      ws();
      size_t j = i;
      while (j < s.size() &&
             (std::isalnum((unsigned char)s[j]) || s[j] == '_')) ++j;
      std::string name = s.substr(i, j - i);
      i = j;
      return name;
    }
    long primary() {
      if (++*depth > 64) fail("expression too deep (recursive #define?)");
      ws();
      if (i >= s.size()) fail("unexpected end");
      long v;
      if (eat("!")) { v = !primary(); --*depth; return v; }
      if (eat("~")) { v = ~primary(); --*depth; return v; }
      if (eat("(")) {
        v = cond();
        if (!eat(")")) fail("missing ')'");
        --*depth;
        return v;
      }
      char c = s[i];
      if (c == '-') { ++i; v = -primary(); --*depth; return v; }
      if (std::isdigit((unsigned char)c)) {
        char* end = nullptr;
        v = std::strtol(s.c_str() + i, &end, 0);
        i = end - s.c_str();
        --*depth;
        return v;
      }
      if (std::isalpha((unsigned char)c) || c == '_') {
        std::string name = ident();
        if (name == "defined") {
          bool paren = eat("(");
          std::string n2 = ident();
          if (n2.empty()) fail("defined() needs a name");
          if (paren && !eat(")")) fail("missing ')' after defined");
          --*depth;
          return is_defined(n2) ? 1 : 0;
        }
        // function-like macro call in a #if condition (C preprocessor
        // expands these too): parse the balanced argument list textually,
        // substitute parameters at identifier boundaries (args wrapped in
        // parens), and evaluate the expansion recursively.  A bare name
        // without '(' falls through to the C identifier=0 rule below.
        if (lx->fn_defines && lx->fn_defines->count(name)) {
          ws();
          if (i < s.size() && s[i] == '(') {
            ++i;
            std::vector<std::string> args;
            std::string cur_arg;
            int par = 0;
            bool closed = false;
            while (i < s.size()) {
              char ch = s[i];
              if (ch == '(') {
                ++par;
                cur_arg += ch;
              } else if (ch == ')') {
                if (par == 0) { ++i; closed = true; break; }
                --par;
                cur_arg += ch;
              } else if (ch == ',' && par == 0) {
                args.push_back(cur_arg);
                cur_arg.clear();
              } else {
                cur_arg += ch;
              }
              ++i;
            }
            if (!closed) fail("unterminated argument list in '" + name + "'");
            args.push_back(cur_arg);
            const FnMacro& m = lx->fn_defines->at(name);
            if (args.size() == 1 && m.params.empty() &&
                args[0].find_first_not_of(" \t") == std::string::npos)
              args.clear();
            if (args.size() != m.params.size())
              fail("macro '" + name + "' expects " +
                   std::to_string(m.params.size()) + " arguments, got " +
                   std::to_string(args.size()));
            std::string out;
            const std::string& b = m.body;
            for (size_t j = 0; j < b.size();) {
              if (std::isalpha((unsigned char)b[j]) || b[j] == '_') {
                size_t k2 = j;
                while (k2 < b.size() && (std::isalnum((unsigned char)b[k2]) ||
                                         b[k2] == '_'))
                  ++k2;
                std::string tok = b.substr(j, k2 - j);
                bool subbed = false;
                for (size_t pi = 0; pi < m.params.size(); ++pi)
                  if (m.params[pi] == tok) {
                    out += "(" + args[pi] + ")";
                    subbed = true;
                    break;
                  }
                if (!subbed) out += tok;
                j = k2;
              } else {
                out += b[j++];
              }
            }
            CondParser sub(out, lx, depth);
            long r = sub.cond();
            sub.ws();
            if (sub.i < out.size()) sub.fail("trailing tokens");
            --*depth;
            return r;
          }
        }
        // object-macro indirection (depth-bounded across nested bodies),
        // then the C rule: a remaining plain identifier evaluates to 0
        if (lx->defines && lx->defines->count(name)) {
          const std::string& body = lx->defines->at(name);
          // self-reference is left unexpanded (blue paint), i.e. 0 in #if
          CondParser probe(body, lx, depth);
          probe.ws();
          bool self = false;
          if (probe.i < body.size() &&
              (std::isalpha((unsigned char)body[probe.i]) ||
               body[probe.i] == '_')) {
            std::string inner = probe.ident();
            probe.ws();
            self = (inner == name && probe.i >= body.size());
          }
          if (!self) {
            CondParser sub(body, lx, depth);
            long r = sub.cond();
            sub.ws();
            if (sub.i < body.size()) sub.fail("trailing tokens");
            --*depth;
            return r;
          }
        }
        --*depth;
        return 0;
      }
      fail(std::string("unexpected '") + c + "'");
    }
    long mul() {
      long v = primary();
      for (;;) {
        ws();
        if (eat("*")) v *= primary();
        else if (i < s.size() && s[i] == '/' &&
                 (i + 1 >= s.size() || s[i + 1] != '/')) {
          ++i;
          long r = primary();
          if (r == 0) fail("division by zero");
          v /= r;
        } else if (eat("%")) {
          long r = primary();
          if (r == 0) fail("modulo by zero");
          v %= r;
        } else {
          return v;
        }
      }
    }
    long add() {
      long v = mul();
      for (;;) {
        ws();
        if (eat("+")) v += mul();
        else if (eat("-")) v -= mul();
        else return v;
      }
    }
    long shift() {
      long v = add();
      for (;;) {
        ws();
        if (eat("<<")) v <<= add();
        else if (eat(">>")) v >>= add();
        else return v;
      }
    }
    long rel() {
      long v = shift();
      for (;;) {
        ws();
        if (eat("<=")) v = v <= shift();
        else if (eat(">=")) v = v >= shift();
        // bare < and > must not consume the first char of <= / >= (already
        // tried) nor of << / >> (consumed by shift() above; the guard keeps
        // a stray second angle from being misread as a comparison)
        else if (i < s.size() && s[i] == '<' &&
                 (i + 1 >= s.size() || s[i + 1] != '<')) {
          ++i;
          v = v < shift();
        } else if (i < s.size() && s[i] == '>' &&
                   (i + 1 >= s.size() || s[i + 1] != '>')) {
          ++i;
          v = v > shift();
        } else {
          return v;
        }
      }
    }
    long eq() {
      long v = rel();
      for (;;) {
        ws();
        if (eat("==")) v = v == rel();
        else if (eat("!=")) v = v != rel();
        else return v;
      }
    }
    // bitwise & ^ | sit between == and && in C precedence; single & / |
    // must not consume the first char of && / ||
    long bitand_() {
      long v = eq();
      for (;;) {
        ws();
        if (i < s.size() && s[i] == '&' &&
            (i + 1 >= s.size() || s[i + 1] != '&')) {
          ++i;
          v &= eq();
        } else {
          return v;
        }
      }
    }
    long bitxor_() {
      long v = bitand_();
      for (;;) {
        ws();
        if (eat("^")) v ^= bitand_();
        else return v;
      }
    }
    long bitor_() {
      long v = bitxor_();
      for (;;) {
        ws();
        if (i < s.size() && s[i] == '|' &&
            (i + 1 >= s.size() || s[i + 1] != '|')) {
          ++i;
          v |= bitxor_();
        } else {
          return v;
        }
      }
    }
    long and_() {
      long v = bitor_();
      while (true) {
        ws();
        if (!eat("&&")) return v;
        long r = bitor_();
        v = (v != 0 && r != 0) ? 1 : 0;
      }
    }
    long or_() {
      long v = and_();
      while (true) {
        ws();
        if (!eat("||")) return v;
        long r = and_();
        v = (v != 0 || r != 0) ? 1 : 0;
      }
    }
    long cond() {  // C ternary, right-associative
      long v = or_();
      ws();
      if (i < s.size() && s[i] == '?' &&
          (i + 1 >= s.size() || s[i + 1] != ':')) {
        ++i;
        long a = cond();
        ws();
        if (!eat(":")) fail("missing ':' in '?:'");
        long b = cond();
        return v != 0 ? a : b;
      }
      return v;
    }
  };

  bool eval_condition(std::string cond) {
    int depth = 0;
    CondParser p(cond, this, &depth);
    long v = p.cond();
    p.ws();
    if (p.i < cond.size())
      p.fail("trailing tokens");
    return v != 0;
  }

  void handle_directive() {
    // at '#': parse the directive name
    size_t line_end = s.find('\n', i);
    std::string line = s.substr(i, line_end == std::string::npos
                                       ? std::string::npos
                                       : line_end - i);
    size_t j = 1;
    while (j < line.size() && std::isspace((unsigned char)line[j])) ++j;
    size_t k = j;
    while (k < line.size() &&
           (std::isalnum((unsigned char)line[k]) || line[k] == '_')) ++k;
    std::string dir = line.substr(j, k - j);
    std::string rest = line.substr(std::min(k, line.size()));
    size_t cm = rest.find("//");
    if (cm != std::string::npos) rest = rest.substr(0, cm);
    if (dir == "ifdef" || dir == "ifndef" || dir == "if") {
      bool c = false;
      if (active()) {
        if (dir == "if") {
          c = eval_condition(rest);
        } else {
          size_t p = rest.find_first_not_of(" \t");
          size_t q = rest.find_last_not_of(" \t");
          std::string name =
              p == std::string::npos ? "" : rest.substr(p, q - p + 1);
          bool d = (defines && defines->count(name)) ||
                   (fn_defines && fn_defines->count(name));
          c = (dir == "ifdef") ? d : !d;
        }
      }
      cond_stack.emplace_back(c, c);
      i = (line_end == std::string::npos) ? s.size() : line_end;
      return;
    }
    if (dir == "elif" || dir == "else" || dir == "endif") {
      if (cond_stack.empty())
        throw EvalError("glsl: '#" + dir + "' without a matching #if");
      if (dir == "endif") {
        cond_stack.pop_back();
      } else {
        auto& top = cond_stack.back();
        bool parent_active = true;
        for (size_t d2 = 0; d2 + 1 < cond_stack.size(); ++d2)
          parent_active = parent_active && cond_stack[d2].first;
        bool take = parent_active && !top.second &&
                    (dir == "else" || eval_condition(rest));
        top.first = take;
        top.second = top.second || take;
      }
      i = (line_end == std::string::npos) ? s.size() : line_end;
      return;
    }
    if (!active()) {  // directives other than conditionals are skipped
      i = (line_end == std::string::npos) ? s.size() : line_end;
      return;
    }
    if (dir == "undef" && defines) {
      size_t p = rest.find_first_not_of(" \t");
      size_t q = rest.find_last_not_of(" \t");
      if (p != std::string::npos) {
        std::string name = rest.substr(p, q - p + 1);
        defines->erase(name);
        if (fn_defines) fn_defines->erase(name);
      }
      i = (line_end == std::string::npos) ? s.size() : line_end;
      return;
    }
    if (dir == "define" && defines) {
      // #define NAME value-tokens  |  #define NAME(a, b) value-tokens
      // (function-like iff '(' immediately follows the name, as in C)
      size_t p = k;
      while (p < line.size() && std::isspace((unsigned char)line[p])) ++p;
      size_t q = p;
      while (q < line.size() &&
             (std::isalnum((unsigned char)line[q]) || line[q] == '_')) ++q;
      std::string name = line.substr(p, q - p);
      if (name.empty())
        throw EvalError("glsl: malformed #define");
      if (q < line.size() && line[q] == '(') {
        FnMacro m;
        ++q;  // past '('
        for (;;) {
          while (q < line.size() && std::isspace((unsigned char)line[q])) ++q;
          // ')' only closes an EMPTY list here; after a ',' a name must follow
          if (m.params.empty() && q < line.size() && line[q] == ')') {
            ++q;
            break;
          }
          size_t r = q;
          while (r < line.size() &&
                 (std::isalnum((unsigned char)line[r]) || line[r] == '_')) ++r;
          if (r == q)
            throw EvalError("glsl: malformed parameter list in '#define " +
                            name + "(...)'");
          m.params.push_back(line.substr(q, r - q));
          q = r;
          while (q < line.size() && std::isspace((unsigned char)line[q])) ++q;
          if (q < line.size() && line[q] == ',') { ++q; continue; }
          if (q < line.size() && line[q] == ')') { ++q; break; }
          throw EvalError("glsl: malformed parameter list in '#define " +
                          name + "(...)'");
        }
        while (q < line.size() && std::isspace((unsigned char)line[q])) ++q;
        size_t e = line.size();
        size_t cm2 = line.find("//", q);
        if (cm2 != std::string::npos) e = cm2;
        while (e > q && std::isspace((unsigned char)line[e - 1])) --e;
        m.body = line.substr(q, e > q ? e - q : 0);
        if (fn_defines) (*fn_defines)[name] = std::move(m);
        i = (line_end == std::string::npos) ? s.size() : line_end;
        return;
      }
      while (q < line.size() && std::isspace((unsigned char)line[q])) ++q;
      size_t e = line.size();
      size_t cm = line.find("//", q);
      if (cm != std::string::npos) e = cm;
      while (e > q && std::isspace((unsigned char)line[e - 1])) --e;
      (*defines)[name] = line.substr(q, e - q);
    }
    // #version / #extension / #pragma / #line: ignored
    i = (line_end == std::string::npos) ? s.size() : line_end;
  }

  void skip_ws() {
    for (;;) {
      while (i < s.size() && std::isspace((unsigned char)s[i])) ++i;
      if (i < s.size() && s[i] == '#') {  // preprocessor line
        handle_directive();
        continue;
      }
      if (!active() && i < s.size()) {
        // inside a false #if branch: consume to the end of the line and
        // look for the next directive
        while (i < s.size() && s[i] != '\n') ++i;
        continue;
      }
      if (i + 1 < s.size() && s[i] == '/' && s[i + 1] == '/') {
        while (i < s.size() && s[i] != '\n') ++i;
        continue;
      }
      if (i + 1 < s.size() && s[i] == '/' && s[i + 1] == '*') {
        i += 2;
        while (i + 1 < s.size() && !(s[i] == '*' && s[i + 1] == '/')) ++i;
        i = std::min(i + 2, s.size());
        continue;
      }
      break;
    }
  }

  std::vector<Token> pending;  // queued macro-expansion tokens

  Token fetch() {
    if (!pending.empty()) {
      Token t = std::move(pending.back());
      pending.pop_back();
      return t;
    }
    return raw_next();
  }

  Token next() {
    // loop so tokens produced by an expansion are themselves re-examined
    // (macros can appear inside macro bodies and argument lists)
    for (int spins = 0;; ++spins) {
      if (spins > 4096)
        throw EvalError("glsl: macro expansion does not terminate "
                        "(self-referential #define?)");
      Token t = fetch();
      if (t.kind != Tok::Ident) return t;
      if (fn_defines && fn_defines->count(t.text)) {
        Token la = fetch();
        if (la.kind == Tok::Punct && la.text == "(") {
          expand_fn_macro(t.text);
          continue;
        }
        pending.push_back(std::move(la));  // bare name: not a macro call
        return t;
      }
      if (defines && defines->count(t.text)) {
        std::vector<Token> toks;
        expand_into(t.text, toks, 0);
        for (size_t k = toks.size(); k-- > 0;) pending.push_back(std::move(toks[k]));
        continue;
      }
      return t;
    }
  }

  // At this point the name and its '(' are consumed; read the argument
  // tokens (balanced parens, top-level commas separate), substitute the
  // parameters in the body, and queue the result for re-examination.
  void expand_fn_macro(const std::string& name) {
    const FnMacro& m = fn_defines->at(name);
    std::vector<std::vector<Token>> args(1);
    int depth = 1;
    for (;;) {
      Token t = fetch();
      if (t.kind == Tok::End)
        throw EvalError("glsl: unterminated argument list in macro '" +
                        name + "(...)'");
      if (t.kind == Tok::Punct && t.text == "(") ++depth;
      if (t.kind == Tok::Punct && t.text == ")") {
        if (--depth == 0) break;
      }
      if (t.kind == Tok::Punct && t.text == "," && depth == 1) {
        args.emplace_back();
        continue;
      }
      args.back().push_back(std::move(t));
    }
    if (args.size() == 1 && args[0].empty()) args.clear();  // `F()`
    if (args.size() != m.params.size())
      throw EvalError("glsl: macro '" + name + "' expects " +
                      std::to_string(m.params.size()) + " arguments, got " +
                      std::to_string(args.size()));
    for (const auto& a : args)
      if (a.empty())
        throw EvalError("glsl: empty argument in macro '" + name + "(...)'");
    std::vector<Token> out;
    Lexer sub(m.body);  // raw body tokens; parameter idents spliced
    for (Token x = sub.raw_next(); x.kind != Tok::End; x = sub.raw_next()) {
      bool is_param = false;
      if (x.kind == Tok::Ident) {
        for (size_t k = 0; k < m.params.size(); ++k) {
          if (m.params[k] == x.text) {
            out.insert(out.end(), args[k].begin(), args[k].end());
            is_param = true;
            break;
          }
        }
      }
      if (!is_param) out.push_back(std::move(x));
    }
    for (size_t k = out.size(); k-- > 0;) pending.push_back(std::move(out[k]));
  }

  void expand_into(const std::string& name, std::vector<Token>& out, int depth) {
    if (depth > 16)
      throw EvalError("glsl: macro expansion too deep (recursive #define '" +
                      name + "'?)");
    Lexer sub(defines->at(name));  // raw body tokens (sub has no defines)
    for (Token x = sub.raw_next(); x.kind != Tok::End; x = sub.raw_next()) {
      if (x.kind == Tok::Ident && defines->count(x.text))
        expand_into(x.text, out, depth + 1);
      else
        out.push_back(std::move(x));
    }
  }

  Token raw_next() {
    skip_ws();
    if (i >= s.size()) return {};
    char c = s[i];
    if (std::isalpha((unsigned char)c) || c == '_') {
      size_t j = i;
      while (j < s.size() && (std::isalnum((unsigned char)s[j]) || s[j] == '_')) ++j;
      Token t{Tok::Ident, s.substr(i, j - i)};
      i = j;
      return t;
    }
    if (std::isdigit((unsigned char)c) ||
        (c == '.' && i + 1 < s.size() && std::isdigit((unsigned char)s[i + 1]))) {
      size_t j = i;
      while (j < s.size() && (std::isdigit((unsigned char)s[j]) || s[j] == '.')) ++j;
      if (j < s.size() && (s[j] == 'e' || s[j] == 'E')) {
        ++j;
        if (j < s.size() && (s[j] == '+' || s[j] == '-')) ++j;
        while (j < s.size() && std::isdigit((unsigned char)s[j])) ++j;
      }
      if (j < s.size() && (s[j] == 'f' || s[j] == 'F')) ++j;  // 1.0f suffix
      Token t{Tok::Num, s.substr(i, j - i)};
      t.num = std::strtod(t.text.c_str(), nullptr);
      i = j;
      return t;
    }
    // multi-char operators
    static const char* two[] = {"==", "!=", "<=", ">=", "&&", "||",
                                "+=", "-=", "*=", "/=", "++", "--", nullptr};
    for (int k = 0; two[k]; ++k)
      if (s.compare(i, 2, two[k]) == 0) {
        Token t{Tok::Punct, two[k]};
        i += 2;
        return t;
      }
    Token t{Tok::Punct, std::string(1, c)};
    ++i;
    return t;
  }
};

// -------------------------------------------------------------------- AST

struct Expr;
using ExprP = std::unique_ptr<Expr>;

struct Expr {
  enum Kind { Num, Var, Call, Member, Binary, Unary, Ternary, Index } kind;
  double num = 0;                  // Num
  bool is_int = false;             // Num: integer literal (no '.', exp, 'f')
  std::string name;                // Var, Call (fn name), Member (swizzle), Binary/Unary (op)
  std::vector<ExprP> args;         // Call args; Member base; Binary l,r; Unary e;
                                   // Ternary c,a,b; Index base,idx
};

struct Stmt;
using StmtP = std::unique_ptr<Stmt>;

struct Stmt {
  enum Kind { Decl, DeclArr, Assign, If, Return, ExprStmt, For, While,
              Break, Continue } kind;
  std::string name;      // Decl/DeclArr/Assign target
  std::string swizzle;   // Assign: non-empty for `x.rgb = ...` / `k[i].x = ...`
  std::string op;        // Assign: "=", "+=", ...
  ExprP expr;            // Decl init / DeclArr declared size / Assign rhs /
                         // If|For|While cond / ExprStmt / Return (may be null)
  ExprP index;           // Assign: non-null for element target `k[i] = ...`
  std::vector<ExprP> elems;  // DeclArr: `float[](e0, e1, ...)` initializer
  std::vector<StmtP> then_body, else_body;  // If; For/While body = then_body
  StmtP init, incr;      // For
};

struct Func {
  std::string ret_type;                 // "void", "float", "vec3", ...
  std::vector<std::string> param_names;
  std::vector<std::string> param_types; // declared types; coerce at call
  std::vector<StmtP> body;
};

struct Shader {
  // uniforms: name -> (is_sampler, default value)
  struct Uniform {
    bool sampler = false;
    bool has_default = false;
    Val dflt;
    std::string type;
  };
  std::map<std::string, Uniform> uniforms;
  std::map<std::string, Val> consts;      // top-level `const TYPE n = expr;`
  std::map<std::string, std::vector<Val>> const_arrays;  // `const TYPE n[k] = TYPE[](...)`
  std::map<std::string, Func> functions;  // user-defined helper functions
  // user struct types: name -> ordered (field type, field name) list.
  // Instances live as dotted locals ("light.dir"), so field access/assign
  // reuses the scalar/vec machinery unchanged.
  std::map<std::string, std::vector<std::pair<std::string, std::string>>>
      struct_types;
  std::string in_name;   // `in vec2 <name>` — the texcoord
  std::string out_name;  // `out vec4 <name>` — the fragment color
  std::vector<StmtP> body;
};

// ------------------------------------------------------------------ parser

struct Parser {
  Lexer lex;
  Token cur;
  int loop_depth = 0;  // for break/continue placement checks
  std::map<std::string, std::string> defines;  // #define NAME tokens
  std::map<std::string, FnMacro> fn_defines;   // #define NAME(a, b) tokens
  std::set<std::string> struct_names;          // user `struct` type names
  explicit Parser(const std::string& src) : lex(src) {
    lex.defines = &defines;
    lex.fn_defines = &fn_defines;
    cur = lex.next();
  }

  [[noreturn]] void fail(const std::string& msg) {
    throw EvalError("glsl parse error: " + msg + " (near '" + cur.text + "')");
  }
  void advance() { cur = lex.next(); }
  bool is_punct(const char* p) { return cur.kind == Tok::Punct && cur.text == p; }
  bool is_ident(const char* p) { return cur.kind == Tok::Ident && cur.text == p; }
  void expect(const char* p) {
    if (!is_punct(p)) fail(std::string("expected '") + p + "'");
    advance();
  }
  std::string expect_ident() {
    if (cur.kind != Tok::Ident) fail("expected identifier");
    std::string s = cur.text;
    advance();
    return s;
  }

  static bool is_type(const std::string& t) {
    return t == "float" || t == "int" || t == "bool" || t == "vec2" ||
           t == "vec3" || t == "vec4" || t == "ivec2" || t == "ivec3" ||
           t == "ivec4" || t == "bvec2" || t == "bvec3" || t == "bvec4" ||
           t == "mat2" || t == "mat3" || t == "mat4" || t == "sampler2D";
  }

  Shader parse() {
    Shader sh;
    while (cur.kind != Tok::End) {
      if (is_ident("precision")) {  // precision mediump float;
        while (cur.kind != Tok::End && !is_punct(";")) advance();
        expect(";");
      } else if (is_ident("uniform")) {
        advance();
        std::string type = expect_ident();
        std::string name = expect_ident();
        Shader::Uniform u;
        u.type = type;
        u.sampler = (type == "sampler2D");
        if (is_punct("=")) {
          advance();
          ExprP e = parse_expr();
          u.has_default = true;
          u.dflt = const_eval(*e);
        }
        expect(";");
        sh.uniforms[name] = std::move(u);
      } else if (is_ident("const")) {
        // top-level constant: const TYPE name = <literal expr>;
        // or const array:    const TYPE name[k] = TYPE[](e0, ..., ek-1);
        advance();
        std::string type = expect_ident();
        if (!is_type(type)) fail("bad const type '" + type + "'");
        std::string name = expect_ident();
        if (is_punct("[")) {
          advance();
          ExprP size;
          if (!is_punct("]")) size = parse_expr();
          expect("]");
          expect("=");
          std::vector<ExprP> elems = parse_array_ctor();
          expect(";");
          std::vector<Val> vals;
          vals.reserve(elems.size());
          for (const auto& el : elems) {
            vals.push_back(const_eval(*el));
            coerce_to_type(vals.back(), type);  // float[](1, 2) holds floats
          }
          if (size) {
            int n = int(const_eval(*size).v[0]);
            if (n != int(vals.size()))
              fail("const array '" + name + "' declares " + std::to_string(n) +
                   " elements but initializes " + std::to_string(vals.size()));
          }
          sh.const_arrays[name] = std::move(vals);
        } else {
          expect("=");
          ExprP e = parse_expr();
          Val cv = const_eval(*e);
          coerce_to_type(cv, type);  // const float k = 1 is a float
          sh.consts[name] = cv;
          expect(";");
        }
      } else if (is_ident("struct")) {
        // struct Name { TYPE field; ... };  (instances are local variables;
        // nested struct fields, samplers, and inline declarators error)
        advance();
        std::string name = expect_ident();
        expect("{");
        std::vector<std::pair<std::string, std::string>> fields;
        while (!is_punct("}")) {
          if (cur.kind == Tok::End) fail("unterminated struct '" + name + "'");
          std::string ftype = expect_ident();
          if ((!is_type(ftype) && !struct_names.count(ftype)) ||
              ftype == "sampler2D")
            fail("bad struct field type '" + ftype + "' in '" + name + "'");
          fields.emplace_back(ftype, expect_ident());
          while (is_punct(",")) {  // float a, b;
            advance();
            fields.emplace_back(ftype, expect_ident());
          }
          expect(";");
        }
        expect("}");
        if (!is_punct(";"))
          fail("inline struct-instance declarators ('struct X {...} x;') "
               "are not supported — declare the variable separately");
        advance();
        struct_names.insert(name);
        sh.struct_types[name] = std::move(fields);
      } else if (is_ident("in") || is_ident("varying")) {
        advance();
        expect_ident();  // type
        sh.in_name = expect_ident();
        expect(";");
      } else if (is_ident("out")) {
        advance();
        expect_ident();  // type
        sh.out_name = expect_ident();
        expect(";");
      } else if (is_ident("void") ||
                 (cur.kind == Tok::Ident &&
                  (is_type(cur.text) || struct_names.count(cur.text)))) {
        // function definition: RET name(TYPE a, TYPE b, ...) { ... }
        // (user helper functions + the mandatory void main())
        std::string ret = expect_ident();
        std::string fn = expect_ident();
        expect("(");
        Func f;
        f.ret_type = ret;
        while (!is_punct(")")) {
          if (cur.kind == Tok::End) fail("unterminated parameter list");
          if (is_ident("in") || is_ident("const")) advance();  // qualifiers
          std::string ptype = expect_ident();
          if (!is_type(ptype) && !struct_names.count(ptype))
            fail("bad parameter type '" + ptype + "'");
          f.param_types.push_back(ptype);
          f.param_names.push_back(expect_ident());
          if (is_punct("[")) {  // array parameter `float k[9]` (by value)
            advance();
            if (!is_punct("]")) parse_expr();  // declared size: unchecked
            expect("]");
            if (struct_names.count(ptype))
              f.param_types.back() += "[]";  // struct array marker
          }
          if (is_punct(",")) advance();
        }
        expect(")");
        expect("{");
        while (!is_punct("}")) {
          if (cur.kind == Tok::End) fail("unterminated function '" + fn + "'");
          f.body.push_back(parse_stmt());
        }
        expect("}");
        if (fn == "main") {
          if (ret != "void" || !f.param_names.empty())
            fail("main must be 'void main()'");
          sh.body = std::move(f.body);
        } else {
          sh.functions[fn] = std::move(f);
        }
      } else {
        fail("unsupported top-level construct '" + cur.text + "'");
      }
    }
    if (!lex.cond_stack.empty()) fail("unterminated #if/#ifdef");
    if (sh.out_name.empty()) sh.out_name = "gl_FragColor";
    return sh;
  }

  // simple statement without trailing ';' — for-loop init/increment clauses:
  // declaration, assignment (incl. compound), i++/i--, or expression
  StmtP parse_simple_stmt() {
    auto st = std::make_unique<Stmt>();
    if (is_ident("const")) advance();  // const-ness is not enforced
    if (cur.kind == Tok::Ident &&
        (is_type(cur.text) || struct_names.count(cur.text))) {
      st->kind = Stmt::Decl;
      st->op = cur.text;  // declared type: "int" coerces the initializer
      advance();
      st->name = expect_ident();
      if (is_punct("[")) {  // array declaration: TYPE name[k] [= TYPE[](...)]
        advance();
        st->kind = Stmt::DeclArr;
        if (!is_punct("]")) st->expr = parse_expr();  // declared size
        expect("]");
        if (is_punct("=")) {
          advance();
          st->elems = parse_array_ctor();
        }
        return st;
      }
      if (is_punct("=")) {
        advance();
        st->expr = parse_expr();
      }
      return st;
    }
    if (cur.kind == Tok::Ident) {
      std::string name = cur.text;
      size_t save_i = lex.i;
      std::vector<Token> save_pending = lex.pending;
      Token save_cur = cur;
      // preprocessor state must round-trip through the backtrack too: a
      // directive between the identifier and the next token would otherwise
      // be processed twice (double-pushing the #if stack / re-#defining)
      auto save_cond = lex.cond_stack;
      auto save_defines = defines;
      auto save_fn_defines = fn_defines;
      advance();
      if (is_punct("[")) {
        // element assignment: name[idx](.swz)? (=|+=|...|++|--) ...
        // (a bare `name[idx];` expression statement has no effect in this
        //  subset, so an assignment operator is required here)
        advance();
        st->index = parse_expr();
        expect("]");
        st->kind = Stmt::Assign;
        st->name = name;
        // dotted chain: `v[i].x = ...` (swizzle) or `lights[i].dir.x = ...`
        // (struct-array field + swizzle; exec splits on the dot)
        while (is_punct(".")) {
          advance();
          if (!st->swizzle.empty()) st->swizzle += ".";
          st->swizzle += expect_ident();
        }
        if (is_punct("++") || is_punct("--")) {
          st->op = cur.text == "++" ? "+=" : "-=";
          advance();
          auto one = std::make_unique<Expr>();
          one->kind = Expr::Num;
          one->num = 1.0;
          one->is_int = true;  // i++ keeps an int counter int
          st->expr = std::move(one);
          return st;
        }
        if (!(cur.kind == Tok::Punct &&
              (cur.text == "=" || cur.text == "+=" || cur.text == "-=" ||
               cur.text == "*=" || cur.text == "/=")))
          fail("expected assignment to array element '" + name + "[...]'");
        st->op = cur.text;
        advance();
        st->expr = parse_expr();
        return st;
      }
      std::string swz;
      // dotted chain: `v.rgb = ...` (swizzle) or `light.dir.x = ...`
      // (struct field + swizzle) — all but the last segment join the name,
      // so struct fields resolve as the dotted locals they are stored as
      while (is_punct(".")) {
        advance();
        if (!swz.empty()) name += "." + swz;
        swz = expect_ident();
      }
      if (is_punct("++") || is_punct("--")) {
        st->kind = Stmt::Assign;
        st->name = name;
        st->swizzle = swz;
        st->op = cur.text == "++" ? "+=" : "-=";
        advance();
        auto one = std::make_unique<Expr>();
        one->kind = Expr::Num;
        one->num = 1.0;
        one->is_int = true;  // i++ keeps an int counter int
        st->expr = std::move(one);
        return st;
      }
      if (cur.kind == Tok::Punct &&
          (cur.text == "=" || cur.text == "+=" || cur.text == "-=" ||
           cur.text == "*=" || cur.text == "/=")) {
        st->kind = Stmt::Assign;
        st->name = name;
        st->swizzle = swz;
        st->op = cur.text;
        advance();
        st->expr = parse_expr();
        return st;
      }
      lex.i = save_i;
      lex.pending = save_pending;
      cur = save_cur;
      lex.cond_stack = std::move(save_cond);
      defines = std::move(save_defines);
      fn_defines = std::move(save_fn_defines);
    }
    st->kind = Stmt::ExprStmt;
    st->expr = parse_expr();
    return st;
  }

  StmtP parse_stmt() {
    auto st = std::make_unique<Stmt>();
    if (is_ident("if")) {
      advance();
      expect("(");
      st->kind = Stmt::If;
      st->expr = parse_expr();
      expect(")");
      parse_block(st->then_body);
      if (is_ident("else")) {
        advance();
        parse_block(st->else_body);
      }
      return st;
    }
    if (is_ident("for")) {
      // for (init; cond; incr) body — cond may be empty (capped at runtime)
      advance();
      expect("(");
      st->kind = Stmt::For;
      if (!is_punct(";")) st->init = parse_simple_stmt();
      expect(";");
      if (!is_punct(";")) st->expr = parse_expr();
      expect(";");
      if (!is_punct(")")) st->incr = parse_simple_stmt();
      expect(")");
      ++loop_depth;
      parse_block(st->then_body);
      --loop_depth;
      return st;
    }
    if (is_ident("while")) {
      advance();
      expect("(");
      st->kind = Stmt::While;
      st->expr = parse_expr();
      expect(")");
      ++loop_depth;
      parse_block(st->then_body);
      --loop_depth;
      return st;
    }
    if (is_ident("break") || is_ident("continue")) {
      if (loop_depth == 0)
        fail("'" + cur.text + "' outside of a loop");
      st->kind = is_ident("break") ? Stmt::Break : Stmt::Continue;
      advance();
      expect(";");
      return st;
    }
    if (is_ident("return")) {
      advance();
      st->kind = Stmt::Return;
      if (!is_punct(";")) st->expr = parse_expr();
      expect(";");
      return st;
    }
    st = parse_simple_stmt();
    expect(";");
    return st;
  }

  // `TYPE[size?](e0, e1, ...)` — the GLSL array constructor used as an
  // array initializer.  Returns the element expressions.
  std::vector<ExprP> parse_array_ctor() {
    std::string type = expect_ident();
    if (!is_type(type) && !struct_names.count(type))
      fail("bad array constructor type '" + type + "'");
    expect("[");
    if (!is_punct("]")) parse_expr();  // size token: element count wins
    expect("]");
    expect("(");
    std::vector<ExprP> elems;
    if (!is_punct(")")) {
      elems.push_back(parse_expr());
      while (is_punct(",")) {
        advance();
        elems.push_back(parse_expr());
      }
    }
    expect(")");
    return elems;
  }

  void parse_block(std::vector<StmtP>& out) {
    if (is_punct("{")) {
      advance();
      while (!is_punct("}")) {
        if (cur.kind == Tok::End) fail("unterminated block");
        out.push_back(parse_stmt());
      }
      expect("}");
    } else {
      out.push_back(parse_stmt());
    }
  }

  // expression grammar, lowest precedence first
  ExprP parse_expr() { return parse_ternary(); }

  ExprP parse_ternary() {
    ExprP c = parse_or();
    if (is_punct("?")) {
      advance();
      auto e = std::make_unique<Expr>();
      e->kind = Expr::Ternary;
      e->args.push_back(std::move(c));
      e->args.push_back(parse_expr());
      expect(":");
      e->args.push_back(parse_expr());
      return e;
    }
    return c;
  }

  ExprP binary(const char* ops[], ExprP (Parser::*sub)()) {
    ExprP l = (this->*sub)();
    for (;;) {
      bool matched = false;
      for (int k = 0; ops[k]; ++k)
        if (is_punct(ops[k])) {
          auto e = std::make_unique<Expr>();
          e->kind = Expr::Binary;
          e->name = ops[k];
          advance();
          e->args.push_back(std::move(l));
          e->args.push_back((this->*sub)());
          l = std::move(e);
          matched = true;
          break;
        }
      if (!matched) return l;
    }
  }

  ExprP parse_or() {
    static const char* ops[] = {"||", nullptr};
    return binary(ops, &Parser::parse_and);
  }
  ExprP parse_and() {
    static const char* ops[] = {"&&", nullptr};
    return binary(ops, &Parser::parse_eq);
  }
  ExprP parse_eq() {
    static const char* ops[] = {"==", "!=", nullptr};
    return binary(ops, &Parser::parse_rel);
  }
  ExprP parse_rel() {
    static const char* ops[] = {"<=", ">=", "<", ">", nullptr};
    return binary(ops, &Parser::parse_add);
  }
  ExprP parse_add() {
    static const char* ops[] = {"+", "-", nullptr};
    return binary(ops, &Parser::parse_mul);
  }
  ExprP parse_mul() {
    static const char* ops[] = {"*", "/", "%", nullptr};
    return binary(ops, &Parser::parse_unary);
  }

  ExprP parse_unary() {
    if (is_punct("-") || is_punct("!")) {
      auto e = std::make_unique<Expr>();
      e->kind = Expr::Unary;
      e->name = cur.text;
      advance();
      e->args.push_back(parse_unary());
      return e;
    }
    return parse_postfix();
  }

  ExprP parse_postfix() {
    ExprP e = parse_primary();
    for (;;) {
      if (is_punct(".")) {
        advance();
        std::string name = expect_ident();
        if (name == "length" && is_punct("(")) {  // arr.length() / vec.length()
          advance();
          expect(")");
          auto c = std::make_unique<Expr>();
          c->kind = Expr::Call;
          c->name = "__length";
          c->args.push_back(std::move(e));
          e = std::move(c);
          continue;
        }
        auto m = std::make_unique<Expr>();
        m->kind = Expr::Member;
        m->name = name;
        m->args.push_back(std::move(e));
        e = std::move(m);
      } else if (is_punct("[")) {
        advance();
        auto ix = std::make_unique<Expr>();
        ix->kind = Expr::Index;
        ix->args.push_back(std::move(e));
        ix->args.push_back(parse_expr());
        expect("]");
        e = std::move(ix);
      } else {
        return e;
      }
    }
  }

  ExprP parse_primary() {
    if (cur.kind == Tok::Num) {
      auto e = std::make_unique<Expr>();
      e->kind = Expr::Num;
      e->num = cur.num;
      e->is_int = cur.text.find_first_of(".eEfF") == std::string::npos;
      advance();
      return e;
    }
    if (is_punct("(")) {
      advance();
      ExprP e = parse_expr();
      expect(")");
      return e;
    }
    if (cur.kind == Tok::Ident) {
      std::string name = cur.text;
      advance();
      if (is_punct("(")) {
        advance();
        auto e = std::make_unique<Expr>();
        e->kind = Expr::Call;
        e->name = name;
        if (!is_punct(")")) {
          e->args.push_back(parse_expr());
          while (is_punct(",")) {
            advance();
            e->args.push_back(parse_expr());
          }
        }
        expect(")");
        return e;
      }
      auto e = std::make_unique<Expr>();
      e->kind = Expr::Var;
      e->name = name;
      return e;
    }
    fail("expected expression");
  }

  // constant evaluation for uniform defaults (literals + constructors only)
  Val const_eval(const Expr& e);
};

// --------------------------------------------------------------- evaluator

struct Sampler {
  const Image* img = nullptr;  // may be null (e.g. missing depth)
  bool is_depth = false;
};

struct Interp {
  const Shader& sh;
  std::map<std::string, Val> globals;   // uniforms + builtins
  std::map<std::string, Sampler> samplers;
  std::map<std::string, Val> locals;    // per-pixel
  std::map<std::string, std::vector<Val>> arrays;        // per-pixel locals
  std::map<std::string, std::vector<Val>> const_arrays;  // top-level consts
  // struct instances: variable name -> struct type.  Fields are stored as
  // dotted locals ("light.dir"); this registry exists for declarations,
  // whole-instance copies, and by-value parameter passing.
  std::map<std::string, std::string> struct_locals;
  // struct arrays: name -> (element type, size).  Element k's fields live
  // as dotted locals "name.k.field"; lights[i].dir resolves at eval time.
  std::map<std::string, std::pair<std::string, int>> struct_arrays;
  bool returned = false;
  bool broke = false;                   // break: unwinds to the nearest loop
  bool continued = false;               // continue: skips to the next iter
  Val ret_val;                          // value of the innermost `return e;`
  // struct return values: `return light;` captures the instance's fields
  // here (they are callee locals and die at the scope swap); the caller's
  // declaration/assignment site consumes them.  A struct-returning call in
  // any other expression context errors loudly (struct_result_ok gate).
  std::string ret_struct_type;
  std::map<std::string, Val> ret_struct_fields;  // keyed by field name
  bool struct_result_ok = false;
  int call_depth = 0;                   // user-function recursion guard
  // Per-pixel loop budget: a fragment shader that spins 10^6 iterations on
  // ONE pixel is runaway (GLSL itself forbids unbounded loops); erroring
  // loudly beats hanging the batch pipeline.
  static constexpr long kMaxLoopIters = 1000000;

  explicit Interp(const Shader& s) : sh(s) {}

  // bilinear sample with clamp-to-edge; origin top-left, v increases downward
  Val sample(const Sampler& smp, float u, float v) {
    Val out;
    out.n = 4;
    out.v[3] = 1.f;
    const Image* img = smp.img;
    if (!img || img->empty()) return out;  // vec4(0,0,0,1)
    float fx = u * img->width - 0.5f;
    float fy = v * img->height - 0.5f;
    int x0 = int(std::floor(fx)), y0 = int(std::floor(fy));
    float tx = fx - x0, ty = fy - y0;
    auto cl = [](int a, int n) { return std::min(std::max(a, 0), n - 1); };
    int x1 = cl(x0 + 1, img->width), y1 = cl(y0 + 1, img->height);
    x0 = cl(x0, img->width);
    y0 = cl(y0, img->height);
    for (int c = 0; c < 3; ++c) {
      int ch = std::min(c, img->channels - 1);
      float p00 = img->row(y0)[x0 * img->channels + ch] / 255.f;
      float p10 = img->row(y0)[x1 * img->channels + ch] / 255.f;
      float p01 = img->row(y1)[x0 * img->channels + ch] / 255.f;
      float p11 = img->row(y1)[x1 * img->channels + ch] / 255.f;
      out.v[c] = (p00 * (1 - tx) + p10 * tx) * (1 - ty) +
                 (p01 * (1 - tx) + p11 * tx) * ty;
    }
    return out;
  }

  Val* lookup(const std::string& name) {
    auto it = locals.find(name);
    if (it != locals.end()) return &it->second;
    auto ig = globals.find(name);
    if (ig != globals.end()) return &ig->second;
    return nullptr;
  }

  // zero value of a declared field type (float/int/bool/vecN/ivecN/bvecN/matN)
  static Val zero_of(const std::string& type) {
    Val v;
    if (type == "int") {
      v.is_int = true;
    } else if (type.rfind("vec", 0) == 0) {
      v.n = type[type.size() - 1] - '0';
    } else if (type.rfind("ivec", 0) == 0) {
      v.n = type[type.size() - 1] - '0';
      v.is_int = true;
    } else if (type.rfind("bvec", 0) == 0) {
      v.n = type[type.size() - 1] - '0';
    } else if (type.rfind("mat", 0) == 0) {
      v.mat = type[type.size() - 1] - '0';
      v.n = v.mat;
    }
    return v;
  }

  // mutable=true restricts the search to per-pixel locals (const arrays are
  // not assignable)
  std::vector<Val>* lookup_arr(const std::string& name, bool mutable_only = false) {
    auto it = arrays.find(name);
    if (it != arrays.end()) return &it->second;
    if (mutable_only) return nullptr;
    auto ic = const_arrays.find(name);
    if (ic != const_arrays.end()) return &ic->second;
    return nullptr;
  }

  static int index_of(const Val& v, const char* what, int size) {
    int i = int(v.v[0]);
    if (i < 0 || i >= size)
      throw EvalError(std::string("index ") + std::to_string(i) +
                      " out of range for " + what + " of size " +
                      std::to_string(size));
    return i;
  }

  static int swizzle_index(char c) {
    switch (c) {
      case 'x': case 'r': case 's': return 0;
      case 'y': case 'g': case 't': return 1;
      case 'z': case 'b': case 'p': return 2;
      case 'w': case 'a': case 'q': return 3;
      default: throw EvalError(std::string("bad swizzle component '") + c + "'");
    }
  }

  Val eval(const Expr& e) {
    switch (e.kind) {
      case Expr::Num: {
        Val s = Val::scalar(float(e.num));
        s.is_int = e.is_int;
        return s;
      }
      case Expr::Var: {
        Val* v = lookup(e.name);
        if (!v) {
          if (samplers.count(e.name))
            throw EvalError("sampler '" + e.name + "' used outside texture()");
          if (struct_locals.count(e.name))
            throw EvalError("struct instance '" + e.name + "' cannot be "
                            "used as a value here (access its fields)");
          throw EvalError("undefined variable '" + e.name + "'");
        }
        return *v;
      }
      case Expr::Member: {
        // struct field read: `light.dir` / `lights[i].dir` /
        // `scene.key.dir` resolves the dotted local directly (a trailing
        // `.x` swizzles the resolved field value below)
        {
          std::string path = member_chain(e);
          if (!path.empty()) {
            if (Val* f = lookup(path)) return *f;
            if (struct_locals.count(path))
              throw EvalError("struct instance '" + path + "' cannot be "
                              "used as a value here (access its fields)");
            // a chain rooted at a struct instance with no such leaf:
            // either a deeper chain (outer member swizzles) or a bad field
            size_t cut = path.rfind('.');
            std::string parent = path.substr(0, cut);
            if (struct_locals.count(parent) && !lookup(parent))
              throw EvalError("struct '" + struct_locals.at(parent) +
                              "' has no field '" + e.name + "'");
          }
        }
        {
          // field read chained through a struct-valued call result, at any
          // depth, with an optional trailing swizzle: makeLight().power /
          // Light(...).dir / makeScene().key.power / mk().inner.color.xy
          std::vector<std::string> segs{e.name};
          const Expr* root = e.args[0].get();
          while (root->kind == Expr::Member) {
            segs.push_back(root->name);
            root = root->args[0].get();
          }
          if (root->kind == Expr::Call) {
            const Expr& c = *root;
            bool is_ctor = sh.struct_types.count(c.name) > 0;
            auto fit = sh.functions.find(c.name);
            bool is_sfn = !is_ctor && fit != sh.functions.end() &&
                          sh.struct_types.count(fit->second.ret_type) > 0;
            if (is_ctor || is_sfn) {
              const std::string& ty =
                  is_ctor ? c.name : fit->second.ret_type;
              std::string suffix;  // dotted path, outermost segment last
              for (auto it = segs.rbegin(); it != segs.rend(); ++it)
                suffix += (suffix.empty() ? "" : ".") + *it;
              std::map<std::string, Val> leaf_vals;
              if (is_ctor) {
                // materialize the constructor's leaves in a reserved temp
                ctor_into("__fld_tmp", ty, c);
                std::vector<std::pair<std::string, std::string>> leaves;
                struct_leaves(ty, "", leaves);
                for (const auto& lf : leaves)
                  leaf_vals[lf.second] = locals.at("__fld_tmp." + lf.second);
              } else {
                bool saved = struct_result_ok;
                struct_result_ok = true;
                eval_call(c);
                struct_result_ok = saved;
                leaf_vals = ret_struct_fields;
              }
              auto rf = leaf_vals.find(suffix);
              if (rf != leaf_vals.end()) return rf->second;
              // trailing swizzle on a leaf field
              size_t dot = suffix.rfind('.');
              if (dot != std::string::npos) {
                auto pf = leaf_vals.find(suffix.substr(0, dot));
                if (pf != leaf_vals.end()) {
                  const std::string swz = suffix.substr(dot + 1);
                  const Val& base = pf->second;
                  if (base.mat)
                    throw EvalError("cannot swizzle a matrix field");
                  Val out;
                  out.n = int(swz.size());
                  out.is_int = base.is_int;
                  if (out.n > 4)
                    throw EvalError("swizzle too long: ." + swz);
                  for (int k = 0; k < out.n; ++k) {
                    int idx = swizzle_index(swz[k]);
                    if (idx >= base.n)
                      throw EvalError("swizzle ." + swz + " out of range");
                    out.v[k] = base.v[idx];
                  }
                  return out;
                }
              }
              for (const auto& kv : leaf_vals)
                if (kv.first.rfind(suffix + ".", 0) == 0)
                  throw EvalError("struct-typed field '" + suffix + "' of a " +
                                  ty + " call result cannot be used as a "
                                  "value here (access its fields)");
              throw EvalError("struct '" + ty + "' has no field '" +
                              suffix + "'");
            }
          }
        }
        Val base = eval(*e.args[0]);
        if (base.mat)
          throw EvalError("cannot swizzle a matrix (index columns with [i])");
        Val out;
        out.n = int(e.name.size());
        out.is_int = base.is_int;  // ivec2 ts; ts.x is still an int
        if (out.n > 4) throw EvalError("swizzle too long: ." + e.name);
        for (int i = 0; i < out.n; ++i) {
          int idx = swizzle_index(e.name[i]);
          if (idx >= base.n) throw EvalError("swizzle ." + e.name + " out of range");
          out.v[i] = base.v[idx];
        }
        return out;
      }
      case Expr::Unary: {
        Val a = eval(*e.args[0]);
        if (e.name == "-") {
          Val out = map1(a, [](float x) { return -x; });
          out.is_int = a.is_int;  // -i is still an int
          return out;
        }
        return map1(a, [](float x) { return x == 0.f ? 1.f : 0.f; });  // !
      }
      case Expr::Binary:
        return eval_binary(e);
      case Expr::Ternary: {
        Val c = eval(*e.args[0]);
        return c.v[0] != 0.f ? eval(*e.args[1]) : eval(*e.args[2]);
      }
      case Expr::Index: {
        const Expr& base = *e.args[0];
        if (base.kind == Expr::Var && struct_arrays.count(base.name))
          throw EvalError("struct array element '" + base.name +
                          "[...]' cannot be used as a value here "
                          "(access its fields)");
        Val iv = eval(*e.args[1]);
        if (base.kind == Expr::Var) {
          if (std::vector<Val>* arr = lookup_arr(base.name)) {
            int i = index_of(iv, ("array '" + base.name + "'").c_str(),
                             int(arr->size()));
            return (*arr)[i];
          }
        }
        Val b = eval(base);
        if (b.mat) {  // m[i]: i-th column as a vec
          int c = index_of(iv, "matrix", b.mat);
          Val out;
          out.n = b.mat;
          for (int r = 0; r < b.mat; ++r) out.v[r] = b.v[c * b.mat + r];
          return out;
        }
        // dynamic component access on a vec value: v[i] (ivec stays int)
        Val out = Val::scalar(b.v[index_of(iv, "vector", b.n)]);
        out.is_int = b.is_int;
        return out;
      }
      case Expr::Call:
        return eval_call(e);
    }
    throw EvalError("unreachable expr kind");
  }

  Val eval_binary(const Expr& e) {
    const std::string& op = e.name;
    if (op == "&&") {
      Val a = eval(*e.args[0]);
      if (a.v[0] == 0.f) return Val::scalar(0.f);
      return Val::scalar(eval(*e.args[1]).v[0] != 0.f ? 1.f : 0.f);
    }
    if (op == "||") {
      Val a = eval(*e.args[0]);
      if (a.v[0] != 0.f) return Val::scalar(1.f);
      return Val::scalar(eval(*e.args[1]).v[0] != 0.f ? 1.f : 0.f);
    }
    Val a = eval(*e.args[0]), b = eval(*e.args[1]);
    if (op == "+" || op == "-" || op == "*" || op == "/" || op == "%")
      return arith(a, b, op);
    if (op == "<") return Val::scalar(a.v[0] < b.v[0] ? 1.f : 0.f);
    if (op == ">") return Val::scalar(a.v[0] > b.v[0] ? 1.f : 0.f);
    if (op == "<=") return Val::scalar(a.v[0] <= b.v[0] ? 1.f : 0.f);
    if (op == ">=") return Val::scalar(a.v[0] >= b.v[0] ? 1.f : 0.f);
    if (op == "==") return Val::scalar(a.v[0] == b.v[0] ? 1.f : 0.f);
    if (op == "!=") return Val::scalar(a.v[0] != b.v[0] ? 1.f : 0.f);
    throw EvalError("unsupported operator '" + op + "'");
  }

  Val eval_call(const Expr& e) {
    const std::string& fn = e.name;
    // user-defined functions (parsed at the top level) take precedence,
    // mirroring GLSL's permission to overload builtins
    auto fit = sh.functions.find(fn);
    if (fit != sh.functions.end()) return call_user(fit->second, e);
    if (sh.struct_types.count(fn))
      throw EvalError("struct constructor '" + fn + "(...)' is only "
                      "supported as a variable initializer");
    if (fn == "__length") {  // arr.length() / vec.length()
      const Expr& base = *e.args[0];
      if (base.kind == Expr::Var)
        if (std::vector<Val>* arr = lookup_arr(base.name))
          return Val::iscalar(int(arr->size()));
      return Val::iscalar(eval(base).n);
    }
    // constructors
    if (fn == "float") return Val::scalar(eval(*e.args[0]).v[0]);
    if (fn == "int") return Val::iscalar(int(eval(*e.args[0]).v[0]));
    if (fn == "vec2" || fn == "vec3" || fn == "vec4" || fn == "ivec2" ||
        fn == "ivec3" || fn == "ivec4" || fn == "bvec2" || fn == "bvec3" ||
        fn == "bvec4") {
      bool to_int = fn[0] == 'i', to_bool = fn[0] == 'b';
      int n = fn[fn.size() - 1] - '0';
      Val out;
      out.n = n;
      out.is_int = to_int;
      auto coerce = [&](Val& o) {
        for (int i = 0; i < o.n; ++i) {
          if (to_int) o.v[i] = float(long(o.v[i]));
          if (to_bool) o.v[i] = o.v[i] != 0.f ? 1.f : 0.f;
        }
        return o;
      };
      if (to_int || to_bool) {
        // same fill rules as vecN below, then coerce components
        if (e.args.size() == 1) {
          Val a = eval(*e.args[0]);
          if (a.mat) throw EvalError(fn + " constructor takes scalars/vectors");
          if (a.n == 1)
            for (int i = 0; i < n; ++i) out.v[i] = a.v[0];
          else
            for (int i = 0; i < n && i < a.n; ++i) out.v[i] = a.v[i];
          return coerce(out);
        }
        int k0 = 0;
        for (const auto& argp : e.args) {
          Val a = eval(*argp);
          if (a.mat) throw EvalError(fn + " constructor takes scalars/vectors");
          for (int i = 0; i < a.n && k0 < n; ++i) out.v[k0++] = a.v[i];
        }
        if (k0 != n) throw EvalError(fn + " constructor arity mismatch");
        return coerce(out);
      }
      if (e.args.size() == 1) {
        Val a = eval(*e.args[0]);
        if (a.n == 1)
          for (int i = 0; i < n; ++i) out.v[i] = a.v[0];  // splat
        else
          for (int i = 0; i < n && i < a.n; ++i) out.v[i] = a.v[i];
        return out;
      }
      int k = 0;
      for (const auto& arg : e.args) {
        Val a = eval(*arg);
        if (a.mat) throw EvalError(fn + " constructor takes scalars/vectors");
        for (int i = 0; i < a.n && k < n; ++i) out.v[k++] = a.v[i];
      }
      if (k != n) throw EvalError(fn + " constructor arity mismatch");
      return out;
    }
    if (fn == "mat2" || fn == "mat3" || fn == "mat4") {
      int N = fn[3] - '0';
      Val out;
      out.mat = N;
      out.n = N;
      if (e.args.size() == 1) {
        Val a = eval(*e.args[0]);
        if (a.n == 1 && !a.mat) {        // diagonal constructor
          for (int i = 0; i < N; ++i) out.v[i * N + i] = a.v[0];
          return out;
        }
        if (a.mat == N) return a;        // copy
        throw EvalError(fn + "(...) single argument must be a scalar or " + fn);
      }
      int k = 0;
      for (const auto& argp : e.args) {  // column-major fill from scalars/vecs
        Val a = eval(*argp);
        if (a.mat) throw EvalError(fn + " constructor takes scalars/vectors");
        for (int i = 0; i < a.n && k < N * N; ++i) out.v[k++] = a.v[i];
      }
      if (k != N * N)
        throw EvalError(fn + " constructor needs " + std::to_string(N * N) +
                        " components, got " + std::to_string(k));
      return out;
    }
    if (fn == "transpose") {
      if (e.args.empty()) throw EvalError("transpose: missing argument");
      Val a = eval(*e.args[0]);
      if (!a.mat) throw EvalError("transpose() needs a matrix");
      Val out = a;
      for (int c = 0; c < a.mat; ++c)
        for (int r = 0; r < a.mat; ++r) out.v[r * a.mat + c] = a.v[c * a.mat + r];
      return out;
    }
    if (fn == "texture" || fn == "texture2D") {
      // (sampler, coord[, bias]) — the LOD bias is meaningless without
      // mipmaps, so a third argument is accepted and ignored
      if (e.args.size() < 2 || e.args.size() > 3 ||
          e.args[0]->kind != Expr::Var)
        throw EvalError("texture() needs (sampler, coord)");
      auto it = samplers.find(e.args[0]->name);
      if (it == samplers.end())
        throw EvalError("'" + e.args[0]->name + "' is not a sampler2D");
      Val uv = eval(*e.args[1]);
      return sample(it->second, uv.v[0], uv.v[1]);
    }
    if (fn == "textureSize") {
      // (sampler[, lod]) -> ivec2(width, height); lod ignored (no mipmaps)
      if (e.args.empty() || e.args[0]->kind != Expr::Var)
        throw EvalError("textureSize() needs a sampler argument");
      auto it = samplers.find(e.args[0]->name);
      if (it == samplers.end())
        throw EvalError("'" + e.args[0]->name + "' is not a sampler2D");
      Val out;
      out.n = 2;
      out.is_int = true;
      if (it->second.img) {
        out.v[0] = float(it->second.img->width);
        out.v[1] = float(it->second.img->height);
      }
      return out;
    }
    auto arg = [&](size_t i) {
      if (i >= e.args.size()) throw EvalError(fn + ": missing argument");
      return eval(*e.args[i]);
    };
    // componentwise unary
    if (fn == "floor") return map1(arg(0), std::floor);
    if (fn == "ceil") return map1(arg(0), std::ceil);
    if (fn == "fract") return map1(arg(0), [](float x) { return x - std::floor(x); });
    if (fn == "abs") {  // GLSL has an int overload: abs(int) is int
      Val a = arg(0);
      Val out = map1(a, std::fabs);
      out.is_int = a.is_int;
      return out;
    }
    if (fn == "sqrt") return map1(arg(0), std::sqrt);
    if (fn == "sin") return map1(arg(0), std::sin);
    if (fn == "cos") return map1(arg(0), std::cos);
    if (fn == "tan") return map1(arg(0), std::tan);
    if (fn == "exp") return map1(arg(0), std::exp);
    if (fn == "exp2") return map1(arg(0), std::exp2);
    if (fn == "log") return map1(arg(0), std::log);
    if (fn == "sign") {  // int overload: sign(int) is int
      Val a = arg(0);
      Val out = map1(a, [](float x) { return float((x > 0) - (x < 0)); });
      out.is_int = a.is_int;
      return out;
    }
    // componentwise binary
    if (fn == "pow") return broadcast_op(arg(0), arg(1), [](float x, float y) { return std::pow(x, y); }, "pow");
    if (fn == "mod") return broadcast_op(arg(0), arg(1), [](float x, float y) { return x - y * std::floor(x / y); }, "mod");
    if (fn == "min" || fn == "max") {  // int overloads: min/max(int, int) is int
      Val a = arg(0), b = arg(1);
      Val out = fn == "min"
          ? broadcast_op(a, b, [](float x, float y) { return std::min(x, y); }, "min")
          : broadcast_op(a, b, [](float x, float y) { return std::max(x, y); }, "max");
      out.is_int = a.is_int && b.is_int;
      return out;
    }
    if (fn == "step") return broadcast_op(arg(0), arg(1), [](float e0, float x) { return x < e0 ? 0.f : 1.f; }, "step");
    if (fn == "distance") {
      Val a = arg(0), b = arg(1);
      double s = 0;
      for (int i = 0; i < std::max(a.n, b.n); ++i) {
        double d = a.v[a.n == 1 ? 0 : i] - b.v[b.n == 1 ? 0 : i];
        s += d * d;
      }
      return Val::scalar(float(std::sqrt(s)));
    }
    if (fn == "dot") {
      Val a = arg(0), b = arg(1);
      double s = 0;
      for (int i = 0; i < a.n; ++i) s += double(a.v[i]) * b.v[b.n == 1 ? 0 : i];
      return Val::scalar(float(s));
    }
    if (fn == "length") {
      Val a = arg(0);
      double s = 0;
      for (int i = 0; i < a.n; ++i) s += double(a.v[i]) * a.v[i];
      return Val::scalar(float(std::sqrt(s)));
    }
    if (fn == "normalize") {
      Val a = arg(0);
      double s = 0;
      for (int i = 0; i < a.n; ++i) s += double(a.v[i]) * a.v[i];
      float inv = s > 0 ? float(1.0 / std::sqrt(s)) : 0.f;
      Val out = a;
      for (int i = 0; i < a.n; ++i) out.v[i] = a.v[i] * inv;
      return out;
    }
    // ternary builtins
    if (fn == "clamp") {  // int overload: clamp(int, int, int) is int
      Val x = arg(0), lo = arg(1), hi = arg(2);
      Val t = broadcast_op(x, lo, [](float a, float b) { return std::max(a, b); }, "clamp");
      Val out = broadcast_op(t, hi, [](float a, float b) { return std::min(a, b); }, "clamp");
      out.is_int = x.is_int && lo.is_int && hi.is_int;
      return out;
    }
    if (fn == "mix") {
      Val a = arg(0), b = arg(1), t = arg(2);
      Val d = broadcast_op(b, a, [](float x, float y) { return x - y; }, "mix");
      Val td = broadcast_op(t, d, [](float x, float y) { return x * y; }, "mix");
      return broadcast_op(a, td, [](float x, float y) { return x + y; }, "mix");
    }
    if (fn == "smoothstep") {
      Val e0 = arg(0), e1 = arg(1), x = arg(2);
      Val num = broadcast_op(x, e0, [](float a, float b) { return a - b; }, "smoothstep");
      Val den = broadcast_op(e1, e0, [](float a, float b) { return a - b; }, "smoothstep");
      Val t = broadcast_op(num, den, [](float a, float b) { return b == 0.f ? 0.f : a / b; }, "smoothstep");
      t = map1(t, [](float v) { return std::min(std::max(v, 0.f), 1.f); });
      return map1(t, [](float v) { return v * v * (3.f - 2.f * v); });
    }
    throw EvalError("unsupported function '" + fn + "'");
  }

  // Capture a struct-valued `return` expression into ret_struct_*.
  // Returns false when the expression is not struct-valued (normal return).
  bool exec_struct_return(const Expr& e) {
    std::string inst = instance_of(e);
    if (!inst.empty()) {
      const std::string& ty = struct_locals.at(inst);
      ret_struct_type = ty;
      ret_struct_fields.clear();
      std::vector<std::pair<std::string, std::string>> leaves;
      struct_leaves(ty, "", leaves);
      for (const auto& lf : leaves)
        ret_struct_fields[lf.second] = locals.at(inst + "." + lf.second);
      return true;
    }
    if (e.kind == Expr::Call && sh.struct_types.count(e.name)) {
      // build the value in a reserved temp, then capture its leaves
      std::string tmp = "__ret_tmp";
      ctor_into(tmp, e.name, e);
      ret_struct_type = e.name;
      ret_struct_fields.clear();
      std::vector<std::pair<std::string, std::string>> leaves;
      struct_leaves(e.name, "", leaves);
      for (const auto& lf : leaves)
        ret_struct_fields[lf.second] = locals.at(tmp + "." + lf.second);
      return true;
    }
    if (e.kind == Expr::Call) {  // return makeLight(...);  (chained)
      auto fit = sh.functions.find(e.name);
      if (fit != sh.functions.end() &&
          sh.struct_types.count(fit->second.ret_type)) {
        bool saved = struct_result_ok;
        struct_result_ok = true;
        eval_call(e);  // fills ret_struct_* via the callee's return
        struct_result_ok = saved;
        return true;
      }
    }
    return false;
  }

  // Consume a struct-returning user-function call into the fields of a
  // declared instance (`Light l = makeLight();` / `l = makeLight();`).
  // Returns false when the expression is not such a call.
  bool struct_call_into(const Expr& e, const std::string& dst,
                        const std::string& want_type) {
    if (e.kind != Expr::Call) return false;
    auto fit = sh.functions.find(e.name);
    if (fit == sh.functions.end() ||
        !sh.struct_types.count(fit->second.ret_type))
      return false;
    if (fit->second.ret_type != want_type)
      throw EvalError("cannot assign '" + fit->second.ret_type +
                      "' result of " + e.name + "() to '" + want_type +
                      " " + dst + "'");
    bool saved = struct_result_ok;
    struct_result_ok = true;
    eval_call(e);
    struct_result_ok = saved;
    for (const auto& kv : ret_struct_fields)
      locals[dst + "." + kv.first] = kv.second;
    return true;
  }

  // `Light ls[2];` / `Light ls[2] = Light[](Light(...), Light(...));`
  // Elements live as dotted locals "ls.k.field".
  void exec_struct_array_decl(const Stmt& st) {
    int size = st.expr ? index_of(eval(*st.expr), "array size", 0x7fffffff)
                       : int(st.elems.size());
    if (!st.elems.empty() && size != int(st.elems.size()))
      throw EvalError("array '" + st.name + "' declares " +
                      std::to_string(size) + " elements but initializes " +
                      std::to_string(st.elems.size()));
    if (size <= 0 || size > 256)
      throw EvalError("struct array '" + st.name +
                      "' needs a size in [1, 256]");
    for (int k = 0; k < size; ++k) {
      std::string prefix = st.name + "." + std::to_string(k);
      if (st.elems.empty()) {
        std::vector<std::pair<std::string, std::string>> leaves;
        struct_leaves(st.op, "", leaves);
        for (const auto& lf : leaves)
          locals[prefix + "." + lf.second] = zero_of(lf.first);
      } else {
        const Expr& el = *st.elems[k];
        if (el.kind != Expr::Call || el.name != st.op)
          throw EvalError("struct array elements must be " + st.op +
                          "(...) constructors");
        ctor_into(prefix, st.op, el);
      }
      register_instance(prefix, st.op);  // each element is an instance
    }
    struct_arrays[st.name] = {st.op, size};
  }

  // Resolve `lights[i]` (struct-array element) to its dotted instance name;
  // empty when the expression is not a struct-array index.
  std::string struct_elem_name(const Expr& e) {
    if (e.kind != Expr::Index || e.args[0]->kind != Expr::Var) return "";
    auto it = struct_arrays.find(e.args[0]->name);
    if (it == struct_arrays.end()) return "";
    int i = index_of(eval(*e.args[1]),
                     ("struct array '" + it->first + "'").c_str(),
                     it->second.second);
    return it->first + "." + std::to_string(i);
  }

  // Enumerate the LEAF fields of a struct type as (leaf type, dotted
  // suffix) — nested struct fields recurse, so `Hit{Material mat; float t}`
  // yields ("vec3","mat.albedo"), ..., ("float","t").
  void struct_leaves(const std::string& ty, const std::string& prefix,
                     std::vector<std::pair<std::string, std::string>>& out) {
    for (const auto& fld : sh.struct_types.at(ty)) {
      std::string p =
          prefix.empty() ? fld.second : prefix + "." + fld.second;
      if (sh.struct_types.count(fld.first))
        struct_leaves(fld.first, p, out);
      else
        out.emplace_back(fld.first, p);
    }
  }

  // Register `name` as an instance of `ty`, plus its nested struct fields
  // as instances in their own right (so `scene.key = otherLight;` works).
  void register_instance(const std::string& name, const std::string& ty) {
    struct_locals[name] = ty;
    for (const auto& fld : sh.struct_types.at(ty))
      if (sh.struct_types.count(fld.first))
        register_instance(name + "." + fld.second, fld.first);
  }

  // Evaluate a `Ty(...)` constructor into the dotted instance `dst`.
  // Struct-typed fields accept an instance expression or a nested
  // constructor call.
  void ctor_into(const std::string& dst, const std::string& ty,
                 const Expr& call) {
    const auto& fields = sh.struct_types.at(ty);
    if (call.args.size() != fields.size())
      throw EvalError("constructor " + ty + "(...) expects " +
                      std::to_string(fields.size()) + " arguments, got " +
                      std::to_string(call.args.size()));
    for (size_t i = 0; i < fields.size(); ++i) {
      const std::string& fty = fields[i].first;
      std::string fdst = dst + "." + fields[i].second;
      if (sh.struct_types.count(fty)) {
        const Expr& a = *call.args[i];
        if (a.kind == Expr::Call && a.name == fty) {
          ctor_into(fdst, fty, a);
        } else if (struct_call_into(a, fdst, fty)) {
          // struct-returning function as a nested-field argument
        } else {
          std::string src = instance_of(a);
          if (src.empty() || struct_locals.at(src) != fty)
            throw EvalError("field " + std::to_string(i + 1) + " of " + ty +
                            "(...) must be a '" + fty + "' instance or " +
                            fty + "(...) constructor");
          copy_leaves(fdst, src, fty);
        }
      } else {
        Val fv = eval(*call.args[i]);
        coerce_to_type(fv, fty);
        locals[fdst] = fv;
      }
    }
  }

  void copy_leaves(const std::string& dst, const std::string& src,
                   const std::string& ty) {
    std::vector<std::pair<std::string, std::string>> leaves;
    struct_leaves(ty, "", leaves);
    for (const auto& lf : leaves)
      locals[dst + "." + lf.second] = locals.at(src + "." + lf.second);
  }

  // Assign a whole struct instance at dotted name `dst` of type `ty` from
  // an rhs expression: another instance, a constructor, or a
  // struct-returning user function.  Only '=' is meaningful.
  void struct_assign_instance(const std::string& dst, const std::string& ty,
                              const Expr& rhs, const std::string& op) {
    if (op != "=")
      throw EvalError("only '=' is supported for whole-struct assignment");
    if (struct_call_into(rhs, dst, ty)) return;
    if (rhs.kind == Expr::Call && rhs.name == ty) {  // ctor rhs
      ctor_into(dst, ty, rhs);
      return;
    }
    std::string src = instance_of(rhs);
    if (src.empty() || struct_locals.at(src) != ty)
      throw EvalError("a struct instance can only be assigned from another "
                      "instance of the same type, a " + ty +
                      "(...) constructor, or a struct-returning function");
    copy_leaves(dst, src, ty);
  }

  // Declared type of the leaf field at dotted `path` inside struct `ty`
  // ("" when the path does not name a leaf field).
  std::string field_type_of(const std::string& ty, const std::string& path) {
    std::vector<std::pair<std::string, std::string>> leaves;
    struct_leaves(ty, "", leaves);
    for (const auto& lf : leaves)
      if (lf.second == path) return lf.first;
    return "";
  }

  // `lights[i] = <instance|ctor|fn>` /
  // `lights[i].field(.nested)*(.swz)? op= expr` — field paths resolve at any
  // nesting depth, matching the non-array Assign path.
  void exec_struct_array_assign(const Stmt& st) {
    const auto& arr = struct_arrays.at(st.name);
    int i = index_of(eval(*st.index),
                     ("struct array '" + st.name + "'").c_str(), arr.second);
    std::string inst = st.name + "." + std::to_string(i);
    if (st.swizzle.empty()) {
      struct_assign_instance(inst, arr.first, *st.expr, st.op);
      return;
    }
    // whole-nested-instance target: `arr[i].inner = <Inner>`
    std::string full = inst + "." + st.swizzle;
    if (struct_locals.count(full)) {
      struct_assign_instance(full, struct_locals.at(full), *st.expr, st.op);
      return;
    }
    // leaf-field target (any depth): `arr[i].inner.field op= expr`, else
    // split a trailing swizzle: `arr[i].inner.field.xy op= expr`
    std::string field = st.swizzle, swz;
    auto fit = locals.find(full);
    if (fit == locals.end()) {
      size_t dot = field.rfind('.');
      if (dot != std::string::npos) {
        swz = field.substr(dot + 1);
        field = field.substr(0, dot);
        fit = locals.find(inst + "." + field);
      }
    }
    if (fit == locals.end())
      throw EvalError("struct '" + arr.first + "' has no field path '" +
                      st.swizzle + "'");
    Val rhs = eval(*st.expr);
    if (swz.empty()) {
      if (st.op == "=") {
        fit->second = rhs;
      } else {
        fit->second = arith(fit->second, rhs, std::string(1, st.op[0]));
      }
      std::string fty = field_type_of(arr.first, field);
      if (!fty.empty()) coerce_to_type(fit->second, fty);
      return;
    }
    for (size_t k = 0; k < swz.size(); ++k) {
      int idx = swizzle_index(swz[k]);
      if (idx >= fit->second.n)
        throw EvalError("swizzle assignment ." + swz + " out of range");
      float r = rhs.v[rhs.n == 1 ? 0 : int(k)];
      float& t = fit->second.v[idx];
      if (st.op == "=") t = r;
      else if (st.op == "+=") t += r;
      else if (st.op == "-=") t -= r;
      else if (st.op == "*=") t *= r;
      else t /= r;
    }
  }

  // Resolve an expression naming a struct instance — a plain variable, a
  // struct-array element, or a nested member chain (`scene.key`) — to its
  // dotted storage name ("" otherwise).
  std::string instance_of(const Expr& e) {
    if (e.kind == Expr::Var && struct_locals.count(e.name)) return e.name;
    if (e.kind == Expr::Member) {
      std::string path = member_chain(e);
      if (!path.empty() && struct_locals.count(path)) return path;
      return "";
    }
    return struct_elem_name(e);
  }

  // Textual dotted path of a Var/Index/Member chain ("" when the chain is
  // not rooted at a variable or struct-array element).
  std::string member_chain(const Expr& e) {
    if (e.kind == Expr::Var) return e.name;
    if (e.kind == Expr::Index) return struct_elem_name(e);
    if (e.kind == Expr::Member) {
      std::string b = member_chain(*e.args[0]);
      return b.empty() ? "" : b + "." + e.name;
    }
    return "";
  }

  // `Light l;` / `Light l = Light(dir, power);` / `Light l2 = l;`
  void exec_struct_decl(const Stmt& st) {
    if (!st.expr) {
      std::vector<std::pair<std::string, std::string>> leaves;
      struct_leaves(st.op, "", leaves);
      for (const auto& lf : leaves)
        locals[st.name + "." + lf.second] = zero_of(lf.first);
    } else if (st.expr->kind == Expr::Call && st.expr->name == st.op) {
      ctor_into(st.name, st.op, *st.expr);
    } else if (!instance_of(*st.expr).empty()) {
      std::string src = instance_of(*st.expr);
      if (struct_locals.at(src) != st.op)
        throw EvalError("cannot initialize '" + st.op + " " + st.name +
                        "' from a '" + struct_locals.at(src) +
                        "' instance");
      copy_leaves(st.name, src, st.op);
    } else if (struct_call_into(*st.expr, st.name, st.op)) {
      // Light l = makeLight(...): fields written by the call's return
    } else {
      throw EvalError("a struct variable must be initialized with a " +
                      st.op + "(...) constructor, another " + st.op +
                      " instance, or a " + st.op + "-returning function");
    }
    register_instance(st.name, st.op);
  }

  Val call_user(const Func& f, const Expr& e) {
    bool struct_ret = sh.struct_types.count(f.ret_type) > 0;
    if (struct_ret && !struct_result_ok)
      throw EvalError("'" + e.name + "' returns a struct ('" + f.ret_type +
                      "'): use it to initialize or assign a " + f.ret_type +
                      " variable (not inside a larger expression)");
    if (e.args.size() != f.param_names.size())
      throw EvalError("function '" + e.name + "' expects " +
                      std::to_string(f.param_names.size()) + " arguments, got " +
                      std::to_string(e.args.size()));
    if (++call_depth > 64) {
      --call_depth;
      throw EvalError("call depth exceeded in '" + e.name +
                      "' (recursion is not allowed in GLSL)");
    }
    // evaluate args in the caller's scope, then run the body in a fresh one.
    // A bare variable naming an array passes the array by value (GLSL
    // array-parameter semantics).
    std::vector<Val> argv(e.args.size());
    std::map<std::string, std::vector<Val>> arr_args;
    // struct arguments pass by value like arrays: the caller instance's
    // fields are copied under the parameter's name in the callee scope
    std::map<std::string, Val> struct_fields;
    std::map<std::string, std::string> struct_args;
    std::map<std::string, std::pair<std::string, int>> struct_array_args;
    for (size_t i = 0; i < e.args.size(); ++i) {
      const Expr& a = *e.args[i];
      const std::string& pty =
          i < f.param_types.size() ? f.param_types[i] : std::string();
      if (pty.size() > 2 && pty.compare(pty.size() - 2, 2, "[]") == 0 &&
          sh.struct_types.count(pty.substr(0, pty.size() - 2))) {
        // struct ARRAY parameter (by value): copy every element's leaves
        std::string ety = pty.substr(0, pty.size() - 2);
        if (a.kind != Expr::Var || !struct_arrays.count(a.name) ||
            struct_arrays.at(a.name).first != ety)
          throw EvalError("argument " + std::to_string(i + 1) + " of '" +
                          e.name + "' must be a '" + ety + "' array");
        int n = struct_arrays.at(a.name).second;
        std::vector<std::pair<std::string, std::string>> leaves;
        struct_leaves(ety, "", leaves);
        for (int k = 0; k < n; ++k)
          for (const auto& lf : leaves)
            struct_fields[f.param_names[i] + "." + std::to_string(k) + "." +
                          lf.second] =
                locals.at(a.name + "." + std::to_string(k) + "." + lf.second);
        struct_array_args[f.param_names[i]] = {ety, n};
        continue;
      }
      if (sh.struct_types.count(pty)) {
        std::string inst = instance_of(a);
        if (!inst.empty() && struct_locals.at(inst) != pty)
          throw EvalError("argument " + std::to_string(i + 1) + " of '" +
                          e.name + "' must be a '" + pty + "' instance");
        if (inst.empty()) {
          // a constructor or struct-returning call as the argument: build
          // the value into a reserved temp, then pass its leaves by value
          std::string tmp = "__arg_tmp" + std::to_string(i);
          if (a.kind == Expr::Call && a.name == pty)
            ctor_into(tmp, pty, a);
          else if (!struct_call_into(a, tmp, pty))
            throw EvalError("argument " + std::to_string(i + 1) + " of '" +
                            e.name + "' must be a '" + pty + "' instance");
          inst = tmp;
        }
        std::vector<std::pair<std::string, std::string>> leaves;
        struct_leaves(pty, "", leaves);
        for (const auto& lf : leaves)
          struct_fields[f.param_names[i] + "." + lf.second] =
              locals.at(inst + "." + lf.second);
        struct_args[f.param_names[i]] = pty;
        continue;
      }
      if (a.kind == Expr::Var) {
        if (std::vector<Val>* arr = lookup_arr(a.name)) {
          arr_args[f.param_names[i]] = *arr;
          continue;
        }
      }
      // arguments are never struct-result consumers: a struct-returning
      // call nested in an argument list must error, not silently bind a
      // dummy value to the parameter
      bool saved_ok = struct_result_ok;
      struct_result_ok = false;
      argv[i] = eval(a);
      struct_result_ok = saved_ok;
      // bind with the declared parameter type's semantics: third(1) with
      // `float third(float x)` converts the int 1 to float at the call
      coerce_to_type(argv[i], pty);
    }
    std::map<std::string, Val> saved_locals;
    saved_locals.swap(locals);
    std::map<std::string, std::vector<Val>> saved_arrays;
    saved_arrays.swap(arrays);
    std::map<std::string, std::string> saved_structs;
    saved_structs.swap(struct_locals);
    std::map<std::string, std::pair<std::string, int>> saved_struct_arrays;
    saved_struct_arrays.swap(struct_arrays);
    bool saved_returned = returned;
    for (size_t i = 0; i < argv.size(); ++i)
      if (!arr_args.count(f.param_names[i]) &&
          !struct_args.count(f.param_names[i]) &&
          !struct_array_args.count(f.param_names[i]))
        locals[f.param_names[i]] = argv[i];
    arrays.swap(arr_args);
    locals.insert(struct_fields.begin(), struct_fields.end());
    struct_locals.swap(struct_args);
    struct_arrays = struct_array_args;
    {
      // nested struct fields of struct params are instances in their own
      // right (snapshot first: register_instance mutates struct_locals)
      std::vector<std::pair<std::string, std::string>> params(
          struct_locals.begin(), struct_locals.end());
      for (const auto& kv : params) register_instance(kv.first, kv.second);
      // struct-array params: each element is an instance
      for (const auto& kv : struct_array_args)
        for (int k = 0; k < kv.second.second; ++k)
          register_instance(kv.first + "." + std::to_string(k),
                            kv.second.first);
    }
    returned = false;
    ret_val = Val{};
    ret_struct_type.clear();
    exec(f.body);
    Val result = ret_val;
    if (!returned && f.ret_type != "void")
      throw EvalError("function '" + e.name + "' ended without a return");
    if (struct_ret && ret_struct_type != f.ret_type)
      throw EvalError("function '" + e.name + "' must return a '" +
                      f.ret_type + "' instance" +
                      (ret_struct_type.empty()
                           ? std::string(" (returned a non-struct value)")
                           : " (returned '" + ret_struct_type + "')"));
    if (!struct_ret && !ret_struct_type.empty())
      throw EvalError("function '" + e.name + "' is declared '" + f.ret_type +
                      "' but returned a '" + ret_struct_type +
                      "' struct instance");
    locals.swap(saved_locals);
    arrays.swap(saved_arrays);
    struct_locals.swap(saved_structs);
    struct_arrays.swap(saved_struct_arrays);
    returned = saved_returned;
    --call_depth;
    return result;
  }

  void exec(const std::vector<StmtP>& body) {
    for (const auto& st : body) {
      if (returned || broke || continued) return;
      exec_stmt(*st);
    }
  }

  void exec_stmt(const Stmt& stmt) {
    const Stmt* st = &stmt;
    {
      switch (st->kind) {
        case Stmt::Decl: {
          if (sh.struct_types.count(st->op)) {
            exec_struct_decl(*st);
            break;
          }
          Val v = st->expr ? eval(*st->expr) : Val{};
          // declared type coerces (GLSL: int i = ..., ivec2 ts = ...,
          // float f = 1 makes the 1 a float)
          coerce_to_type(v, st->op);
          locals[st->name] = v;
          break;
        }
        case Stmt::DeclArr: {
          if (sh.struct_types.count(st->op)) {
            exec_struct_array_decl(*st);
            break;
          }
          std::vector<Val> vals;
          vals.reserve(st->elems.size());
          for (const auto& el : st->elems) {
            vals.push_back(eval(*el));
            // element type coerces: float k[2] = float[](1, 2) holds floats
            coerce_to_type(vals.back(), st->op);
          }
          int size = st->expr ? index_of(eval(*st->expr), "array size",
                                         0x7fffffff)
                              : int(vals.size());
          if (!vals.empty() && size != int(vals.size()))
            throw EvalError("array '" + st->name + "' declares " +
                            std::to_string(size) + " elements but initializes " +
                            std::to_string(vals.size()));
          if (size <= 0 || size > (1 << 16))
            throw EvalError("array '" + st->name + "' needs a size in [1, 65536]");
          if (vals.empty()) vals.resize(size);
          arrays[st->name] = std::move(vals);
          break;
        }
        case Stmt::Assign: {
          // struct whole-field target: `light.dir = ...` parses as
          // name=light, swizzle=dir — when that dotted local exists, assign
          // the field as a whole (with the declared field type's coercion)
          if (!st->index && !st->swizzle.empty()) {
            auto fit = locals.find(st->name + "." + st->swizzle);
            if (fit != locals.end() && struct_locals.count(st->name)) {
              Val rhs = eval(*st->expr);
              if (st->op == "=") {
                fit->second = rhs;
              } else {
                fit->second = arith(fit->second, rhs,
                                    std::string(1, st->op[0]));
              }
              const auto& fields =
                  sh.struct_types.at(struct_locals.at(st->name));
              for (const auto& fld : fields)
                if (fld.second == st->swizzle)
                  coerce_to_type(fit->second, fld.first);
              break;
            }
            // nested-instance target: `scene.key = <Light>` (any depth)
            std::string full = st->name + "." + st->swizzle;
            if (struct_locals.count(full)) {
              struct_assign_instance(full, struct_locals.at(full),
                                     *st->expr, st->op);
              break;
            }
          }
          // struct-array element targets: `lights[i] = ...` (whole element)
          // and `lights[i].field(.swz)? op= ...`
          if (st->index && struct_arrays.count(st->name)) {
            exec_struct_array_assign(*st);
            break;
          }
          // whole-instance copy: `l2 = l;` / `l2 = lights[i];` /
          // `l2 = makeLight();`
          if (!st->index && st->swizzle.empty() &&
              struct_locals.count(st->name)) {
            struct_assign_instance(st->name, struct_locals.at(st->name),
                                   *st->expr, st->op);
            break;
          }
          Val rhs = eval(*st->expr);
          if (st->index) {  // element target: name[idx](.swz)? op= rhs
            std::vector<Val>* arr = lookup_arr(st->name, /*mutable_only=*/true);
            if (!arr) {
              if (lookup_arr(st->name))
                throw EvalError("cannot assign to const array '" + st->name + "'");
              // dynamic component assignment on a vec local: v[i] = x
              Val* vec = lookup(st->name);
              if (!vec)
                throw EvalError("undefined array '" + st->name + "'");
              if (vec->mat) {  // m[i] = vec: column write
                if (!st->swizzle.empty())
                  throw EvalError("cannot swizzle a matrix column write");
                int c = index_of(eval(*st->index), "matrix", vec->mat);
                if (st->op != "=")
                  throw EvalError("only '=' is supported for matrix columns");
                if (rhs.mat || rhs.n != vec->mat)
                  throw EvalError("matrix column needs a vec" +
                                  std::to_string(vec->mat) + " value");
                for (int r = 0; r < vec->mat; ++r)
                  vec->v[c * vec->mat + r] = rhs.v[r];
                break;
              }
              if (!st->swizzle.empty())
                throw EvalError("cannot swizzle a scalar component of '" +
                                st->name + "'");
              int ci = index_of(eval(*st->index), "vector", vec->n);
              float& t = vec->v[ci];
              float r = rhs.v[0];
              if (st->op == "=") t = r;
              else if (st->op == "+=") t += r;
              else if (st->op == "-=") t -= r;
              else if (st->op == "*=") t *= r;
              else t /= r;
              break;
            }
            int i = index_of(eval(*st->index),
                             ("array '" + st->name + "'").c_str(),
                             int(arr->size()));
            Val& el = (*arr)[i];
            if (st->swizzle.empty()) {
              if (st->op == "=") {
                el = rhs;
              } else {
                el = arith(el, rhs, std::string(1, st->op[0]));
              }
            } else {
              for (size_t k = 0; k < st->swizzle.size(); ++k) {
                int idx = swizzle_index(st->swizzle[k]);
                if (idx >= el.n)
                  throw EvalError("swizzle assignment ." + st->swizzle +
                                  " out of range");
                float r = rhs.v[rhs.n == 1 ? 0 : int(k)];
                float& t = el.v[idx];
                if (st->op == "=") t = r;
                else if (st->op == "+=") t += r;
                else if (st->op == "-=") t -= r;
                else if (st->op == "*=") t *= r;
                else t /= r;
              }
            }
            break;
          }
          Val* target = lookup(st->name);
          if (!target) {  // assigning to an undeclared name (e.g. gl_FragColor)
            if (lookup_arr(st->name))
              throw EvalError("cannot assign an array '" + st->name +
                              "' wholesale (assign elements instead)");
            locals[st->name] = Val{};
            target = &locals[st->name];
            target->n = 4;
          }
          if (st->swizzle.empty()) {
            if (st->op == "=") {
              *target = rhs;
            } else {
              *target = arith(*target, rhs, std::string(1, st->op[0]));
            }
          } else {
            for (size_t i = 0; i < st->swizzle.size(); ++i) {
              int idx = swizzle_index(st->swizzle[i]);
              if (idx >= target->n)
                throw EvalError("swizzle assignment ." + st->swizzle + " out of range");
              float r = rhs.v[rhs.n == 1 ? 0 : int(i)];
              float& t = target->v[idx];
              if (st->op == "=") t = r;
              else if (st->op == "+=") t += r;
              else if (st->op == "-=") t -= r;
              else if (st->op == "*=") t *= r;
              else t /= r;
            }
          }
          break;
        }
        case Stmt::If: {
          Val c = eval(*st->expr);
          exec(c.v[0] != 0.f ? st->then_body : st->else_body);
          break;
        }
        case Stmt::For: {
          if (st->init) exec_stmt(*st->init);
          long iters = 0;
          while (!st->expr || eval(*st->expr).v[0] != 0.f) {
            exec(st->then_body);
            if (returned) break;
            if (broke) { broke = false; break; }
            continued = false;  // `continue` still runs the increment
            if (st->incr) exec_stmt(*st->incr);
            if (++iters > kMaxLoopIters)
              throw EvalError("for-loop exceeded the per-pixel iteration "
                              "budget (1e6) — unbounded loop?");
          }
          break;
        }
        case Stmt::While: {
          long iters = 0;
          while (eval(*st->expr).v[0] != 0.f) {
            exec(st->then_body);
            if (returned) break;
            if (broke) { broke = false; break; }
            continued = false;
            if (++iters > kMaxLoopIters)
              throw EvalError("while-loop exceeded the per-pixel iteration "
                              "budget (1e6) — unbounded loop?");
          }
          break;
        }
        case Stmt::Break:
          broke = true;
          return;
        case Stmt::Continue:
          continued = true;
          return;
        case Stmt::Return:
          // `return instance;` / `return Type(...);` / `return makeT(...);`
          // capture the struct fields before the call-scope swap drops them
          if (st->expr && exec_struct_return(*st->expr)) {
            returned = true;
            return;
          }
          // a non-struct return: clear any capture left by an inner call so
          // call_user can tell whether THIS function's final return was a
          // struct (declared-type mismatch check)
          ret_struct_type.clear();
          ret_val = st->expr ? eval(*st->expr) : Val{};
          returned = true;
          return;
        case Stmt::ExprStmt:
          eval(*st->expr);
          break;
      }
    }
  }
};

Val Parser::const_eval(const Expr& e) {
  // uniform defaults are literal expressions; evaluate with an empty env
  Shader dummy;
  Interp in(dummy);
  return in.eval(e);
}

}  // namespace

bool looks_like_glsl(const std::string& source) {
  return source.find("void main") != std::string::npos;
}

GlslResult run_glsl_shader(const std::string& source, const Image& rgb,
                           const Image& depth, const Params& uniforms) {
  GlslResult res;
  try {
    Parser parser(source);
    Shader sh = parser.parse();
    if (sh.body.empty()) throw EvalError("shader has no main() body");

    Interp in(sh);
    for (const auto& kv : sh.consts) in.globals[kv.first] = kv.second;
    in.const_arrays = sh.const_arrays;
    // bind samplers by convention (reference main.cpp:126-137 binds
    // u_texture to unit 0 and u_depth to unit 1)
    for (const auto& kv : sh.uniforms) {
      if (kv.second.sampler) {
        Sampler s;
        bool is_depth = kv.first.find("depth") != std::string::npos;
        s.img = is_depth ? (depth.empty() ? nullptr : &depth) : &rgb;
        s.is_depth = is_depth;
        in.samplers[kv.first] = s;
      }
    }
    // uniform values: CLI/params override > shader default > auto-binding
    for (const auto& kv : sh.uniforms) {
      if (kv.second.sampler) continue;
      Val v = kv.second.has_default ? kv.second.dflt : Val{};
      auto it = uniforms.find(kv.first);
      if (it == uniforms.end() && kv.first.rfind("u_", 0) == 0)
        it = uniforms.find(kv.first.substr(2));  // allow --param levels=4
      if (it != uniforms.end()) {
        v = Val::scalar(float(it->second));
        const std::string& ty = kv.second.type;
        if (ty.rfind("vec", 0) == 0 || ty.rfind("ivec", 0) == 0 ||
            ty.rfind("bvec", 0) == 0) {
          int n = ty[ty.size() - 1] - '0';
          v.n = n;
          for (int i = 1; i < n; ++i) v.v[i] = v.v[0];
        }
        // a --param override of a `uniform int` keeps integer semantics
        coerce_to_type(v, ty);
      } else if (!kv.second.has_default && kv.first.find("resolution") != std::string::npos) {
        v.n = 2;
        v.v[0] = float(rgb.width);
        v.v[1] = float(rgb.height);
      }
      in.globals[kv.first] = v;
    }

    Image out;
    out.width = rgb.width;
    out.height = rgb.height;
    out.channels = 3;
    out.data.resize(size_t(rgb.width) * rgb.height * 3);
    std::string tc = sh.in_name.empty() ? "v_texCoord" : sh.in_name;
    for (int y = 0; y < rgb.height; ++y) {
      for (int x = 0; x < rgb.width; ++x) {
        in.locals.clear();
        in.arrays.clear();
        in.struct_locals.clear();
        in.struct_arrays.clear();
        in.returned = false;
        Val uv;
        uv.n = 2;
        uv.v[0] = (x + 0.5f) / rgb.width;
        uv.v[1] = (y + 0.5f) / rgb.height;
        in.globals[tc] = uv;
        // gl_FragCoord: pixel-center coordinates, same top-left orientation
        // as the texcoord (scanline/CRT shaders key off .y parity)
        Val fc;
        fc.n = 4;
        fc.v[0] = x + 0.5f;
        fc.v[1] = y + 0.5f;
        fc.v[2] = 0.f;
        fc.v[3] = 1.f;
        in.globals["gl_FragCoord"] = fc;
        in.exec(sh.body);
        Val* frag = in.lookup(sh.out_name);
        Val color = frag ? *frag : Val{};
        uint8_t* row = out.row(y);
        for (int c = 0; c < 3; ++c) {
          float v = color.v[std::min(c, color.n - 1)] * 255.f;
          row[x * 3 + c] = uint8_t(std::min(255.f, std::max(0.f, v)));
        }
      }
    }
    res.image = std::move(out);
    res.ok = true;
  } catch (const std::exception& ex) {
    res.error = ex.what();
  }
  return res;
}
