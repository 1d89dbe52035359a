"""Python <-> native shader_processor bridge.

Mirrors the reference's ShaderSystem (/root/reference/src/shader_system.py:10-231):
binary discovery with a Python fallback when it's missing (:48-54), first-run
creation of default + toon ``.frag`` files (:56-106), and PNG-tempfile
round-trips through ``subprocess.run([binary, --input, --output, --shader,
--depth])`` (:121-161).  Differences by design: the native tool is headless
(no GL in this environment), shader files carry explicit ``// effect:`` /
``// param:`` directives so parameters survive the process boundary, the
binary can be (re)built on demand via CMake, and the Python fallback is the
jitted on-device fx pipeline rather than a second NumPy implementation.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native", "shader_processor")


def _default_binary() -> str:
    """Resolve the native binary: $DANERF_SHADER_PROCESSOR, then the repo
    checkout's build tree, then a `shader_processor` on PATH.

    The wheel ships only the Python package (pyproject packages.find), so a
    non-editable install has no native sources next to it; pointing the env
    var at a separately built binary (or installing one on PATH) gives
    pip-installed users the native path instead of the silent fx fallback.
    """
    env = os.environ.get("DANERF_SHADER_PROCESSOR")
    if env:
        return env
    checkout = os.path.join(_NATIVE_DIR, "build", "shader_processor")
    if os.path.exists(checkout) or os.path.isdir(_NATIVE_DIR):
        return checkout  # built, or buildable in-place by ensure_built
    import shutil

    on_path = shutil.which("shader_processor")
    return on_path or checkout


DEFAULT_BINARY = _default_binary()

# Shader files written on first run.  GLSL-shaped for compatibility with
# GL-capable consumers, with directives the headless tool executes.
DEFAULT_FRAG = """\
// effect: passthrough
#version 330 core
out vec4 FragColor;
in vec2 TexCoord;
uniform sampler2D u_texture;
void main() { FragColor = texture(u_texture, TexCoord); }
"""

TOON_FRAG = """\
// effect: toon
// param: levels=4
// param: edge_threshold=0.1
#version 330 core
out vec4 FragColor;
in vec2 TexCoord;
uniform sampler2D u_texture;
uniform sampler2D u_depth;
uniform float u_levels = 4.0;
uniform float u_edge_threshold = 0.1;
void main() {
    vec4 color = texture(u_texture, TexCoord);
    color.rgb = floor(color.rgb * u_levels) / u_levels;
    float d  = texture(u_depth, TexCoord).r;
    float dr = texture(u_depth, TexCoord + vec2(0.001, 0.0)).r;
    float db = texture(u_depth, TexCoord + vec2(0.0, 0.001)).r;
    float edge = step(u_edge_threshold, abs(d - dr) + abs(d - db));
    color.rgb *= (1.0 - edge);
    FragColor = color;
}
"""

FOG_FRAG = """\
// effect: fog
// param: fog_start=0.1
// param: fog_exponent=3.0
// param: fog_visibility=0.3
#version 330 core
out vec4 FragColor;
in vec2 TexCoord;
uniform sampler2D u_texture;
uniform sampler2D u_depth;
void main() {
    vec3 c = texture(u_texture, TexCoord).rgb;
    float d = texture(u_depth, TexCoord).r;
    float adj = clamp((d - 0.1) / 0.9, 0.0, 1.0);
    adj = pow(adj, 3.0) * 0.3;
    FragColor = vec4(mix(vec3(1.0), c, adj), 1.0);
}
"""


def ensure_built(binary: str = DEFAULT_BINARY, quiet: bool = True) -> Optional[str]:
    """Build the native tool with CMake if the binary is missing.

    Returns the binary path, or None if the build fails (callers fall back to
    the Python path, like the reference does at src/shader_system.py:48-54).
    """
    if os.path.exists(binary):
        return binary
    src_dir = os.path.dirname(os.path.dirname(binary))
    build_dir = os.path.join(src_dir, "build")
    try:
        kw = dict(capture_output=quiet, check=True)
        subprocess.run(["cmake", "-S", src_dir, "-B", build_dir, "-G", "Ninja"], **kw)
        subprocess.run(["cmake", "--build", build_dir], **kw)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return binary if os.path.exists(binary) else None


class ShaderBridge:
    """Subprocess interface to the native shader_processor."""

    def __init__(self, binary_path: Optional[str] = None,
                 shader_dir: str = "shaders", auto_build: bool = True):
        self.binary = binary_path or DEFAULT_BINARY
        self.shader_dir = shader_dir
        if not os.path.exists(self.shader_dir):
            os.makedirs(self.shader_dir, exist_ok=True)
            self._write_default_shaders()
        if not os.path.exists(self.binary) and auto_build:
            ensure_built(self.binary)
        self.use_native = os.path.exists(self.binary)
        # effect selection cached across frames (reference
        # src/shader_system.py:215-231 stores current_effect/params)
        self.current_effect: Optional[str] = None
        self.params: dict = {}

    def _write_default_shaders(self):
        for name, text in [("default.frag", DEFAULT_FRAG),
                           ("toon.frag", TOON_FRAG),
                           ("fog.frag", FOG_FRAG)]:
            with open(os.path.join(self.shader_dir, name), "w") as f:
                f.write(text)

    def available_shaders(self):
        if not os.path.isdir(self.shader_dir):
            return []
        return sorted(f for f in os.listdir(self.shader_dir)
                      if f.endswith((".frag", ".glsl")))

    def apply_shader(self, image: np.ndarray, depth: Optional[np.ndarray] = None,
                     shader_name: str = "default.frag",
                     params: Optional[dict] = None) -> np.ndarray:
        """Run one image through the native tool; fall back to fx on failure."""
        shader_path = os.path.join(self.shader_dir, shader_name)
        if not os.path.exists(shader_path):
            if not self.use_native:
                # the fx fallback resolves effects by NAME, so a missing
                # file is fine there — but say so when even the name is
                # unknown (see _apply_fallback)
                return self._apply_fallback(image, depth, shader_name, params)
            import warnings

            warnings.warn(f"shader file {shader_path!r} not found; using "
                          f"default.frag (passthrough)", stacklevel=2)
            shader_path = os.path.join(self.shader_dir, "default.frag")

        if not self.use_native:
            return self._apply_fallback(image, depth, shader_name, params)

        from PIL import Image as PILImage

        with tempfile.TemporaryDirectory() as td:
            in_path = os.path.join(td, "in.png")
            out_path = os.path.join(td, "out.png")
            PILImage.fromarray(np.asarray(image, np.uint8)).save(in_path)
            cmd = [self.binary, "--input", in_path, "--output", out_path,
                   "--shader", shader_path]
            if depth is not None:
                depth_path = os.path.join(td, "depth.png")
                d = np.asarray(depth, np.float32)
                d = (d - d.min()) / (d.max() - d.min() + 1e-10)
                PILImage.fromarray((d * 255).astype(np.uint8)).save(depth_path)
                cmd += ["--depth", depth_path]
            for k, v in (params or {}).items():
                cmd += ["--param", f"{k}={v}"]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                with PILImage.open(out_path) as img:
                    return np.asarray(img)
            except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
                import warnings

                detail = ""
                if isinstance(e, subprocess.CalledProcessError) and e.stderr:
                    detail = ": " + e.stderr.decode(errors="replace").strip()
                warnings.warn(f"native shader_processor failed on "
                              f"{shader_name!r}{detail}; falling back to the "
                              f"Python fx pipeline", stacklevel=2)
                return self._apply_fallback(image, depth, shader_name, params)

    @staticmethod
    def parse_directives(shader_path: str):
        """Read the ``// effect:`` / ``// param: k=v`` directives this
        bridge writes into its .frag files (and shader_parse.cpp executes
        natively), so the Python fallback honors the same contract."""
        effect, dparams = None, {}
        try:
            with open(shader_path) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("// effect:"):
                        effect = line.split(":", 1)[1].strip()
                    elif line.startswith("// param:"):
                        kv = line.split(":", 1)[1].strip()
                        if "=" in kv:
                            k, v = kv.split("=", 1)
                            try:
                                dparams[k.strip()] = float(v)
                            except ValueError:
                                pass
        except OSError:
            pass
        return effect, dparams

    def _apply_fallback(self, image, depth, shader_name, params):
        """Python fallback: route through the jitted fx pipeline (the
        reference falls back to NumPy effects, src/shader_system.py:177-213).

        The effect comes from the shader file's ``// effect:`` directive when
        present, else the filename stem.  An effect the fx pipeline doesn't
        implement degrades to the unprocessed image WITH a warning naming the
        shader — never a silent identity return.
        """
        import warnings

        shader_path = os.path.join(self.shader_dir, shader_name)
        effect, dparams = self.parse_directives(shader_path)
        name = effect or shader_name.rsplit(".", 1)[0].lower()
        merged = dict(dparams)
        if params:
            merged.update(params)
        fx_name = {"toon": "Toon Shader", "sketch": "Pencil Sketch",
                   "passthrough": "Original", "default": "Original"}.get(
                       name, name)
        from danerf_tpu.fx import apply_effect

        try:
            return np.asarray(apply_effect(fx_name, image, depth, merged))
        except KeyError:
            warnings.warn(
                f"shader {shader_name!r} (effect {name!r}) has no Python fx "
                f"fallback; returning the image UNPROCESSED. Build the native "
                f"tool (danerf_tpu.native.ensure_built) to run it.",
                stacklevel=2)
            return np.asarray(image)
