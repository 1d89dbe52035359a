"""Native shader_processor tests: CLI contract, effect numerics, shader-file
parsing, and the Python bridge incl. fallback (SURVEY.md §2 C15-C19, §3.5)."""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from danerf_tpu.native.bridge import DEFAULT_BINARY, ShaderBridge, ensure_built

BINARY = ensure_built()

pytestmark = pytest.mark.skipif(BINARY is None, reason="native build unavailable")


def _write(path, arr):
    Image.fromarray(arr).save(path)


def _read(path):
    with Image.open(path) as img:
        return np.asarray(img)


@pytest.fixture
def io_dir(tmp_path):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
    depth = np.zeros((20, 20), np.uint8)
    depth[:, 10:] = 255
    _write(tmp_path / "in.png", rgb)
    _write(tmp_path / "depth.png", depth)
    return tmp_path, rgb, depth


def _run(args):
    return subprocess.run([BINARY] + args, capture_output=True, text=True)


def test_cli_contract_and_usage():
    r = _run([])
    assert r.returncode == 1 and "--input" in r.stderr  # usage on bad args
    r = _run(["--list-effects"])
    assert r.returncode == 0
    for name in ["toon", "fog", "sepia", "vignette", "posterize", "passthrough"]:
        assert name in r.stdout


def test_passthrough_roundtrip(io_dir):
    td, rgb, _ = io_dir
    r = _run(["--input", str(td / "in.png"), "--output", str(td / "out.png"),
              "--effect", "passthrough"])
    assert r.returncode == 0
    np.testing.assert_array_equal(_read(td / "out.png"), rgb)


def test_missing_input_fails(io_dir):
    td, _, _ = io_dir
    r = _run(["--input", str(td / "nope.png"), "--output", str(td / "o.png"),
              "--effect", "sepia"])
    assert r.returncode == 2


def test_toon_glsl_semantics(io_dir):
    """floor(c*levels)/levels quantization + depth-discontinuity black edge
    (reference toon.glsl:10-30)."""
    td, _, _ = io_dir
    rgb = np.full((20, 20, 3), 200, np.uint8)
    _write(td / "flat.png", rgb)
    r = _run(["--input", str(td / "flat.png"), "--depth", str(td / "depth.png"),
              "--output", str(td / "out.png"), "--effect", "toon",
              "--param", "levels=4"])
    assert r.returncode == 0
    out = _read(td / "out.png").astype(float)
    want = np.floor(200 / 255.0 * 4) / 4 * 255.0
    # flat regions quantized
    np.testing.assert_allclose(out[5, 2], want, atol=1.0)
    # edge column blacked out (|d - d_right| crosses threshold at x=9)
    assert out[5, 9].max() == 0


def test_fog_formula(io_dir):
    td, _, _ = io_dir
    rgb = np.full((8, 8, 3), 100, np.uint8)
    depth = np.full((8, 8), 179, np.uint8)  # ~0.702
    _write(td / "i.png", rgb)
    _write(td / "d.png", depth)
    r = _run(["--input", str(td / "i.png"), "--depth", str(td / "d.png"),
              "--output", str(td / "o.png"), "--effect", "fog"])
    assert r.returncode == 0
    d = 179 / 255.0
    adj = np.clip((d - 0.1) / 0.9, 0, 1) ** 3 * 0.3
    want = 100 * adj + 255 * (1 - adj)
    np.testing.assert_allclose(_read(td / "o.png").astype(float), want, atol=1.0)


def test_sepia_matches_python_fx(io_dir):
    td, rgb, _ = io_dir
    r = _run(["--input", str(td / "in.png"), "--output", str(td / "o.png"),
              "--effect", "sepia"])
    assert r.returncode == 0
    from danerf_tpu.fx import apply_effect

    want = np.asarray(apply_effect("Sepia", rgb))
    np.testing.assert_allclose(_read(td / "o.png").astype(int), want.astype(int), atol=1)


def test_shader_file_directive(io_dir, tmp_path):
    td, rgb, _ = io_dir
    frag = tmp_path / "custom.frag"
    frag.write_text("// effect: invert\nvoid main() {}\n")
    r = _run(["--input", str(td / "in.png"), "--output", str(td / "o.png"),
              "--shader", str(frag)])
    assert r.returncode == 0
    np.testing.assert_array_equal(_read(td / "o.png"), 255 - rgb)


def test_shader_file_heuristic_toon(io_dir, tmp_path):
    """A GLSL body using u_levels + u_depth (the reference's stock toon shader
    shape) must resolve to the toon effect without directives."""
    td, _, _ = io_dir
    frag = tmp_path / "mystery.frag"
    frag.write_text(
        "#version 330 core\nuniform sampler2D u_texture;\n"
        "uniform sampler2D u_depth;\nuniform float u_levels = 4.0;\n"
        "void main() { /* floor(color.rgb * u_levels) / u_levels */ }\n")
    rgb = np.full((10, 10, 3), 200, np.uint8)
    _write(td / "f.png", rgb)
    r = _run(["--input", str(td / "f.png"), "--output", str(td / "o.png"),
              "--shader", str(frag)])
    assert r.returncode == 0
    out = _read(td / "o.png")
    assert out[0, 0, 0] == int(np.floor(200 / 255.0 * 4) / 4 * 255.0)


# ------------------------------------------------------------------ bridge

def test_bridge_writes_default_shaders(tmp_path):
    b = ShaderBridge(shader_dir=str(tmp_path / "shaders"))
    names = b.available_shaders()
    assert "default.frag" in names and "toon.frag" in names and "fog.frag" in names


def test_bridge_native_roundtrip(tmp_path):
    b = ShaderBridge(shader_dir=str(tmp_path / "shaders"))
    assert b.use_native
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = b.apply_shader(rgb, shader_name="default.frag")
    np.testing.assert_array_equal(out, rgb)

    depth = np.linspace(0, 1, 16 * 16, dtype=np.float32).reshape(16, 16)
    out = b.apply_shader(rgb, depth, shader_name="toon.frag")
    assert out.shape == rgb.shape
    assert not np.array_equal(out, rgb)


def test_bridge_fallback_without_binary(tmp_path):
    b = ShaderBridge(binary_path=str(tmp_path / "missing_binary"),
                     shader_dir=str(tmp_path / "shaders"), auto_build=False)
    assert not b.use_native
    rgb = np.full((8, 8, 3), 100, np.uint8)
    out = b.apply_shader(rgb, shader_name="sepia.frag")
    from danerf_tpu.fx import apply_effect

    np.testing.assert_array_equal(out, np.asarray(apply_effect("Sepia", rgb)))
