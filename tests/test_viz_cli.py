"""Camera paths, frame-render drivers, batch effects, video, and the CLI
end-to-end (SURVEY.md §2 C12, C13, C21, C22; §3.2-3.4)."""

import json
import os

import jax
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig
from danerf_tpu.viz.paths import aligned_spiral_path, alignment_matrix, camera_path

TINY = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                  num_samples=8, num_importance=0, use_bf16=False,
                  appearance_dim=8, render_chunk=256)


# ------------------------------------------------------------- camera paths

@pytest.mark.parametrize("kind", ["circle", "spiral", "horizontal_only", "hemisphere"])
def test_camera_paths_shapes_and_validity(kind):
    c2ws = camera_path(kind, 12)
    assert c2ws.shape == (12, 4, 4)
    for m in c2ws:
        R = m[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    # all cameras at radius 4 for circle paths (run.py:149,169-173)
    if kind != "hemisphere":
        r = np.linalg.norm(c2ws[:, [0, 2], 3], axis=-1)
        assert np.all(r <= 4.0 + 1e-5)


def test_circle_path_closes():
    c2ws = camera_path("circle", 13)
    np.testing.assert_allclose(c2ws[0][:3, 3], c2ws[-1][:3, 3], atol=1e-5)


def test_spiral_path_height_sweep():
    c2ws = camera_path("spiral", 10, height_range=(-0.5, 0.5))
    ys = c2ws[:, 1, 3]
    np.testing.assert_allclose(ys[0], -0.5, atol=1e-6)
    np.testing.assert_allclose(ys[-1], 0.5, atol=1e-6)


def test_lego_scene_overrides():
    # lego gets z-up + raised center (run.py:110-113,122-123)
    c2ws = camera_path("circle", 5, scene="lego")
    assert np.all(c2ws[:, 1, 3] == 0.5)


def test_alignment_matrices_are_rotations():
    for axis in ["x", "y", "z", "none"]:
        A = alignment_matrix(axis)
        np.testing.assert_allclose(A.T @ A, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(A), 1.0, atol=1e-12)
    # x-rotation maps +y to +z (render_aligned_spiral.py:35-39)
    np.testing.assert_allclose(alignment_matrix("x") @ [0, 1, 0], [0, 0, 1], atol=1e-12)


def test_aligned_spiral_path():
    c2ws = aligned_spiral_path(8, loops=2, rotation_axis="x")
    assert c2ws.shape == (8, 4, 4)
    for m in c2ws:
        np.testing.assert_allclose(m[:3, :3].T @ m[:3, :3], np.eye(3), atol=1e-5)


# ------------------------------------------------------------- frame drivers

@pytest.fixture(scope="module")
def trained_params():
    from danerf_tpu.models import init_nerf_params

    return init_nerf_params(jax.random.key(0), TINY)


def test_render_path_writes_reference_naming(tmp_path, trained_params):
    from danerf_tpu.render.frames import render_path

    out = str(tmp_path / "frames")
    written = render_path(trained_params, TINY, out, num_frames=2,
                          quality="preview", width=20, height=20,
                          save_depth=True, raw_output=True)
    assert len(written) == 2
    assert os.path.exists(os.path.join(out, "rgb_000.png"))
    assert os.path.exists(os.path.join(out, "depth_001.png"))
    assert os.path.exists(os.path.join(out, "raw", "rgb_000.png"))
    assert os.path.exists(os.path.join(out, "raw", "depth_000.npy"))
    d = np.load(os.path.join(out, "raw", "depth_000.npy"))
    assert d.shape == (20, 20)


def test_render_path_with_effect(tmp_path, trained_params):
    from danerf_tpu.render.frames import render_path

    out = str(tmp_path / "fx")
    render_path(trained_params, TINY, out, num_frames=1, quality="preview",
                width=16, height=16, effect="Fog")
    assert os.path.exists(os.path.join(out, "rgb_000.png"))


def test_aligned_spiral_driver(tmp_path, trained_params):
    from danerf_tpu.render.frames import render_aligned_spiral

    out = str(tmp_path / "spiral")
    written = render_aligned_spiral(trained_params, TINY, out, num_frames=3,
                                    width=16, height=16, make_video=False)
    assert len(written) == 3
    assert os.path.exists(os.path.join(out, "frame_0000.png"))
    assert os.path.exists(os.path.join(out, "depth_0000.png"))  # every 10th
    assert not os.path.exists(os.path.join(out, "depth_0001.png"))


# ------------------------------------------------------------- batch effects

def _write_frames(d, n=3, with_depth=(0, 2)):
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            os.path.join(d, f"frame_{i:04d}.png"))
        if i in with_depth:
            Image.fromarray(rng.integers(0, 255, (16, 16), dtype=np.uint8)).save(
                os.path.join(d, f"depth_{i:04d}.png"))


def test_find_frames_with_depth(tmp_path):
    from danerf_tpu.fx.batch import find_frames_with_depth

    _write_frames(str(tmp_path), 3, with_depth=(0, 2))
    assert find_frames_with_depth(str(tmp_path)) == ["0000", "0002"]


def test_batch_effect_and_fog_depth_restriction(tmp_path):
    from danerf_tpu.fx.batch import apply_effect_to_frames

    src = str(tmp_path / "in")
    _write_frames(src, 3, with_depth=(0, 2))

    out_sepia = str(tmp_path / "sepia")
    w = apply_effect_to_frames(src, out_sepia, "Sepia", make_video=False)
    assert len(w) == 3

    out_fog = str(tmp_path / "fog")
    w = apply_effect_to_frames(src, out_fog, "Fog", make_video=False)
    assert len(w) == 2  # fog only on depth-bearing frames (apply_all_shaders.py:114-117)


def test_batch_effect_timings_and_order(tmp_path):
    """The pipelined batch driver reports the per-stage breakdown
    (png-load / device / fetch+encode) and keeps output paths in frame
    order even when some frames are skipped."""
    from PIL import Image

    from danerf_tpu.fx.batch import apply_effect_to_frames

    src = str(tmp_path / "in")
    _write_frames(src, 4, with_depth=())
    out = str(tmp_path / "out")
    # pre-populate frame 1 so it takes the skip path mid-sequence
    os.makedirs(out)
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        os.path.join(out, "frame_0001.png"))
    tm = {}
    w = apply_effect_to_frames(src, out, "Sepia", make_video=False,
                               timings=tm)
    assert [os.path.basename(p) for p in w] == [
        f"frame_{i:04d}.png" for i in range(4)]
    assert tm["frames"] == 3  # one skipped
    assert tm["load_s"] >= 0 and tm["device_s"] > 0 and tm["write_s"] > 0


def test_skip_existing(tmp_path):
    from danerf_tpu.fx.batch import apply_effect_to_frames

    src = str(tmp_path / "in")
    _write_frames(src, 2, with_depth=())
    out = str(tmp_path / "out")
    apply_effect_to_frames(src, out, "Sepia", make_video=False)
    mtime = os.path.getmtime(os.path.join(out, "frame_0000.png"))
    apply_effect_to_frames(src, out, "Sepia", make_video=False)
    assert os.path.getmtime(os.path.join(out, "frame_0000.png")) == mtime


# ------------------------------------------------------------- video

def test_create_video(tmp_path):
    from danerf_tpu.viz.video import create_video_from_images

    _write_frames(str(tmp_path), 4, with_depth=())
    out = str(tmp_path / "v.mp4")
    ok = create_video_from_images(str(tmp_path), out, pattern="frame_*.png", fps=10)
    assert ok and os.path.getsize(out) > 0
    assert not create_video_from_images(str(tmp_path), str(tmp_path / "x.mp4"),
                                        pattern="nomatch_*.png")


# ------------------------------------------------------------- cli

def test_cli_video_command(tmp_path):
    from danerf_tpu.cli.main import main

    _write_frames(str(tmp_path), 3, with_depth=())
    out = str(tmp_path / "out.mp4")
    main(["video", "--input_dir", str(tmp_path), "--output", out,
          "--pattern", "frame_*.png", "--fps", "5"])
    assert os.path.exists(out)


def test_cli_effects_command(tmp_path):
    from danerf_tpu.cli.main import main

    src = str(tmp_path / "in")
    _write_frames(src, 2, with_depth=(0, 1))
    main(["effects", "--input_dir", src, "--effect", "Sepia",
          "--output_dir", str(tmp_path / "out")])
    assert os.path.exists(str(tmp_path / "out" / "sepia" / "frame_0000.png"))


def test_cli_parser_covers_reference_flags():
    """Spot-check the reference's knob set is exposed (run.py:15-61)."""
    from danerf_tpu.cli.main import build_parser

    p = build_parser()
    args = p.parse_args(["render", "--scene", "chair", "--quality", "preview",
                         "--camera_path", "hemisphere", "--spiral_loops", "3",
                         "--height_range", "-1", "1", "--frames", "10",
                         "--save_depth", "--raw_output", "--create_video"])
    assert args.quality == "preview" and args.camera_path == "hemisphere"
    args = p.parse_args(["spiral", "--rotation", "z", "--loops", "3"])
    assert args.rotation == "z"
    args = p.parse_args(["effects", "--input_dir", "x", "--fog_only"])
    assert args.fog_only
