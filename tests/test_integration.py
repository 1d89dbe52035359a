"""End-to-end integration (SURVEY.md §4): train on the procedural scene until
PSNR improves, render a fixed pose deterministically, post-process with a
depth-aware effect, and drive it all once through the CLI."""

import os

import jax
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data import make_synthetic_scene
from danerf_tpu.train import create_train_state, make_train_step
from danerf_tpu.train.evaluate import evaluate

CFG = NeRFConfig(hidden_dim=64, num_layers=4, skip_connect_layers=(2,),
                 num_samples=24, num_importance=0, batch_size=512,
                 use_bf16=False, appearance_dim=8, render_chunk=1024,
                 near=2.0, far=6.0)


@pytest.fixture(scope="module")
def trained():
    scene = make_synthetic_scene("train", n_images=8, height=40, width=40)
    state = create_train_state(jax.random.key(0), CFG, scene.n_images)
    pool = scene.device_arrays()
    step = make_train_step(CFG, scene.height, scene.width, scene.focal)
    before = evaluate(state.params["model"], CFG, scene,
                      appearance=state.params.get("appearance"), max_views=2)
    for _ in range(300):
        state, m = step(state, pool)
    after = evaluate(state.params["model"], CFG, scene,
                     appearance=state.params.get("appearance"), max_views=2)
    return scene, state, before, after


def test_training_improves_psnr(trained):
    _, _, before, after = trained
    assert after["psnr"] > before["psnr"] + 3.0, (before["psnr"], after["psnr"])
    assert after["psnr"] > 14.0


def test_deterministic_render_given_key(trained):
    from danerf_tpu.render import render_frame

    scene, state, _, _ = trained
    a = render_frame(state.params["model"], CFG, jax.random.key(5),
                     scene.c2ws[0], 24, 24, scene.focal, perturb=True,
                     n_importance=0)
    b = render_frame(state.params["model"], CFG, jax.random.key(5),
                     scene.c2ws[0], 24, 24, scene.focal, perturb=True,
                     n_importance=0)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_render_plus_depth_effect_pipeline(trained):
    """Full reference pipeline 3.2: render -> normalized depth -> effect."""
    from danerf_tpu.fx import apply_effect
    from danerf_tpu.render import render_frame
    from danerf_tpu.viz.depth import normalize_depth

    scene, state, _, _ = trained
    rgb, depth, acc = render_frame(state.params["model"], CFG, jax.random.key(0),
                                   scene.c2ws[0], 40, 40, scene.focal,
                                   n_importance=0)
    rgb_u8 = np.clip(np.asarray(rgb) * 255, 0, 255).astype(np.uint8)
    depth_n = normalize_depth(np.asarray(depth))
    out = np.asarray(apply_effect("Fog", rgb_u8, depth_n))
    assert out.shape == (40, 40, 3)
    # fog must whiten the image overall (white fog color dominates far pixels)
    assert out.mean() > rgb_u8.mean()


@pytest.mark.slow
def test_cli_train_and_render_smoke(tmp_path, monkeypatch):
    """CLI end-to-end on a tiny run (uses the synthetic-scene fallback)."""
    from danerf_tpu.cli import main as cli

    monkeypatch.chdir(tmp_path)
    cli.main(["train", "--scene", "toy", "--dataset_path", str(tmp_path / "nodata"),
              "--iters", "4", "--batch_size", "64", "--num_importance", "0",
              "--save_dir", str(tmp_path / "ck")])
    assert os.path.exists(tmp_path / "ck" / "checkpoint_final")
    assert os.path.exists(tmp_path / "ck" / "metrics.jsonl")

    cli.main(["render", "--scene", "toy", "--dataset_path", str(tmp_path / "nodata"),
              "--checkpoint", str(tmp_path / "ck" / "checkpoint_final"),
              "--output_dir", str(tmp_path / "out"), "--frames", "1",
              "--quality", "preview", "--width", "16", "--height", "16"])
    assert os.path.exists(tmp_path / "out" / "rgb_000.png")

    cli.main(["preview", "--image", str(tmp_path / "out" / "rgb_000.png"),
              "--spec", _write_spec(tmp_path),
              "--output_dir", str(tmp_path / "pv")])
    assert os.path.exists(tmp_path / "pv" / "manifest.json")


def _write_spec(tmp_path):
    import json

    path = str(tmp_path / "spec.json")
    with open(path, "w") as f:
        json.dump({"effects": [{"name": "Sepia"}]}, f)
    return path
