"""Real-data readiness drill (VERDICT r4 item 5).

The BASELINE bar names chair/hotdog PSNR@800x800, but data/nerf_synthetic is
egress-blocked in this environment (examples/fetch_nerf_synthetic.sh is the
committed fetch path).  These tests make sure that the DAY the data appears,
chair parity is one command with zero code changes:

- the Blender loader handles native 800x800 RGBA frames,
- the white-background convention (reference src/dataset.py:159-161 splits
  alpha; nerf_synthetic models are conventionally trained over white) is
  wired through the pool, the renderer, the loss, and the eval scorer,
- a skip-marked end-to-end engages automatically when chair exists.
"""

import json
import os

import jax
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data.blender import load_blender_scene

CHAIR_DIR = os.path.join(os.path.dirname(__file__), "..",
                         "data", "nerf_synthetic", "chair")
CHAIR_PRESENT = os.path.isfile(os.path.join(CHAIR_DIR, "transforms_train.json"))


def _write_scene(scene_dir, n, size):
    from PIL import Image

    (scene_dir / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for k in range(n):
        arr = rng.integers(0, 255, (size, size, 4), dtype=np.uint8)
        # a transparent band, like the empty space around every
        # nerf_synthetic object
        arr[: size // 4, :, 3] = 0
        Image.fromarray(arr, "RGBA").save(scene_dir / "train" / f"r_{k}.png")
        frames.append({"file_path": f"./train/r_{k}",
                       "transform_matrix": np.eye(4).tolist()})
    with open(scene_dir / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)


def test_blender_loader_native_resolution_rgba(tmp_path):
    """800x800 RGBA frames — the dataset's NATIVE resolution
    (/root/reference/data/nerf_synthetic/README.txt:9) — load with the alpha
    split off and composite over white in the pool."""
    scene_dir = tmp_path / "native"
    _write_scene(scene_dir, 2, 800)
    ds = load_blender_scene(str(scene_dir), "train")
    assert ds.images.shape == (2, 800, 800, 3)
    assert ds.alphas.shape == (2, 800, 800)
    assert ds.alphas.dtype == np.uint8
    np.testing.assert_allclose(ds.focal, 0.5 * 800 / np.tan(0.5 * 0.6911),
                               rtol=1e-6)
    pool = ds.device_arrays(white_background=True)
    imgs = np.asarray(pool["images"]).reshape(2, 800, 800, 3)
    assert np.all(imgs[:, :200] == 1.0), "transparent band must become white"


def test_white_background_render_fills_empty_space():
    """With cfg.white_background, rays that hit nothing must come out WHITE
    from the frame renderer (reference RGBA convention at render time)."""
    from danerf_tpu.models import init_nerf_params
    from danerf_tpu.render import render_frame
    from danerf_tpu.ops.rays import look_at_c2w

    # a born-dead density head => acc == 0 everywhere
    cfg = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                     num_samples=8, num_importance=0, use_bf16=False,
                     use_appearance=False, render_chunk=256,
                     density_bias_init=-100.0)
    params = init_nerf_params(jax.random.key(0), cfg)
    c2w = look_at_c2w(np.array([0.0, 0.0, 4.0]), np.zeros(3),
                      np.array([0.0, 1.0, 0.0]))
    black = np.asarray(render_frame(params, cfg, jax.random.key(1), c2w,
                                    16, 16, 20.0)[0])
    white = np.asarray(render_frame(
        params, cfg.replace(white_background=True), jax.random.key(1), c2w,
        16, 16, 20.0)[0])
    assert np.all(np.abs(black) < 1e-3)
    assert np.all(np.abs(white - 1.0) < 1e-3)


def test_white_background_training_is_consistent():
    """Training with white_background must improve PSNR against the
    white-composited targets — loss render, pool targets, and eval scorer
    all share the same compositing convention."""
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.train import create_train_state, make_train_step
    from danerf_tpu.train.evaluate import evaluate

    cfg = NeRFConfig(hidden_dim=48, num_layers=3, skip_connect_layers=(2,),
                     num_samples=16, num_importance=0, batch_size=256,
                     use_bf16=False, appearance_dim=8, render_chunk=1024,
                     white_background=True)
    scene = make_synthetic_scene("train", n_images=4, height=32, width=32)
    assert (scene.alphas < 10).any(), "scene must have empty background"
    state = create_train_state(jax.random.key(0), cfg, scene.n_images)
    pool = scene.device_arrays(white_background=True)
    step = make_train_step(cfg, scene.height, scene.width, scene.focal)
    before = evaluate(state.params["model"], cfg, scene,
                      appearance=state.params.get("appearance"), max_views=2)
    for _ in range(200):
        state, m = step(state, pool)
    after = evaluate(state.params["model"], cfg, scene,
                     appearance=state.params.get("appearance"), max_views=2)
    assert after["psnr"] > before["psnr"] + 2.0, (before["psnr"], after["psnr"])


@pytest.mark.slow
@pytest.mark.skipif(not CHAIR_PRESENT, reason=(
    "data/nerf_synthetic/chair absent (egress-blocked); run "
    "examples/fetch_nerf_synthetic.sh — this end-to-end engages "
    "automatically once the data exists"))
def test_chair_end_to_end():
    """The real-data drill: load chair, train briefly under the reference
    config (white background), and demand a sane PSNR trajectory.  Zero code
    changes needed the day the dataset lands."""
    from danerf_tpu.train import create_train_state, make_train_step
    from danerf_tpu.train.evaluate import evaluate

    ds = load_blender_scene(CHAIR_DIR, "train", downscale=8)  # 100x100
    cfg = NeRFConfig(white_background=True, use_bf16=False, batch_size=1024,
                     num_importance=0)
    state = create_train_state(jax.random.key(0), cfg, ds.n_images)
    pool = ds.device_arrays(white_background=True)
    step = make_train_step(cfg, ds.height, ds.width, ds.focal)
    for _ in range(500):
        state, m = step(state, pool)
    res = evaluate(state.params["model"], cfg, ds,
                   appearance=state.params.get("appearance"), max_views=3)
    assert res["psnr"] > 15.0, res["psnr"]
