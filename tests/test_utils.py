"""Tests for profiling, eval harness, preview mode, dir bootstrap."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig

TINY = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                  num_samples=8, num_importance=0, use_bf16=False,
                  appearance_dim=8, render_chunk=256)


def test_timeit_forces_execution():
    from danerf_tpu.utils.profiling import timeit

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))
    dt = timeit(f, x, iters=3, warmup=1)
    assert dt > 0


def test_throughput_meter():
    from danerf_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter()
    assert m.rays_per_sec == 0.0
    for _ in range(5):
        m.update(1000)
    assert m.rays_per_sec > 0


def test_evaluate_harness_scores_gt_render_highly():
    """Evaluating the analytic scene's own ground truth-ish model is hard, so
    instead check the metric plumbing: a model evaluated against itself after
    a few steps yields finite psnr/ssim per view."""
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.train import create_train_state
    from danerf_tpu.train.evaluate import evaluate

    scene = make_synthetic_scene("val", n_images=2, height=24, width=24)
    state = create_train_state(jax.random.key(0), TINY, scene.n_images)
    res = evaluate(state.params["model"], TINY, scene,
                   appearance=state.params.get("appearance"), max_views=2)
    assert res["n_views"] == 2
    assert np.isfinite(res["psnr"]) and -1 <= res["ssim"] <= 1
    assert len(res["per_view"]) == 2
    # PSNR formula: -10 log10(mse) (reference src/train.py:100)
    v = res["per_view"][0]
    np.testing.assert_allclose(v["psnr"], -10 * np.log10(v["mse"]), atol=1e-6)


def test_preview_spec_expansion_and_rendering(tmp_path):
    from danerf_tpu.fx.preview import expand_spec, render_previews

    spec = {"effects": [
        {"name": "Fog", "sweep": {"fog_start": [0.0, 0.5], "fog_visibility": [0.3]}},
        {"name": "Sepia"},
    ]}
    combos = list(expand_spec(spec))
    assert len(combos) == 3  # 2 fog sweeps + 1 sepia

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    depth = np.linspace(0, 1, 256, dtype=np.float32).reshape(16, 16)
    out = str(tmp_path / "previews")
    written = render_previews(img, depth, spec, out)
    assert len(written) == 3
    assert all(os.path.exists(p) for p in written)
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest) == 3
    assert manifest[0]["params"]["fog_start"] in (0.0, 0.5)


def test_preview_unknown_effect_raises():
    from danerf_tpu.fx.preview import expand_spec

    with pytest.raises(KeyError):
        list(expand_spec({"effects": [{"name": "Nope"}]}))


def test_ensure_directories_and_list_checkpoints(tmp_path):
    from danerf_tpu.utils.dirs import ensure_directories, list_checkpoints

    created = ensure_directories(str(tmp_path))
    assert all(os.path.isdir(d) for d in created)

    # fabricate a checkpoint layout
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.train import create_train_state
    from danerf_tpu.utils.checkpoint import save_checkpoint

    scene = make_synthetic_scene("train", n_images=2, height=8, width=8)
    state = create_train_state(jax.random.key(0), TINY, scene.n_images)
    save_checkpoint(str(tmp_path / "checkpoints_chair"), "checkpoint_000002",
                    state, {"step": 2})
    found = list_checkpoints(str(tmp_path))
    assert "chair" in found and found["chair"].endswith("checkpoint_000002")
