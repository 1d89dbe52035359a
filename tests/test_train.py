"""Trainer tests: LR schedule parity with StepLR, loss descent on the
synthetic scene, checkpoint round-trip + true resume (SURVEY.md §4, §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data import make_synthetic_scene
from danerf_tpu.train import create_train_state, make_train_step, train
from danerf_tpu.train.trainer import TrainState, lr_schedule
from danerf_tpu.utils.checkpoint import (latest_checkpoint, restore_checkpoint,
                                         save_checkpoint)

TINY = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                  num_samples=16, num_importance=0, batch_size=128,
                  use_bf16=False, appearance_dim=8, warmup_iters=2,
                  warmup_batch_size=32)


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene("train", n_images=4, height=32, width=32)


def test_lr_schedule_matches_steplr():
    # StepLR: lr * 0.5^floor(step/10000) (reference config.py:22-25)
    cfg = NeRFConfig()
    sched = lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(5e-4)
    assert float(sched(9999)) == pytest.approx(5e-4)
    assert float(sched(10000)) == pytest.approx(2.5e-4)
    assert float(sched(20000)) == pytest.approx(1.25e-4)


def test_train_step_updates_and_metrics(scene):
    state = create_train_state(jax.random.key(0), TINY, scene.n_images)
    pool = scene.device_arrays()
    step = make_train_step(TINY, scene.height, scene.width, scene.focal)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, m = step(state, pool)
    assert int(state.step) == 1
    assert np.isfinite(float(m["loss"]))
    p1 = state.params
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # appearance embeddings train too (reference src/train.py:36-37)
    assert float(np.abs(p0["appearance"] - np.asarray(p1["appearance"])).max()) > 0


def test_loss_decreases_on_synthetic_scene(scene):
    state = create_train_state(jax.random.key(0), TINY, scene.n_images)
    pool = scene.device_arrays()
    step = make_train_step(TINY, scene.height, scene.width, scene.focal)
    losses = []
    for _ in range(60):
        state, m = step(state, pool)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8


def test_hierarchical_train_step_runs(scene):
    cfg = TINY.replace(num_importance=16)
    state = create_train_state(jax.random.key(0), cfg, scene.n_images)
    pool = scene.device_arrays()
    step = make_train_step(cfg, scene.height, scene.width, scene.focal)
    state, m = step(state, pool)
    assert "coarse_mse" in m
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_roundtrip(tmp_path, scene):
    state = create_train_state(jax.random.key(0), TINY, scene.n_images)
    save_checkpoint(str(tmp_path), "checkpoint_000005", state, {"step": 5})
    path = latest_checkpoint(str(tmp_path))
    assert path is not None and path.endswith("checkpoint_000005")
    restored, meta = restore_checkpoint(path, state)
    assert meta["step"] == 5

    def host(t):
        from danerf_tpu.utils.checkpoint import _to_host
        return _to_host(t)

    for x, y in zip(jax.tree_util.tree_leaves(host(state)),
                    jax.tree_util.tree_leaves(host(restored))):
        np.testing.assert_array_equal(x, y)


def test_train_loop_with_resume(tmp_path, scene):
    d = str(tmp_path / "ck")
    state1, log1 = train(TINY, scene, save_dir=d, num_iterations=8,
                         checkpoint_every=4, progress=False)
    assert int(state1.step) == 8
    assert os.path.exists(os.path.join(d, "checkpoint_000008"))
    assert os.path.exists(os.path.join(d, "checkpoint_final"))
    # periodic validation strip + final curves (reference src/train.py:127-204)
    assert os.path.exists(os.path.join(d, "render_000004.png"))
    assert os.path.exists(os.path.join(d, "training_curves.png"))

    # resume continues from the final checkpoint's step
    state2, _ = train(TINY, scene, save_dir=d, num_iterations=12, resume=True,
                      progress=False)
    assert int(state2.step) == 12


def test_validation_render_honors_num_importance(tmp_path, scene, monkeypatch):
    """Periodic eval renders must run the config actually being trained
    (hier config => hier render), not a hardcoded coarse-only pass."""
    import danerf_tpu.render.renderer as renderer_mod
    from danerf_tpu.train.trainer import _save_validation_render

    cfg = TINY.replace(num_importance=16)
    state = create_train_state(jax.random.key(0), cfg, scene.n_images)
    seen = {}
    real = renderer_mod.render_frame

    def spy(*args, **kwargs):
        seen["n_importance"] = kwargs.get("n_importance")
        return real(*args, **kwargs)

    monkeypatch.setattr(renderer_mod, "render_frame", spy)
    _save_validation_render(state, cfg, scene, str(tmp_path), 1)
    assert seen["n_importance"] == 16
    assert os.path.exists(os.path.join(str(tmp_path), "render_000001.png"))


def test_step_replay_is_exact(scene):
    """Deterministic PRNG threading: same seed => bit-identical training
    trajectory (SURVEY.md §5.2 — the replay/race-detection story)."""
    pool = scene.device_arrays()
    step = make_train_step(TINY, scene.height, scene.width, scene.focal)
    runs = []
    for _ in range(2):
        st = create_train_state(jax.random.key(7), TINY, scene.n_images)
        for _ in range(5):
            st, m = step(st, pool)
        runs.append((jax.tree_util.tree_map(np.asarray, st.params), float(m["loss"])))
    assert runs[0][1] == runs[1][1]
    for x, y in zip(jax.tree_util.tree_leaves(runs[0][0]),
                    jax.tree_util.tree_leaves(runs[1][0])):
        np.testing.assert_array_equal(x, y)


def test_scan_chunked_steps_match_single(scene):
    """steps_per_call=K must produce bit-identical state evolution to K
    single steps (same PRNG threading)."""
    pool = scene.device_arrays()
    a = create_train_state(jax.random.key(0), TINY, scene.n_images)
    b = create_train_state(jax.random.key(0), TINY, scene.n_images)
    single = make_train_step(TINY, scene.height, scene.width, scene.focal)
    chunk4 = make_train_step(TINY, scene.height, scene.width, scene.focal,
                             steps_per_call=4)
    for _ in range(4):
        a, ma = single(a, pool)
    b, mb = chunk4(b, pool)
    assert int(a.step) == int(b.step) == 4
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_train_loop_checkpoint_cadence_with_chunks(tmp_path, scene):
    """Chunked stepping must still hit exact checkpoint boundaries."""
    d = str(tmp_path / "ck")
    train(TINY, scene, save_dir=d, num_iterations=9, checkpoint_every=3,
          progress=False, steps_per_call=4)
    for s in (3, 6, 9):
        assert os.path.exists(os.path.join(d, f"checkpoint_{s:06d}")), s


def test_warmup_batch_then_full(scene):
    """First warmup_iters steps use the small batch (src/train.py:26,56-58);
    both step functions must produce a valid state transition."""
    state = create_train_state(jax.random.key(0), TINY, scene.n_images)
    pool = scene.device_arrays()
    warm = make_train_step(TINY, scene.height, scene.width, scene.focal,
                           batch_size=TINY.warmup_batch_size)
    full = make_train_step(TINY, scene.height, scene.width, scene.focal)
    state, m1 = warm(state, pool)
    state, m2 = full(state, pool)
    assert int(state.step) == 2
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
