"""Distributed tests on the faked 8-device CPU mesh (SURVEY.md §4):
sharded batch == replicated math, gradient all-reduce correctness, tensor
parallelism, sharded frame render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data import make_synthetic_scene
from danerf_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    param_pspecs,
    replicate_pool,
    shard_train_state,
)
from danerf_tpu.parallel.mesh import make_sharded_render
from danerf_tpu.train import create_train_state, make_train_step

TINY = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                  num_samples=16, num_importance=0, batch_size=128,
                  use_bf16=False, appearance_dim=8)


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene("train", n_images=4, height=32, width=32)


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device(scene):
    """Same key, same data: the 8-way sharded step must produce the same loss
    and parameters as the unsharded step (the all-reduce placement bar from
    SURVEY.md §4)."""
    mesh = make_mesh(data=8, model=1)
    pool_s = replicate_pool(scene.device_arrays(), mesh)
    pool_1 = scene.device_arrays()

    st_a = create_train_state(jax.random.key(0), TINY, scene.n_images)
    st_b = shard_train_state(create_train_state(jax.random.key(0), TINY, scene.n_images), mesh)

    step_1 = make_train_step(TINY, scene.height, scene.width, scene.focal)
    step_8 = make_sharded_train_step(TINY, mesh, scene.height, scene.width, scene.focal)

    for _ in range(3):
        st_a, m_a = step_1(st_a, pool_1)
        st_b, m_b = step_8(st_b, pool_s)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_sharded_step_with_time_matches_single_device():
    """AnimatedNeRF batches carry a per-ray time t (B,1); the sharded step
    must split it over 'data' with the rest of the batch and reproduce the
    single-device trajectory."""
    from danerf_tpu.data.synthetic import make_time_varying_scene

    cfg = TINY.replace(use_time=True, time_enc_levels=4)
    sc = make_time_varying_scene("train", n_images=4, height=24, width=24,
                                 n_samples=48)
    mesh = make_mesh(data=8, model=1)
    pool_s = replicate_pool(sc.device_arrays(), mesh)
    pool_1 = sc.device_arrays()
    assert "times" in pool_1

    st_a = create_train_state(jax.random.key(0), cfg, sc.n_images)
    st_b = shard_train_state(
        create_train_state(jax.random.key(0), cfg, sc.n_images), mesh)
    step_1 = make_train_step(cfg, sc.height, sc.width, sc.focal)
    step_8 = make_sharded_train_step(cfg, mesh, sc.height, sc.width, sc.focal)
    for _ in range(2):
        st_a, m_a = step_1(st_a, pool_1)
        st_b, m_b = step_8(st_b, pool_s)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)


def test_batch_actually_sharded(scene):
    """The rendered batch inside the sharded step must be laid out P('data')."""
    mesh = make_mesh(data=8, model=1)
    sharding = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.zeros((128, 3)), sharding)
    # addressable shards: 8 pieces of 16 rays each
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (16, 3)


def test_tensor_parallel_matches_replicated(scene):
    """2-way TP over the hidden dim must be numerically equivalent."""
    mesh = make_mesh(data=4, model=2)
    st = create_train_state(jax.random.key(0), TINY, scene.n_images)
    specs = param_pspecs(st.params, tensor_parallel=True)
    # trunk alternates column/row parallel
    assert specs["model"]["trunk"][0]["w"] == P(None, "model")
    assert specs["model"]["trunk"][1]["w"] == P("model", None)

    from danerf_tpu.models import nerf_apply
    x = jax.random.normal(jax.random.key(1), (64, 3))
    d = jax.random.normal(jax.random.key(2), (64, 3))
    want = nerf_apply(st.params["model"], TINY, x, d)

    st_tp = shard_train_state(st, mesh, tensor_parallel=True)
    got = jax.jit(lambda p: nerf_apply(p, TINY, x, d))(st_tp.params["model"])
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(want[1]), np.asarray(got[1]), atol=1e-4)


def test_sharded_render_matches_unsharded(scene):
    from danerf_tpu.ops.rays import generate_rays
    from danerf_tpu.render import render_rays

    mesh = make_mesh(data=8, model=1)
    st = create_train_state(jax.random.key(0), TINY, scene.n_images)
    H = W = 16
    o, d = generate_rays(H, W, scene.focal, jnp.asarray(scene.c2ws[0]))
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    render = make_sharded_render(TINY, mesh, H, W, TINY.num_samples, 0)
    rgb_s, depth_s, _ = render(st.params["model"], jax.random.key(0), o, d, None)
    out = render_rays(st.params["model"], TINY, jax.random.key(0), o, d,
                      n_importance=0, perturb=False)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(out["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_s), np.asarray(out["depth"]), atol=1e-4)


def test_train_loop_with_mesh(scene):
    """End-to-end: the high-level train() API accepts a mesh."""
    import tempfile

    mesh = make_mesh(data=8, model=1)
    from danerf_tpu.train import train

    with tempfile.TemporaryDirectory() as d:
        state, _ = train(TINY, scene, save_dir=d, num_iterations=3,
                         checkpoint_every=0, mesh=mesh, progress=False)
    assert int(state.step) == 3


def test_sharded_step_with_fused_march(scene):
    """The fused ray-march custom VJP must compose with the GSPMD-sharded
    train step (8-way data parallel): loss finite and matching the unsharded
    fused step."""
    cfg = TINY.replace(use_pallas=True, use_fused_train=True)
    mesh = make_mesh(data=8, model=1)
    pool_s = replicate_pool(scene.device_arrays(), mesh)
    pool_1 = scene.device_arrays()

    st_a = create_train_state(jax.random.key(0), cfg, scene.n_images)
    st_b = shard_train_state(create_train_state(jax.random.key(0), cfg, scene.n_images), mesh)

    step_1 = make_train_step(cfg, scene.height, scene.width, scene.focal)
    step_8 = make_sharded_train_step(cfg, mesh, scene.height, scene.width, scene.focal)

    for _ in range(2):
        st_a, m_a = step_1(st_a, pool_1)
        st_b, m_b = step_8(st_b, pool_s)

    assert np.isfinite(float(m_b["loss"]))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_sharded_steps_per_call_matches_singly_dispatched(scene):
    """fori_loop-chunked dispatch on the MESH path (3 steps per device call)
    must equal three single dispatches — the trainer no longer forces
    1 step/dispatch under a mesh."""
    mesh = make_mesh(data=8, model=1)
    pool = replicate_pool(scene.device_arrays(), mesh)

    st_a = shard_train_state(
        create_train_state(jax.random.key(0), TINY, scene.n_images), mesh)
    st_b = shard_train_state(
        create_train_state(jax.random.key(0), TINY, scene.n_images), mesh)

    step_1 = make_sharded_train_step(TINY, mesh, scene.height, scene.width,
                                     scene.focal)
    step_3 = make_sharded_train_step(TINY, mesh, scene.height, scene.width,
                                     scene.focal, steps_per_call=3)

    for _ in range(3):
        st_a, m_a = step_1(st_a, pool)
    st_b, m_b = step_3(st_b, pool)

    assert int(st_a.step) == int(st_b.step) == 3
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_render_frame_with_mesh_matches_single(scene):
    """The production render path (render_frame, used by CLI render/spiral)
    sharded over 8 devices must reproduce single-device numerics."""
    from danerf_tpu.render.renderer import render_frame

    mesh = make_mesh(data=8, model=1)
    st = create_train_state(jax.random.key(0), TINY, scene.n_images)
    H = W = 16

    rgb1, depth1, acc1 = render_frame(
        st.params["model"], TINY, jax.random.key(0), scene.c2ws[0], H, W,
        scene.focal, n_importance=0, perturb=False)
    rgb8, depth8, acc8 = render_frame(
        st.params["model"], TINY, jax.random.key(0), scene.c2ws[0], H, W,
        scene.focal, n_importance=0, perturb=False, mesh=mesh)

    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth8), np.asarray(depth1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc8), np.asarray(acc1), atol=1e-5)


def test_process_slice_partitions_disjointly(monkeypatch):
    """Host-side work partitioning: the per-process slices must cover
    [0, n) exactly once for any process count."""
    from danerf_tpu.parallel import mesh as mesh_mod

    for n_proc in (1, 2, 3, 8):
        covered = []
        for pid in range(n_proc):
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            monkeypatch.setattr(jax, "process_count", lambda n=n_proc: n)
            covered.extend(range(17)[mesh_mod.process_slice(17)])
        assert covered == list(range(17)), (n_proc, covered)


def test_initialize_distributed_wiring(monkeypatch):
    """Multi-process args must reach jax.distributed.initialize; the
    single-process call must be a no-op."""
    from danerf_tpu.parallel import initialize_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a: calls.append(a))

    assert initialize_distributed() is False
    assert initialize_distributed(num_processes=1) is False
    assert calls == []

    assert initialize_distributed("host0:1234", 4, 2) is True
    assert calls == [("host0:1234", 4, 2)]


def test_sharded_render_frame_fused_hier_matches_single_device():
    """VERDICT item 3: the EXACT production multi-chip render program — 
    render_frame with use_pallas=True AND an active importance pass under a
    mesh (what `danerf render --mesh_data N` runs on TPU, cli/main.py) — must
    partition across 8 devices and match the single-device result."""
    from danerf_tpu.models import init_nerf_params
    from danerf_tpu.render.renderer import render_frame

    cfg = NeRFConfig(hidden_dim=32, num_layers=2, skip_connect_layers=(),
                     num_samples=8, num_importance=4, batch_size=16,
                     use_bf16=False, use_pallas=True, appearance_dim=4,
                     pos_enc_levels=4, dir_enc_levels=2)
    params = init_nerf_params(jax.random.key(0), cfg)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    mesh = make_mesh(data=8, model=1)
    kw = dict(n_importance=4, perturb=False, chunk=64)
    rgb_m, d_m, a_m = render_frame(params, cfg, jax.random.key(1), c2w,
                                   16, 16, 20.0, mesh=mesh, **kw)
    rgb_s, d_s, a_s = render_frame(params, cfg, jax.random.key(1), c2w,
                                   16, 16, 20.0, **kw)
    np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_s), atol=1e-5)
