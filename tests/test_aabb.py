"""Ray-AABB bounds tightening (static-shape empty-space culling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data import make_synthetic_scene
from danerf_tpu.models import init_nerf_params
from danerf_tpu.ops.sampling import ray_aabb_bounds
from danerf_tpu.render import render_rays

TINY = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                  num_samples=16, num_importance=0, use_bf16=False,
                  appearance_dim=8)


def test_axis_ray_through_unit_box():
    o = jnp.asarray([[0.0, 0.0, 4.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    tn, tf = ray_aabb_bounds(o, d, [-1, -1, -1], [1, 1, 1], 2.0, 6.0)
    np.testing.assert_allclose(float(tn[0, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(tf[0, 0]), 5.0, atol=1e-5)


def test_miss_parks_at_far():
    o = jnp.asarray([[0.0, 10.0, 4.0]])      # far above the box
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    tn, tf = ray_aabb_bounds(o, d, [-1, -1, -1], [1, 1, 1], 2.0, 6.0)
    assert float(tn[0, 0]) >= 6.0 - 2e-3
    assert float(tf[0, 0]) == 6.0
    assert float(tn[0, 0]) <= float(tf[0, 0])


def test_bounds_clamped_to_global():
    o = jnp.asarray([[0.0, 0.0, 0.5]])       # camera inside the box
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    tn, tf = ray_aabb_bounds(o, d, [-1, -1, -1], [1, 1, 1], 2.0, 6.0)
    assert float(tn[0, 0]) >= 2.0
    assert float(tf[0, 0]) <= 6.0


def test_diagonal_ray():
    o = jnp.asarray([[3.0, 3.0, 3.0]])
    d = jnp.asarray([[-1.0, -1.0, -1.0]])    # unnormalized, like z params
    tn, tf = ray_aabb_bounds(o, d, [-1, -1, -1], [1, 1, 1], 0.0, 10.0)
    # slab in o + d*t parameterization: enters at t=2 (x=1), exits t=4 (x=-1)
    np.testing.assert_allclose(float(tn[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(tf[0, 0]), 4.0, atol=1e-5)


def test_render_rays_with_aabb_concentrates_samples():
    cfg = TINY.replace(scene_aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0))
    params = init_nerf_params(jax.random.key(0), cfg)
    o = jnp.asarray([[0.0, 0.0, 4.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    out = render_rays(params, cfg, jax.random.key(1), o, d, perturb=False)
    z = np.asarray(out["z_vals"][0])
    assert z.min() >= 3.0 - 1e-4 and z.max() <= 5.0 + 1e-4

    # without the box: global [2, 6]
    out2 = render_rays(params, TINY, jax.random.key(1), o, d, perturb=False)
    z2 = np.asarray(out2["z_vals"][0])
    np.testing.assert_allclose(z2.min(), 2.0, atol=1e-5)
    np.testing.assert_allclose(z2.max(), 6.0, atol=1e-5)


@pytest.mark.slow
def test_aabb_training_quality_at_reduced_samples():
    """Same sample budget, tighter bounds => at least as good reconstruction
    on the procedural scene (blobs live inside [-1.3, 1.3]^3)."""
    from danerf_tpu.train import create_train_state, make_train_step

    scene = make_synthetic_scene("train", n_images=4, height=32, width=32)
    results = {}
    for name, cfg in [("global", TINY.replace(num_samples=12)),
                      ("aabb", TINY.replace(num_samples=12,
                                            scene_aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)))]:
        state = create_train_state(jax.random.key(0), cfg, scene.n_images)
        pool = scene.device_arrays()
        step = make_train_step(cfg, scene.height, scene.width, scene.focal)
        for _ in range(80):
            state, m = step(state, pool)
        results[name] = float(m["psnr"])
    assert results["aabb"] > results["global"] - 0.5, results
