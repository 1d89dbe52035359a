"""Renderer tests: coarse path vs golden composition, wired fine pass,
whole-frame scan renderer (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

import golden_ref as gold
from danerf_tpu.config import NeRFConfig
from danerf_tpu.models import init_nerf_params
from danerf_tpu.render import render_frame, render_rays

CFG = NeRFConfig(hidden_dim=32, num_layers=4, skip_connect_layers=(2,),
                 num_samples=16, num_importance=16, use_bf16=False,
                 appearance_dim=8, render_chunk=128)


def _rays(n=8, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    d = rng.standard_normal((n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_coarse_only_matches_golden_pipeline():
    """render_rays(perturb=False, no importance) == golden sample->MLP->composite."""
    params = init_nerf_params(jax.random.key(0), CFG)
    o, d = _rays(8)
    out = render_rays(params, CFG, jax.random.key(1), o, d,
                      n_importance=0, perturb=False)

    # golden pipeline in fp64
    d_np = np.asarray(d, np.float64)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o_np = np.asarray(o, np.float64)
    z, pts = gold.sample_stratified(o_np, d_np, CFG.near, CFG.far, CFG.num_samples)
    p_np = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    dirs = np.broadcast_to(d_np[:, None, :], pts.shape)
    rgb_s, sigma_s = gold.nerf_mlp(p_np, CFG, pts, dirs)
    rgb_g, depth_g, acc_g, _ = gold.composite(rgb_s, sigma_s, z)

    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_g, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["acc"]), acc_g, atol=1e-4)
    assert out["z_vals"].shape == (8, CFG.num_samples)


def test_fine_pass_is_wired():
    """The hierarchical pass must actually run (the reference stubs it —
    src/render.py:83-86) and produce n_samples + n_importance sorted depths."""
    params = init_nerf_params(jax.random.key(0), CFG)
    o, d = _rays(8)
    out = render_rays(params, CFG, jax.random.key(1), o, d, perturb=True)
    total = CFG.num_samples + CFG.num_importance
    assert out["z_vals"].shape == (8, total)
    assert out["weights"].shape == (8, total)
    z = np.asarray(out["z_vals"])
    assert np.all(np.diff(z, axis=-1) >= 0)
    assert "coarse_rgb" in out and out["coarse_rgb"].shape == (8, 3)


def test_fine_samples_concentrate_near_surface():
    """Importance samples must land where the coarse pass finds density."""
    params = init_nerf_params(jax.random.key(0), CFG)

    # A field with a hard density spike: fake it by a sigma that depends on z
    # via a wrapper model is overkill — instead check the statistics through
    # sample_pdf directly in test_ops; here verify end-to-end determinism.
    o, d = _rays(4)
    out1 = render_rays(params, CFG, jax.random.key(7), o, d, perturb=True)
    out2 = render_rays(params, CFG, jax.random.key(7), o, d, perturb=True)
    np.testing.assert_array_equal(np.asarray(out1["rgb"]), np.asarray(out2["rgb"]))
    out3 = render_rays(params, CFG, jax.random.key(8), o, d, perturb=True)
    assert not np.array_equal(np.asarray(out1["rgb"]), np.asarray(out3["rgb"]))


def test_render_rays_gradients_flow():
    params = init_nerf_params(jax.random.key(0), CFG)
    o, d = _rays(4)

    def loss(p):
        out = render_rays(p, CFG, jax.random.key(1), o, d, perturb=False)
        return jnp.sum(out["rgb"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_render_frame_shapes_and_padding():
    """Frame renderer must handle H*W not divisible by chunk."""
    params = init_nerf_params(jax.random.key(0), CFG)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    rgb, depth, acc = render_frame(params, CFG, jax.random.key(0), c2w,
                                   height=11, width=13, focal=10.0,
                                   n_importance=0, chunk=32)
    assert rgb.shape == (11, 13, 3)
    assert depth.shape == (11, 13)
    assert acc.shape == (11, 13)
    assert np.all(np.isfinite(np.asarray(rgb)))


def test_render_frame_matches_render_rays():
    params = init_nerf_params(jax.random.key(0), CFG)
    from danerf_tpu.ops.rays import generate_rays
    H, W, f = 6, 8, 7.0
    rgb_f, depth_f, _ = render_frame(params, CFG, jax.random.key(0), np.eye(4, dtype=np.float32),
                                     height=H, width=W, focal=f, n_importance=0,
                                     perturb=False, chunk=16)
    o, d = generate_rays(H, W, f, jnp.eye(4))
    out = render_rays(params, CFG, jax.random.key(0), o.reshape(-1, 3), d.reshape(-1, 3),
                      n_importance=0, perturb=False)
    np.testing.assert_allclose(np.asarray(rgb_f).reshape(-1, 3), np.asarray(out["rgb"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_f).reshape(-1), np.asarray(out["depth"]),
                               atol=1e-4)
