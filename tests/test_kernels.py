"""Pallas fused-MLP kernel tests (interpreter mode on CPU): values and
gradients must match the XLA reference path (SURVEY.md §7 gate:
allclose-vs-core before the kernel ships)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig
from danerf_tpu.kernels import fused_nerf_apply
from danerf_tpu.models import init_nerf_params, nerf_apply

CFG = NeRFConfig(use_bf16=False)
SMALL = NeRFConfig(hidden_dim=64, num_layers=4, skip_connect_layers=(2,),
                   use_bf16=False, appearance_dim=16)


def _inputs(n, cfg, seed=0):
    kx, kd, ke = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, (n, 3))
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    e = jax.random.normal(ke, (n, cfg.appearance_dim))
    return x, d, e


@pytest.mark.parametrize("cfg", [SMALL, CFG], ids=["small", "full"])
def test_fused_forward_matches_xla(cfg):
    params = init_nerf_params(jax.random.key(0), cfg)
    x, d, e = _inputs(512, cfg)
    rgb_f, sig_f = fused_nerf_apply(params, cfg, x, d, e)
    rgb_x, sig_x = nerf_apply(params, cfg, x, d, e)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_x), atol=2e-4)


def test_fused_forward_multi_tile_and_padding():
    """Inputs not divisible by TILE must pad internally and match."""
    params = init_nerf_params(jax.random.key(0), SMALL)
    x, d, e = _inputs(700, SMALL)  # 700 = 512 + 188 -> 2 tiles with padding
    rgb_f, sig_f = fused_nerf_apply(params, SMALL, x, d, e)
    rgb_x, sig_x = nerf_apply(params, SMALL, x, d, e)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_x), atol=2e-4)


def test_fused_forward_without_appearance():
    cfg = SMALL.replace(use_appearance=False)
    params = init_nerf_params(jax.random.key(0), cfg)
    x, d, _ = _inputs(512, cfg)
    rgb_f, sig_f = fused_nerf_apply(params, cfg, x, d, None)
    rgb_x, sig_x = nerf_apply(params, cfg, x, d, None)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_x), atol=2e-4)


def test_fused_gradients_match_xla():
    """Parameter + embedding grads through the custom VJP must match autodiff
    through the XLA path (the per-pixel gradient bar, BASELINE.json:5)."""
    params = init_nerf_params(jax.random.key(0), SMALL)
    x, d, e = _inputs(1024, SMALL, seed=3)
    target = jax.random.uniform(jax.random.key(9), (1024, 3))

    def loss_fused(p, emb):
        rgb, sigma = fused_nerf_apply(p, SMALL, x, d, emb)
        return jnp.mean((rgb - target) ** 2) + 1e-3 * jnp.mean(sigma)

    def loss_xla(p, emb):
        rgb, sigma = nerf_apply(p, SMALL, x, d, emb)
        return jnp.mean((rgb - target) ** 2) + 1e-3 * jnp.mean(sigma)

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, e)
    (lx, gx) = jax.value_and_grad(loss_xla, argnums=(0, 1))(params, e)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg="gradient mismatch")


def test_fused_in_render_rays():
    """use_pallas config flag routes the renderer through the fused kernel."""
    from danerf_tpu.render import render_rays

    cfg = SMALL.replace(num_samples=16, num_importance=0)
    params = init_nerf_params(jax.random.key(0), cfg)
    o = jnp.zeros((32, 3))
    d = jax.random.normal(jax.random.key(1), (32, 3))
    out_x = render_rays(params, cfg, jax.random.key(2), o, d, perturb=False)
    out_p = render_rays(params, cfg.replace(use_pallas=True), jax.random.key(2),
                        o, d, perturb=False)
    np.testing.assert_allclose(np.asarray(out_p["rgb"]), np.asarray(out_x["rgb"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p["depth"]), np.asarray(out_x["depth"]),
                               atol=1e-3)

    # Hierarchical: fp noise in coarse weights shifts inverse-CDF sample
    # positions, so outputs are only statistically close — check they render.
    cfg_h = cfg.replace(num_importance=8, use_pallas=True)
    out_h = render_rays(params, cfg_h, jax.random.key(2), o, d, perturb=False)
    assert np.all(np.isfinite(np.asarray(out_h["rgb"])))
    assert out_h["z_vals"].shape == (32, 24)


def test_fused_time_variant_matches_xla():
    """AnimatedNeRF (use_time) through the fused kernel: values + grads match
    nerf_apply (reference src/models.py:165-265 capability)."""
    cfg = NeRFConfig(hidden_dim=64, num_layers=4, skip_connect_layers=(2,),
                     use_bf16=False, appearance_dim=16, use_time=True,
                     time_enc_levels=4)
    params = init_nerf_params(jax.random.key(0), cfg)
    x, d, e = _inputs(96, cfg)
    t = jax.random.uniform(jax.random.key(7), (96, 1))

    rgb_k, sig_k = fused_nerf_apply(params, cfg, x, d, e, t)
    rgb_x, sig_x = nerf_apply(params, cfg, x, d, e, t)
    np.testing.assert_allclose(rgb_k, rgb_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sig_k, sig_x, rtol=1e-5, atol=1e-5)

    def loss_k(p, emb):
        r, s = fused_nerf_apply(p, cfg, x, d, emb, t)
        return jnp.sum(r) + jnp.sum(s)

    def loss_x(p, emb):
        r, s = nerf_apply(p, cfg, x, d, emb, t)
        return jnp.sum(r) + jnp.sum(s)

    gk = jax.grad(loss_k, argnums=(0, 1))(params, e)
    gx = jax.grad(loss_x, argnums=(0, 1))(params, e)
    # atol 1e-3: the kernel computes cos as sin(.+pi/2) (matmul-form encoding);
    # the ~1e-7 rounding difference can flip a ReLU gate for a sample sitting
    # on the boundary, shifting isolated gradient entries by ~1e-4.
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
