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


def _rays(n, cfg, seed=1):
    ko, kd, ke = jax.random.split(jax.random.key(seed), 3)
    rays_o = jax.random.normal(ko, (n, 3)) * 0.1 + jnp.asarray([0.0, 0.0, 4.0])
    rays_d = jax.random.normal(kd, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    emb = jax.random.normal(ke, (n, cfg.appearance_dim))
    return rays_o, rays_d, emb


def test_fused_render_matches_core():
    """The fully-fused ray-march kernel (kernels/fused_render.py) must match
    the core sample->eval->composite path, including the background-color
    composite."""
    from danerf_tpu.render.renderer import render_rays

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    rays_o, rays_d, emb = _rays(24, cfg)
    key = jax.random.key(7)
    kwargs = dict(n_samples=16, n_importance=0, perturb=True,
                  background_color=jnp.asarray([1.0, 1.0, 1.0]))

    ref = render_rays(params, cfg, key, rays_o, rays_d, emb, **kwargs)
    out = render_rays(params, cfg, key, rays_o, rays_d, emb,
                      fused_composite=True, **kwargs)
    for k in ("rgb", "depth", "acc", "weights", "z_vals"):
        np.testing.assert_allclose(out[k], ref[k], rtol=3e-5, atol=3e-5,
                                   err_msg=k)


def test_fused_render_fine_pass_shape():
    """Hierarchical fine-pass parity on IDENTICAL combined z (end-to-end hier
    comparisons are only statistically close: fp noise in coarse weights
    discretely shifts the inverse-CDF sample positions).  Here a sorted
    non-uniform S=24 depth vector — the fine pass shape — must composite
    identically through the fused kernel and the core path."""
    from danerf_tpu.models import nerf_apply
    from danerf_tpu.ops.composite import composite

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    R, S = 24, 24
    rays_o, rays_d, emb = _rays(R, cfg)
    z = jnp.sort(jax.random.uniform(jax.random.key(11), (R, S),
                                    minval=2.0, maxval=6.0), axis=-1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    e = jnp.broadcast_to(emb[:, None, :], (R, S, cfg.appearance_dim))
    rgb_s, sig_s = nerf_apply(params, cfg, pts, dirs, e, None)
    ref = composite(rgb_s, sig_s, z)

    from danerf_tpu.kernels.fused_render import fused_render_rays_eval

    out = fused_render_rays_eval(params, cfg, rays_o, rays_d, z, emb)
    for k in ("rgb", "depth", "acc", "weights"):
        np.testing.assert_allclose(out[k], ref[k], rtol=3e-5, atol=3e-5,
                                   err_msg=k)

    # and the end-to-end hier fused path must at least render finite images
    from danerf_tpu.render.renderer import render_rays

    hier = render_rays(params, cfg, jax.random.key(3), rays_o, rays_d, emb,
                       n_samples=16, n_importance=8, perturb=False,
                       fused_composite=True)
    assert np.all(np.isfinite(np.asarray(hier["rgb"])))
    assert hier["z_vals"].shape == (R, 24)


def test_fused_render_ray_padding():
    """Ray counts that don't divide the ray tile go through the pad path."""
    from danerf_tpu.kernels.fused_render import fused_render_rays_eval
    from danerf_tpu.models import nerf_apply
    from danerf_tpu.ops.composite import composite
    from danerf_tpu.ops.sampling import sample_stratified

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    rays_o, rays_d, emb = _rays(7, cfg)  # 7 rays, S=16 -> pads the ray tile
    z, pts = sample_stratified(jax.random.key(2), rays_o, rays_d, 2.0, 6.0,
                               16, perturb=False)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    e = jnp.broadcast_to(emb[:, None, :], (7, 16, cfg.appearance_dim))
    rgb_s, sig_s = nerf_apply(params, cfg, pts, dirs, e, None)
    ref = composite(rgb_s, sig_s, z)
    out = fused_render_rays_eval(params, cfg, rays_o, rays_d, z, emb)
    np.testing.assert_allclose(out["rgb"], ref["rgb"], rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(out["weights"], ref["weights"], rtol=3e-5, atol=3e-5)


def test_fused_render_with_aabb_bounds():
    """Per-ray AABB-tightened [near, far] feeds the fused kernel the same way
    it feeds the core path (z is computed outside the kernel either way)."""
    from danerf_tpu.render.renderer import render_rays

    cfg = SMALL.replace(scene_aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5))
    params = init_nerf_params(jax.random.key(0), cfg)
    rays_o, rays_d, emb = _rays(16, cfg)
    kwargs = dict(n_samples=16, n_importance=0, perturb=False)

    ref = render_rays(params, cfg, jax.random.key(1), rays_o, rays_d, emb, **kwargs)
    out = render_rays(params, cfg, jax.random.key(1), rays_o, rays_d, emb,
                      fused_composite=True, **kwargs)
    for k in ("rgb", "depth", "acc", "weights"):
        np.testing.assert_allclose(out[k], ref[k], rtol=3e-5, atol=3e-5, err_msg=k)


def test_fused_march_gradients_match_core():
    """Gradients through the fully-fused ray-march custom VJP (MLP + the
    compositing chain in-kernel) must match autodiff through the core
    sample->eval->composite path, for a loss over rgb, depth and acc."""
    from danerf_tpu.render.renderer import render_rays

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    rays_o, rays_d, emb = _rays(24, cfg)
    key = jax.random.key(7)
    target = jax.random.uniform(jax.random.key(9), (24, 3))

    def loss(p, e, fused):
        out = render_rays(p, cfg, key, rays_o, rays_d, e, n_samples=16,
                          n_importance=0, perturb=True, fused_composite=fused)
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 0.1 * jnp.mean(out["depth"]) + 0.05 * jnp.mean(out["acc"]))

    (lf, gf) = jax.value_and_grad(loss, argnums=(0, 1))(params, emb, True)
    (lx, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, emb, False)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg="march grad mismatch")


@pytest.mark.slow
def test_fused_march_gradients_hierarchical():
    """Hierarchical training path through the fused march (coarse + fine both
    fused, coarse aux loss, weights stop-gradiented into sample_pdf): grads
    must be finite and match the core path when the sampled z positions agree
    (perturb=False keeps them deterministic; the coarse weights feeding
    sample_pdf only shift fine z by fp noise, so compare loosely)."""
    from danerf_tpu.render.renderer import render_rays

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    rays_o, rays_d, emb = _rays(16, cfg)
    target = jax.random.uniform(jax.random.key(9), (16, 3))

    def loss(p, e, fused):
        out = render_rays(p, cfg, jax.random.key(3), rays_o, rays_d, e,
                          n_samples=16, n_importance=8, perturb=False,
                          fused_composite=fused)
        l = jnp.mean((out["rgb"] - target) ** 2)
        return l + 0.1 * jnp.mean((out["coarse_rgb"] - target) ** 2)

    gf = jax.grad(loss, argnums=(0, 1))(params, emb, True)
    gx = jax.grad(loss, argnums=(0, 1))(params, emb, False)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-2, err_msg="hier march grads")


def test_coarse_field_output_matches_nerf_apply():
    """fused_render_rays_coarse_field's per-sample field output (R, 4, Sc)
    must hold exactly the MLP's rgb/sigma at the coarse depths."""
    from danerf_tpu.kernels.fused_render import fused_render_rays_coarse_field
    from danerf_tpu.ops.sampling import sample_stratified

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    R, S = 16, 16
    rays_o, rays_d, emb = _rays(R, cfg)
    z, pts = sample_stratified(jax.random.key(2), rays_o, rays_d, 2.0, 6.0,
                               S, perturb=False)
    out = fused_render_rays_coarse_field(params, cfg, rays_o, rays_d, z, emb)
    assert out["field"].shape == (R, 4, S)

    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    e = jnp.broadcast_to(emb[:, None, :], (R, S, cfg.appearance_dim))
    rgb_s, sig_s = nerf_apply(params, cfg, pts, dirs, e, None)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out["field"][:, :3]), 1, 2),
                               rgb_s, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["field"][:, 3]), sig_s,
                               rtol=3e-5, atol=3e-5)


def test_merged_kernel_equals_full_eval_on_union():
    """The merged composite (field eval at fine depths only + reuse of coarse
    values) must equal evaluating the field at ALL union depths — the
    mathematical identity the 2x-FLOP hierarchical path rests on."""
    from danerf_tpu.kernels.fused_render import (
        fused_render_rays_coarse_field, fused_render_rays_eval,
        fused_render_rays_merged)
    from danerf_tpu.ops.sampling import sample_stratified

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    R, SC, SF = 16, 16, 8
    rays_o, rays_d, emb = _rays(R, cfg)
    z_c, _ = sample_stratified(jax.random.key(2), rays_o, rays_d, 2.0, 6.0,
                               SC, perturb=True)
    z_f = jnp.sort(jax.random.uniform(jax.random.key(5), (R, SF),
                                      minval=2.0, maxval=6.0), axis=-1)

    coarse = fused_render_rays_coarse_field(params, cfg, rays_o, rays_d,
                                            z_c, emb)
    merged = fused_render_rays_merged(params, cfg, rays_o, rays_d, z_c,
                                      coarse["field"], z_f, emb)

    z_union = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
    ref = fused_render_rays_eval(params, cfg, rays_o, rays_d, z_union, emb)

    np.testing.assert_allclose(merged["z_vals"], z_union, atol=1e-6)
    for k in ("rgb", "depth", "acc", "weights"):
        np.testing.assert_allclose(merged[k], ref[k], rtol=3e-5, atol=3e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_merged_kernel_gradients_equal_full_eval():
    """Gradients through the merged path (fine cotangents reaching the coarse
    kernel via the field cotangent) must equal gradients of the full-union
    evaluation."""
    from danerf_tpu.kernels.fused_render import (
        fused_render_rays_coarse_field, fused_render_rays_eval,
        fused_render_rays_merged)
    from danerf_tpu.ops.sampling import sample_stratified

    cfg = SMALL
    params = init_nerf_params(jax.random.key(0), cfg)
    R, SC, SF = 12, 12, 6
    rays_o, rays_d, emb = _rays(R, cfg)
    z_c, _ = sample_stratified(jax.random.key(2), rays_o, rays_d, 2.0, 6.0,
                               SC, perturb=False)
    z_f = jnp.sort(jax.random.uniform(jax.random.key(5), (R, SF),
                                      minval=2.0, maxval=6.0), axis=-1)
    target = jax.random.uniform(jax.random.key(9), (R, 3))

    def loss_merged(p, e):
        coarse = fused_render_rays_coarse_field(p, cfg, rays_o, rays_d, z_c, e)
        out = fused_render_rays_merged(p, cfg, rays_o, rays_d, z_c,
                                       coarse["field"], z_f, e)
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 0.1 * jnp.mean(out["depth"])
                + 0.1 * jnp.mean((coarse["rgb"] - target) ** 2))

    def loss_union(p, e):
        z_union = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
        out = fused_render_rays_eval(p, cfg, rays_o, rays_d, z_union, e)
        coarse = fused_render_rays_eval(p, cfg, rays_o, rays_d, z_c, e)
        return (jnp.mean((out["rgb"] - target) ** 2)
                + 0.1 * jnp.mean(out["depth"])
                + 0.1 * jnp.mean((coarse["rgb"] - target) ** 2))

    gm = jax.grad(loss_merged, argnums=(0, 1))(params, emb)
    gu = jax.grad(loss_union, argnums=(0, 1))(params, emb)
    for a, b in zip(jax.tree_util.tree_leaves(gm), jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg="merged grads")


@pytest.mark.parametrize("use_app", [True, False], ids=["app", "noapp"])
def test_onepass_train_kernel_matches_vjp_path(use_app):
    """The single-pass train kernel (forward + in-kernel MSE + backward in one
    pallas_call, kernels/fused_render._train_kernel) must reproduce the
    loss AND gradients of value_and_grad through the custom-VJP path, for a
    ray count that is not a tile multiple (exercises the in-kernel padding
    mask)."""
    from danerf_tpu.models import init_appearance_embeddings
    from danerf_tpu.train.trainer import _onepass_loss_grads, loss_fn

    cfg = SMALL.replace(use_pallas=True, use_fused_train=True,
                        num_importance=0, num_samples=16,
                        use_appearance=use_app)
    params = {"model": init_nerf_params(jax.random.key(0), cfg)}
    n_img = 5
    if use_app:
        params["appearance"] = init_appearance_embeddings(
            jax.random.key(1), n_img, cfg.appearance_dim)

    n = 24  # not a multiple of the (bwd_tile // s) ray tile
    rays_o, rays_d, _ = _rays(n, cfg)
    batch = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
        "img_idx": jax.random.randint(jax.random.key(4), (n,), 0, n_img),
    }
    key = jax.random.key(7)

    (l1, aux1), g1 = _onepass_loss_grads(params, cfg, key, batch)
    (l2, aux2), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, key, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(aux1["mse"]), float(aux2["mse"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=f"onepass grad {path}")


def test_onepass_train_kernel_with_aabb():
    """One-pass path under scene_aabb bound tightening matches the VJP path."""
    from danerf_tpu.train.trainer import _onepass_loss_grads, loss_fn

    cfg = SMALL.replace(use_pallas=True, use_fused_train=True,
                        num_importance=0, num_samples=16,
                        use_appearance=False,
                        scene_aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5))
    params = {"model": init_nerf_params(jax.random.key(0), cfg)}
    n = 32
    rays_o, rays_d, _ = _rays(n, cfg)
    batch = {
        "rays_o": rays_o, "rays_d": rays_d,
        "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
        "img_idx": jnp.zeros((n,), jnp.int32),
    }
    key = jax.random.key(11)
    (l1, _), g1 = _onepass_loss_grads(params, cfg, key, batch)
    (l2, _), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, key, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg="onepass aabb grads")


def test_onepass_hier_train_matches_vjp_path():
    """Hierarchical single-pass training (merged fwd+MSE+bwd in one kernel +
    coarse custom VJP fed the in-kernel g_field) must reproduce
    value_and_grad through the fused hier path for loss AND every grad leaf,
    including the coarse auxiliary loss term."""
    from danerf_tpu.models import init_appearance_embeddings
    from danerf_tpu.train.trainer import _onepass_hier_loss_grads, loss_fn

    cfg = SMALL.replace(use_pallas=True, use_fused_train=True,
                        num_samples=16, num_importance=8,
                        coarse_loss_weight=1.0)
    params = {"model": init_nerf_params(jax.random.key(0), cfg),
              "appearance": init_appearance_embeddings(
                  jax.random.key(1), 5, cfg.appearance_dim)}
    n = 24  # not a tile multiple: exercises the merged kernel's ray mask
    rays_o, rays_d, _ = _rays(n, cfg)
    batch = {
        "rays_o": rays_o, "rays_d": rays_d,
        "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
        "img_idx": jax.random.randint(jax.random.key(4), (n,), 0, 5),
    }
    key = jax.random.key(13)

    (l1, aux1), g1 = _onepass_hier_loss_grads(params, cfg, key, batch)
    (l2, aux2), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, key, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(aux1["mse"]), float(aux2["mse"]), rtol=1e-5)
    np.testing.assert_allclose(float(aux1["coarse_mse"]),
                               float(aux2["coarse_mse"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=f"hier onepass {path}")


@pytest.mark.slow
def test_onepass_train_kernel_bf16_runs_and_learns():
    """The PRODUCTION config runs bf16 kernels; CI otherwise only exercises
    f32.  The bf16 one-pass step must produce finite loss/grads that agree
    with the f32 path to bf16 tolerance, and a few optimizer steps must
    reduce the loss."""
    import optax

    from danerf_tpu.train.trainer import _onepass_loss_grads, loss_fn

    cfg16 = SMALL.replace(use_pallas=True, use_fused_train=True,
                          num_importance=0, num_samples=16,
                          use_appearance=False, use_bf16=True)
    cfg32 = cfg16.replace(use_bf16=False)
    params = {"model": init_nerf_params(jax.random.key(0), cfg16)}
    n = 32
    rays_o, rays_d, _ = _rays(n, cfg16)
    batch = {
        "rays_o": rays_o, "rays_d": rays_d,
        "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
        "img_idx": jnp.zeros((n,), jnp.int32),
    }
    key = jax.random.key(5)
    (l16, _), g16 = _onepass_loss_grads(params, cfg16, key, batch)
    (l32, _), g32 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg32, key, batch)
    assert np.isfinite(float(l16))
    np.testing.assert_allclose(float(l16), float(l32), rtol=5e-2)
    for a, b in zip(jax.tree_util.tree_leaves(g16),
                    jax.tree_util.tree_leaves(g32)):
        assert np.all(np.isfinite(np.asarray(a)))
        # bf16 matmuls vs f32: loose agreement, same direction
        denom = np.maximum(np.abs(np.asarray(b)), 1e-3)
        assert np.median(np.abs(np.asarray(a) - np.asarray(b)) / denom) < 0.15

    opt = optax.adam(1e-2)
    ostate = opt.init(params)
    losses = []
    for i in range(8):
        (l, _), g = _onepass_loss_grads(params, cfg16,
                                        jax.random.fold_in(key, i), batch)
        upd, ostate = opt.update(g, ostate, params)
        params = optax.apply_updates(params, upd)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_density_robustness_knobs():
    """softplus density + bias init: kernel matches XLA path (fwd and grads),
    and the born-dead-seed scenario (parity_report.json: seed 1 never trains
    under reference-exact relu init) actually learns with either knob."""
    import optax

    from danerf_tpu.render.renderer import render_rays
    from danerf_tpu.train.trainer import _onepass_loss_grads

    cfg = SMALL.replace(use_appearance=False, num_samples=16,
                        num_importance=0, density_activation="softplus",
                        density_bias_init=0.5)
    params = init_nerf_params(jax.random.key(0), cfg)
    x, d, _ = _inputs(64, cfg)
    r_x, s_x = nerf_apply(params, cfg, x, d)
    r_f, s_f = fused_nerf_apply(params, cfg, x, d)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), atol=2e-5)

    key = jax.random.key(3)
    rays_o, rays_d, _ = _rays(32, cfg)
    target = jax.random.uniform(jax.random.key(9), (32, 3))

    def loss(p, fused):
        out = render_rays(p, cfg, key, rays_o, rays_d, n_samples=16,
                          n_importance=0, perturb=True, fused_composite=fused)
        return jnp.mean((out["rgb"] - target) ** 2)

    gf = jax.grad(lambda p: loss(p, True))(params)
    gx = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg="softplus grads")

    # Born-dead scenario: force the head dead, then check each knob revives it.
    dead = dict(params)
    dead["density"] = {"w": params["density"]["w"],
                       "b": params["density"]["b"] - 10.0}
    batch = {"rays_o": rays_o, "rays_d": rays_d, "rgb": target,
             "img_idx": jnp.zeros((32,), jnp.int32)}
    cfg_relu = cfg.replace(density_activation="relu", use_pallas=True,
                           use_fused_train=True)
    (_, _), g_relu = _onepass_loss_grads({"model": dead}, cfg_relu, key, batch)
    gn_relu = sum(float(jnp.sum(jnp.abs(x)))
                  for x in jax.tree_util.tree_leaves(g_relu))
    assert gn_relu == 0.0  # the hazard: relu gate kills every gradient

    cfg_sp = cfg_relu.replace(density_activation="softplus")
    (_, _), g_sp = _onepass_loss_grads({"model": dead}, cfg_sp, key, batch)
    gn_sp = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g_sp))
    assert gn_sp > 0.0  # softplus always passes gradient

    # density_bias_init moves a fresh init's head alive
    cfg_b = cfg_relu.replace(density_bias_init=0.5)
    p_b = init_nerf_params(jax.random.key(1), cfg_b)
    _, sig = nerf_apply(p_b, cfg_b, x, d)
    assert float(jnp.mean(sig > 0)) > 0.5


@pytest.mark.slow
def test_hier_onepass_fused_matches_twokernel_and_autodiff():
    """The ONE-kernel hierarchical train step (coarse march + in-kernel
    inverse-CDF + merged fine + both losses + full backward in a single
    pallas_call) must reproduce the two-kernel path AND value_and_grad of the
    fused hier loss for the loss and every grad leaf.  Only numerics delta:
    the in-kernel CDF cumsum is a triangular matmul (different f32 summation
    order than jnp.cumsum), which perturbs the importance depths by ~1 ulp —
    the inverse CDF is continuous in the cdf values, so tolerances absorb it."""
    from danerf_tpu.models import init_appearance_embeddings
    from danerf_tpu.train.trainer import (_onepass_hier_fused_loss_grads,
                                          _onepass_hier_loss_grads, loss_fn)

    cfg = SMALL.replace(use_pallas=True, use_fused_train=True,
                        use_hier_onepass=True, num_samples=16,
                        num_importance=8, coarse_loss_weight=0.7)
    params = {"model": init_nerf_params(jax.random.key(0), cfg),
              "appearance": init_appearance_embeddings(
                  jax.random.key(1), 5, cfg.appearance_dim)}
    n = 24  # not a tile multiple: exercises the fused kernel's ray mask
    rays_o, rays_d, _ = _rays(n, cfg)
    batch = {
        "rays_o": rays_o, "rays_d": rays_d,
        "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
        "img_idx": jax.random.randint(jax.random.key(4), (n,), 0, 5),
    }
    key = jax.random.key(13)

    (l1, aux1), g1 = _onepass_hier_fused_loss_grads(params, cfg, key, batch)
    (l2, aux2), g2 = _onepass_hier_loss_grads(params, cfg, key, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_allclose(float(aux1["mse"]), float(aux2["mse"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(aux1["coarse_mse"]),
                               float(aux2["coarse_mse"]), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=f"hier fused 2k {path}")

    (l3, _), g3 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, key, batch)
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-4)
    flat3 = jax.tree_util.tree_leaves_with_path(g3)
    for (path, a), (_, b) in zip(flat1, flat3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=f"hier fused ad {path}")


def test_pdf_tile_matches_sample_pdf():
    """The in-kernel inverse-CDF tile must reproduce ops/sampling.sample_pdf
    given the same uniforms (outside a kernel both run as plain jnp)."""
    from danerf_tpu.kernels.fused_render import _pdf_tile
    from danerf_tpu.ops.sampling import importance_uniforms, sample_pdf

    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    tr, sc, sf = 8, 16, 8
    z = jnp.sort(jax.random.uniform(k1, (tr, sc), minval=2.0, maxval=6.0),
                 axis=-1)
    w = jax.random.uniform(k2, (tr, sc))
    u = importance_uniforms(k3, (tr,), sf, perturb=True)
    ref = sample_pdf(k3, z, w, sf, perturb=True)
    got = _pdf_tile(tr, sc, sf, z, w, u)
    # A u within ~1 ulp of a CDF boundary can flip the searchsorted bracket
    # between the two implementations (cumsum vs triangular-matmul summation
    # order) and produce an O(bin-width) depth mismatch; mask such samples
    # out before asserting tight tolerances so the test is robust to
    # seed/shape edits, not just to this fixed seed.
    eps = 1e-5
    wn = w + eps
    cdf = jnp.cumsum(wn / jnp.sum(wn, axis=-1, keepdims=True), axis=-1)
    near_boundary = jnp.any(
        jnp.abs(u[..., :, None] - cdf[..., None, :]) < 4e-7, axis=-1)
    safe = np.asarray(~near_boundary)
    assert safe.mean() > 0.8, "probe: too few boundary-safe samples"
    np.testing.assert_allclose(np.asarray(got)[safe], np.asarray(ref)[safe],
                               atol=1e-5, rtol=1e-5)
    # sorted output (u strictly increasing, cdf strictly increasing)
    assert bool(jnp.all(got[:, 1:] >= got[:, :-1]))


@pytest.mark.slow
def test_train_kernel_composite2d_matches_lane_layout():
    """The dense (TR,S) 2D composite (cfg.fused_composite2d) must reproduce
    the (TR,1,S) lane-layout path bit-for-near: same loss, same grads."""
    from danerf_tpu.models import init_appearance_embeddings
    from danerf_tpu.train.trainer import _onepass_loss_grads

    base = SMALL.replace(use_pallas=True, use_fused_train=True,
                         num_importance=0, num_samples=16,
                         use_appearance=True)
    params = {"model": init_nerf_params(jax.random.key(0), base),
              "appearance": init_appearance_embeddings(
                  jax.random.key(1), 4, base.appearance_dim)}
    n = 24
    rays_o, rays_d, _ = _rays(n, base)
    batch = {"rays_o": rays_o, "rays_d": rays_d,
             "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
             "img_idx": jax.random.randint(jax.random.key(4), (n,), 0, 4)}
    key = jax.random.key(7)

    (l_a, _), g_a = _onepass_loss_grads(
        params, base.replace(fused_composite2d=True), key, batch)
    (l_b, _), g_b = _onepass_loss_grads(
        params, base.replace(fused_composite2d=False), key, batch)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    for (path, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_a),
                                 jax.tree_util.tree_leaves_with_path(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   rtol=1e-5, err_msg=f"composite2d {path}")


@pytest.mark.slow
def test_hier_train_kernel_composite2d_matches_lane_layout():
    """The 2D merged-train composite must reproduce the lane-layout merged
    path: same hier loss, same grads (default 64+64 config's hot kernel)."""
    from danerf_tpu.models import init_appearance_embeddings
    from danerf_tpu.train.trainer import _onepass_hier_loss_grads

    base = SMALL.replace(use_pallas=True, use_fused_train=True,
                         num_samples=16, num_importance=8,
                         use_appearance=True)
    params = {"model": init_nerf_params(jax.random.key(0), base),
              "appearance": init_appearance_embeddings(
                  jax.random.key(1), 4, base.appearance_dim)}
    n = 24
    rays_o, rays_d, _ = _rays(n, base)
    batch = {"rays_o": rays_o, "rays_d": rays_d,
             "rgb": jax.random.uniform(jax.random.key(3), (n, 3)),
             "img_idx": jax.random.randint(jax.random.key(4), (n,), 0, 4)}
    key = jax.random.key(7)

    (l_a, _), g_a = _onepass_hier_loss_grads(
        params, base.replace(fused_composite2d=True), key, batch)
    (l_b, _), g_b = _onepass_hier_loss_grads(
        params, base.replace(fused_composite2d=False), key, batch)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    for (path, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_a),
                                 jax.tree_util.tree_leaves_with_path(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   rtol=1e-5, err_msg=f"hier composite2d {path}")
