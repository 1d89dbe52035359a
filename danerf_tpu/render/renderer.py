"""Volume renderer: stratified coarse pass + (actually wired) hierarchical
inverse-CDF fine pass + alpha compositing.

The reference declares hierarchical sampling (config.py:14, README "Hierarchical
sampling") but stubs the fine pass (``pass`` at /root/reference/src/render.py:83-86);
its building block ``sample_importance`` is imported and never called, and would
index out of bounds if it were.  Here the full coarse->fine loop is implemented
as declared: coarse weights -> inverse-CDF resample -> combined sort -> fine MLP
evaluation over all samples -> final composite.

TPU shape discipline: every intermediate is (rays, samples, feat) with static
sample counts, so the whole render_rays body is one fused XLA program — the two
MLP evaluations are large (rays*samples, 256) matmuls that tile directly onto
the MXU, and everything between them is VPU elementwise work that XLA fuses.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from danerf_tpu.config import NeRFConfig
from danerf_tpu.models.nerf import nerf_apply
from danerf_tpu.ops.composite import composite
from danerf_tpu.ops.sampling import combine_z, sample_pdf, sample_stratified


def _eval_field(params, cfg, pts, rays_d, appearance_embedding, t):
    """Evaluate the MLP on (R, S, 3) points with per-ray dirs/embeddings.

    The reference flattens to (R*S, feat) before the MLP (src/render.py:29-46);
    functionally identical here, but we keep the (R, S) structure and let
    broadcasting expand dirs/embeddings — XLA folds the broadcast into the
    first matmul instead of materializing expanded copies in HBM.
    """
    dirs = jnp.broadcast_to(rays_d[..., None, :], pts.shape)
    emb = None
    if appearance_embedding is not None:
        emb = jnp.broadcast_to(
            appearance_embedding[..., None, :],
            pts.shape[:-1] + (appearance_embedding.shape[-1],),
        )
    tt = None
    if t is not None:
        tt = jnp.broadcast_to(t[..., None, :], pts.shape[:-1] + (t.shape[-1],))
    if cfg.use_pallas:
        from danerf_tpu.kernels import fused_nerf_apply

        rgb, sigma = fused_nerf_apply(params, cfg, pts, dirs, emb, tt)
    elif cfg.remat:
        apply = jax.checkpoint(
            lambda p, a, b, c, dd: nerf_apply(p, cfg, a, b, c, dd),
            policy=jax.checkpoint_policies.nothing_saveable)
        rgb, sigma = apply(params, pts, dirs, emb, tt)
    else:
        rgb, sigma = nerf_apply(params, cfg, pts, dirs, emb, tt)
    return rgb, sigma


def render_rays(
    params,
    cfg: NeRFConfig,
    key,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    appearance_embedding: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
    n_samples: Optional[int] = None,
    n_importance: Optional[int] = None,
    perturb: bool = True,
    background_color=None,
    fused_composite: bool = False,
):
    """Render a batch of rays.

    Args:
        params: model param pytree.
        cfg: static config.
        key: PRNG key threading the stratified + importance jitter.
        rays_o, rays_d: (R, 3); directions need not be normalized (the
            reference normalizes inside, src/render.py:19).
        appearance_embedding: optional (R, app_dim) per-ray embedding.
        t: optional (R, 1) time input.
        n_samples / n_importance: static overrides of cfg (render presets).
        perturb: static bool.
        background_color: optional (3,).
        fused_composite: static bool — route field eval AND compositing
            through the fully-fused ray-march kernel
            (kernels/fused_render.py).  Differentiable via its custom VJP
            (params/appearance grads only; ray geometry and z_vals receive
            zero gradients — sampling positions are stop_gradient'ed anyway).
            HBM then sees only per-ray tensors, avoiding the 4-128x
            tiled-layout padding of (rays*samples, feat) temporaries
            that OOMed the hierarchical 800x800 frame.

    Returns:
        dict with rgb (R, 3), depth (R,), acc (R,), weights (R, S_total),
        z_vals (R, S_total), plus coarse_* entries when a fine pass ran.
    """
    if n_samples is None:
        n_samples = cfg.num_samples
    if n_importance is None:
        n_importance = cfg.num_importance

    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    near, far = cfg.near, cfg.far
    if cfg.scene_aabb is not None:
        from danerf_tpu.ops.sampling import ray_aabb_bounds

        box = cfg.scene_aabb
        near, far = ray_aabb_bounds(rays_o, rays_d, box[:3], box[3:],
                                    cfg.near, cfg.far)

    def eval_composite(z_vals, pts):
        if fused_composite:
            from danerf_tpu.kernels.fused_render import fused_render_rays_eval

            out = fused_render_rays_eval(params, cfg, rays_o, rays_d, z_vals,
                                         appearance_embedding, t)
            if background_color is not None:
                bg = jnp.asarray(background_color, out["rgb"].dtype)
                out["rgb"] = out["rgb"] + (1.0 - out["acc"][..., None]) * bg
            return out
        rgb, sigma = _eval_field(params, cfg, pts, rays_d, appearance_embedding, t)
        return composite(rgb, sigma, z_vals, background_color)

    k_strat, k_imp = jax.random.split(key)
    z_coarse, pts = sample_stratified(
        k_strat, rays_o, rays_d, near, far, n_samples, perturb=perturb
    )

    if fused_composite and n_importance > 0:
        # Fused hierarchical path: the coarse kernel also emits its per-sample
        # field values, the importance depths come from the coarse weights,
        # and the merged kernel field-evals ONLY the new depths — compositing
        # over the rank-merged order (2x coarse FLOPs instead of 3x; numerics
        # identical to re-evaluating all samples, see fused_render.py).
        from danerf_tpu.kernels.fused_render import (
            fused_render_rays_coarse_field, fused_render_rays_merged)

        coarse = fused_render_rays_coarse_field(
            params, cfg, rays_o, rays_d, z_coarse, appearance_embedding, t)
        weights = jax.lax.stop_gradient(coarse["weights"])
        z_fine = sample_pdf(k_imp, z_coarse, weights, n_importance,
                            perturb=perturb)
        fine = fused_render_rays_merged(
            params, cfg, rays_o, rays_d, z_coarse, coarse["field"],
            jax.lax.stop_gradient(z_fine), appearance_embedding, t)
        if background_color is not None:
            bg = jnp.asarray(background_color, fine["rgb"].dtype)
            fine["rgb"] = fine["rgb"] + (1.0 - fine["acc"][..., None]) * bg
            coarse_rgb = coarse["rgb"] + (1.0 - coarse["acc"][..., None]) * bg
        else:
            coarse_rgb = coarse["rgb"]
        fine["coarse_rgb"] = coarse_rgb
        fine["coarse_depth"] = coarse["depth"]
        return fine

    coarse = eval_composite(z_coarse, pts)

    if n_importance <= 0:
        coarse["z_vals"] = z_coarse
        return coarse

    # Hierarchical fine pass.  Weights are detached: sampling positions are a
    # control-variate choice, not a differentiable quantity (keeps the backward
    # pass free of sort/searchsorted gradients).
    weights = jax.lax.stop_gradient(coarse["weights"])
    z_fine = sample_pdf(k_imp, z_coarse, weights, n_importance, perturb=perturb)
    z_all, pts_all = combine_z(rays_o, rays_d, z_coarse, jax.lax.stop_gradient(z_fine))

    fine = eval_composite(z_all, pts_all)
    fine["z_vals"] = z_all
    fine["coarse_rgb"] = coarse["rgb"]
    fine["coarse_depth"] = coarse["depth"]
    return fine


@partial(jax.jit, static_argnames=("cfg", "height", "width", "n_samples",
                                   "n_importance", "perturb", "chunk", "mesh"))
def _render_frame_jit(params, cfg, key, rays_o, rays_d, emb, height, width,
                      n_samples, n_importance, perturb, chunk, mesh=None,
                      t=None):
    """Whole-frame render as a scan over fixed-size ray chunks.

    Replaces the reference's Python chunk loop with per-chunk host syncs
    (run.py:212-228) by a single device program: ``lax.scan`` over chunks keeps
    every chunk's (rays, samples, 256) activations inside one compilation and
    transfers only the final (H, W) images to the host.

    With ``mesh`` (static), each chunk's rays are constrained to
    ``P('data')`` so GSPMD splits the frame's rays across every device —
    an 800x800 frame's 640k rays render as per-device tiles instead of on one
    chip (SURVEY.md §5.7 ray/tile sharding; reference equivalent is the serial
    chunk loop).
    """
    n_rays = height * width
    n_chunks = -(-n_rays // chunk)
    pad = n_chunks * chunk - n_rays
    rays_o = jnp.pad(rays_o.reshape(-1, 3), ((0, pad), (0, 0)))
    rays_d = jnp.pad(rays_d.reshape(-1, 3), ((0, pad), (0, 0)))
    rays_o = rays_o.reshape(n_chunks, chunk, 3)
    rays_d = rays_d.reshape(n_chunks, chunk, 3)
    keys = jax.random.split(key, n_chunks)

    constrain = lambda x: x
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        ray_sharding = NamedSharding(mesh, PartitionSpec("data"))
        constrain = lambda x: jax.lax.with_sharding_constraint(x, ray_sharding)

    # White-background compositing at render time (the reference's RGBA
    # convention, src/dataset.py:159-161: training targets are composited
    # over white, so rendered rays must fill acc<1 with white to match).
    bg = (1.0, 1.0, 1.0) if cfg.white_background else None

    def body(_, inp):
        k, ro, rd = inp
        e = None if emb is None else jnp.broadcast_to(emb, (chunk, emb.shape[-1]))
        tt = None if t is None else jnp.broadcast_to(
            jnp.reshape(t, (1, 1)), (chunk, 1))
        out = render_rays(params, cfg, k, constrain(ro), constrain(rd), e,
                          t=tt, n_samples=n_samples, n_importance=n_importance,
                          perturb=perturb, fused_composite=cfg.use_pallas,
                          background_color=bg)
        return None, (out["rgb"], out["depth"], out["acc"])

    _, (rgb, depth, acc) = jax.lax.scan(body, None, (keys, rays_o, rays_d))
    rgb = rgb.reshape(-1, 3)[:n_rays].reshape(height, width, 3)
    depth = depth.reshape(-1)[:n_rays].reshape(height, width)
    acc = acc.reshape(-1)[:n_rays].reshape(height, width)
    return rgb, depth, acc


def render_frame(
    params,
    cfg: NeRFConfig,
    key,
    c2w,
    height: int,
    width: int,
    focal,
    appearance_embedding=None,
    n_samples: Optional[int] = None,
    n_importance: Optional[int] = None,
    perturb: bool = False,
    chunk: Optional[int] = None,
    mesh=None,
    t=None,
):
    """Render a full (height, width) frame from camera matrix ``c2w``.

    With ``mesh``, the frame's rays are sharded over its 'data' axis (every
    chunk splits across all devices).  ``t``: optional scalar frame time in
    [0, 1] for the AnimatedNeRF variant (cfg.use_time).  Returns
    (rgb [H,W,3] in [0,1], depth [H,W], acc [H,W]) as device arrays.
    """
    from danerf_tpu.ops.rays import generate_rays

    if n_samples is None:
        n_samples = cfg.num_samples
    if n_importance is None:
        n_importance = cfg.num_importance
    if chunk is None:
        chunk = cfg.render_chunk
    chunk = min(chunk, height * width)
    if mesh is not None:  # chunks must split evenly over the data axis
        n_data = mesh.shape.get("data", 1)
        chunk = -(-chunk // n_data) * n_data

    rays_o, rays_d = generate_rays(height, width, focal, jnp.asarray(c2w))
    emb = None
    if cfg.use_appearance and appearance_embedding is not None:
        emb = jnp.asarray(appearance_embedding)
    if cfg.use_time and t is None:
        t = 0.0  # default frame time; CLI --time / --animate_time override
    tt = None if t is None else jnp.asarray(t, jnp.float32)
    return _render_frame_jit(params, cfg, key, rays_o, rays_d, emb, height, width,
                             n_samples, n_importance, perturb, chunk, mesh,
                             t=tt)
