"""Evaluation harness: render held-out views and score PSNR/SSIM.

The reference's only evaluation is a 1000-ray validation strip rendered every
1000 steps and judged by eye (/root/reference/src/train.py:127-173).  This
harness renders full held-out views against ground truth and reports the
PSNR / SSIM numbers that the 0.1 dB parity bar is measured with
(BASELINE.json:5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data.dataset import RayDataset
from danerf_tpu.render.renderer import render_frame, render_rays
from danerf_tpu.train.metrics import ssim_device


@partial(jax.jit, static_argnames=("cfg", "steps", "batch", "n_importance"))
def _optimize_embedding_jit(params, cfg: NeRFConfig, key, rays_o, rays_d,
                            target, steps: int, batch: int,
                            n_importance: Optional[int], lr: float, t=None):
    """Adam on a single appearance embedding against a held-out view's rays.

    The NeRF-W test-time protocol: the model is frozen; only the (app_dim,)
    embedding is fit, on rays from the view's LEFT half (the caller passes
    that subset), so scoring the right half stays leak-free.
    """
    import optax

    opt = optax.adam(lr)
    emb0 = jnp.zeros((cfg.appearance_dim,), jnp.float32)
    opt_state = opt.init(emb0)
    n_rays = rays_o.shape[0]

    def loss_fn(emb, k):
        idx = jax.random.randint(jax.random.fold_in(k, 1), (batch,), 0, n_rays)
        ro, rd, tg = rays_o[idx], rays_d[idx], target[idx]
        tt = None if t is None else jnp.broadcast_to(
            jnp.reshape(t, (1, 1)), (batch, 1))
        out = render_rays(params, cfg, jax.random.fold_in(k, 2), ro, rd,
                          appearance_embedding=jnp.broadcast_to(
                              emb, (batch, cfg.appearance_dim)),
                          t=tt, n_importance=n_importance, perturb=False,
                          fused_composite=cfg.use_pallas,
                          background_color=((1.0, 1.0, 1.0)
                                            if cfg.white_background else None))
        return jnp.mean((out["rgb"] - tg) ** 2)

    def step(i, carry):
        emb, opt_state = carry
        g = jax.grad(loss_fn)(emb, jax.random.fold_in(key, i))
        updates, opt_state = opt.update(g, opt_state, emb)
        return optax.apply_updates(emb, updates), opt_state

    emb, _ = jax.lax.fori_loop(0, steps, step, (emb0, opt_state))
    return emb


def optimize_embedding(params, cfg: NeRFConfig, key, c2w, gt_image,
                       focal, n_importance: Optional[int] = None,
                       steps: int = 50, batch: int = 1024, lr: float = 0.05,
                       t=None):
    """Fit an appearance embedding on the left half of a held-out view."""
    from danerf_tpu.ops.rays import generate_rays

    h, w = gt_image.shape[:2]
    rays_o, rays_d = generate_rays(h, w, focal, jnp.asarray(c2w))
    half = w // 2
    rays_o = rays_o[:, :half].reshape(-1, 3)
    rays_d = rays_d[:, :half].reshape(-1, 3)
    target = jnp.asarray(gt_image[:, :half].reshape(-1, 3), jnp.float32)
    tt = None if t is None else jnp.asarray(t, jnp.float32)
    return _optimize_embedding_jit(params, cfg, key, rays_o, rays_d, target,
                                   steps, min(batch, rays_o.shape[0]),
                                   n_importance, lr, t=tt)


@partial(jax.jit, static_argnames=("half", "crop"))
def _score_view(pred, gt_u8, half: int, crop: bool, alpha_u8=None):
    """Score one view ON DEVICE: (mse, ssim) as jnp scalars.

    The eval loop fetches view i's scalars only after view i+1's render has
    been dispatched, so the ~2 s/view frame fetch over the 4 MB/s tunnel and
    the host-side SSIM both leave the critical path (the reference fetches
    every chunk synchronously, run.py:212-228).

    alpha_u8: when given, the GT is alpha-composited over white in f32
    (cfg.white_background; reference RGBA convention src/dataset.py:159-161)
    — matching how the training pool and the renderer composite."""
    tgt = gt_u8.astype(jnp.float32) / 255.0
    if alpha_u8 is not None:
        a = alpha_u8.astype(jnp.float32)[..., None] / 255.0
        tgt = tgt * a + (1.0 - a)
    if crop:
        pred, tgt = pred[:, half:], tgt[:, half:]  # leak-free right half
    # one packed fetch instead of two scalar round trips (the remote tunnel
    # charges per-transfer latency)
    return jnp.stack([jnp.mean((pred - tgt) ** 2), ssim_device(pred, tgt)])


def evaluate(params, cfg: NeRFConfig, dataset: RayDataset,
             appearance=None, max_views: Optional[int] = None,
             n_importance: Optional[int] = None, seed: int = 0,
             optimize_embeddings: bool = False, opt_steps: int = 50,
             opt_lr: float = 0.05) -> dict:
    """Render every view of ``dataset`` and compare to ground truth.

    appearance: (N_img, app_dim) embeddings, indexed per view when provided —
    the correct choice when evaluating the TRAINING split (the reference
    reuses embedding 0 for novel views, run.py:205).

    optimize_embeddings: NeRF-W held-out protocol — per view, freeze the model
    and fit a fresh embedding on the view's LEFT half, then score PSNR/SSIM on
    the RIGHT half only (leak-free).  Takes precedence over ``appearance``.

    Returns dict with per-view and mean psnr/ssim/mse (+ the scoring protocol).
    """
    key = jax.random.key(seed)
    n = dataset.n_images if max_views is None else min(max_views, dataset.n_images)
    gt = dataset.images.astype(np.float32) / 255.0
    half = dataset.width // 2
    half_crop = optimize_embeddings and cfg.use_appearance

    per_view = []

    def _collect(pending):
        i, scores_dev = pending
        mse, ssim_val = np.asarray(scores_dev)  # one packed fetch
        mse = float(mse)
        per_view.append({
            "view": i,
            "mse": mse,
            "psnr": float(-10.0 * np.log10(max(mse, 1e-12))),
            "ssim": float(ssim_val),
        })

    def _gt_dev(i):
        alpha_i = None
        if cfg.white_background and dataset.alphas is not None:
            alpha_i = jnp.asarray(dataset.alphas[i])
        return jnp.asarray(dataset.images[i]), alpha_i

    pending = None
    nxt_gt = _gt_dev(0) if n else None
    for i in range(n):
        t_i = None
        if getattr(dataset, "times", None) is not None:
            t_i = float(dataset.times[i])  # AnimatedNeRF: per-view time
        emb = None
        if cfg.use_appearance and optimize_embeddings:
            gt_fit = gt[i]
            if cfg.white_background and dataset.alphas is not None:
                a = dataset.alphas[i].astype(np.float32)[..., None] / 255.0
                gt_fit = gt_fit * a + (1.0 - a)
            emb = optimize_embedding(
                params, cfg, jax.random.fold_in(key, 10_000 + i),
                dataset.c2ws[i], gt_fit, dataset.focal,
                n_importance=n_importance, steps=opt_steps, lr=opt_lr, t=t_i)
        elif cfg.use_appearance and appearance is not None:
            emb = appearance[min(i, appearance.shape[0] - 1)]
        rgb, depth, _ = render_frame(
            params, cfg, jax.random.fold_in(key, i), dataset.c2ws[i],
            dataset.height, dataset.width, dataset.focal,
            appearance_embedding=emb, n_importance=n_importance, perturb=False,
            t=t_i)
        gt_i, alpha_i = nxt_gt
        scores = _score_view(rgb, gt_i, half, half_crop, alpha_u8=alpha_i)
        if i + 1 < n:
            nxt_gt = _gt_dev(i + 1)  # upload overlaps view i's compute
        if pending is not None:
            _collect(pending)  # fetch i-1 while view i renders
        pending = (i, scores)
    if pending is not None:
        _collect(pending)

    return {
        "per_view": per_view,
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
        "ssim": float(np.mean([v["ssim"] for v in per_view])),
        "mse": float(np.mean([v["mse"] for v in per_view])),
        "n_views": n,
        "protocol": ("left-half-optimized, right-half-scored"
                     if optimize_embeddings and cfg.use_appearance
                     else "full-image"),
    }
