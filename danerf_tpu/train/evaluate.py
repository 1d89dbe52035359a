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
from danerf_tpu.train.metrics import ssim


@partial(jax.jit, static_argnames=("cfg", "steps", "batch", "n_importance"))
def _optimize_embedding_jit(params, cfg: NeRFConfig, key, rays_o, rays_d,
                            target, steps: int, batch: int,
                            n_importance: Optional[int], lr: float):
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
        out = render_rays(params, cfg, jax.random.fold_in(k, 2), ro, rd,
                          appearance_embedding=jnp.broadcast_to(
                              emb, (batch, cfg.appearance_dim)),
                          n_importance=n_importance, perturb=False,
                          fused_composite=cfg.use_pallas)
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
                       steps: int = 50, batch: int = 1024, lr: float = 0.05):
    """Fit an appearance embedding on the left half of a held-out view."""
    from danerf_tpu.ops.rays import generate_rays

    h, w = gt_image.shape[:2]
    rays_o, rays_d = generate_rays(h, w, focal, jnp.asarray(c2w))
    half = w // 2
    rays_o = rays_o[:, :half].reshape(-1, 3)
    rays_d = rays_d[:, :half].reshape(-1, 3)
    target = jnp.asarray(gt_image[:, :half].reshape(-1, 3), jnp.float32)
    return _optimize_embedding_jit(params, cfg, key, rays_o, rays_d, target,
                                   steps, min(batch, rays_o.shape[0]),
                                   n_importance, lr)


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

    per_view = []
    for i in range(n):
        emb = None
        if cfg.use_appearance and optimize_embeddings:
            emb = optimize_embedding(
                params, cfg, jax.random.fold_in(key, 10_000 + i),
                dataset.c2ws[i], gt[i], dataset.focal,
                n_importance=n_importance, steps=opt_steps, lr=opt_lr)
        elif cfg.use_appearance and appearance is not None:
            emb = appearance[min(i, appearance.shape[0] - 1)]
        rgb, depth, _ = render_frame(
            params, cfg, jax.random.fold_in(key, i), dataset.c2ws[i],
            dataset.height, dataset.width, dataset.focal,
            appearance_embedding=emb, n_importance=n_importance, perturb=False)
        pred = np.asarray(rgb)
        tgt = gt[i]
        if optimize_embeddings and cfg.use_appearance:
            pred, tgt = pred[:, half:], tgt[:, half:]  # leak-free right half
        mse = float(np.mean((pred - tgt) ** 2))
        per_view.append({
            "view": i,
            "mse": mse,
            "psnr": float(-10.0 * np.log10(max(mse, 1e-12))),
            "ssim": ssim(pred, tgt),
        })

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
