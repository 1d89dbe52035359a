"""Evaluation harness: render held-out views and score PSNR/SSIM.

The reference's only evaluation is a 1000-ray validation strip rendered every
1000 steps and judged by eye (/root/reference/src/train.py:127-173).  This
harness renders full held-out views against ground truth and reports the
PSNR / SSIM numbers that the 0.1 dB parity bar is measured with
(BASELINE.json:5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data.dataset import RayDataset
from danerf_tpu.render.renderer import render_frame
from danerf_tpu.train.metrics import ssim


def evaluate(params, cfg: NeRFConfig, dataset: RayDataset,
             appearance=None, max_views: Optional[int] = None,
             n_importance: Optional[int] = None, seed: int = 0) -> dict:
    """Render every view of ``dataset`` and compare to ground truth.

    appearance: (N_img, app_dim) embeddings, indexed per view when provided
    (the reference reuses embedding 0 for novel views, run.py:205; for eval on
    *training* views the per-view embedding is the correct one).

    Returns dict with per-view and mean psnr/ssim/mse.
    """
    key = jax.random.key(seed)
    n = dataset.n_images if max_views is None else min(max_views, dataset.n_images)
    gt = dataset.images.astype(np.float32) / 255.0

    per_view = []
    for i in range(n):
        emb = None
        if cfg.use_appearance and appearance is not None:
            emb = appearance[min(i, appearance.shape[0] - 1)]
        rgb, depth, _ = render_frame(
            params, cfg, jax.random.fold_in(key, i), dataset.c2ws[i],
            dataset.height, dataset.width, dataset.focal,
            appearance_embedding=emb, n_importance=n_importance, perturb=False)
        pred = np.asarray(rgb)
        mse = float(np.mean((pred - gt[i]) ** 2))
        per_view.append({
            "view": i,
            "mse": mse,
            "psnr": float(-10.0 * np.log10(max(mse, 1e-12))),
            "ssim": ssim(pred, gt[i]),
        })

    return {
        "per_view": per_view,
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
        "ssim": float(np.mean([v["ssim"] for v in per_view])),
        "mse": float(np.mean([v["mse"] for v in per_view])),
        "n_views": n,
    }
