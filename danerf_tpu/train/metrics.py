"""Metrics and structured logging.

The reference logs loss/PSNR into Python lists and plots them once at the end
(/root/reference/src/train.py:51-52,102-104,189-204), with PSNR defined as
``-10 * log10(MSE)`` (src/train.py:100).  Here: the same observables as
structured JSONL rows (debug prints would break jit anyway — SURVEY.md §5.5),
plus SSIM for the eval harness.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np


def psnr(mse):
    """PSNR in dB from MSE (reference src/train.py:100)."""
    return -10.0 * jnp.log10(mse)


def _gaussian_win(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    i = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-(i ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def _filt_valid(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 2-D correlation with a 1-D kernel, 'valid' region only."""
    from numpy.lib.stride_tricks import sliding_window_view

    x = np.tensordot(sliding_window_view(x, k.size, axis=1), k, axes=([2], [0]))
    return np.tensordot(sliding_window_view(x, k.size, axis=0), k,
                        axes=([2], [0]))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5) -> float:
    """Standard SSIM (Wang et al. 2004): 11x11 Gaussian sliding window
    (sigma 1.5), population statistics, mean over the valid region, averaged
    over channels — the convention NeRF papers (and
    skimage.metrics.structural_similarity with gaussian_weights=True,
    use_sample_covariance=False) report, so numbers here are directly
    comparable to published tables.

    a, b: (H, W) or (H, W, C) in [0, data_range].
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    if min(a.shape[0], a.shape[1]) < win_size:  # tiny images: global window
        win_size = min(a.shape[0], a.shape[1])
        if win_size % 2 == 0:
            win_size -= 1
    k = _gaussian_win(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x = _filt_valid(x, k)
        mu_y = _filt_valid(y, k)
        var_x = _filt_valid(x * x, k) - mu_x ** 2
        var_y = _filt_valid(y * y, k) - mu_y ** 2
        cov = _filt_valid(x * y, k) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
            (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


def _filt_valid_jnp(x, k):
    """Separable valid-region correlation of (H, W) with a 1-D kernel, in
    jax.numpy (static shapes: the window slices unroll and XLA fuses them)."""
    w = k.size
    x = jnp.stack([x[:, j:x.shape[1] - w + 1 + j] for j in range(w)], -1) @ k
    x = jnp.stack([x[i:x.shape[0] - w + 1 + i, :] for i in range(w)], -1) @ k
    return x


def ssim_device(a, b, data_range: float = 1.0, win_size: int = 11,
                sigma: float = 1.5):
    """SSIM as a jittable on-device computation — same 11x11 Gaussian
    valid-window math as :func:`ssim` (cross-checked in tests/test_utils.py),
    in f32 jax.numpy.  The eval harness scores views with this so only
    SCALARS cross the host tunnel (~4 MB/s here; an 800x800 f32 frame is
    ~2 s of transfer per view otherwise).

    a, b: (H, W) or (H, W, C) jnp arrays in [0, data_range].
    Returns a jnp scalar.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    if min(a.shape[0], a.shape[1]) < win_size:  # tiny images: global window
        win_size = min(a.shape[0], a.shape[1])
        if win_size % 2 == 0:
            win_size -= 1
    k = jnp.asarray(_gaussian_win(win_size, sigma), jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x = _filt_valid_jnp(x, k)
        mu_y = _filt_valid_jnp(y, k)
        var_x = _filt_valid_jnp(x * x, k) - mu_x ** 2
        var_y = _filt_valid_jnp(y * y, k) - mu_y ** 2
        cov = _filt_valid_jnp(x * y, k) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
            (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
        vals.append(s.mean())
    return jnp.mean(jnp.stack(vals))


class MetricsLogger:
    """Append-only JSONL scalar logger with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = None
        self.history: list[dict] = []
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, **scalars):
        row = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in scalars.items()})
        self.history.append(row)
        if self._f is not None:
            self._f.write(json.dumps(row) + "\n")

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None
