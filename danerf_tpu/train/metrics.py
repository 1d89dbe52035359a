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


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Global-window SSIM between two images (H, W, C) in [0, data_range].

    A single-window SSIM (no 11x11 sliding Gaussian) is enough for eval
    tracking; the constant choices follow Wang et al. 2004.
    """
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    var_a, var_b = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                 / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)))


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
