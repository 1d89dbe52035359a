"""Depth-map visualization.

The reference writes viridis-colormapped depth PNGs via matplotlib
(/root/reference/run.py:271-275) and raw min-max-normalized grayscale PNGs
(/root/reference/render_aligned_spiral.py:169-175).  Both are provided as
array-in/array-out helpers with no figure machinery.
"""

from __future__ import annotations

import numpy as np


def normalize_depth(depth: np.ndarray) -> np.ndarray:
    """(d - min) / (max - min + eps): the normalization fed to the shader path
    (run.py:249) and the grayscale depth PNGs (render_aligned_spiral.py:171)."""
    d = np.asarray(depth, np.float32)
    return (d - d.min()) / (d.max() - d.min() + 1e-6)


def colorize_depth(depth: np.ndarray, cmap: str = "viridis") -> np.ndarray:
    """uint8 (H, W, 3) colormapped depth."""
    import matplotlib

    norm = normalize_depth(depth)
    rgba = matplotlib.colormaps[cmap](norm)
    return (rgba[..., :3] * 255).astype(np.uint8)


def depth_to_gray_u8(depth: np.ndarray) -> np.ndarray:
    return (normalize_depth(depth) * 255).astype(np.uint8)
