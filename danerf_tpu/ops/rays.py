"""Ray generation for a pinhole camera.

Camera convention matches the reference (/root/reference/src/ray_utils.py:4-50):
pixel (i=row, j=col) maps to camera-space direction
``((j - W/2)/f, -(i - H/2)/f, -1)`` (x right, y up, camera looks down -z),
rotated to world space by the upper-left 3x3 of the camera-to-world matrix and
normalized; origins broadcast from the c2w translation column.

Two entry points:
- ``generate_rays``      full (H, W) grid, for frame rendering.
- ``rays_for_pixels``    rays for a flat batch of pixel indices into specific
                         images, for training.  This replaces the reference's
                         per-step full-image ray grid + host-side pixel gather
                         (src/dataset.py:248-277) with an on-device gather that
                         only computes the rays that are actually used.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _camera_dirs(i: jnp.ndarray, j: jnp.ndarray, height: int, width: int, focal) -> jnp.ndarray:
    """Camera-space unnormalized directions for pixel rows ``i``, cols ``j``."""
    x = (j - width * 0.5) / focal
    y = -(i - height * 0.5) / focal
    z = -jnp.ones_like(x)
    return jnp.stack([x, y, z], axis=-1)


def _rotate(dirs: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    """Rotate camera-space dirs to world by R = c2w[:3,:3] (ray_utils.py:40-42)."""
    rot = c2w[..., :3, :3]
    return jnp.sum(dirs[..., None, :] * rot, axis=-1)


def generate_rays(height: int, width: int, focal, c2w: jnp.ndarray):
    """Rays for every pixel of an image.

    Args:
        height, width: static ints.
        focal: scalar focal length in pixels.
        c2w: (3, 4) or (4, 4) camera-to-world matrix.

    Returns:
        origins, directions: each (height, width, 3); directions unit-norm.
    """
    i, j = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = _camera_dirs(i, j, height, width, focal)
    dirs = _rotate(dirs, c2w)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[..., :3, 3], dirs.shape)
    return origins, dirs


def rays_for_pixels(pixel_idx: jnp.ndarray, c2w: jnp.ndarray, height: int, width: int, focal):
    """Rays for a batch of flat pixel indices under per-ray camera matrices.

    Args:
        pixel_idx: (B,) int32 flat indices into the H*W pixel grid (row-major).
        c2w: (B, 3, 4)/(B, 4, 4) per-ray c2w, or a single (3, 4)/(4, 4).
        height, width: static ints; focal: scalar.

    Returns:
        origins, directions: (B, 3); directions unit-norm.
    """
    i = (pixel_idx // width).astype(jnp.float32)
    j = (pixel_idx % width).astype(jnp.float32)
    dirs = _camera_dirs(i, j, height, width, focal)  # (B, 3)
    if c2w.ndim == 2:
        c2w = jnp.broadcast_to(c2w, (dirs.shape[0],) + c2w.shape)
    dirs = jnp.sum(dirs[..., None, :] * c2w[..., :3, :3], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[..., :3, 3], dirs.shape)
    return origins, dirs


def look_at_c2w(cam_pos: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Build a 4x4 c2w from camera position, look-at center, and up vector.

    Column layout [right | up | -forward | position] matches the reference
    (run.py:182-195).  Degenerate-basis guards follow
    render_aligned_spiral.py:97-116.  Host-side numpy: camera paths are tiny
    per-frame scalars, not device work.
    """
    cam_pos = np.asarray(cam_pos, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)

    forward = center - cam_pos
    n = np.linalg.norm(forward)
    forward = np.array([0.0, 0.0, -1.0]) if n < 1e-10 else forward / n

    right = np.cross(forward, up)
    n = np.linalg.norm(right)
    right = np.array([1.0, 0.0, 0.0]) if n < 1e-10 else right / n

    camera_up = np.cross(right, forward)
    n = np.linalg.norm(camera_up)
    camera_up = up if n < 1e-10 else camera_up / n

    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = camera_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = cam_pos
    return c2w.astype(np.float32)
