"""Device-resident ray pool.

The reference re-decodes a PNG with PIL on EVERY training step and builds a
full 800x800 ray grid just to gather 1024 pixels from it
(/root/reference/src/dataset.py:156, 248-277) — a known CPU bottleneck called
out in SURVEY.md §3.1.  The TPU-native design decodes every image exactly once
into a uint8 pool that lives in HBM (100 * 800*800 * 4 bytes ≈ 256 MB), and the
per-step batch is an on-device gather driven by the PRNG key inside the jitted
train step: zero host->device traffic in steady state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from danerf_tpu.config import NeRFConfig


@dataclasses.dataclass
class RayDataset:
    """Immutable scene data.

    images: (N, H, W, 3) uint8; alphas: (N, H, W) uint8;
    c2ws: (N, 4, 4) float32; focal: float; near/far: float.
    times: optional (N,) float32 in [0, 1] — per-image capture time for the
    AnimatedNeRF variant (cfg.use_time; the reference declares the model at
    src/models.py:165-265 but ships no dataset or flag that feeds it).
    Device placement happens lazily via ``device_arrays``.
    """

    images: np.ndarray
    alphas: np.ndarray
    c2ws: np.ndarray
    focal: float
    near: float
    far: float
    split: str = "train"
    times: Optional[np.ndarray] = None

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    @property
    def height(self) -> int:
        return self.images.shape[1]

    @property
    def width(self) -> int:
        return self.images.shape[2]

    def __len__(self) -> int:
        return self.n_images

    def device_arrays(self, white_background: bool = False, sharding=None):
        """Upload the pool to device(s) once.

        Returns dict of images (N*H*W, 3) f32 in [0,1] (alpha-composited over
        white when requested), c2ws (N,4,4) f32.  With ``sharding``, the pool
        is replicated/sharded per the given jax.sharding spec.

        The pixel pool is stored PRE-FLATTENED: the per-step batch draw is a
        single-axis row ``jnp.take``, and the flattening must happen outside
        the jitted step — reshaping (N,H,W,3)->(N*H*W,3) inside the step makes
        XLA fold the reshape back into a multi-dim gather, which lowers ~25x
        slower on TPU (measured 4.7 vs 0.18 ms for a 1024-row draw on v5e).
        """
        imgs = self.images.astype(np.float32) / 255.0
        if white_background:
            a = self.alphas.astype(np.float32)[..., None] / 255.0
            imgs = imgs * a + (1.0 - a)
        arrs = {
            "images": jnp.asarray(imgs.reshape(-1, 3)),
            "c2ws": jnp.asarray(self.c2ws),
        }
        if self.times is not None:
            arrs["times"] = jnp.asarray(self.times, jnp.float32)
        if sharding is not None:
            arrs = {k: jax.device_put(v, sharding) for k, v in arrs.items()}
        return arrs


def sample_ray_batch(key, pool, cfg: NeRFConfig, height: int, width: int, focal,
                     batch_size: Optional[int] = None, single_image: bool = True):
    """Draw a training batch of rays fully on device.

    Args:
        key: PRNG key.
        pool: dict from :meth:`RayDataset.device_arrays`.
        cfg: static config.
        height, width, focal: camera intrinsics (static / scalar).
        batch_size: static override (warmup batches, reference src/train.py:26).
        single_image: reference-compatible sampling — all rays of a batch come
            from ONE random image (src/dataset.py:250).  False samples
            (image, pixel) pairs independently, which decorrelates batches.

    Returns:
        dict rays_o, rays_d (B,3); rgb (B,3); img_idx (B,) int32 (the
        appearance index, reference src/dataset.py:166-168); plus t (B,1)
        when the pool carries per-image times (cfg.use_time).
    """
    from danerf_tpu.ops.rays import rays_for_pixels

    if batch_size is None:
        batch_size = cfg.batch_size
    n_images = pool["c2ws"].shape[0]
    k_img, k_pix = jax.random.split(key)

    if single_image:
        img_idx = jnp.broadcast_to(
            jax.random.randint(k_img, (), 0, n_images), (batch_size,))
    else:
        img_idx = jax.random.randint(k_img, (batch_size,), 0, n_images)

    # With-replacement pixel draw: at 1024 of 640k pixels the collision
    # probability is <0.1%, statistically equivalent to the reference's
    # replace=False draw (src/dataset.py:260) and jit-friendly.
    pix_idx = jax.random.randint(k_pix, (batch_size,), 0, height * width)

    c2w = pool["c2ws"][img_idx]
    rays_o, rays_d = rays_for_pixels(pix_idx, c2w, height, width, focal)
    # Single-axis row gather from the pre-flattened pool (see device_arrays):
    # the (N*H*W, 3) take is the fast TPU gather path; reshaping here instead
    # would be folded into a ~25x slower multi-dim gather.
    rgb = jnp.take(pool["images"], img_idx * (height * width) + pix_idx, axis=0)
    batch = {"rays_o": rays_o, "rays_d": rays_d, "rgb": rgb, "img_idx": img_idx}
    if "times" in pool:
        batch["t"] = pool["times"][img_idx][:, None]
    return batch


def load_dataset(cfg: NeRFConfig, split: str = "train") -> RayDataset:
    """Load a scene: real nerf_synthetic layout when present, otherwise the
    procedural scene generator (the reference repo ships no image data either —
    /root/reference/data/nerf_synthetic contains only a README)."""
    import os

    from danerf_tpu.data.blender import load_blender_scene
    from danerf_tpu.data.custom import load_custom_scene
    from danerf_tpu.data.synthetic import make_synthetic_scene

    scene_dir = os.path.join(cfg.dataset_path, cfg.scene)
    if cfg.dataset_type != "nerf_synthetic":
        return load_custom_scene(cfg.dataset_path, split=split,
                                 near=cfg.near, far=cfg.far)
    if os.path.exists(os.path.join(scene_dir, f"transforms_{split}.json")):
        return load_blender_scene(scene_dir, split=split, near=cfg.near, far=cfg.far)
    if cfg.use_time:
        # AnimatedNeRF needs per-image times; the procedural time-varying
        # scene supplies them (no Blender scene carries a time channel)
        from danerf_tpu.data.synthetic import make_time_varying_scene

        return make_time_varying_scene(split=split, near=cfg.near,
                                       far=cfg.far, seed=0)
    return make_synthetic_scene(split=split, near=cfg.near, far=cfg.far, seed=0)
