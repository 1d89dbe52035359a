"""Blender nerf_synthetic loader.

Parses the transforms_{split}.json layout documented in
/root/reference/data/nerf_synthetic/README.txt and consumed by the reference
dataset (/root/reference/src/dataset.py:29-83): per-frame ``file_path`` +
``transform_matrix``, focal from ``camera_angle_x`` via
``0.5 * W / tan(0.5 * angle)`` (src/dataset.py:65-71), RGBA images with the
alpha split off (src/dataset.py:159-161).

Unlike the reference this decodes every image exactly once at load time into
the ray pool (see danerf_tpu.data.dataset).
"""

from __future__ import annotations

import json
import os

import numpy as np

from danerf_tpu.data.dataset import RayDataset


def load_blender_scene(scene_dir: str, split: str = "train",
                       near: float = 2.0, far: float = 6.0,
                       downscale: int = 1) -> RayDataset:
    """Load one scene split.

    Args:
        scene_dir: directory containing transforms_{split}.json and images.
        split: 'train' | 'val' | 'test'.
        near, far: scene bounds (config-level in the reference, config.py:28-29).
        downscale: integer factor to shrink images (focal scales with width).
    """
    from PIL import Image

    with open(os.path.join(scene_dir, f"transforms_{split}.json")) as f:
        meta = json.load(f)

    frames = meta["frames"]
    images, alphas, c2ws = [], [], []
    for frame in frames:
        fp = frame["file_path"]
        if fp.startswith("./"):
            fp = fp[2:]
        img_path = os.path.join(scene_dir, fp + ".png")
        with Image.open(img_path) as img:
            if downscale > 1:
                img = img.resize((img.width // downscale, img.height // downscale),
                                 Image.LANCZOS)
            arr = np.asarray(img)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        if arr.shape[-1] == 4:
            images.append(arr[..., :3])
            alphas.append(arr[..., 3])
        else:
            images.append(arr[..., :3])
            alphas.append(np.full(arr.shape[:2], 255, np.uint8))
        c2ws.append(np.asarray(frame["transform_matrix"], np.float32))

    images = np.stack(images)
    alphas = np.stack(alphas)
    c2ws = np.stack(c2ws)

    H, W = images.shape[1:3]
    if "camera_angle_x" in meta:
        focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
    elif "fl_x" in meta:
        focal = float(meta["fl_x"]) / downscale
    else:
        focal = W / (2 * np.tan(np.radians(55) / 2))

    return RayDataset(images=images, alphas=alphas, c2ws=c2ws,
                      focal=float(focal), near=near, far=far, split=split)


def save_blender_scene(dataset: RayDataset, out_dir: str,
                       split: str | None = None) -> str:
    """Write a RayDataset to disk in the nerf_synthetic layout.

    Produces transforms_{split}.json + RGBA PNGs exactly as the reference
    loader consumes them (/root/reference/src/dataset.py:35-41, 159-161), so a
    procedurally generated scene can round-trip through ``load_blender_scene``
    — used by the parity harness (examples/parity_chair.py) to exercise the
    real file-loading path when the real nerf_synthetic data is absent.
    """
    from PIL import Image

    split = split or dataset.split
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)

    camera_angle_x = 2.0 * np.arctan(0.5 * dataset.width / dataset.focal)
    frames = []
    for i in range(dataset.n_images):
        rgba = np.concatenate(
            [dataset.images[i], dataset.alphas[i][..., None]], axis=-1)
        name = f"r_{i}"
        Image.fromarray(rgba, "RGBA").save(
            os.path.join(img_dir, name + ".png"))
        frames.append({
            "file_path": f"./{split}/{name}",
            "transform_matrix": np.asarray(
                dataset.c2ws[i], np.float64).tolist(),
        })

    meta = {"camera_angle_x": float(camera_angle_x), "frames": frames}
    path = os.path.join(out_dir, f"transforms_{split}.json")
    with open(path, "w") as f:
        json.dump(meta, f)
    return path
