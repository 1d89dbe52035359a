"""Custom-dataset loader.

The reference's second dataset branch (/root/reference/src/dataset.py:85-124):
a single ``transforms.json`` one directory above ``dataset_path`` with
``w``/``h``/``camera_angle_x``/``fl_x`` metadata; the train split is all
frames but the last, the val split is the last frame; images are plain RGB.
"""

from __future__ import annotations

import json
import os

import numpy as np

from danerf_tpu.data.dataset import RayDataset


def load_custom_scene(dataset_path: str, split: str = "train",
                      near: float = 2.0, far: float = 6.0) -> RayDataset:
    from PIL import Image

    meta_path = os.path.join(dataset_path, "..", "transforms.json")
    if not os.path.exists(meta_path):
        meta_path = os.path.join(dataset_path, "transforms.json")
    with open(meta_path) as f:
        meta = json.load(f)

    frames = meta["frames"]
    # train = all but last, val/test = last (src/dataset.py:92-95)
    frames = frames[:-1] if split == "train" else frames[-1:]

    images, alphas, c2ws = [], [], []
    for frame in frames:
        img_path = os.path.join(dataset_path, frame["file_path"])
        with Image.open(img_path) as img:
            arr = np.asarray(img.convert("RGB"))
        images.append(arr)
        alphas.append(np.full(arr.shape[:2], 255, np.uint8))
        c2ws.append(np.asarray(frame["transform_matrix"], np.float32))

    images = np.stack(images)
    alphas = np.stack(alphas)
    c2ws = np.stack(c2ws)

    W = int(meta.get("w", images.shape[2]))
    if "camera_angle_x" in meta:
        focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
    elif "fl_x" in meta:
        focal = float(meta["fl_x"])
    else:
        focal = W / (2 * np.tan(np.radians(55) / 2))

    return RayDataset(images=images, alphas=alphas, c2ws=c2ws,
                      focal=float(focal), near=near, far=far, split=split)
