"""Batch effects driver: apply effects across a directory of rendered frames.

Replaces apply_all_shaders.py in the reference (/root/reference/apply_all_shaders.py:17-194):
frame/depth discovery by the ``frame_NNNN.png`` / ``depth_NNNN.png`` pairing
(:11-15), per-effect output directories, skip-if-exists videos (:101-103), and
the Fog-only-on-depth-frames rule (:114-117).  The per-frame work is the jitted
on-device pipeline from danerf_tpu.fx.effects rather than a serial CPU loop.
"""

from __future__ import annotations

import os
import re
from typing import Iterable, Optional

import numpy as np

from danerf_tpu.fx.effects import EFFECTS, apply_effect


def find_frames_with_depth(input_dir: str):
    """Frame numbers that have a matching depth map (apply_all_shaders.py:11-15)."""
    nums = []
    for f in os.listdir(input_dir):
        m = re.fullmatch(r"depth_(\d+)\.png", f)
        if m:
            nums.append(m.group(1))
    return sorted(nums)


def _load_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img)


def apply_effect_to_frames(input_dir: str, output_dir: str, effect: str,
                           params: Optional[dict] = None,
                           make_video: bool = True, fps: int = 60,
                           skip_existing: bool = True) -> list[str]:
    """Apply one effect to every frame in ``input_dir``; returns output paths."""
    from PIL import Image

    if effect not in EFFECTS:
        raise KeyError(f"unknown effect {effect!r}")
    os.makedirs(output_dir, exist_ok=True)

    frames = sorted(f for f in os.listdir(input_dir)
                    if re.fullmatch(r"frame_\d+\.png", f))
    depth_nums = set(find_frames_with_depth(input_dir))
    if effect == "Fog":  # fog needs depth (apply_all_shaders.py:114-117)
        frames = [f for f in frames
                  if re.fullmatch(r"frame_(\d+)\.png", f).group(1) in depth_nums]

    written = []
    for f in frames:
        out_path = os.path.join(output_dir, f)
        if skip_existing and os.path.exists(out_path):
            written.append(out_path)
            continue
        rgb = _load_png(os.path.join(input_dir, f))[..., :3]
        num = re.fullmatch(r"frame_(\d+)\.png", f).group(1)
        depth = None
        if num in depth_nums:
            depth = _load_png(os.path.join(input_dir, f"depth_{num}.png")).astype(np.float32)
            if depth.ndim == 3:
                depth = depth[..., 0]
            depth = depth / 255.0
        out = np.asarray(apply_effect(effect, rgb, depth, params))
        Image.fromarray(out).save(out_path)
        written.append(out_path)

    if make_video and written:
        from danerf_tpu.viz.video import create_video_from_images

        video = os.path.join(os.path.dirname(output_dir.rstrip("/")) or ".",
                             f"{effect.lower().replace(' ', '_')}.mp4")
        if not (skip_existing and os.path.exists(video)):
            create_video_from_images(output_dir, video, pattern="frame_*.png", fps=fps)
    return written


def apply_all_effects(input_dir: str, output_base_dir: str,
                      effects: Optional[Iterable[str]] = None,
                      fog_only: bool = False, skip: Iterable[str] = (),
                      fps: int = 60):
    """Apply every effect, one output dir + video per effect
    (apply_all_shaders.py:92-143)."""
    names = list(effects) if effects is not None else list(EFFECTS)
    if fog_only:
        names = ["Fog"]
    names = [n for n in names if n not in set(skip)]
    os.makedirs(output_base_dir, exist_ok=True)
    for name in names:
        out_dir = os.path.join(output_base_dir, name.lower().replace(" ", "_"))
        apply_effect_to_frames(input_dir, out_dir, name, fps=fps)
    return names
