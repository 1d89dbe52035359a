"""Video encoding from image sequences.

Mirrors /root/reference/create_video.py:8-76: glob pattern -> OpenCV
VideoWriter with codec selected by extension (mp4v for .mp4/.mov/.mkv, XVID
for .avi), optional resize, fps control.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple


def create_video_from_images(image_dir: str, output_path: str,
                             pattern: str = "rgb_*.png", fps: int = 30,
                             resolution: Optional[Tuple[int, int]] = None) -> bool:
    import cv2

    images = sorted(glob.glob(os.path.join(image_dir, pattern)))
    if not images:
        return False

    first = cv2.imread(images[0])
    if first is None:
        return False
    if resolution:
        width, height = resolution
    else:
        height, width = first.shape[:2]

    root, ext = os.path.splitext(output_path)
    ext = ext.lower()
    if ext not in (".mp4", ".avi", ".mov", ".mkv"):
        ext = ".mp4"
        output_path = root + ext
    fourcc = cv2.VideoWriter_fourcc(*("XVID" if ext == ".avi" else "mp4v"))

    out_dir = os.path.dirname(output_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    video = cv2.VideoWriter(output_path, fourcc, fps, (width, height))
    try:
        for path in images:
            img = cv2.imread(path)
            if img is None:
                continue
            if resolution:
                img = cv2.resize(img, resolution)
            video.write(img)
    finally:
        video.release()
    return True
