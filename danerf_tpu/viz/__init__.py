from danerf_tpu.viz.paths import camera_path, aligned_spiral_path, alignment_matrix
from danerf_tpu.viz.video import create_video_from_images
from danerf_tpu.viz.depth import colorize_depth

__all__ = [
    "camera_path",
    "aligned_spiral_path",
    "alignment_matrix",
    "create_video_from_images",
    "colorize_depth",
]
