"""Novel-view frame rendering drivers.

TPU-native equivalents of the reference's render_path (/root/reference/run.py:63-282)
and render_aligned_spiral (/root/reference/render_aligned_spiral.py:15-208):
quality presets, the four camera paths + aligned spiral, rgb/depth PNG output
with the reference's file naming (rgb_NNN.png / frame_NNNN.png / depth_*), the
optional per-frame depth-aware effect — applied as a jitted on-device op while
the depth buffer is still on device — and video assembly.

Both drivers DOUBLE-BUFFER host I/O against device compute: frame k+1's
render is dispatched before frame k's buffers are fetched, and the fetch +
PNG encode run on a worker thread — the chip never idles on the ~4 MB/s
host tunnel or on PIL (the reference's chunk loop blocks on both,
run.py:212-228).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import numpy as np

from danerf_tpu.config import RENDER_PRESETS, NeRFConfig
from danerf_tpu.render.renderer import render_frame
from danerf_tpu.viz.depth import colorize_depth, depth_to_gray_u8
from danerf_tpu.viz.paths import aligned_spiral_path, camera_path


def _save_png(arr: np.ndarray, path: str):
    from PIL import Image

    Image.fromarray(arr).save(path)


def render_path(params, cfg: NeRFConfig, output_dir: str,
                appearance_embedding=None, num_frames: int = 120,
                quality: str = "high", width: int = 800, height: int = 800,
                start_frame: int = 0, end_frame: Optional[int] = None,
                camera_path_kind: str = "circle", spiral_loops: float = 2.0,
                height_range=(-0.5, 0.5), effect: Optional[str] = None,
                effect_params: Optional[dict] = None, save_depth: bool = False,
                raw_output: bool = False, make_video: bool = False,
                fps: int = 30, dataset_width: Optional[int] = None,
                focal: Optional[float] = None, seed: int = 0,
                frame_name: str = "rgb_{:03d}.png",
                chunk: Optional[int] = None, mesh=None,
                time: Optional[float] = None,
                animate_time: bool = False) -> list[str]:
    """Render frames along a parametric path (reference run.py:63-282).

    focal: dataset focal at dataset_width; rescaled for the output width like
    run.py:199-200.  With ``mesh`` each frame's rays shard over its 'data'
    axis; under a multi-process runtime the FRAMES are additionally
    partitioned per host (disjoint host-side work, parallel/mesh.py
    process_slice).  ``time``/``animate_time`` drive the AnimatedNeRF
    variant (cfg.use_time): a fixed frame time, or t sweeping 0..1 over the
    path.  Returns written rgb paths.
    """
    os.makedirs(output_dir, exist_ok=True)

    preset = RENDER_PRESETS[quality]
    n_samples = max(int(cfg.num_samples * preset["samples_scale"]), 1)
    n_importance = cfg.num_importance if preset["importance"] else 0
    perturb = preset["perturb"]
    if chunk is None:
        chunk = preset["chunk"]  # quality->chunk mapping, reference run.py:89-100

    if focal is None:
        focal = 0.5 * width / np.tan(0.5 * 0.6911)
    elif dataset_width is not None:
        focal = focal * (width / dataset_width)

    c2ws = camera_path(camera_path_kind, num_frames, cfg.scene,
                       spiral_loops, height_range)
    if end_frame is None:
        end_frame = num_frames

    frame_ids = list(range(len(c2ws)))
    if jax.process_count() > 1 and mesh is None:
        # multi-host without a global mesh: each host renders a disjoint
        # slice of the path (with a global mesh all hosts must execute every
        # frame's sharded program together)
        from danerf_tpu.parallel.mesh import process_slice

        frame_ids = frame_ids[process_slice(len(frame_ids))]

    if raw_output or save_depth:
        raw_dir = os.path.join(output_dir, "raw")
        os.makedirs(raw_dir, exist_ok=True)

    def _write_frame(frame_idx, rgb_dev, depth_dev):
        """Worker-thread side: fetch device buffers + encode PNGs.  Runs
        while the NEXT frame computes on the chip."""
        rgb_u8 = np.asarray(rgb_dev)
        depth_np = np.asarray(depth_dev)
        if raw_output:
            _save_png(rgb_u8, os.path.join(raw_dir, f"rgb_{frame_idx:03d}.png"))
        if save_depth:
            np.save(os.path.join(raw_dir, f"depth_{frame_idx:03d}.npy"), depth_np)
        out_path = os.path.join(output_dir, frame_name.format(frame_idx))
        _save_png(rgb_u8, out_path)
        _save_png(colorize_depth(depth_np),
                  os.path.join(output_dir, f"depth_{frame_idx:03d}.png"))
        return out_path

    import jax.numpy as jnp

    key = jax.random.key(seed)
    futures = []
    with ThreadPoolExecutor(max_workers=2) as io_pool:
        for i in frame_ids:
            c2w = c2ws[i]
            frame_idx = start_frame + i
            if frame_idx >= end_frame:
                continue
            t_frame = time
            if animate_time:
                t_frame = i / max(num_frames - 1, 1)
            rgb, depth, _ = render_frame(
                params, cfg, jax.random.fold_in(key, i), c2w, height, width,
                focal, appearance_embedding=appearance_embedding,
                n_samples=n_samples, n_importance=n_importance,
                perturb=perturb, chunk=chunk, mesh=mesh, t=t_frame)

            # quantize on device; the effect below also runs on device so the
            # rgb/depth buffers never round-trip the host in between
            rgb_dev = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)

            if effect is not None and not raw_output:
                from danerf_tpu.fx import apply_effect

                dmin, dmax = depth.min(), depth.max()
                depth_norm = (depth - dmin) / (dmax - dmin + 1e-6)  # run.py:249
                rgb_dev = apply_effect(effect, rgb_dev, depth_norm,
                                       effect_params,
                                       key=jax.random.fold_in(key, 10_000 + i))

            # hand the DEVICE buffers to the I/O worker: the fetch itself
            # overlaps the next frame's compute (frame k+1 is dispatched
            # before frame k's transfer starts)
            futures.append(io_pool.submit(_write_frame, frame_idx,
                                          rgb_dev, depth))
            if len(futures) >= 3:
                futures[-3].result()  # bound in-flight frames (HBM + queue)
        written = [f.result() for f in futures]

    if make_video and written:
        from danerf_tpu.viz.video import create_video_from_images

        create_video_from_images(
            output_dir, os.path.join(output_dir, f"{cfg.scene}_render.mp4"),
            pattern=frame_name.replace("{:03d}", "*"), fps=fps)
    return written


def render_aligned_spiral(params, cfg: NeRFConfig, output_dir: str,
                          appearance_embedding=None, num_frames: int = 120,
                          fps: int = 60, loops: float = 2.0,
                          rotation_axis: str = "x", height: int = 800,
                          width: int = 800, focal: Optional[float] = None,
                          make_video: bool = True, seed: int = 0,
                          mesh=None) -> list[str]:
    """Aligned spiral render (reference render_aligned_spiral.py:15-208):
    frame_NNNN.png naming, grayscale depth every 10th frame, chunked render
    without perturbation, inline video."""
    os.makedirs(output_dir, exist_ok=True)
    if focal is None:
        focal = 0.5 * width / np.tan(0.5 * 0.6911)

    c2ws = aligned_spiral_path(num_frames, loops, rotation_axis, cfg.scene)
    key = jax.random.key(seed)

    import jax.numpy as jnp

    def _write_frame(i, rgb_dev, depth_dev):
        """Worker-thread fetch + PNG encode, overlapped with the next
        frame's device compute (double buffering)."""
        path = os.path.join(output_dir, f"frame_{i:04d}.png")
        _save_png(np.asarray(rgb_dev), path)
        if depth_dev is not None:
            _save_png(depth_to_gray_u8(np.asarray(depth_dev)),
                      os.path.join(output_dir, f"depth_{i:04d}.png"))
        return path

    futures = []
    with ThreadPoolExecutor(max_workers=2) as io_pool:
        for i, c2w in enumerate(c2ws):
            rgb, depth, _ = render_frame(
                params, cfg, jax.random.fold_in(key, i), c2w, height, width,
                focal, appearance_embedding=appearance_embedding,
                perturb=False, mesh=mesh)
            rgb_u8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
            # depth every 10 frames (render_aligned_spiral.py:169)
            futures.append(io_pool.submit(
                _write_frame, i, rgb_u8, depth if i % 10 == 0 else None))
            if len(futures) >= 3:
                futures[-3].result()  # bound in-flight frames
        written = [f.result() for f in futures]

    if make_video:
        from danerf_tpu.viz.video import create_video_from_images

        create_video_from_images(output_dir,
                                 os.path.join(output_dir, f"{cfg.scene}_spiral.mp4"),
                                 pattern="frame_*.png", fps=fps)
    return written
