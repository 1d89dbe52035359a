"""End-to-end demo on the procedural scene: train -> eval PSNR -> spiral
render -> depth-aware effects -> video.

Run: python examples/demo_synthetic.py [--iters 3000] [--out demo_out]
Produces demo_out/{checkpoints,frames,fog_frames,spiral.mp4,report.json}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--out", type=str, default="demo_out")
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--pallas", action="store_true",
                    help="force the Pallas kernels (default: auto on TPU)")
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()
    use_pallas = (args.pallas or jax.default_backend() == "tpu") \
        and not args.no_pallas

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.fx import apply_effect
    from danerf_tpu.render.frames import render_aligned_spiral
    from danerf_tpu.train import train
    from danerf_tpu.train.evaluate import evaluate
    from danerf_tpu.viz.depth import normalize_depth
    from danerf_tpu.viz.video import create_video_from_images

    os.makedirs(args.out, exist_ok=True)
    cfg = NeRFConfig(num_importance=0, use_bf16=True, use_pallas=use_pallas,
                     render_chunk=args.size * args.size)
    print(f"devices: {jax.devices()}")

    scene = make_synthetic_scene("train", n_images=20, height=args.size,
                                 width=args.size)
    val = make_synthetic_scene("val", n_images=4, height=args.size,
                               width=args.size)

    t0 = time.time()
    state, logger = train(cfg, scene, save_dir=os.path.join(args.out, "checkpoints"),
                          num_iterations=args.iters, checkpoint_every=0,
                          log_path=os.path.join(args.out, "metrics.jsonl"))
    train_s = time.time() - t0
    params = state.params

    res = evaluate(params["model"], cfg, val, appearance=params.get("appearance"),
                   max_views=4)
    print(f"val PSNR {res['psnr']:.2f} dB  SSIM {res['ssim']:.3f} "
          f"after {args.iters} steps in {train_s:.1f}s")

    frames_dir = os.path.join(args.out, "frames")
    t1 = time.time()
    render_aligned_spiral(params["model"], cfg, frames_dir,
                          appearance_embedding=params["appearance"][0],
                          num_frames=args.frames, rotation_axis="none",
                          height=args.size, width=args.size, focal=scene.focal,
                          make_video=True)
    render_s = time.time() - t1

    # depth-aware fog pass over the frames that have depth maps
    from danerf_tpu.fx.batch import apply_effect_to_frames

    fog_dir = os.path.join(args.out, "fog_frames")
    apply_effect_to_frames(frames_dir, fog_dir, "Fog", make_video=False)

    report = {
        "iters": args.iters,
        "train_seconds": round(train_s, 1),
        "train_rays_per_sec": round(args.iters * cfg.batch_size / train_s, 1),
        "render_seconds_per_frame": round(render_s / args.frames, 3),
        "val_psnr": round(res["psnr"], 3),
        "val_ssim": round(res["ssim"], 4),
        "backend": jax.default_backend(),
        "use_pallas": use_pallas,
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
