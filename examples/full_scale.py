"""Full-scale study: the reference's NATIVE workload, end-to-end.

The reference trains 800x800 scenes (100 train views) for 30k iterations
(/root/reference/config.py:23, data/nerf_synthetic/README.txt:5-9) and renders
800x800 novel-view videos.  This script runs that exact scale through this
framework on the attached TPU — the real chair/hotdog data is egress-blocked
(examples/fetch_nerf_synthetic.sh when available), so the 3D-consistent
procedural scene stands in at the same resolution/view-count/iteration budget:

  1. scene generation   100 train + N val views at 800x800 (device GT path)
  2. train              default hierarchical 64+64 config, 30k iters,
                        checkpoints + hier validation renders every 1000
  3. eval               PSNR/SSIM over held-out 800x800 views (hier render)
  4. aligned spiral     120 frames at 800x800 through the fused renderer,
                        depth every 10th frame, mp4
  5. effects            on-device depth-aware Fog + Toon over the frames,
                        per-effect mp4s

Writes examples/full_scale_report_v5e.json (BASELINE configs #3/#4/#5 at
native scale).  Run:  python examples/full_scale.py
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
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--train-views", type=int, default=100)
    ap.add_argument("--val-views", type=int, default=16)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--out", default="examples/full_scale_out")
    ap.add_argument("--report", default="examples/full_scale_report_v5e.json")
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.fx.batch import apply_effect_to_frames
    from danerf_tpu.render.frames import render_aligned_spiral
    from danerf_tpu.train import train
    from danerf_tpu.train.evaluate import evaluate

    os.makedirs(args.out, exist_ok=True)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = NeRFConfig(use_bf16=True, use_pallas=on_tpu and not args.no_pallas)
    assert cfg.num_importance == 64 and cfg.num_samples == 64, (
        "full-scale study must run the default hierarchical config")
    print(f"devices: {jax.devices()}  config: 64+64 hier, "
          f"batch {cfg.batch_size}, pallas={cfg.use_pallas}", flush=True)

    t0 = time.time()
    scene = make_synthetic_scene("train", n_images=args.train_views,
                                 height=args.size, width=args.size,
                                 backend="jax")
    val = make_synthetic_scene("val", n_images=args.val_views,
                               height=args.size, width=args.size,
                               backend="jax")
    gen_s = time.time() - t0
    pool_mb = scene.images.size * 4 / 1e6  # f32 pool footprint once uploaded
    print(f"scene: {args.train_views}+{args.val_views} views at "
          f"{args.size}x{args.size} in {gen_s:.1f}s (pool {pool_mb:.0f} MB)",
          flush=True)

    ckpt_dir = os.path.join(args.out, "checkpoints")
    t0 = time.time()
    state, logger = train(cfg, scene, save_dir=ckpt_dir,
                          num_iterations=args.iters, checkpoint_every=1000,
                          log_path=os.path.join(args.out, "metrics.jsonl"))
    train_s = time.time() - t0
    params = state.params
    rays_s = args.iters * cfg.batch_size / train_s
    print(f"train: {args.iters} iters in {train_s:.1f}s "
          f"({rays_s:,.0f} rays/s incl. checkpointing)", flush=True)

    emb = None
    if cfg.use_appearance and "appearance" in params:
        emb = np.asarray(params["appearance"]).mean(0, keepdims=True)
    t0 = time.time()
    res = evaluate(params["model"], cfg, val, appearance=emb,
                   n_importance=cfg.num_importance)
    eval_s = time.time() - t0
    print(f"eval: PSNR {res['psnr']:.2f} dB SSIM {res['ssim']:.4f} over "
          f"{args.val_views} views at {args.size}x{args.size} "
          f"({eval_s / args.val_views:.2f} s/view)", flush=True)

    frames_dir = os.path.join(args.out, "spiral")
    t0 = time.time()
    render_aligned_spiral(params["model"], cfg, frames_dir,
                          appearance_embedding=(emb[0] if emb is not None
                                                else None),
                          num_frames=args.frames, rotation_axis="none",
                          height=args.size, width=args.size,
                          focal=scene.focal, make_video=True)
    spiral_s = time.time() - t0
    print(f"spiral: {args.frames} frames at {args.size}x{args.size} in "
          f"{spiral_s:.1f}s ({spiral_s / args.frames * 1e3:.0f} ms/frame)",
          flush=True)

    fx_seconds = {}
    fx_breakdown = {}
    for effect in ("Fog", "Toon Shader"):
        fx_dir = os.path.join(args.out, effect.lower().replace(" ", "_"))
        tm: dict = {}
        t0 = time.time()
        # skip_existing=False: a STUDY must measure even over a reused
        # --out dir (with the default skip rule a second run silently
        # times 0 frames)
        apply_effect_to_frames(frames_dir, fx_dir, effect, make_video=True,
                               skip_existing=False, timings=tm)
        fx_seconds[effect] = round(time.time() - t0, 1)
        n = max(tm.get("frames", 0), 1)
        fx_breakdown[effect] = {
            "frames": tm.get("frames", 0),
            "png_load_ms_per_frame": round(tm.get("load_s", 0) / n * 1e3, 1),
            "device_ms_per_frame": round(tm.get("device_s", 0) / n * 1e3, 1),
            "fetch_encode_ms_per_frame_overlapped": round(
                tm.get("write_s", 0) / n * 1e3, 1),
        }
    print(f"effects: {fx_seconds}  breakdown: {fx_breakdown}", flush=True)

    report = {
        "study": "reference-native workload end-to-end "
                 "(800x800, 100 views, 30k iters, hier 64+64)",
        "reference_workload": "/root/reference/config.py:23 + "
                              "data/nerf_synthetic/README.txt:5-9",
        "data": {"kind": "procedural (real scenes egress-blocked)",
                 "resolution": [args.size, args.size],
                 "train_views": args.train_views,
                 "val_views": args.val_views,
                 "pool_mb_f32": round(pool_mb),
                 "generation_seconds": round(gen_s, 1)},
        "config": {"samples": [cfg.num_samples, cfg.num_importance],
                   "batch_size": cfg.batch_size, "bf16": cfg.use_bf16,
                   "pallas": cfg.use_pallas,
                   "checkpoint_every": 1000},
        "train": {"iters": args.iters,
                  "seconds": round(train_s, 1),
                  "rays_per_sec_incl_ckpt": round(rays_s),
                  "final_train_psnr": round(
                      float(logger.history[-1].get("psnr", float("nan"))), 3)
                  if logger.history else None},
        "eval": {"val_psnr": round(res["psnr"], 3),
                 "val_ssim": round(res["ssim"], 4),
                 "seconds_per_view": round(eval_s / args.val_views, 2),
                 "per_view_psnr": [round(v["psnr"], 2)
                                   for v in res["per_view"]]},
        "spiral": {"frames": args.frames,
                   "ms_per_frame": round(spiral_s / args.frames * 1e3),
                   "video": os.path.join(frames_dir,
                                         f"{cfg.scene}_spiral.mp4")},
        "effects_seconds": fx_seconds,
        "effects_breakdown": fx_breakdown,
        "oom": False,
        "backend": jax.default_backend(),
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
