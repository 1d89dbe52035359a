"""Multi-scene training + aligned-spiral renders (BASELINE.json config #5's
single-host form): train one model per scene, render each as a spiral video,
and write a combined report.

Run: python examples/multi_scene.py --scenes 0 1 --iters 1500
Each integer names a procedural-scene variant (blob-field seed); with real
nerf_synthetic data on disk, pass scene names instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=str, nargs="+", default=["0", "1"])
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--size", type=int, default=80)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", type=str, default="multi_scene_out")
    args = ap.parse_args()

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data import load_dataset, make_synthetic_scene
    from danerf_tpu.render.frames import render_aligned_spiral
    from danerf_tpu.train import train
    from danerf_tpu.train.evaluate import evaluate

    report = {}
    for scene_name in args.scenes:
        cfg = NeRFConfig(scene=scene_name, num_importance=0, use_bf16=True,
                         use_pallas=True, render_chunk=args.size * args.size)
        if scene_name.isdigit():
            scene = make_synthetic_scene("train", n_images=16, height=args.size,
                                         width=args.size, seed=int(scene_name))
            val = make_synthetic_scene("val", n_images=2, height=args.size,
                                       width=args.size, seed=int(scene_name))
        else:
            scene = load_dataset(cfg, "train")
            val = load_dataset(cfg, "val")

        save_dir = os.path.join(args.out, f"checkpoints_{scene_name}")
        state, _ = train(cfg, scene, save_dir=save_dir, checkpoint_every=0,
                         num_iterations=args.iters, progress=False)
        res = evaluate(state.params["model"], cfg, val,
                       appearance=state.params.get("appearance"), max_views=2)
        frames_dir = os.path.join(args.out, f"spiral_{scene_name}")
        render_aligned_spiral(state.params["model"], cfg, frames_dir,
                              appearance_embedding=state.params["appearance"][0],
                              num_frames=args.frames, rotation_axis="none",
                              height=args.size, width=args.size,
                              focal=scene.focal)
        report[scene_name] = {"psnr": round(res["psnr"], 2),
                              "ssim": round(res["ssim"], 4)}
        print(f"scene {scene_name}: {report[scene_name]}")

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
