"""Re-measure the host-I/O-overlap surfaces against the full-scale artifacts
(VERDICT r4 items 3+4) without repeating the 30k-iter train:

  - eval s/view at 800x800 hier through the pipelined device-scored path,
  - per-stage effects breakdown (png-load / device / fetch+encode) for Fog
    and Toon over the 120 rendered spiral frames, on CLEARED output dirs.

Merges the numbers into examples/full_scale_report_v5e.json under
"io_overlap_remeasure".  Run after examples/full_scale.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "examples/full_scale_out"
    report_path = (sys.argv[2] if len(sys.argv) > 2
                   else "examples/full_scale_report_v5e.json")
    size = 800

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.fx.batch import apply_effect_to_frames
    from danerf_tpu.train import create_train_state
    from danerf_tpu.train.evaluate import evaluate
    from danerf_tpu.utils.checkpoint import restore_checkpoint

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = NeRFConfig(use_bf16=True, use_pallas=on_tpu)

    val = make_synthetic_scene("val", n_images=16, height=size, width=size,
                               backend="jax")
    template = create_train_state(jax.random.key(0), cfg, 100)
    state, _ = restore_checkpoint(
        os.path.join(out_dir, "checkpoints", "checkpoint_final"), template)
    params = state[0]
    emb = None
    if cfg.use_appearance and "appearance" in params:
        emb = np.asarray(params["appearance"]).mean(0, keepdims=True)

    t0 = time.time()
    res = evaluate(params["model"], cfg, val, appearance=emb,
                   n_importance=cfg.num_importance)
    eval_s = time.time() - t0
    print(f"eval: {eval_s / val.n_images:.2f} s/view "
          f"(PSNR {res['psnr']:.2f}, SSIM {res['ssim']:.4f})", flush=True)

    frames_dir = os.path.join(out_dir, "spiral")
    fx = {}
    for effect in ("Fog", "Toon Shader"):
        fx_dir = os.path.join(out_dir, "remeasure_"
                              + effect.lower().replace(" ", "_"))
        shutil.rmtree(fx_dir, ignore_errors=True)
        tm: dict = {}
        t0 = time.time()
        apply_effect_to_frames(frames_dir, fx_dir, effect, make_video=False,
                               skip_existing=False, timings=tm)
        wall = time.time() - t0
        n = max(tm.get("frames", 0), 1)
        fx[effect] = {
            "frames": tm.get("frames", 0),
            "wall_ms_per_frame": round(wall / n * 1e3, 1),
            "png_load_ms_per_frame": round(tm.get("load_s", 0) / n * 1e3, 1),
            "device_ms_per_frame": round(tm.get("device_s", 0) / n * 1e3, 1),
            "fetch_encode_ms_per_frame_overlapped": round(
                tm.get("write_s", 0) / n * 1e3, 1),
        }
        print(f"{effect}: {fx[effect]}", flush=True)

    block = {
        "eval_seconds_per_view": round(eval_s / val.n_images, 2),
        "eval_psnr_check": round(res["psnr"], 3),
        "effects": fx,
        "note": "pipelined loops: device time is serial main-thread time "
                "forced by a 1-element fetch; fetch+encode runs on worker "
                "threads overlapped with the next frame's compute",
    }
    try:
        with open(report_path) as f:
            report = json.load(f)
    except OSError:
        report = {}
    report["io_overlap_remeasure"] = block
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(block, indent=2), flush=True)


if __name__ == "__main__":
    main()
