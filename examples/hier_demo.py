"""Hierarchical (64 coarse + 64 importance) end-to-end demo.

The reference declares hierarchical sampling but stubs the fine pass
(/root/reference/src/render.py:83-86); this exercises the actually-wired
coarse->fine trainer end to end and writes the report committed as
examples/hier_report_v5e.json.

Run: python examples/hier_demo.py [--iters 1500] [--size 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--size", type=int, default=100)
    ap.add_argument("--out", type=str, default="hier_out")
    args = ap.parse_args()

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.train import train
    from danerf_tpu.train.evaluate import evaluate

    cfg = NeRFConfig(use_bf16=True, use_pallas=True)  # 64+64 hierarchical
    scene = make_synthetic_scene("train", height=args.size, width=args.size)
    val = make_synthetic_scene("val", height=args.size, width=args.size)

    t0 = time.time()
    state, _ = train(cfg, scene, save_dir=os.path.join(args.out, "checkpoints"),
                     num_iterations=args.iters, checkpoint_every=args.iters,
                     eval_every=0, progress=False)
    train_s = time.time() - t0
    m = evaluate(state.params["model"], cfg, val,
                 appearance=state.params.get("appearance"), max_views=3)

    report = {
        "iters": args.iters,
        "train_s": round(train_s, 1),
        "train_rays_per_sec": round(args.iters * cfg.batch_size / train_s, 1),
        "psnr": round(float(m["psnr"]), 2),
        "ssim": round(float(m["ssim"]), 4),
        "config": "pallas hier 64+64",
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
