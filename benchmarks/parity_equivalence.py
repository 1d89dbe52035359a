"""Measure the trajectory drift between the REAL torch reference trainer and
its JAX mirror (benchmarks/jax_reference.py) at the parity-study scale.

Both sides start from the SAME torch init and consume the SAME numpy RNG
stream (torch_reference module-doc protocol), so per-step losses differ only
by float summation order (torch CPU MKL vs XLA).  This is the evidence that
lets the multi-seed parity statistics run through the mirror on the TPU
(examples/parity_study.py "reference" arm) instead of 8-hour torch seeds.

Writes examples/parity_runs/equivalence.json:
  - per-step relative loss drift over the window (eager torch vs mirror)
  - summary stats (max/median drift over the first K steps, correlation of
    the full window)

Run:  python benchmarks/parity_equivalence.py --iters 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hier", action="store_true")
    ap.add_argument("--scene", default="examples/procedural_scene")
    ap.add_argument("--out", default="examples/parity_runs/equivalence.json")
    args = ap.parse_args()

    from benchmarks.jax_reference import train_mirror
    from benchmarks.torch_reference import train_reference
    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data.blender import load_blender_scene

    train_ds = load_blender_scene(args.scene, "train")
    cfg = NeRFConfig(num_importance=64 if args.hier else 0,
                     use_pallas=False, use_bf16=False,
                     near=train_ds.near, far=train_ds.far)
    imgs = train_ds.images.astype(np.float32) / 255.0

    init = {}
    t0 = time.time()
    _, _, mses_t = train_reference(cfg, imgs, train_ds.c2ws, train_ds.focal,
                                   args.iters, seed=args.seed,
                                   init_out=init, log_every=10 ** 9)
    torch_s = time.time() - t0
    t0 = time.time()
    _, mses_j = train_mirror(cfg, imgs, train_ds.c2ws, train_ds.focal,
                             args.iters, seed=args.seed, init=init)
    jax_s = time.time() - t0

    mt, mj = np.asarray(mses_t), np.asarray(mses_j)
    rel = np.abs(mt - mj) / np.maximum(np.abs(mt), 1e-12)
    k = min(50, args.iters)
    report = {
        "iters": args.iters,
        "seed": args.seed,
        "hier": args.hier,
        "scale": {"resolution": [train_ds.height, train_ds.width],
                  "batch": cfg.batch_size, "model": "8x256",
                  "samples": [cfg.num_samples, cfg.num_importance]},
        "pairing": "same torch init + same numpy RNG stream (see "
                   "benchmarks/torch_reference.py module doc)",
        "torch_seconds": torch_s,
        "mirror_seconds": jax_s,
        f"rel_drift_first_{k}": {"max": float(rel[:k].max()),
                                 "median": float(np.median(rel[:k]))},
        "rel_drift_full": {"max": float(rel.max()),
                           "median": float(np.median(rel))},
        "log_mse_correlation_full": float(np.corrcoef(
            np.log(np.maximum(mt, 1e-12)), np.log(np.maximum(mj, 1e-12)))[0, 1]),
        "final_psnr_torch": float(-10 * np.log10(mt[-min(50, len(mt)):].mean())),
        "final_psnr_mirror": float(-10 * np.log10(mj[-min(50, len(mj)):].mean())),
        "loss_trace_torch_every10": mt[::10].tolist(),
        "loss_trace_mirror_every10": mj[::10].tolist(),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.startswith("loss_trace")}, indent=2))


if __name__ == "__main__":
    main()
