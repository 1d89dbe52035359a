"""Single-seed same-data parity run (torch vs this framework), kept as the
script for the FULL-SCALE real-data measurement (800x800 chair / 30k iters)
once data egress exists — fetch with examples/fetch_nerf_synthetic.sh, then:
    python examples/parity_chair.py --data data/nerf_synthetic/chair \
        --iters 30000 --out examples/parity_report_fullscale.json

The in-repo headline parity experiment is the MULTI-SEED study in
examples/parity_study.py (statistics across seeds/arms, symmetric dead-seed
handling, f32 and hierarchical arms, torch anchors) — see its module doc.

Data: point --data at a real nerf_synthetic scene directory (e.g.
``data/nerf_synthetic/chair`` after running examples/fetch_nerf_synthetic.sh).
When the real data is absent (this build environment has no network egress),
the harness generates a procedural scene, WRITES it to disk in the Blender
nerf_synthetic layout, and loads it back through the same
``load_blender_scene`` path — so the full file pipeline is exercised and the
comparison is still same-data / same-config; the report records which data
was used.

Both sides run the reference's live training path — coarse-only
(num_importance=0: the reference's hierarchical fine pass is stubbed,
/root/reference/src/render.py:83-86), 8x256 MLP, appearance embeddings,
batch 1024, Adam + StepLR(10k, 0.5), warmup batch 64 for 5 iters
(/root/reference/config.py:3-36, src/train.py:26-104).  Held-out views are
scored with the mean trained appearance embedding on BOTH sides (the
embedding of an unseen view is undefined; same convention on each side keeps
the comparison symmetric).

Full reference scale is ``--downscale 1 --iters 30000`` on the real chair
data; the recorded in-repo run uses a reduced scale that fits this
environment's torch-CPU floor (~530 rays/s, benchmarks/baseline_measured.json)
and says so in the report.

Run:  python examples/parity_chair.py --iters 1200 --height 160
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data.blender import load_blender_scene, save_blender_scene


def get_scene(args):
    """Real data when present; otherwise procedural round-trip (see module doc)."""
    if args.data and os.path.isfile(os.path.join(args.data, "transforms_train.json")):
        train = load_blender_scene(args.data, "train", downscale=args.downscale)
        val = load_blender_scene(args.data, "val", downscale=args.downscale)
        return train, val, {"source": os.path.abspath(args.data),
                            "kind": "nerf_synthetic", "downscale": args.downscale}

    from danerf_tpu.data.synthetic import make_synthetic_scene

    scene_dir = os.path.join(args.workdir, "procedural_scene")
    if not os.path.isfile(os.path.join(scene_dir, "transforms_train.json")):
        for split, n in [("train", 20), ("val", args.val_views)]:
            ds = make_synthetic_scene(split, n_images=n, height=args.height,
                                      width=args.height)
            save_blender_scene(ds, scene_dir, split)
    train = load_blender_scene(scene_dir, "train")
    val = load_blender_scene(scene_dir, "val")
    return train, val, {"source": scene_dir, "kind": "procedural-roundtrip",
                        "note": "real nerf_synthetic absent in this environment "
                                "(no egress); see examples/fetch_nerf_synthetic.sh"}


def train_jax(cfg, train_ds, iters, seed):
    import jax

    from danerf_tpu.train import create_train_state, make_train_step

    state = create_train_state(jax.random.key(seed), cfg, train_ds.n_images)
    pool = train_ds.device_arrays(white_background=cfg.white_background)
    spc = 10
    step = make_train_step(cfg, train_ds.height, train_ds.width,
                           train_ds.focal, steps_per_call=spc)
    # reference warmup: first 5 iters at batch 64 (src/train.py:26,56-58)
    warm = make_train_step(cfg, train_ds.height, train_ds.width, train_ds.focal,
                           batch_size=cfg.warmup_batch_size)
    t0 = time.time()
    for _ in range(cfg.warmup_iters):
        state, metrics = warm(state, pool)
    for i in range(cfg.warmup_iters, iters, spc):
        state, metrics = step(state, pool)
        if (i - cfg.warmup_iters) % (50 * spc) == 0:
            print(f"[jax] iter {i}: psnr {float(metrics['psnr']):.2f}",
                  flush=True)
    jax.block_until_ready(state.params)
    return state, time.time() - t0


def eval_jax(state, cfg, val_ds):
    from danerf_tpu.train.evaluate import evaluate

    emb = None
    if cfg.use_appearance:
        emb = np.asarray(state.params["appearance"]).mean(0, keepdims=True)
    res = evaluate(state.params["model"], cfg, val_ds, appearance=emb)
    return res


def run_torch(cfg, train_ds, val_ds, iters, seed):
    import torch

    from benchmarks.torch_reference import (render_image_reference,
                                            train_reference)

    imgs = train_ds.images.astype(np.float32) / 255.0
    t0 = time.time()
    model, emb, mses = train_reference(
        cfg, imgs, train_ds.c2ws, train_ds.focal, iters, seed=seed,
        log_every=100,
        on_log=lambda it, p: print(f"[torch] iter {it}: psnr {p:.2f}",
                                   flush=True))
    train_s = time.time() - t0

    emb_row = emb.detach().mean(0) if emb is not None else None
    gt = val_ds.images.astype(np.float32) / 255.0
    per_view = []
    for i in range(val_ds.n_images):
        pred = render_image_reference(model, cfg, val_ds.c2ws[i],
                                      val_ds.height, val_ds.width,
                                      val_ds.focal, emb_row=emb_row)
        mse = float(np.mean((pred - gt[i]) ** 2))
        per_view.append({"view": i, "mse": mse,
                         "psnr": float(-10 * np.log10(max(mse, 1e-12)))})
        print(f"[torch] val view {i}: psnr {per_view[-1]['psnr']:.2f}",
              flush=True)
    return {
        "train_seconds": train_s,
        "final_train_psnr": float(-10 * np.log10(np.mean(mses[-100:]))),
        "per_view": per_view,
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", default="data/nerf_synthetic/chair",
                    help="real scene dir (transforms_train.json inside)")
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--height", type=int, default=160,
                    help="procedural fallback resolution")
    ap.add_argument("--val-views", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="examples")
    ap.add_argument("--out", default="examples/parity_report.json")
    ap.add_argument("--skip-torch", action="store_true",
                    help="only run the JAX side; preserves an existing "
                         "report's torch_reference section")
    ap.add_argument("--jax-seeds", type=int, default=1,
                    help="train the JAX side for this many seeds (seed..seed+N-1)"
                         " — at short iteration counts single-seed trajectory"
                         " noise dominates; the spread contextualizes the delta")
    ap.add_argument("--jax-f32-control", action="store_true",
                    help="also run one JAX seed with bf16 off (precision control)")
    args = ap.parse_args()

    train_ds, val_ds, data_info = get_scene(args)
    print(f"data: {data_info}  train {train_ds.n_images}x"
          f"{train_ds.height}x{train_ds.width}, val {val_ds.n_images}",
          flush=True)

    # Reference live-path config: coarse-only (see module doc).
    cfg = NeRFConfig(num_importance=0, use_pallas=True,
                     near=train_ds.near, far=train_ds.far)
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        cfg = cfg.replace(use_pallas=False)

    jax_runs = []
    variants = [(args.seed + i, cfg) for i in range(args.jax_seeds)]
    if args.jax_f32_control:
        variants.append((args.seed, cfg.replace(use_bf16=False)))
    for seed, c in variants:
        state, jax_s = train_jax(c, train_ds, args.iters, seed)
        ev = eval_jax(state, c, val_ds)
        jax_runs.append({"seed": seed, "bf16": c.use_bf16,
                         "val_psnr": ev["psnr"], "val_ssim": ev["ssim"],
                         "per_view": ev["per_view"], "train_seconds": jax_s})
        print(f"[jax] seed {seed} bf16={c.use_bf16}: val psnr "
              f"{ev['psnr']:.3f} ({jax_s:.0f}s train)", flush=True)
    jax_eval = {"psnr": jax_runs[0]["val_psnr"], "ssim": jax_runs[0]["val_ssim"],
                "per_view": jax_runs[0]["per_view"]}
    jax_s = jax_runs[0]["train_seconds"]

    report = {
        "experiment": "BASELINE.json parity: same data, same config, "
                      "reference live path (coarse-only)",
        "data": data_info,
        "config": {
            "iters": args.iters, "batch_size": cfg.batch_size,
            "num_samples": cfg.num_samples, "num_importance": 0,
            "hidden": cfg.hidden_dim, "layers": cfg.num_layers,
            "resolution": [train_ds.height, train_ds.width],
            "lr": cfg.learning_rate, "appearance": cfg.use_appearance,
            "eval_embedding": "mean trained embedding (both sides)",
        },
        "hardware": {
            "jax_backend": jax.default_backend(),
            "host": platform.machine(),
            "note": "torch side runs on this host's CPU (the reference's "
                    "CUDA GPU is unavailable here); PSNR comparison is "
                    "hardware-independent, wall-clock is not",
        },
        "jax": {"val_psnr": jax_eval["psnr"], "val_ssim": jax_eval["ssim"],
                "per_view": jax_eval["per_view"], "train_seconds": jax_s},
    }
    if len(jax_runs) > 1:
        psnrs = [r["val_psnr"] for r in jax_runs]
        report["jax_psnr_spread"] = {"min": min(psnrs), "max": max(psnrs),
                                     "mean": float(np.mean(psnrs))}
        report["jax_runs"] = jax_runs
    if any(r["val_psnr"] < 10.0 for r in jax_runs):
        report["density_init_hazard"] = (
            "a run never trained: the reference's ReLU density head under "
            "torch-default init can be BORN DEAD (sigma_pre < 0 at every "
            "visible point -> the relu gate zeroes every gradient).  This is "
            "a property of the reference semantics, not of this framework: "
            "5/12 torch-init seeds of the reference model are fully dead at "
            "init (benchmarks/torch_reference.py probe).  Mitigations (off "
            "by default to stay reference-exact): config density_activation="
            "'softplus' or density_bias_init>0 — with softplus the stalled "
            "seed trains normally (tests/test_kernels.py::"
            "test_density_robustness_knobs).")

    prior_torch = None
    if args.skip_torch and os.path.isfile(args.out):
        try:
            with open(args.out) as f:
                prior_torch = json.load(f).get("torch_reference")
        except Exception:
            prior_torch = None

    if not args.skip_torch:
        torch_res = run_torch(cfg, train_ds, val_ds, args.iters, args.seed)
        report["torch_reference"] = torch_res
        report["psnr_delta_jax_minus_torch"] = (
            jax_eval["psnr"] - torch_res["psnr"])
        print(f"[parity] jax {jax_eval['psnr']:.3f} vs torch "
              f"{torch_res['psnr']:.3f} dB "
              f"(delta {report['psnr_delta_jax_minus_torch']:+.3f})",
              flush=True)
    elif prior_torch is not None:
        report["torch_reference"] = prior_torch
        report["psnr_delta_jax_minus_torch"] = (
            jax_eval["psnr"] - prior_torch["psnr"])

    at_reference_scale = (data_info["kind"] == "nerf_synthetic"
                          and args.downscale == 1 and args.iters >= 30000)
    report["at_reference_scale"] = at_reference_scale
    if not at_reference_scale:
        report["scale_note"] = (
            "reduced scale: the 0.1 dB bar of BASELINE.json applies to the "
            "real chair at 800x800 / 30k iters — run this script with real "
            "data (fetch_nerf_synthetic.sh) and --iters 30000 to measure it")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
