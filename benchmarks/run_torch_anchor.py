"""Run ONE real-torch reference-semantics training run (the parity anchor).

The multi-seed statistics of the parity study run on the TPU through the
validated JAX mirror (benchmarks/jax_reference.py) because this host's torch
floor (~180 rays/s eager, ~330 compiled on 2 vCPUs) makes multi-seed torch
runs impossible — ONE compiled 5k-iter seed already costs ~4.3 h.  This
script produces that one seed as the external gold anchor: trajectory-paired
with the mirror (same init, same numpy RNG stream), partial results written
as it goes so an interrupted run still reports.

Writes:
  examples/parity_runs/torch_anchor_seed{S}[_hier].json   (progress + final)
  examples/parity_runs/torch_anchor_seed{S}[_hier]_init.npz (init for pairing)

Usage: python benchmarks/run_torch_anchor.py --iters 5000 --seed 0
       python benchmarks/run_torch_anchor.py --iters 1500 --seed 0 --hier
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
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hier", action="store_true",
                    help="hierarchical arm: num_importance=64, loss = "
                         "mse(fine) + mse(coarse)")
    ap.add_argument("--no-compile", action="store_true")
    ap.add_argument("--scene", default="examples/procedural_scene")
    ap.add_argument("--outdir", default="examples/parity_runs")
    args = ap.parse_args()

    import torch

    from benchmarks.torch_reference import (render_image_reference,
                                            train_reference)
    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data.blender import load_blender_scene

    train_ds = load_blender_scene(args.scene, "train")
    val_ds = load_blender_scene(args.scene, "val")
    cfg = NeRFConfig(num_importance=64 if args.hier else 0,
                     use_pallas=False, use_bf16=False,
                     near=train_ds.near, far=train_ds.far)

    tag = f"torch_anchor_seed{args.seed}" + ("_hier" if args.hier else "")
    os.makedirs(args.outdir, exist_ok=True)
    out_json = os.path.join(args.outdir, f"{tag}.json")
    imgs = train_ds.images.astype(np.float32) / 255.0
    gt = val_ds.images.astype(np.float32) / 255.0

    t0 = time.time()
    state = {
        "arm": "torch_reference",
        "hier": args.hier,
        "seed": args.seed,
        "iters_target": args.iters,
        "compiled": not args.no_compile,
        "config": {"batch": cfg.batch_size, "samples": cfg.num_samples,
                   "importance": cfg.num_importance, "hidden": cfg.hidden_dim,
                   "layers": cfg.num_layers,
                   "resolution": [train_ds.height, train_ds.width]},
        "status": "running",
    }

    def eval_now(model, emb, n_views=None):
        emb_row = emb.detach().mean(0) if emb is not None else None
        per_view = []
        nv = val_ds.n_images if n_views is None else min(n_views, val_ds.n_images)
        for i in range(nv):
            pred = render_image_reference(
                model, cfg, val_ds.c2ws[i], val_ds.height, val_ds.width,
                val_ds.focal, emb_row=emb_row,
                n_importance=cfg.num_importance)
            mse = float(np.mean((pred - gt[i]) ** 2))
            per_view.append({"view": i, "mse": mse,
                             "psnr": float(-10 * np.log10(max(mse, 1e-12)))})
        return per_view

    def on_checkpoint(it, model, emb, mses):
        state["iters_done"] = it
        state["train_seconds"] = time.time() - t0
        state["train_psnr_tail"] = float(-10 * np.log10(np.mean(mses[-100:])))
        state["mse_trace_every100"] = [float(np.mean(mses[j:j + 100]))
                                       for j in range(0, len(mses), 100)]
        # partial eval on ONE view keeps checkpoint cost ~30 s
        if it % 1000 == 0:
            with torch.no_grad():
                state["partial_val"] = eval_now(model, emb, n_views=1)
        with open(out_json, "w") as f:
            json.dump(state, f, indent=2)
        print(f"[anchor] iter {it} psnr {state['train_psnr_tail']:.2f} "
              f"({state['train_seconds']:.0f}s)", flush=True)

    init_out = {}
    model, emb, mses = train_reference(
        cfg, imgs, train_ds.c2ws, train_ds.focal, args.iters, seed=args.seed,
        log_every=10 ** 9, use_compile=not args.no_compile, init_out=init_out,
        on_checkpoint=on_checkpoint, checkpoint_every=500)
    np.savez(os.path.join(args.outdir, f"{tag}_init.npz"), **init_out)

    per_view = eval_now(model, emb)
    state.update({
        "status": "done",
        "iters_done": args.iters,
        "train_seconds": time.time() - t0,
        "per_view": per_view,
        "val_psnr": float(np.mean([v["psnr"] for v in per_view])),
        "final_train_psnr": float(-10 * np.log10(np.mean(mses[-100:]))),
        "mse_trace_every100": [float(np.mean(mses[j:j + 100]))
                               for j in range(0, len(mses), 100)],
    })
    with open(out_json, "w") as f:
        json.dump(state, f, indent=2)
    print(f"[anchor] done: val psnr {state['val_psnr']:.3f} "
          f"in {state['train_seconds']:.0f}s -> {out_json}", flush=True)


if __name__ == "__main__":
    main()
