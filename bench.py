"""Benchmark: training-step throughput (rays/sec/chip, forward+backward).

Measures the full production train step — on-device batch sampling from the
HBM ray pool, hierarchical-capable volume render, backward, Adam update — on
the flagship config (8x256 NeRF-W MLP, 64 coarse samples, 1024-ray batch:
reference config.py defaults, the same workload as the reference's hot loop
at src/train.py:54-92).

Baseline: the reference publishes no benchmark numbers (SURVEY.md §6).  The
only quantitative statement it makes is that 30,000 iterations of this
workload take "typically several hours" (README.md:147).  Reading that as 3
hours on the reference's CUDA GPU gives 30000*1024/10800 ≈ 2,844 rays/s —
recorded here as the baseline the ratio is computed against.

That derivation is also cross-checked by MEASUREMENT on this host: the torch
reference-semantics step (benchmarks/baseline_torch.py) timed at the same
config runs 534.7 rays/s on this machine's 2-core CPU
(benchmarks/baseline_measured.json; regenerate with
``python benchmarks/baseline_torch.py``).  When that file exists the JSON
line additionally carries ``vs_torch_cpu_same_host``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2844.0  # see module docstring


def build_pool(n_images: int, height: int, width: int):
    """Random image pool — content doesn't affect throughput, geometry does."""
    from danerf_tpu.data.dataset import RayDataset

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n_images, height, width, 3), dtype=np.uint8)
    alphas = np.full((n_images, height, width), 255, np.uint8)
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n_images, 1, 1))
    c2ws[:, 2, 3] = 4.0
    return RayDataset(images=images, alphas=alphas, c2ws=c2ws,
                      focal=0.5 * width / np.tan(0.5 * 0.6911),
                      near=2.0, far=6.0)


def bench_train_step(cfg, n_images=20, height=800, width=800,
                     warmup=3, iters=20, steps_per_call=10):
    import jax

    from danerf_tpu.train import create_train_state, make_train_step

    ds = build_pool(n_images, height, width)
    pool = ds.device_arrays()
    state = create_train_state(jax.random.key(0), cfg, n_images)
    # steps_per_call matches the production trainer (scan-chunked steps);
    # each timed iteration performs that many real optimizer steps.
    step = make_train_step(cfg, height, width, ds.focal,
                           steps_per_call=steps_per_call)

    for _ in range(warmup):
        state, metrics = step(state, pool)
    float(metrics["loss"])  # value fetch: block_until_ready alone does not
    # force execution through the remote-dispatch tunnel (measured: it returns
    # at enqueue time and reports physically impossible FLOP rates)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, pool)
    loss = float(metrics["loss"])  # forces the whole chained sequence
    dt = time.perf_counter() - t0
    assert loss == loss, "non-finite loss in bench"
    return cfg.batch_size * iters * steps_per_call / dt


def main():
    from danerf_tpu.config import NeRFConfig

    # Flagship config: reference defaults (config.py:10-21), coarse-only like
    # the reference's live train path (its fine pass is stubbed, SURVEY.md §1).
    # Production path: the SINGLE-PASS fused train kernel (forward + in-kernel
    # MSE + backward in one pallas_call — 3x forward matmul FLOPs instead of
    # the custom-VJP route's 4x; kernels/fused_render._train_kernel) with
    # fori_loop-chunked steps.  Measured 557k rays/s vs 403k for the
    # fwd-kernel + recompute-bwd-kernel VJP, same day (BENCH_NOTES.md).
    cfg = NeRFConfig(num_importance=0, use_bf16=True, use_pallas=True)
    rays_per_sec = bench_train_step(cfg, iters=20, steps_per_call=10)

    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
    }

    # Measured same-host torch-CPU baseline, when recorded (module docstring).
    import os

    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "baseline_measured.json")
    if os.path.exists(measured):
        try:
            with open(measured) as f:
                torch_rays = json.load(f)["value"]
            result["vs_torch_cpu_same_host"] = round(rays_per_sec / torch_rays, 1)
        except Exception:
            pass

    # Hierarchical 64+64 (the DEFAULT config and BASELINE configs #2/#3):
    # coarse field+composite kernel emitting per-sample field values,
    # inverse-CDF resample, then the merged kernel that field-evals only the
    # 64 NEW depths and composites over the rank-merged 128 (the coarse MLP
    # values are reused, not recomputed: ~1.9x coarse cost vs 3.2x for the
    # naive re-evaluate-everything fine pass).  Reported alongside the
    # coarse-only headline in the same JSON line.
    try:
        cfg_h = NeRFConfig(use_bf16=True, use_pallas=True)
        h = bench_train_step(cfg_h, warmup=2, iters=10, steps_per_call=10)
        result["hier_rays_per_sec"] = round(h, 1)
        result["hier_cost_vs_coarse"] = round(rays_per_sec / h, 2)
        print(f"[bench] hierarchical 64+64: {h:,.0f} rays/s "
              f"({rays_per_sec / h:.2f}x coarse cost)", file=sys.stderr)
    except Exception as e:  # diagnostics must never fail the bench
        print(f"[bench] hierarchical bench skipped: {e}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
