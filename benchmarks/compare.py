"""Compare train-step implementations on the real chip: XLA, XLA+remat,
Pallas fused kernel — across batch sizes.

Usage: python benchmarks/compare.py [--iters 20]
Not part of the driver contract (that's bench.py); this is the tuning harness.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

sys.path.insert(0, ".")

from bench import build_pool  # noqa: E402
from danerf_tpu.config import NeRFConfig  # noqa: E402
from danerf_tpu.train import create_train_state, make_train_step  # noqa: E402


def time_config(name, cfg, pool, ds, n_images, iters=20, warmup=5):
    try:
        state = create_train_state(jax.random.key(0), cfg, n_images)
        step = make_train_step(cfg, 800, 800, ds.focal)
        for _ in range(warmup):
            state, m = step(state, pool)
        float(m["loss"])  # force (block_until_ready lies over the tunnel)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, pool)
        float(m["loss"])
        dt = time.perf_counter() - t0
        rays = cfg.batch_size * iters / dt
        samples = cfg.batch_size * (cfg.num_samples + 2 * cfg.num_importance)
        tf = samples * 532_000 * 2 * 3 * iters / dt / 1e12
        print(f"{name:34s} bs={cfg.batch_size:6d}: {dt*1000/iters:8.2f} ms/step  "
              f"{rays/1e3:9.1f} krays/s  ~{tf:6.1f} TF")
        return rays
    except Exception as e:
        print(f"{name:34s} bs={cfg.batch_size:6d}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[1024, 4096, 16384])
    args = ap.parse_args()

    n_images = 8
    ds = build_pool(n_images, 800, 800)
    pool = ds.device_arrays()

    for bs in args.batches:
        base = dict(num_importance=0, batch_size=bs)
        for name, cfg in [
            ("xla bf16", NeRFConfig(**base, use_bf16=True)),
            ("xla bf16 + remat", NeRFConfig(**base, use_bf16=True, remat=True)),
            ("pallas fused bf16", NeRFConfig(**base, use_bf16=True, use_pallas=True)),
        ]:
            time_config(name, cfg, pool, ds, n_images, iters=args.iters)
        print()


if __name__ == "__main__":
    main()
