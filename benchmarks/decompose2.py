"""Separate per-call dispatch overhead from real sampling compute.

Times three programs at steps_per_call in {10, 100}:
  empty  : fori loop incrementing a scalar (pure dispatch floor)
  sample : batch sampling from the HBM pool
  full   : the production train step

If per-step time falls ~10x from 10->100 steps, the cost is per-call dispatch;
if it is flat, it is real per-step device compute.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import build_pool  # noqa: E402
from danerf_tpu.config import NeRFConfig  # noqa: E402
from danerf_tpu.data.dataset import sample_ray_batch  # noqa: E402
from danerf_tpu.train.trainer import create_train_state, make_train_step  # noqa: E402

ITERS = 20


def timeit(name, steps, fn, *args, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(out[1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(out[1])
    dt = (time.perf_counter() - t0) / (ITERS * steps) * 1e3
    call_ms = dt * steps
    print(f"{name:14s} steps={steps:4d}  {dt:7.3f} ms/step  ({call_ms:6.1f} ms/call)")
    return dt


def main():
    cfg = NeRFConfig(num_importance=0, use_bf16=True, use_pallas=True)
    ds = build_pool(20, 800, 800)
    pool = ds.device_arrays()
    state = create_train_state(jax.random.key(0), cfg, 20)
    H, W, focal = 800, 800, ds.focal

    for steps in (10, 100):
        @jax.jit
        def empty(key, _steps=steps):
            def body(i, c):
                k, acc = c
                k2, _ = jax.random.split(k)
                return k2, acc + 1.0
            return jax.lax.fori_loop(0, _steps, body, (key, jnp.float32(0)))

        @jax.jit
        def sample(key, pool, _steps=steps):
            def body(i, c):
                k, acc = c
                kb, kn = jax.random.split(k)
                batch = sample_ray_batch(kb, pool, cfg, H, W, focal)
                return kn, acc + jnp.mean(batch["rgb"])
            return jax.lax.fori_loop(0, _steps, body, (key, jnp.float32(0)))

        timeit("empty", steps, empty, jax.random.key(1))
        timeit("sample", steps, sample, jax.random.key(1), pool)

    host_state = jax.device_get(state)
    for steps in (10, 50):
        step_fn = make_train_step(cfg, H, W, focal, steps_per_call=steps)
        from danerf_tpu.train.trainer import TrainState
        s = TrainState(*jax.tree_util.tree_map(jnp.asarray, host_state))
        for _ in range(3):
            s, m = step_fn(s, pool)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s, m = step_fn(s, pool)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / (ITERS * steps) * 1e3
        print(f"{'full':14s} steps={steps:4d}  {dt:7.3f} ms/step  ({dt*steps:6.1f} ms/call)")


if __name__ == "__main__":
    main()
