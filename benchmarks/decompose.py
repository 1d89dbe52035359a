"""Decompose the production train step time into components (A/B timings).

Variants, all at the reference workload (1024 rays x 64 samples, 8x256 MLP,
bf16, Pallas fused kernel, fori_loop steps_per_call=10):

  full      : sample batch -> fwd+bwd -> Adam update   (the bench path)
  nograd    : sample batch -> forward-only loss        (no backward, no Adam)
  gradsonly : sample batch -> fwd+bwd                  (no optimizer update)
  sample    : batch sampling from the HBM pool only

Prints per-step ms for each so the deltas attribute time to backward, Adam,
and the input gather.  Each variant is its own compile (~1-2 min remote AOT).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from bench import build_pool  # noqa: E402
from danerf_tpu.config import NeRFConfig  # noqa: E402
from danerf_tpu.data.dataset import sample_ray_batch  # noqa: E402
from danerf_tpu.render.renderer import render_rays  # noqa: E402
from danerf_tpu.train.trainer import (create_train_state, loss_fn,  # noqa: E402
                                      make_optimizer, make_train_step)

STEPS = 10
ITERS = 20


def timeit(name, fn, *args, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    # force value fetch (remote tunnel returns at enqueue otherwise)
    float(out[1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(out[1])
    dt = (time.perf_counter() - t0) / (ITERS * STEPS) * 1e3
    print(f"{name:10s} {dt:7.3f} ms/step")
    return dt


def main():
    cfg = NeRFConfig(num_importance=0, use_bf16=True, use_pallas=True)
    ds = build_pool(20, 800, 800)
    pool = ds.device_arrays()
    state = create_train_state(jax.random.key(0), cfg, 20)
    H, W, focal = 800, 800, ds.focal
    opt = make_optimizer(cfg)

    def fori(body, init):
        return jax.lax.fori_loop(0, STEPS, lambda i, c: body(c), init)

    @jax.jit
    def sample_only(key, pool):
        def body(c):
            key, acc = c
            k_batch, k_next = jax.random.split(key)
            batch = sample_ray_batch(k_batch, pool, cfg, H, W, focal)
            return k_next, acc + jnp.mean(batch["rgb"])
        return fori(body, (key, jnp.float32(0)))

    @jax.jit
    def nograd(params, key, pool):
        def body(c):
            key, acc = c
            k_batch, k_render, k_next = jax.random.split(key, 3)
            batch = sample_ray_batch(k_batch, pool, cfg, H, W, focal)
            loss, _ = loss_fn(params, cfg, k_render, batch)
            return k_next, acc + loss
        return fori(body, (key, jnp.float32(0)))

    @jax.jit
    def gradsonly(params, key, pool):
        def body(c):
            key, acc = c
            k_batch, k_render, k_next = jax.random.split(key, 3)
            batch = sample_ray_batch(k_batch, pool, cfg, H, W, focal)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, cfg, k_render, batch)
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return k_next, acc + loss + 0 * gsum
        return fori(body, (key, jnp.float32(0)))

    full = make_train_step(cfg, H, W, focal, steps_per_call=STEPS)

    timeit("sample", sample_only, jax.random.key(1), pool)
    timeit("nograd", nograd, state.params, jax.random.key(1), pool)
    timeit("gradsonly", gradsonly, state.params, jax.random.key(1), pool)

    # full donates state; chain states across calls
    for _ in range(3):
        state, m = full(state, pool)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = full(state, pool)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / (ITERS * STEPS) * 1e3
    print(f"{'full':10s} {dt:7.3f} ms/step")


if __name__ == "__main__":
    main()
