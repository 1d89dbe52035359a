"""Probe: is sub-bf16 MXU arithmetic (int8 / fp8) actually faster on this
chip for the train kernel's matmul shapes?  Decides whether the "fp8 trunk"
idea (BENCH_NOTES round-3/4 remaining candidate) is worth an accuracy study.

Times the trunk-shaped matmul (N=TILE*S rows x 256x256) as XLA jit dots in
bf16 / int8 / fp8_e4m3 / fp8_e5m2, plus a f32 control, with chained
dispatch and a value fetch (remote-tunnel discipline).

Run on an idle chip:  python benchmarks/probe_lowprec_matmul.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_dot(dtype, n=8192, k=256, m=256, reps=200):
    try:
        a = jnp.asarray(np.random.default_rng(0).normal(size=(n, k)) * 3,
                        dtype)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(k, m)) * 3,
                        dtype)
    except Exception as e:
        return None, f"cast failed: {e}"
    acc = jnp.int32 if jnp.issubdtype(dtype, jnp.integer) else jnp.float32

    @jax.jit
    def chain(a):
        def body(i, x):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), preferred_element_type=acc)
            # renormalize + recast so the chain stays in the probe dtype
            return (y // (m * 2)).astype(dtype) if acc == jnp.int32 \
                else (y * (1.0 / m)).astype(dtype)
        out = jax.lax.fori_loop(0, reps, body, a)
        # scalar result: a full-array fetch through the remote tunnel would
        # dominate the measurement (~33 MB at ~4 MB/s)
        return jnp.sum(out.astype(jnp.float32))

    try:
        float(chain(a))  # compile + warm, value-fetched
        t0 = time.perf_counter()
        float(chain(a))
        dt = time.perf_counter() - t0
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:160]}"
    flops = 2.0 * n * k * m * reps
    return flops / dt / 1e12, None


def main():
    results = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16),
                     ("int8", jnp.int8),
                     ("fp8_e4m3", jnp.float8_e4m3fn),
                     ("fp8_e5m2", jnp.float8_e5m2)]:
        tf, err = time_dot(dt)
        results[name] = round(tf, 1) if tf else err
        print(f"{name}: {results[name]} "
              f"{'TFLOP/s' if tf else ''}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
