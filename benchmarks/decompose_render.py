"""Decompose full-frame render time (800x800, Pallas, bf16).

Timed variants:
  coarse64   : 64 coarse samples, no fine pass      (baseline 770 ms)
  coarse128  : 128 coarse samples only               = fine-pass MLP cost proxy
  coarse192  : 192 coarse samples only               = total hier MLP cost proxy
  hier       : 64 coarse + 64 importance             (baseline 3835 ms)
  hier_nosort: hier with combine_z's sort replaced by plain concat
               (wrong image, isolates the per-ray 128-sort cost)

Deltas attribute the hier overhead between the extra MLP evals, sample_pdf,
and the combined sort.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from danerf_tpu.config import NeRFConfig  # noqa: E402
from danerf_tpu.models import init_nerf_params  # noqa: E402
from danerf_tpu.ops import sampling  # noqa: E402
from danerf_tpu.render import renderer  # noqa: E402

H = W = 800
ITERS = 3


def timeit(name, fn):
    out = fn()
    rgb = out[0]
    float(jnp.sum(rgb))  # force through the remote tunnel
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn()
    float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:12s} {dt:8.1f} ms/frame")
    return dt


def main():
    cfg = NeRFConfig(use_bf16=True, use_pallas=True)
    params = init_nerf_params(jax.random.key(0), cfg)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    emb = jnp.zeros((cfg.appearance_dim,), jnp.float32)
    key = jax.random.key(1)

    def frame(ns, ni):
        return renderer.render_frame(params, cfg, key, c2w, H, W, 1111.0,
                                     appearance_embedding=emb,
                                     n_samples=ns, n_importance=ni,
                                     perturb=False)

    timeit("coarse64", lambda: frame(64, 0))
    timeit("coarse128", lambda: frame(128, 0))
    timeit("coarse192", lambda: frame(192, 0))
    timeit("hier", lambda: frame(64, 64))

    orig = sampling.combine_z

    def combine_nosort(rays_o, rays_d, z_coarse, z_fine):
        z = jnp.concatenate([z_coarse, z_fine], axis=-1)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., :, None]
        return z, pts

    renderer.combine_z = combine_nosort
    try:
        renderer._render_frame_jit.clear_cache()
        timeit("hier_nosort", lambda: frame(64, 64))
    finally:
        renderer.combine_z = orig
        renderer._render_frame_jit.clear_cache()


if __name__ == "__main__":
    main()
