"""JAX mirror of the torch reference-semantics trainer (torch_reference.py).

Purpose: the PSNR-parity experiment (BASELINE.json "within 0.1 dB") needs a
multi-seed *reference-semantics* arm, but the torch side runs at ~180 rays/s
on this 2-vCPU host (benchmarks/baseline_measured.json) — a single 5k-iter
seed costs ~8 h, so a 3+ seed torch study is physically impossible here.
This mirror runs the SAME training program on the TPU:

- the model math is this repo's f32 XLA path (danerf_tpu.models.nerf_apply +
  ops.composite — already golden-tested allclose against the reference
  formulas, tests/golden_ref.py),
- the INIT is the actual torch init, exported tensor-for-tensor
  (sample_torch_init / torch_init_to_params),
- the data/jitter stream is the byte-identical numpy protocol of
  torch_reference.train_reference (make_step_inputs): same image picks, same
  pixel picks, same stratified jitter, same importance uniforms,
- the optimizer is Adam + StepLR with torch-identical update math
  (optax.adam: m_hat / (sqrt(v_hat) + eps), eps=1e-8 — the same formula as
  torch.optim.Adam), and
- matmuls run at f32-highest precision.

So mirror(seed) and torch(seed) compute the same trajectory up to float
summation order; benchmarks/parity_equivalence.py measures that drift
directly, and tests/test_torch_parity.py asserts it stays tight over a short
window.  With the mirror validated, reference-arm seeds cost minutes on the
TPU instead of 8 hours on the CPU.

Reference citations: training loop /root/reference/src/train.py:13-207,
sampling /root/reference/src/ray_utils.py:52-149, compositing
/root/reference/src/render.py:56-80, model /root/reference/src/models.py:57-162.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from danerf_tpu.config import NeRFConfig
from danerf_tpu.models.nerf import nerf_apply
from danerf_tpu.ops.composite import composite
from danerf_tpu.ops.sampling import combine_z, sample_pdf
from danerf_tpu.train.trainer import lr_schedule


def sample_torch_init(cfg: NeRFConfig, n_images: int, seed: int) -> dict:
    """Draw a REAL torch init (torch RNG, torch default Linear init) and
    export it as {name: np.ndarray} — the reference arm of the parity study
    starts from genuine reference inits."""
    import torch

    from benchmarks.torch_reference import ReferenceNeRF, export_init

    torch.manual_seed(seed)
    model = ReferenceNeRF(cfg)
    emb = (torch.nn.Parameter(torch.randn(n_images, cfg.appearance_dim))
           if cfg.use_appearance else None)
    return export_init(model, emb)


def torch_init_to_params(init: dict, cfg: NeRFConfig) -> dict:
    """Convert an export_init() snapshot into this repo's param pytree.

    torch Linear stores weight as (out, in); nerf_apply expects (in, out).
    """
    def lin(name):
        return {"w": jnp.asarray(init[f"{name}.weight"].T),
                "b": jnp.asarray(init[f"{name}.bias"])}

    model = {
        "trunk": [lin(f"layers.{i}") for i in range(cfg.num_layers)],
        "density": lin("density"),
        "dir": lin("dir_layer"),
        "rgb": lin("rgb_layer"),
    }
    if cfg.use_appearance:
        model["appearance_proj"] = lin("app_proj")
    params = {"model": model}
    if "appearance_embeddings" in init:
        params["appearance"] = jnp.asarray(init["appearance_embeddings"])
    return params


def density_alive_probe(params_model, cfg: NeRFConfig, images_shape,
                        c2ws, focal, n_probe: int = 1024,
                        n_z: int = 16) -> float:
    """Max sigma over stratified probe points of the first training views.

    == 0.0 (under ReLU) means the density head is BORN DEAD: every visible
    pre-activation is negative, the relu gate zeroes every gradient, and
    training never moves (the reference-semantics hazard documented at
    config.py density_activation).  Applied to BOTH parity arms so dead
    seeds are excluded symmetrically.
    """
    from benchmarks.torch_reference import ray_grid, rays_from_c2w
    import torch

    n_images, height, width = images_shape[:3]
    cam = ray_grid(height, width, focal)
    rng = np.random.default_rng(0)  # probe set is fixed across all seeds/arms
    pts = []
    for i in range(min(2, n_images)):
        ro, rd = rays_from_c2w(cam, torch.tensor(np.asarray(c2ws[i], np.float32)))
        sel = rng.choice(height * width, n_probe // 2, replace=False)
        z = np.linspace(cfg.near, cfg.far, n_z, dtype=np.float32)
        p = (ro[sel].numpy()[:, None, :]
             + rd[sel].numpy()[:, None, :] * z[None, :, None])
        pts.append(p.reshape(-1, 3))
    pts = jnp.asarray(np.concatenate(pts))
    dirs = jnp.zeros_like(pts).at[..., 2].set(-1.0)
    cfg_probe = cfg.replace(use_bf16=False, use_pallas=False)
    _, sigma = nerf_apply(params_model, cfg_probe, pts, dirs, None)
    return float(jnp.max(sigma))


def _loss(params, cfg: NeRFConfig, ro, rd, z, tgt, u_jit):
    """One training loss: reference coarse pass (+ declared hier fine pass).

    Math identical to torch_reference.train_reference's fwd() — coarse MSE,
    or mse(fine) + coarse_loss_weight * mse(coarse) with the fine z drawn by
    inverse-CDF at the supplied uniforms (stop-gradient on the weights, as
    the torch side detaches).  Returns (loss, fine_mse) like the torch side.
    """
    S = cfg.num_samples
    emb = None
    if cfg.use_appearance:
        emb = jnp.broadcast_to(params["appearance_row"][None, None, :],
                               z.shape + (cfg.appearance_dim,))[:, :S]
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
    rgb_s, sigma = nerf_apply(params["model"], cfg, pts, dirs, emb)
    out = composite(rgb_s, sigma, z)
    mse_c = jnp.mean((out["rgb"] - tgt) ** 2)
    if cfg.num_importance == 0:
        return mse_c, mse_c

    w = jax.lax.stop_gradient(out["weights"])
    ni = cfg.num_importance
    u = jnp.linspace(0.0, 1.0, ni + 1, dtype=z.dtype)[:-1] + u_jit / ni
    z_fine = sample_pdf(None, jax.lax.stop_gradient(z), w, ni, u=u)
    z_all, pts = combine_z(ro, rd, jax.lax.stop_gradient(z), z_fine)
    dirs = jnp.broadcast_to(rd[:, None, :], pts.shape)
    emb_all = None
    if cfg.use_appearance:
        emb_all = jnp.broadcast_to(params["appearance_row"][None, None, :],
                                   z_all.shape + (cfg.appearance_dim,))
    rgb_s, sigma = nerf_apply(params["model"], cfg, pts, dirs, emb_all)
    out_f = composite(rgb_s, sigma, z_all)
    mse_f = jnp.mean((out_f["rgb"] - tgt) ** 2)
    return mse_f + cfg.coarse_loss_weight * mse_c, mse_f


def _step_fn(cfg: NeRFConfig, opt):
    """One optimizer step over host-supplied batch data (paired mode)."""

    def step(params, opt_state, ro, rd, tgt, emb_row_idx, z, u_jit):
        def loss_fn(p):
            p_loss = {"model": p["model"]}
            if cfg.use_appearance:
                p_loss["appearance_row"] = p["appearance"][emb_row_idx]
            return _loss(p_loss, cfg, ro, rd, z, tgt, u_jit)

        # The appearance row is indexed INSIDE loss_fn so autodiff scatters
        # its cotangent into the (N, app_dim) table — the torch side's Adam
        # sees the same: a gradient on one row, zeros elsewhere.
        (loss, mse_f), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse_f

    return step


def train_mirror(cfg: NeRFConfig, images, c2ws, focal, iters: int,
                 seed: int = 0, init: Optional[dict] = None,
                 chunk: int = 250, log_every: int = 500, on_log=None):
    """Train the reference semantics on the current JAX backend.

    images: (N, H, W, 3) float32 in [0, 1]; c2ws: (N, 4, 4).
    init: export_init() snapshot; defaults to sample_torch_init(cfg, N, seed).
    Returns (params, mses: list[float]).
    """
    assert not cfg.use_bf16, "the mirror is the f32 reference arm"
    from benchmarks.torch_reference import (make_step_inputs, ray_grid,
                                            rays_from_c2w)
    import torch

    n_images, height, width = images.shape[:3]
    n_pixels = height * width
    g = np.random.default_rng(seed)

    if init is None:
        init = sample_torch_init(cfg, n_images, seed)
    params = torch_init_to_params(init, cfg)

    # Ray grids computed BY TORCH on the host (zero drift vs the torch side).
    cam = ray_grid(height, width, focal)
    ro_all, rd_all = [], []
    for i in range(n_images):
        ro, rd = rays_from_c2w(cam, torch.tensor(np.asarray(c2ws[i], np.float32)))
        ro_all.append(ro.numpy())
        rd_all.append(rd.numpy())
    ro_all = jnp.asarray(np.stack(ro_all))   # (N, P, 3)
    rd_all = jnp.asarray(np.stack(rd_all))
    imgs_flat = jnp.asarray(images.reshape(n_images, n_pixels, 3))

    # Stratified bin bounds (constants; torch side computes the same).
    t_lin = np.linspace(0.0, 1.0, cfg.num_samples, dtype=np.float32)
    z0 = cfg.near + t_lin * (cfg.far - cfg.near)
    mids = 0.5 * (z0[1:] + z0[:-1])
    upper = jnp.asarray(np.concatenate([mids, z0[-1:]]))
    lower = jnp.asarray(np.concatenate([z0[:1], mids]))

    opt = optax.adam(lr_schedule(cfg))
    opt_state = opt.init(params)
    step = _step_fn(cfg, opt)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, img_idx, sel, jitter, u_jit):
        def body(carry, xs):
            params, opt_state = carry
            ii, ss, jj, uu = xs
            ro = ro_all[ii][ss]
            rd = rd_all[ii][ss]
            tgt = imgs_flat[ii][ss]
            z = lower + (upper - lower) * jj
            params, opt_state, loss, mse_f = step(
                params, opt_state, ro, rd, tgt, ii, z, uu)
            return (params, opt_state), mse_f

        (params, opt_state), mses = jax.lax.scan(
            body, (params, opt_state), (img_idx, sel, jitter, u_jit))
        return params, opt_state, mses

    step_1 = jax.jit(step, donate_argnums=(0, 1))

    mses: list = []
    with jax.default_matmul_precision("highest"):
        it = 0
        # warmup: batch 64 for the first warmup_iters (src/train.py:26,56-58)
        while it < min(cfg.warmup_iters, iters):
            bs, ii, ss, jj, uu = make_step_inputs(g, it, cfg, n_images, n_pixels)
            z = lower + (upper - lower) * jnp.asarray(jj)
            params, opt_state, loss, mse_f = step_1(
                params, opt_state, ro_all[ii][jnp.asarray(ss)],
                rd_all[ii][jnp.asarray(ss)], imgs_flat[ii][jnp.asarray(ss)],
                ii, z,
                jnp.asarray(uu) if uu is not None else jnp.zeros((bs, 1)))
            mses.append(mse_f)
            it += 1
        while it < iters:
            k = min(chunk, iters - it)
            cols = [[], [], [], []]
            for j in range(k):
                bs, ii, ss, jj, uu = make_step_inputs(
                    g, it + j, cfg, n_images, n_pixels)
                for c, v in zip(cols, (ii, ss, jj,
                                       uu if uu is not None
                                       else np.zeros((bs, 1), np.float32))):
                    c.append(v)
            params, opt_state, mse_arr = run_chunk(
                params, opt_state,
                jnp.asarray(np.asarray(cols[0], np.int32)),
                jnp.asarray(np.stack(cols[1]).astype(np.int32)),
                jnp.asarray(np.stack(cols[2])),
                jnp.asarray(np.stack(cols[3])))
            mses.extend(np.asarray(mse_arr).tolist())
            it += k
            if on_log is not None and log_every and it % log_every < chunk:
                on_log(it, float(-10.0 * np.log10(
                    np.mean([float(m) for m in mses[-100:]]))))
    mses = [float(m) for m in mses]
    return params, mses
