"""Training: one fused, donated, jitted step.

Reference semantics (/root/reference/src/train.py:13-207): Adam over model
params + appearance embeddings, lr 5e-4 halved every 10k steps (StepLR), MSE
loss over a 1024-ray batch (64 for the first 5 warmup steps), PSNR logging,
checkpoints every 1000 iterations.

TPU-native differences:
- the batch is SAMPLED INSIDE the jitted step from the HBM-resident ray pool
  (no per-step host->device copies; the reference crosses the device boundary
  twice per iteration — SURVEY.md §3.1),
- ``donate_argnums`` on the train state so Adam's moments update in place,
- the LR schedule is an optax ``exponential_decay(staircase=True)``, which is
  exactly StepLR's ``lr * gamma^floor(step/step_size)``,
- checkpoints carry the FULL state (params, opt state, step, PRNG key) and
  training can actually resume (the reference cannot — SURVEY.md §5.4).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data.dataset import RayDataset, sample_ray_batch
from danerf_tpu.models.nerf import init_appearance_embeddings, init_nerf_params
from danerf_tpu.render.renderer import render_rays
from danerf_tpu.train.metrics import MetricsLogger, psnr


class TrainState(NamedTuple):
    params: Any          # {"model": ..., optional "appearance": (N, app_dim)}
    opt_state: Any
    step: jnp.ndarray    # int32 scalar
    key: jnp.ndarray     # PRNG key


def lr_schedule(cfg: NeRFConfig):
    """StepLR equivalent (reference config.py:22-25, src/train.py:42-44,95-96)."""
    return optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.scheduler_step_size,
        decay_rate=cfg.scheduler_gamma,
        staircase=True,
    )


def make_optimizer(cfg: NeRFConfig):
    # optax.flatten turns ~40 tiny per-leaf update kernels into one fused
    # elementwise pass over a single contiguous vector (measured ~2x faster
    # per step on v5e for this 532k-param model).
    return optax.flatten(optax.adam(lr_schedule(cfg)))


def create_train_state(key, cfg: NeRFConfig, n_images: int) -> TrainState:
    k_model, k_app, k_train = jax.random.split(key, 3)
    params = {"model": init_nerf_params(k_model, cfg)}
    if cfg.use_appearance:
        params["appearance"] = init_appearance_embeddings(k_app, n_images, cfg.appearance_dim)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.asarray(0, jnp.int32), key=k_train)


def loss_fn(params, cfg: NeRFConfig, key, batch):
    """MSE on rendered rgb vs target (reference src/train.py:87), plus the
    coarse auxiliary term when the hierarchical pass is active."""
    emb = None
    if cfg.use_appearance:
        emb = params["appearance"][batch["img_idx"]]
    # White-background targets (pool composited over white,
    # RayDataset.device_arrays) need the render composited over white too —
    # reference RGBA convention, src/dataset.py:159-161.
    bg = (1.0, 1.0, 1.0) if cfg.white_background else None
    out = render_rays(params["model"], cfg, key, batch["rays_o"], batch["rays_d"],
                      appearance_embedding=emb, t=batch.get("t"), perturb=True,
                      background_color=bg,
                      fused_composite=cfg.use_pallas and cfg.use_fused_train)
    loss = jnp.mean((out["rgb"] - batch["rgb"]) ** 2)
    aux = {"mse": loss}
    if "coarse_rgb" in out and cfg.coarse_loss_weight > 0:
        coarse = jnp.mean((out["coarse_rgb"] - batch["rgb"]) ** 2)
        loss = loss + cfg.coarse_loss_weight * coarse
        aux["coarse_mse"] = coarse
    return loss, aux


def _onepass_loss_grads(params, cfg: NeRFConfig, key, batch):
    """Single-kernel fused loss + gradients (coarse-only Pallas train path).

    The custom-VJP route runs the forward kernel for the loss value and then a
    backward kernel that RECOMPUTES the forward (4x forward matmul FLOPs);
    since the training loss is just MSE against the batch targets (reference
    src/train.py:87), kernels/fused_render._train_kernel computes loss AND
    gradients in one pass (3x).  Numerics match value_and_grad(loss_fn) up to
    f32 accumulation order (asserted in tests/test_kernels.py).
    """
    from danerf_tpu.kernels.fused_render import fused_train_loss_grads
    from danerf_tpu.ops.sampling import sample_stratified

    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = cfg.near, cfg.far
    if cfg.scene_aabb is not None:
        from danerf_tpu.ops.sampling import ray_aabb_bounds

        box = cfg.scene_aabb
        near, far = ray_aabb_bounds(rays_o, rays_d, box[:3], box[3:],
                                    cfg.near, cfg.far)
    # Same key split as render_rays so the one-pass and VJP paths draw
    # identical stratified jitter.
    k_strat, _ = jax.random.split(key)
    z_vals, _ = sample_stratified(k_strat, rays_o, rays_d, near, far,
                                  cfg.num_samples, perturb=True)
    emb = None
    if cfg.use_appearance:
        emb = params["appearance"][batch["img_idx"]]
    mse, model_grads, demb = fused_train_loss_grads(
        params["model"], cfg, rays_o, rays_d, z_vals, batch["rgb"], emb)
    grads = {"model": model_grads}
    if cfg.use_appearance:
        grads["appearance"] = jnp.zeros_like(
            params["appearance"]).at[batch["img_idx"]].add(demb)
    return (mse, {"mse": mse}), grads


def _onepass_hier_loss_grads(params, cfg: NeRFConfig, key, batch):
    """Hierarchical single-pass training: the merged fine stage computes its
    MSE and backward in one kernel (kernels/fused_render._merged_train_kernel,
    no forward recompute), emitting the coarse-field cotangent; the coarse
    pass stays on its custom VJP, fed that cotangent plus the coarse rgb loss
    term.  Total gradient matches autodiff of mse(fine) + w*mse(coarse)."""
    from danerf_tpu.kernels.fused_render import (
        fused_hier_train_loss_grads, fused_render_rays_coarse_field)
    from danerf_tpu.ops.sampling import sample_pdf, sample_stratified

    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = cfg.near, cfg.far
    if cfg.scene_aabb is not None:
        from danerf_tpu.ops.sampling import ray_aabb_bounds

        box = cfg.scene_aabb
        near, far = ray_aabb_bounds(rays_o, rays_d, box[:3], box[3:],
                                    cfg.near, cfg.far)
    k_strat, k_imp = jax.random.split(key)
    z_c, _ = sample_stratified(k_strat, rays_o, rays_d, near, far,
                               cfg.num_samples, perturb=True)
    emb = None
    if cfg.use_appearance:
        emb = params["appearance"][batch["img_idx"]]

    if emb is not None:
        coarse, coarse_vjp = jax.vjp(
            lambda pm, e: fused_render_rays_coarse_field(
                pm, cfg, rays_o, rays_d, z_c, e), params["model"], emb)
    else:
        coarse, coarse_vjp = jax.vjp(
            lambda pm: fused_render_rays_coarse_field(
                pm, cfg, rays_o, rays_d, z_c, None), params["model"])

    weights = jax.lax.stop_gradient(coarse["weights"])
    z_f = jax.lax.stop_gradient(
        sample_pdf(k_imp, z_c, weights, cfg.num_importance, perturb=True))

    mse_fine, grads_f, demb_f, g_field = fused_hier_train_loss_grads(
        params["model"], cfg, rays_o, rays_d, z_c, coarse["field"], z_f,
        batch["rgb"], emb)

    n = batch["rgb"].shape[0]
    cw = cfg.coarse_loss_weight
    diff_c = coarse["rgb"] - batch["rgb"]
    mse_coarse = jnp.mean(diff_c ** 2)
    cot = {
        "rgb": (2.0 * cw / (n * 3.0)) * diff_c,
        "depth": jnp.zeros_like(coarse["depth"]),
        "acc": jnp.zeros_like(coarse["acc"]),
        "weights": jnp.zeros_like(coarse["weights"]),
        "field": g_field,
    }
    if emb is not None:
        grads_c, demb_c = coarse_vjp(cot)
        demb = demb_f + demb_c
    else:
        (grads_c,) = coarse_vjp(cot)
        demb = demb_f
    model_grads = jax.tree.map(jnp.add, grads_f, grads_c)

    loss = mse_fine + cw * mse_coarse
    grads = {"model": model_grads}
    if cfg.use_appearance:
        grads["appearance"] = jnp.zeros_like(
            params["appearance"]).at[batch["img_idx"]].add(demb)
    return (loss, {"mse": mse_fine, "coarse_mse": mse_coarse}), grads


def _onepass_hier_fused_loss_grads(params, cfg: NeRFConfig, key, batch):
    """Hierarchical training as ONE kernel: coarse march + in-kernel
    inverse-CDF resample + merged fine stage + both MSE terms + full backward
    share a VMEM tile (kernels/fused_render._hier_onepass_kernel).  Keeping
    the coarse residuals alive across the fine stage removes the coarse
    forward recompute the two-kernel path pays (6x vs 7x forward-matmul
    FLOPs).  Gradients match _onepass_hier_loss_grads up to the f32
    summation order of the in-kernel CDF cumsum."""
    from danerf_tpu.kernels.fused_render import fused_hier_onepass_train
    from danerf_tpu.ops.sampling import importance_uniforms, sample_stratified

    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = cfg.near, cfg.far
    if cfg.scene_aabb is not None:
        from danerf_tpu.ops.sampling import ray_aabb_bounds

        box = cfg.scene_aabb
        near, far = ray_aabb_bounds(rays_o, rays_d, box[:3], box[3:],
                                    cfg.near, cfg.far)
    # Same key split as the two-kernel path: identical stratified jitter and
    # identical importance uniforms (they depend only on the key, not on the
    # coarse weights — the CDF inversion itself happens in-kernel).
    k_strat, k_imp = jax.random.split(key)
    z_c, _ = sample_stratified(k_strat, rays_o, rays_d, near, far,
                               cfg.num_samples, perturb=True)
    u = importance_uniforms(k_imp, z_c.shape[:-1], cfg.num_importance,
                            perturb=True, dtype=z_c.dtype)
    emb = None
    if cfg.use_appearance:
        emb = params["appearance"][batch["img_idx"]]

    mse_fine, mse_coarse, model_grads, demb = fused_hier_onepass_train(
        params["model"], cfg, rays_o, rays_d, z_c, u, batch["rgb"], emb)

    loss = mse_fine + cfg.coarse_loss_weight * mse_coarse
    grads = {"model": model_grads}
    if cfg.use_appearance:
        grads["appearance"] = jnp.zeros_like(
            params["appearance"]).at[batch["img_idx"]].add(demb)
    return (loss, {"mse": mse_fine, "coarse_mse": mse_coarse}), grads


def use_onepass(cfg: NeRFConfig) -> bool:
    """True when the single-pass fused train kernels serve this config.

    White-background configs take the custom-VJP route instead: the one-pass
    kernels compute the MSE in-kernel against raw composited rgb, with no
    background fill for acc<1 rays — loss_fn adds the white background on
    the XLA side (reference RGBA convention, src/dataset.py:159-161)."""
    return (cfg.use_pallas and cfg.use_fused_train and not cfg.use_time
            and not cfg.white_background)


def compute_loss_and_grads(params, cfg: NeRFConfig, key, batch):
    """Loss + grads via the fastest path the config allows (shared by the
    single-device and mesh-sharded train steps)."""
    if use_onepass(cfg):
        if cfg.num_importance > 0:
            if cfg.use_hier_onepass:
                return _onepass_hier_fused_loss_grads(params, cfg, key, batch)
            return _onepass_hier_loss_grads(params, cfg, key, batch)
        return _onepass_loss_grads(params, cfg, key, batch)
    return jax.value_and_grad(loss_fn, has_aux=True)(params, cfg, key, batch)


def make_train_step(cfg: NeRFConfig, height: int, width: int, focal: float,
                    batch_size: Optional[int] = None, steps_per_call: int = 1):
    """Build the jitted train step.

    Returned fn: (state, pool) -> (state, metrics); ``pool`` is the dict from
    RayDataset.device_arrays.  The state is donated.

    steps_per_call > 1 runs that many optimizer steps inside one device
    program (metrics are from the last step), amortizing the per-dispatch
    overhead.  The loop is a lax.fori_loop, NOT lax.scan: scan's stacked
    outputs stall the remote AOT compiler when the body contains the Pallas
    custom VJP (>12 min at length 10), while the fori form compiles in ~90 s
    and runs 3.1 ms/step (329k rays/s) vs ~9 ms dispatched singly.
    """
    opt = make_optimizer(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, pool):
        def one_step(state: TrainState):
            k_batch, k_render, k_next = jax.random.split(state.key, 3)
            batch = sample_ray_batch(k_batch, pool, cfg, height, width, focal,
                                     batch_size=batch_size)
            (loss, aux), grads = compute_loss_and_grads(
                state.params, cfg, k_render, batch)
            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, "psnr": psnr(aux["mse"]), **aux}
            return TrainState(params, opt_state, state.step + 1, k_next), metrics

        state, metrics = one_step(state)
        if steps_per_call > 1:
            state, metrics = jax.lax.fori_loop(
                0, steps_per_call - 1,
                lambda i, carry: one_step(carry[0]),
                (state, metrics))
        return state, metrics

    return train_step


def train(cfg: NeRFConfig, dataset: RayDataset, save_dir: str = "checkpoints",
          resume: bool = False, log_path: Optional[str] = None,
          checkpoint_every: int = 1000, eval_every: int = 1,
          num_iterations: Optional[int] = None, seed: int = 0,
          mesh=None, progress: bool = True, steps_per_call: int = 10):
    """Full training loop (reference ``train_nerf``, src/train.py:13-207).

    Returns (state, logger).  With ``mesh``, state/pool are sharded via
    danerf_tpu.parallel (params replicated, batch sharded over 'data').
    """
    import os

    from danerf_tpu.utils.checkpoint import (latest_checkpoint, restore_checkpoint,
                                             save_checkpoint)

    os.makedirs(save_dir, exist_ok=True)
    if cfg.use_time and getattr(dataset, "times", None) is None:
        raise ValueError(
            "cfg.use_time=True but the dataset has no per-image times; "
            "AnimatedNeRF needs a time channel (RayDataset.times). The "
            "procedural time-varying scene provides one "
            "(danerf_tpu.data.synthetic.make_time_varying_scene); Blender "
            "scenes do not.")
    n_iters = num_iterations if num_iterations is not None else cfg.num_iterations

    state = create_train_state(jax.random.key(seed), cfg, dataset.n_images)
    start_step = 0
    if resume:
        path = latest_checkpoint(save_dir)
        if path is not None:
            restored, meta = restore_checkpoint(path, state)
            state = jax.tree_util.tree_map(jnp.asarray, restored)
            state = TrainState(*state)
            start_step = int(state.step)

    if mesh is not None:
        from danerf_tpu.parallel.mesh import (make_sharded_train_step,
                                              replicate_pool, shard_train_state)
        tp = cfg.mesh_model > 1
        pool = replicate_pool(dataset.device_arrays(cfg.white_background), mesh)
        state = shard_train_state(state, mesh, tensor_parallel=tp)
        mk = partial(make_sharded_train_step, cfg, mesh, dataset.height,
                     dataset.width, dataset.focal, tensor_parallel=tp)
        # same fori_loop step chunking as the single-device path: the mesh
        # path pays the same ~1.9 ms dispatch floor per call otherwise
        step_full = mk(steps_per_call=steps_per_call)
        step_single = mk()
        step_warm = mk(batch_size=min(cfg.warmup_batch_size, cfg.batch_size))
    else:
        pool = dataset.device_arrays(cfg.white_background)
        step_full = make_train_step(cfg, dataset.height, dataset.width,
                                    dataset.focal, steps_per_call=steps_per_call)
        step_single = make_train_step(cfg, dataset.height, dataset.width, dataset.focal)
        step_warm = make_train_step(cfg, dataset.height, dataset.width, dataset.focal,
                                    batch_size=min(cfg.warmup_batch_size, cfg.batch_size))

    logger = MetricsLogger(log_path)
    t0 = time.time()
    metrics = {}
    i = start_step
    last_logged = start_step
    last_progress = start_step
    # Metric fetches are buffered as device arrays and converted to floats
    # only at progress/checkpoint boundaries: a float() per dispatch blocks
    # on a full host<->device round trip (the TPU here is behind a remote
    # tunnel — measured 3.8x end-to-end slowdown on a slow-tunnel day).
    pending: list = []

    def _flush_logs():
        for j, m in pending:
            logger.log(j, **{k: float(v) for k, v in m.items()})
        pending.clear()

    while i < n_iters:
        # Reference warms up with batch 64 for the first 5 iterations
        # (src/train.py:26,56-58).
        if i < cfg.warmup_iters:
            state, metrics = step_warm(state, pool)
            i += 1
        else:
            # advance in scan chunks, never crossing a checkpoint boundary
            k = min(steps_per_call, n_iters - i)
            if checkpoint_every:
                k = min(k, checkpoint_every - i % checkpoint_every)
            if k == steps_per_call:
                state, metrics = step_full(state, pool)
            else:
                for _ in range(k):
                    state, metrics = step_single(state, pool)
            i += k

        # i advances in steps_per_call chunks offset by the 5-iter warmup, so
        # an ``i % 10 == 0`` test would (almost) never fire; log by distance.
        if i - last_logged >= 10 or i == n_iters:
            last_logged = i
            pending.append((i, metrics))
            # like last_logged: i advances in warmup-offset chunks, so a
            # modulo test would rarely fire — print by distance instead
            if progress and (i - last_progress >= 1000 or i == n_iters):
                last_progress = i
                _flush_logs()
                m = {k: float(v) for k, v in metrics.items()}
                rays_s = cfg.batch_size * i / max(time.time() - t0, 1e-9)
                print(f"step {i}/{n_iters} loss={m['loss']:.5f} "
                      f"psnr={m['psnr']:.2f} rays/s={rays_s:,.0f}")

        if checkpoint_every and i % checkpoint_every == 0:
            _flush_logs()
            save_checkpoint(save_dir, f"checkpoint_{i:06d}", state,
                            {"step": i, **{k: float(v) for k, v in metrics.items()}})
            if eval_every:
                _save_validation_render(state, cfg, dataset, save_dir, i)

    _flush_logs()
    save_checkpoint(save_dir, "checkpoint_final", state,
                    {"step": n_iters, **{k: float(v) for k, v in metrics.items()}})
    _save_training_curves(logger, save_dir)
    logger.close()
    return state, logger


def _save_validation_render(state, cfg, dataset, save_dir, step,
                            max_size: int = 128):
    """Periodic validation render (reference src/train.py:127-173 renders a
    1000-ray strip; here it's a full low-res view of the last image)."""
    import os

    import numpy as np

    from danerf_tpu.render.renderer import render_frame
    from danerf_tpu.viz.depth import colorize_depth

    try:
        from PIL import Image

        scale = max(1, max(dataset.height, dataset.width) // max_size)
        h, w = dataset.height // scale, dataset.width // scale
        params = state.params
        emb = None
        if cfg.use_appearance and "appearance" in params:
            emb = params["appearance"][dataset.n_images - 1]
        rgb, depth, _ = render_frame(
            params["model"], cfg, jax.random.key(0), dataset.c2ws[-1],
            h, w, dataset.focal / scale, appearance_embedding=emb,
            n_importance=cfg.num_importance, perturb=False)
        rgb_u8 = np.clip(np.asarray(rgb) * 255, 0, 255).astype(np.uint8)
        strip = np.concatenate([rgb_u8, colorize_depth(np.asarray(depth))], axis=1)
        Image.fromarray(strip).save(os.path.join(save_dir, f"render_{step:06d}.png"))
    except Exception as e:  # eval renders must never kill training
        print(f"validation render failed at step {step}: {e}")


def _save_training_curves(logger: MetricsLogger, save_dir: str):
    """Loss/PSNR curves (reference src/train.py:189-204)."""
    import os

    if not logger.history:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [r["step"] for r in logger.history]
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].plot(steps, [r.get("loss") for r in logger.history])
        axes[0].set_title("Training Loss")
        axes[0].set_xlabel("Iteration")
        axes[1].plot(steps, [r.get("psnr") for r in logger.history])
        axes[1].set_title("Training PSNR")
        axes[1].set_xlabel("Iteration")
        fig.tight_layout()
        fig.savefig(os.path.join(save_dir, "training_curves.png"))
        plt.close(fig)
    except Exception as e:
        print(f"training-curve plot failed: {e}")
