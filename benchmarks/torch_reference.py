"""Full-scale torch implementation of the reference's training semantics.

This is the comparison side of the BASELINE.json parity bar ("PSNR within
0.1 dB of the reference implementation trained under the same config").  The
reference repo ships no trained checkpoints and no recorded PSNR, so the
number has to be produced by *running* its semantics (SURVEY.md §6).  Every
formula here is re-derived from the cited reference lines, not copied:

- model: 8x256 trunk with skip-concat, ReLU density head, view-dir branch at
  hidden//2, appearance embedding projected and ADDED to the dir feature,
  sigmoid RGB (/root/reference/src/models.py:57-162);
- ray grid: ((j - W/2)/f, -(i - H/2)/f, -1) rotated by c2w
  (/root/reference/src/ray_utils.py:26-48);
- stratified sampling with in-bin jitter (/root/reference/src/ray_utils.py:52-88);
- compositing: alpha = 1 - exp(-sigma*dists) with the 1e-3 tail distance,
  exclusive-cumprod transmittance with the 1e-10 floor
  (/root/reference/src/render.py:56-80);
- loop: Adam over model params + per-image appearance embeddings, MSE loss,
  warmup batch 64 for the first 5 iters, StepLR(10k, 0.5), PSNR =
  -10*log10(MSE) (/root/reference/src/train.py:26-104, config.py:3-36).

The reference's live path is coarse-only (its hierarchical fine pass is
stubbed, /root/reference/src/render.py:83-86).  ``num_importance > 0``
additionally wires the fine pass the reference DECLARES (config.py:14,
src/ray_utils.py:90-149 ``sample_importance``): coarse weights -> inverse-CDF
resample -> union sort -> the same single model on the union -> loss =
mse(fine) + mse(coarse), matching this repo's default hierarchical loss
(danerf_tpu/train/trainer.py coarse_loss_weight) so hier-vs-hier parity has an
external torch anchor.

RNG protocol (shared with benchmarks/jax_reference.py so the two trainers can
be trajectory-PAIRED): all per-step randomness is drawn from ONE
``np.random.default_rng(seed)`` in a fixed order —
  1. img_idx = g.integers(0, n_images)
  2. sel     = g.choice(H*W, bs, replace=False)
  3. jitter  = g.random((bs, num_samples), dtype=float32)     [stratified]
  4. u_jit   = g.random((bs, num_importance), dtype=float32)  [hier only]
The reference draws its jitter from torch.rand instead
(src/ray_utils.py:79,119) — same U[0,1) distribution, different stream;
drawing it from numpy preserves the semantics while making the torch and JAX
mirrors of this trainer byte-comparable step by step.

Used by examples/parity_chair.py; also runnable standalone for timing
(see baseline_torch.py for the throughput-only variant).
"""

from __future__ import annotations

import numpy as np
import torch


def encode(x: torch.Tensor, levels: int) -> torch.Tensor:
    """gamma(x) = [x, sin(2^i x), cos(2^i x)] (reference src/models.py:6-54)."""
    outs = [x]
    for i in range(levels):
        f = 2.0 ** i
        outs += [torch.sin(f * x), torch.cos(f * x)]
    return torch.cat(outs, -1)


class ReferenceNeRF(torch.nn.Module):
    """The reference MLP (src/models.py:57-162), dims driven by a NeRFConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        pdim = 3 * (1 + 2 * cfg.pos_enc_levels)
        ddim = 3 * (1 + 2 * cfg.dir_enc_levels)
        H = cfg.hidden_dim
        self.layers = torch.nn.ModuleList([torch.nn.Linear(pdim, H)])
        for i in range(1, cfg.num_layers):
            inp = H + pdim if i in cfg.skip_connect_layers else H
            self.layers.append(torch.nn.Linear(inp, H))
        self.density = torch.nn.Linear(H, 1)
        self.dir_layer = torch.nn.Linear(H + ddim, H // 2)
        if cfg.use_appearance:
            self.app_proj = torch.nn.Linear(cfg.appearance_dim, H // 2)
        self.rgb_layer = torch.nn.Linear(H // 2, 3)

    def forward(self, pts, dirs, emb=None):
        cfg = self.cfg
        ex = encode(pts, cfg.pos_enc_levels)
        ed = encode(dirs, cfg.dir_enc_levels)
        h = ex
        for i, lin in enumerate(self.layers):
            if i in cfg.skip_connect_layers and i > 0:
                h = torch.cat([h, ex], -1)
            h = torch.relu(lin(h))
        sigma = torch.relu(self.density(h))[..., 0]
        hd = torch.relu(self.dir_layer(torch.cat([h, ed], -1)))
        if emb is not None:
            # projected and ADDED to the dir feature (src/models.py:146-156)
            hd = hd + self.app_proj(emb)
        return torch.sigmoid(self.rgb_layer(hd)), sigma


def composite(rgb_s, sigma, z):
    """Reference compositing (src/render.py:56-80): returns (rgb, depth, w)."""
    dists = torch.cat([z[..., 1:] - z[..., :-1],
                       torch.full_like(z[..., :1], 1e-3)], -1)
    alpha = 1.0 - torch.exp(-sigma * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        -1)[..., :-1]
    w = alpha * trans
    rgb = torch.sum(w[..., None] * rgb_s, -2)
    depth = torch.sum(w * z, -1) / (torch.sum(w, -1) + 1e-10)
    return rgb, depth, w


def ray_grid(height, width, focal):
    """Camera-frame pixel directions (src/ray_utils.py:26-28)."""
    i, j = torch.meshgrid(torch.arange(height, dtype=torch.float32),
                          torch.arange(width, dtype=torch.float32),
                          indexing="ij")
    return torch.stack([(j - width * 0.5) / focal,
                        -(i - height * 0.5) / focal,
                        -torch.ones_like(i)], -1)


def rays_from_c2w(cam, c2w):
    """Rotate camera dirs into the world + broadcast origins
    (src/ray_utils.py:40-48)."""
    dirs = torch.sum(cam[..., None, :] * c2w[:3, :3], -1)
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    origins = c2w[:3, 3].expand_as(dirs)
    return origins.reshape(-1, 3), dirs.reshape(-1, 3)


def sample_importance_z(z, weights, n_importance, u_jit):
    """Reference inverse-CDF importance sampling of new depths
    (src/ray_utils.py:105-139), with the per-bin jitter supplied by the
    caller (the numpy stream; distribution identical to the reference's
    torch.rand at :119).  Returns the UNION-SORTED depths (:142-144)."""
    eps = 1e-5
    w = weights + eps
    w = w / w.sum(dim=-1, keepdim=True)
    cdf = torch.cumsum(w, dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], dim=-1)

    u = torch.linspace(0.0, 1.0, n_importance + 1)[:-1]
    u = u.expand(list(cdf.shape[:-1]) + [n_importance])
    u = u + u_jit / n_importance

    inds = torch.searchsorted(cdf.contiguous(), u.contiguous())
    below = torch.clamp_min(inds - 1, 0)
    above = torch.clamp_max(inds, cdf.shape[-1] - 1)
    inds_g = torch.stack([below, above], dim=-1)
    cdf_g = torch.gather(
        cdf.unsqueeze(-2).expand(*cdf.shape[:-1], n_importance, cdf.shape[-1]),
        dim=-1, index=inds_g)
    z_g = torch.gather(
        z.unsqueeze(-2).expand(*z.shape[:-1], n_importance, z.shape[-1]),
        dim=-1, index=torch.clamp_max(inds_g, z.shape[-1] - 1))
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    z_fine = z_g[..., 0] + t * (z_g[..., 1] - z_g[..., 0])
    z_all, _ = torch.sort(torch.cat([z, z_fine], dim=-1), dim=-1)
    return z_all


def export_init(model, emb):
    """Snapshot the torch init as {name: np.ndarray} for the JAX mirror
    (benchmarks/jax_reference.torch_init_to_params)."""
    out = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    if emb is not None:
        out["appearance_embeddings"] = emb.detach().numpy().copy()
    return out


def make_step_inputs(g, it, cfg, n_images, n_pixels):
    """Draw one step's randomness from the shared numpy stream (module-doc
    RNG protocol).  Returns (bs, img_idx, sel, jitter, u_jit|None)."""
    bs = 64 if it < cfg.warmup_iters else cfg.batch_size
    img_idx = int(g.integers(0, n_images))
    sel = g.choice(n_pixels, bs, replace=False)
    jitter = g.random((bs, cfg.num_samples), dtype=np.float32)
    u_jit = (g.random((bs, cfg.num_importance), dtype=np.float32)
             if cfg.num_importance > 0 else None)
    return bs, img_idx, sel, jitter, u_jit


def train_reference(cfg, images, c2ws, focal, iters, seed=0, log_every=100,
                    on_log=None, use_compile=False, init_out=None,
                    on_checkpoint=None, checkpoint_every=0):
    """Train the reference semantics end to end; returns (model, emb, mses).

    images: (N, H, W, 3) float32 in [0, 1]; c2ws: (N, 4, 4).
    use_compile: torch.compile the fwd+loss (identical math modulo fusion
        reassociation; ~1.9x on this 2-vCPU host).
    init_out: optional dict populated with export_init() before training.
    on_checkpoint(it, model, emb, mses): periodic callback (partial reports).
    """
    torch.manual_seed(seed)
    g = np.random.default_rng(seed)
    n_images, height, width = images.shape[:3]

    model = ReferenceNeRF(cfg)
    emb = (torch.nn.Parameter(torch.randn(n_images, cfg.appearance_dim))
           if cfg.use_appearance else None)
    if init_out is not None:
        init_out.update(export_init(model, emb))
    params = list(model.parameters()) + ([emb] if emb is not None else [])
    opt = torch.optim.Adam(params, lr=cfg.learning_rate)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=cfg.scheduler_step_size, gamma=cfg.scheduler_gamma)

    imgs = torch.tensor(images)
    c2ws_t = torch.tensor(np.asarray(c2ws, np.float32))
    cam = ray_grid(height, width, focal)

    def fwd(ro, rd, z, e, tgt, u_jit):
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        dirs = rd[:, None, :].expand(-1, z.shape[-1], -1)
        rgb_s, sigma = model(pts, dirs,
                             e.expand(-1, z.shape[-1], -1) if e is not None
                             else None)
        pred, _, w = composite(rgb_s, sigma, z)
        loss = torch.mean((pred - tgt) ** 2)
        if cfg.num_importance > 0:
            # hierarchical fine pass the reference declares (config.py:14):
            # importance resample from coarse weights, union sort, SAME model
            z_all = sample_importance_z(z.detach(), w.detach(),
                                        cfg.num_importance, u_jit)
            pts = ro[:, None, :] + rd[:, None, :] * z_all[..., None]
            dirs = rd[:, None, :].expand(-1, z_all.shape[-1], -1)
            rgb_s, sigma = model(pts, dirs,
                                 e.expand(-1, z_all.shape[-1], -1)
                                 if e is not None else None)
            pred, _, _ = composite(rgb_s, sigma, z_all)
            # fine MSE + coarse auxiliary (danerf default coarse_loss_weight=1)
            loss_fine = torch.mean((pred - tgt) ** 2)
            return loss_fine + cfg.coarse_loss_weight * loss, loss_fine
        return loss, loss

    if use_compile:
        fwd = torch.compile(fwd, dynamic=True)

    t_lin = torch.linspace(0, 1, cfg.num_samples)
    mses = []
    for it in range(iters):
        # warmup batch 64 for the first 5 iters (src/train.py:26,56-58)
        bs, img_idx, sel, jitter, u_jit = make_step_inputs(
            g, it, cfg, n_images, height * width)
        ro, rd = rays_from_c2w(cam, c2ws_t[img_idx])
        sel_t = torch.from_numpy(np.ascontiguousarray(sel))
        ro, rd = ro[sel_t], rd[sel_t]
        tgt = imgs[img_idx].reshape(-1, 3)[sel_t]

        # stratified sampling with in-bin jitter (src/ray_utils.py:69-81);
        # jitter values come from the shared numpy stream (module doc)
        z = (cfg.near + t_lin * (cfg.far - cfg.near)).expand(bs, -1)
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = torch.cat([mids, z[..., -1:]], -1)
        lower = torch.cat([z[..., :1], mids], -1)
        z = lower + (upper - lower) * torch.from_numpy(jitter)

        e = emb[img_idx].expand(bs, 1, -1) if emb is not None else None
        loss, mse_fine = fwd(ro, rd, z, e, tgt,
                             torch.from_numpy(u_jit) if u_jit is not None
                             else None)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        mses.append(float(mse_fine.detach()))
        if on_log is not None and (it + 1) % log_every == 0:
            on_log(it + 1, -10.0 * np.log10(np.mean(mses[-log_every:])))
        if (on_checkpoint is not None and checkpoint_every
                and (it + 1) % checkpoint_every == 0):
            on_checkpoint(it + 1, model, emb, mses)
    return model, emb, mses


@torch.no_grad()
def render_image_reference(model, cfg, c2w, height, width, focal, emb_row=None,
                           chunk=4096, n_importance=0):
    """Full-image no-jitter render (reference run.py:212-228 chunk loop).

    n_importance > 0 renders hierarchically: deterministic bin-center
    uniforms (u + 0.5/n, the perturb=False convention shared with
    danerf_tpu.ops.sampling.importance_uniforms) invert the coarse CDF.
    """
    cam = ray_grid(height, width, focal)
    ro, rd = rays_from_c2w(cam, torch.tensor(np.asarray(c2w, np.float32)))
    out = []
    t = torch.linspace(0, 1, cfg.num_samples)
    for s in range(0, ro.shape[0], chunk):
        o, d = ro[s:s + chunk], rd[s:s + chunk]
        z = (cfg.near + t * (cfg.far - cfg.near)).expand(o.shape[0], -1)

        def field(zv):
            pts = o[:, None, :] + d[:, None, :] * zv[..., None]
            dirs = d[:, None, :].expand(-1, zv.shape[-1], -1)
            e = (emb_row.expand(o.shape[0], zv.shape[-1], -1)
                 if emb_row is not None else None)
            return model(pts, dirs, e)

        rgb_s, sigma = field(z)
        rgb, _, w = composite(rgb_s, sigma, z)
        if n_importance > 0:
            u_jit = torch.full((o.shape[0], n_importance), 0.5)
            z_all = sample_importance_z(z, w, n_importance, u_jit)
            rgb_s, sigma = field(z_all)
            rgb, _, _ = composite(rgb_s, sigma, z_all)
        out.append(rgb)
    return torch.cat(out).reshape(height, width, 3).numpy()
