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
stubbed, /root/reference/src/render.py:83-86), so this trainer is coarse-only
too — the parity config on our side sets num_importance=0 to match.

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


def train_reference(cfg, images, c2ws, focal, iters, seed=0, log_every=100,
                    on_log=None):
    """Train the reference semantics end to end; returns (model, emb, psnrs).

    images: (N, H, W, 3) float32 in [0, 1]; c2ws: (N, 4, 4).
    """
    torch.manual_seed(seed)
    g = np.random.default_rng(seed)
    n_images, height, width = images.shape[:3]

    model = ReferenceNeRF(cfg)
    emb = (torch.nn.Parameter(torch.randn(n_images, cfg.appearance_dim))
           if cfg.use_appearance else None)
    params = list(model.parameters()) + ([emb] if emb is not None else [])
    opt = torch.optim.Adam(params, lr=cfg.learning_rate)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=cfg.scheduler_step_size, gamma=cfg.scheduler_gamma)

    imgs = torch.tensor(images)
    c2ws_t = torch.tensor(np.asarray(c2ws, np.float32))
    cam = ray_grid(height, width, focal)

    mses = []
    for it in range(iters):
        # warmup batch 64 for the first 5 iters (src/train.py:26,56-58)
        bs = 64 if it < 5 else cfg.batch_size
        img_idx = int(g.integers(0, n_images))
        ro, rd = rays_from_c2w(cam, c2ws_t[img_idx])
        sel = g.choice(height * width, bs, replace=False)
        ro, rd = ro[sel], rd[sel]
        tgt = imgs[img_idx].reshape(-1, 3)[sel]

        # stratified sampling with in-bin jitter (src/ray_utils.py:69-81)
        t = torch.linspace(0, 1, cfg.num_samples)
        z = cfg.near + t * (cfg.far - cfg.near)
        z = z.expand(bs, -1)
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = torch.cat([mids, z[..., -1:]], -1)
        lower = torch.cat([z[..., :1], mids], -1)
        z = lower + (upper - lower) * torch.rand_like(z)

        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        dirs = rd[:, None, :].expand(-1, cfg.num_samples, -1)
        e = (emb[img_idx].expand(bs, cfg.num_samples, -1)
             if emb is not None else None)
        rgb_s, sigma = model(pts, dirs, e)
        pred, _, _ = composite(rgb_s, sigma, z)

        loss = torch.mean((pred - tgt) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        mses.append(float(loss))
        if on_log is not None and (it + 1) % log_every == 0:
            on_log(it + 1, -10.0 * np.log10(np.mean(mses[-log_every:])))
    return model, emb, mses


@torch.no_grad()
def render_image_reference(model, cfg, c2w, height, width, focal, emb_row=None,
                           chunk=4096):
    """Full-image no-jitter render (reference run.py:212-228 chunk loop)."""
    cam = ray_grid(height, width, focal)
    ro, rd = rays_from_c2w(cam, torch.tensor(np.asarray(c2w, np.float32)))
    out = []
    t = torch.linspace(0, 1, cfg.num_samples)
    for s in range(0, ro.shape[0], chunk):
        o, d = ro[s:s + chunk], rd[s:s + chunk]
        z = (cfg.near + t * (cfg.far - cfg.near)).expand(o.shape[0], -1)
        pts = o[:, None, :] + d[:, None, :] * z[..., None]
        dirs = d[:, None, :].expand(-1, cfg.num_samples, -1)
        e = (emb_row.expand(o.shape[0], cfg.num_samples, -1)
             if emb_row is not None else None)
        rgb_s, sigma = model(pts, dirs, e)
        rgb, _, _ = composite(rgb_s, sigma, z)
        out.append(rgb)
    return torch.cat(out).reshape(height, width, 3).numpy()
