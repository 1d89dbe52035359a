"""Measure the torch reference-semantics train step on THIS host.

The reference publishes no numbers (SURVEY.md §6); bench.py's primary
baseline is derived from its only quantitative statement ("typically several
hours" for 30k iterations, README.md:147, read as 3 hours -> 2,844 rays/s).
This script replaces assumption with measurement where possible: it times a
faithful torch implementation of the reference's hot loop — the 8x256 NeRF MLP
(src/models.py:57-162), stratified sampling (src/ray_utils.py:52-88),
alpha compositing with the 1e-3 tail (src/render.py:56-80), MSE + Adam
(src/train.py:33-92) — at the reference batch (1024 rays x 64 samples) on the
CPU this environment provides (torch is CPU-only here; the reference's CUDA
GPU is unavailable, so this is the same-host floor, recorded as such).

Writes benchmarks/baseline_measured.json; bench.py reports a
``vs_torch_cpu_same_host`` ratio whenever that file exists.

Run:  python benchmarks/baseline_torch.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time

import numpy as np
import torch

H = 256          # hidden dim (reference config.py:10)
LAYERS = 8       # trunk depth (config.py:11)
SKIP = 4         # skip-concat layer (src/models.py:86-90)
L_POS, L_DIR = 10, 4   # encoding levels (config.py:32-33)
N_SAMPLES = 64   # coarse samples (config.py:13)
BATCH = 1024     # rays per step (config.py:21)
NEAR, FAR = 2.0, 6.0


def enc(x, L):
    outs = [x]
    for i in range(L):
        f = 2.0 ** i
        outs += [torch.sin(f * x), torch.cos(f * x)]
    return torch.cat(outs, -1)


def build_model():
    pdim = 3 * (1 + 2 * L_POS)
    ddim = 3 * (1 + 2 * L_DIR)
    layers = torch.nn.ModuleList()
    layers.append(torch.nn.Linear(pdim, H))
    for i in range(1, LAYERS):
        inp = H + pdim if i == SKIP else H
        layers.append(torch.nn.Linear(inp, H))
    density = torch.nn.Linear(H, 1)
    dirl = torch.nn.Linear(H + ddim, H // 2)
    rgbl = torch.nn.Linear(H // 2, 3)

    def model(pts, dirs):
        ex, ed = enc(pts, L_POS), enc(dirs, L_DIR)
        h = ex
        for i, lin in enumerate(layers):
            if i == SKIP:
                h = torch.cat([h, ex], -1)
            h = torch.relu(lin(h))
        sig = torch.relu(density(h))[..., 0]
        hd = torch.relu(dirl(torch.cat([h, ed], -1)))
        return torch.sigmoid(rgbl(hd)), sig

    params = (list(layers.parameters()) + list(density.parameters())
              + list(dirl.parameters()) + list(rgbl.parameters()))
    return model, params


def step_fn(model, params, opt, rays_o, rays_d, tgt):
    z = NEAR + torch.linspace(0, 1, N_SAMPLES) * (FAR - NEAR)
    z = z.expand(BATCH, N_SAMPLES)
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = torch.cat([mids, z[..., -1:]], -1)
    lower = torch.cat([z[..., :1], mids], -1)
    z = lower + (upper - lower) * torch.rand_like(z)
    pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
    dirs = rays_d[:, None].expand_as(pts)

    rgb_s, sig = model(pts.reshape(-1, 3), dirs.reshape(-1, 3))
    rgb_s = rgb_s.reshape(BATCH, N_SAMPLES, 3)
    sig = sig.reshape(BATCH, N_SAMPLES)
    dists = torch.cat([z[..., 1:] - z[..., :-1],
                       torch.full_like(z[..., :1], 1e-3)], -1)
    alpha = 1 - torch.exp(-sig * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1),
        -1)[..., :-1]
    w = alpha * trans
    pred = torch.sum(w[..., None] * rgb_s, 1)
    loss = torch.mean((pred - tgt) ** 2)
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    torch.manual_seed(0)
    model, params = build_model()
    opt = torch.optim.Adam(params, lr=5e-4)

    rays_o = torch.zeros(BATCH, 3) + torch.tensor([0.0, 0.0, 4.0])
    rays_d = torch.nn.functional.normalize(torch.randn(BATCH, 3), dim=-1)
    tgt = torch.rand(BATCH, 3)

    for _ in range(args.warmup):
        step_fn(model, params, opt, rays_o, rays_d, tgt)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step_fn(model, params, opt, rays_o, rays_d, tgt)
    dt = time.perf_counter() - t0
    rays_per_sec = BATCH * args.iters / dt

    result = {
        "metric": "torch_reference_semantics_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "device": "cpu",
        "torch_version": torch.__version__,
        "host": platform.machine(),
        "cpu_count": os.cpu_count(),
        "config": f"{LAYERS}x{H} MLP, {N_SAMPLES} samples, batch {BATCH}",
        "note": ("same-host CPU floor; the reference targeted an unspecified "
                 "CUDA GPU (README.md:147) — see bench.py for the documented "
                 "3-hour GPU derivation used as the primary baseline"),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "baseline_measured.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
