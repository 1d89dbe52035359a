"""Statistical training-equivalence vs the reference semantics.

BASELINE.json's parity bar is "PSNR within 0.1 dB of the reference trained
under the same config".  Exact trajectories can't match across frameworks
(different PRNGs — SURVEY.md §7 'hard parts'), so this asserts the
*statistical* form on a scaled-down config: a torch implementation of the
reference's training semantics (model src/models.py:57-162, sampling
src/ray_utils.py:52-88, compositing src/render.py:56-80, loop
src/train.py:54-104 — re-derived from the cited formulas, not copied) and our
JAX trainer, trained on the same procedural scene, must converge to PSNRs
within a small band.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from danerf_tpu.config import NeRFConfig
from danerf_tpu.data import make_synthetic_scene
from danerf_tpu.train import create_train_state, make_train_step

CFG = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                 num_samples=16, num_importance=0, batch_size=256,
                 use_bf16=False, use_appearance=False, learning_rate=5e-4,
                 pos_enc_levels=6, dir_enc_levels=2)
ITERS = 350


def _torch_train(scene, iters=ITERS, seed=0):
    """Reference-semantics trainer in torch (formulas cited in module doc)."""
    torch.manual_seed(seed)
    g = np.random.default_rng(seed)

    def enc(x, L):
        outs = [x]
        for i in range(L):
            f = 2.0 ** i
            outs += [torch.sin(f * x), torch.cos(f * x)]
        return torch.cat(outs, -1)

    pe, de = CFG.pos_enc_levels, CFG.dir_enc_levels
    pdim, ddim = 3 * (1 + 2 * pe), 3 * (1 + 2 * de)
    H = CFG.hidden_dim

    layers = torch.nn.ModuleList()
    layers.append(torch.nn.Linear(pdim, H))
    for i in range(1, CFG.num_layers):
        inp = H + pdim if i in CFG.skip_connect_layers else H
        layers.append(torch.nn.Linear(inp, H))
    density = torch.nn.Linear(H, 1)
    dirl = torch.nn.Linear(H + ddim, H // 2)
    rgbl = torch.nn.Linear(H // 2, 3)
    params = (list(layers.parameters()) + list(density.parameters())
              + list(dirl.parameters()) + list(rgbl.parameters()))
    opt = torch.optim.Adam(params, lr=CFG.learning_rate)

    imgs = torch.tensor(scene.images.astype(np.float32) / 255.0)
    c2ws = torch.tensor(scene.c2ws)
    Hh, Ww, focal = scene.height, scene.width, scene.focal

    # full-image ray grids per image (precomputed; reference recomputes)
    i_grid, j_grid = torch.meshgrid(torch.arange(Hh, dtype=torch.float32),
                                    torch.arange(Ww, dtype=torch.float32),
                                    indexing="ij")
    cam = torch.stack([(j_grid - Ww * 0.5) / focal,
                       -(i_grid - Hh * 0.5) / focal,
                       -torch.ones_like(i_grid)], -1)

    def model(pts, dirs):
        ex, ed = enc(pts, pe), enc(dirs, de)
        h = ex
        for i, lin in enumerate(layers):
            if i in CFG.skip_connect_layers and i > 0:
                h = torch.cat([h, ex], -1)
            h = torch.relu(lin(h))
        sig = torch.relu(density(h))[..., 0]
        hd = torch.relu(dirl(torch.cat([h, ed], -1)))
        return torch.sigmoid(rgbl(hd)), sig

    mses = []
    for it in range(iters):
        img_idx = int(g.integers(0, scene.n_images))
        dirs = torch.sum(cam[..., None, :] * c2ws[img_idx][:3, :3], -1)
        dirs = dirs / dirs.norm(dim=-1, keepdim=True)
        origins = c2ws[img_idx][:3, 3].expand_as(dirs)
        sel = g.choice(Hh * Ww, CFG.batch_size, replace=False)
        ro = origins.reshape(-1, 3)[sel]
        rd = dirs.reshape(-1, 3)[sel]
        tgt = imgs[img_idx].reshape(-1, 3)[sel]

        t = torch.linspace(0, 1, CFG.num_samples)
        z = CFG.near + t * (CFG.far - CFG.near)
        z = z.expand(CFG.batch_size, -1)
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = torch.cat([mids, z[..., -1:]], -1)
        lower = torch.cat([z[..., :1], mids], -1)
        z = lower + (upper - lower) * torch.rand_like(z)
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]

        rgb_s, sig = model(pts.reshape(-1, 3),
                           rd[:, None, :].expand(-1, CFG.num_samples, -1).reshape(-1, 3))
        rgb_s = rgb_s.reshape(CFG.batch_size, CFG.num_samples, 3)
        sig = sig.reshape(CFG.batch_size, CFG.num_samples)

        dists = torch.cat([z[..., 1:] - z[..., :-1],
                           torch.full_like(z[..., :1], 1e-3)], -1)
        alpha = 1 - torch.exp(-sig * dists)
        trans = torch.cumprod(
            torch.cat([torch.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1
        )[..., :-1]
        w = alpha * trans
        pred = torch.sum(w[..., None] * rgb_s, 1)

        loss = torch.mean((pred - tgt) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        mses.append(float(loss))
    return -10 * np.log10(np.mean(mses[-20:]))


def _jax_train(scene, iters=ITERS, seed=0):
    state = create_train_state(jax.random.key(seed), CFG, scene.n_images)
    pool = scene.device_arrays()
    step = make_train_step(CFG, scene.height, scene.width, scene.focal)
    mses = []
    for _ in range(iters):
        state, m = step(state, pool)
        mses.append(float(m["mse"]))
    return -10 * np.log10(np.mean(mses[-20:]))


@pytest.mark.slow
def test_trained_psnr_statistically_equivalent():
    scene = make_synthetic_scene("train", n_images=4, height=32, width=32)
    p_torch = _torch_train(scene)
    p_jax = _jax_train(scene)
    # both must learn, and land in the same band
    assert p_torch > 12 and p_jax > 12, (p_torch, p_jax)
    assert abs(p_torch - p_jax) < 2.5, (p_torch, p_jax)
