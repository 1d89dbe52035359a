"""NumPy golden reference of the reference repo's math.

Independent re-derivation (NOT a copy) of the formulas used by
/root/reference/src/{models.py, ray_utils.py, render.py}, written against the
citations in SURVEY.md §2.  The JAX kernels must match these to fp32 tolerance
for both values and gradients.  Everything is straight NumPy on fp64 where
noted so the goldens themselves are trustworthy.
"""

from __future__ import annotations

import numpy as np


def positional_encoding(x: np.ndarray, L: int, include_input: bool = True) -> np.ndarray:
    """gamma(x)=[x, sin(2^0 x), cos(2^0 x), ...] (reference src/models.py:36-44)."""
    outs = [x] if include_input else []
    for i in range(L):
        f = 2.0 ** i
        outs.append(np.sin(f * x))
        outs.append(np.cos(f * x))
    return np.concatenate(outs, axis=-1)


def get_rays(height: int, width: int, focal: float, c2w: np.ndarray):
    """Pinhole ray grid (reference src/ray_utils.py:18-50)."""
    i, j = np.meshgrid(np.arange(height, dtype=np.float32),
                       np.arange(width, dtype=np.float32), indexing="ij")
    x = (j - width * 0.5) / focal
    y = -(i - height * 0.5) / focal
    z = -np.ones_like(x)
    dirs = np.stack([x, y, z], axis=-1)
    rot = c2w[:3, :3]
    # directions[..., None, :] * rot summed over last axis == dirs @ rot.T
    dirs = np.sum(dirs[..., None, :] * rot, axis=-1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, 3], dirs.shape)
    return origins, dirs


def sample_stratified(rays_o, rays_d, near, far, n_samples, t_rand=None):
    """Stratified depths (reference src/ray_utils.py:68-86).

    t_rand: optional (..., n_samples) uniforms; None => unperturbed midline.
    """
    t_vals = np.linspace(0.0, 1.0, n_samples, dtype=np.float64)
    z_vals = near + t_vals * (far - near)
    z_vals = np.broadcast_to(z_vals, rays_o.shape[:-1] + (n_samples,)).copy()
    if t_rand is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = np.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = np.concatenate([z_vals[..., :1], mids], axis=-1)
        z_vals = lower + (upper - lower) * t_rand
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return z_vals, pts


def sample_pdf(z_vals, weights, n_importance, u_rand=None):
    """Inverse-CDF sampling (reference src/ray_utils.py:105-139).

    u_rand: optional (..., n_importance) uniforms in [0,1); None => bin
    centers.  The reference's z-gather uses CDF indices directly, which can
    reach one past the end of z; like the build, we clamp into range (the
    reference path was never executed — SURVEY.md §1 L2).
    """
    eps = 1e-5
    w = weights + eps
    w = w / w.sum(axis=-1, keepdims=True)
    cdf = np.cumsum(w, axis=-1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], axis=-1)

    u = np.linspace(0.0, 1.0, n_importance + 1, dtype=np.float64)[:-1]
    u = np.broadcast_to(u, cdf.shape[:-1] + (n_importance,)).copy()
    if u_rand is not None:
        u = u + u_rand / n_importance
    else:
        u = u + 0.5 / n_importance

    inds = np.stack([np.searchsorted(c, uu, side="left")
                     for c, uu in zip(cdf.reshape(-1, cdf.shape[-1]),
                                      u.reshape(-1, n_importance))]).reshape(u.shape)
    below = np.maximum(inds - 1, 0)
    above = np.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = np.take_along_axis(cdf, below, axis=-1)
    cdf_a = np.take_along_axis(cdf, above, axis=-1)
    zmax = z_vals.shape[-1] - 1
    z_b = np.take_along_axis(z_vals, np.minimum(below, zmax), axis=-1)
    z_a = np.take_along_axis(z_vals, np.minimum(above, zmax), axis=-1)

    denom = cdf_a - cdf_b
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return z_b + t * (z_a - z_b)


def composite(rgb, sigma, z_vals):
    """Alpha compositing (reference src/render.py:56-80). fp64 in, fp64 out."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e-3)], axis=-1)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = np.sum(weights[..., None] * rgb, axis=-2)
    acc = np.sum(weights, axis=-1)
    depth_map = np.sum(weights * z_vals, axis=-1) / (acc + 1e-10)
    return rgb_map, depth_map, acc, weights


def nerf_mlp(params, cfg, x, d, emb=None):
    """Forward pass of the reference MLP (src/models.py:105-162) in NumPy.

    params: the build's pytree (w: (in,out), b: (out,)) converted to numpy.
    """
    enc_x = positional_encoding(x, cfg.pos_enc_levels)
    enc_d = positional_encoding(d, cfg.dir_enc_levels)

    h = enc_x
    for i, layer in enumerate(params["trunk"]):
        if i in cfg.skip_connect_layers and i > 0:
            h = np.concatenate([h, enc_x], axis=-1)
        h = np.maximum(h @ layer["w"] + layer["b"], 0.0)

    sigma = np.maximum(h @ params["density"]["w"] + params["density"]["b"], 0.0)[..., 0]

    h_dir = np.concatenate([h, enc_d], axis=-1)
    h_dir = np.maximum(h_dir @ params["dir"]["w"] + params["dir"]["b"], 0.0)
    if emb is not None and "appearance_proj" in params:
        h_dir = h_dir + emb @ params["appearance_proj"]["w"] + params["appearance_proj"]["b"]
    rgb = 1.0 / (1.0 + np.exp(-(h_dir @ params["rgb"]["w"] + params["rgb"]["b"])))
    return rgb, sigma
