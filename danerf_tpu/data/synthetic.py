"""Procedural test scene: an analytic emission-absorption field rendered into a
pose-consistent multi-view dataset.

Neither this repo nor the reference ships the Blender scenes (the reference's
data directory holds only a README — /root/reference/data/nerf_synthetic).  For
tests, integration training, and benchmarks we therefore synthesize a scene
whose ground truth is *exactly* computable: a handful of Gaussian density blobs
with constant colors, volume-rendered with the same compositing math the model
is trained under (src/render.py:56-80 semantics).  Because the images are
genuinely 3D-consistent, a NeRF trained on them must drive PSNR up — the
integration-test bar from SURVEY.md §4.
"""

from __future__ import annotations

import functools

import numpy as np

from danerf_tpu.data.dataset import RayDataset


def _blob_field(seed: int):
    """Return (centers, radii, densities, colors) for a deterministic scene."""
    rng = np.random.default_rng(seed)
    k = 6
    centers = rng.uniform(-0.8, 0.8, size=(k, 3))
    radii = rng.uniform(0.25, 0.5, size=(k,))
    dens = rng.uniform(8.0, 20.0, size=(k,))
    colors = rng.uniform(0.1, 1.0, size=(k, 3))
    return centers, radii, dens, colors


def _blob_motion(seed: int):
    """Per-blob oscillation (amplitude vectors + phases) for the
    time-varying variant: center_i(t) = center_i + amp_i * sin(pi*t + ph_i).
    A HALF period over t in [0, 1], so the t=0 and t=1 configurations are
    maximally different (a full 2*pi period would make them identical).
    Deterministic in ``seed``."""
    rng = np.random.default_rng(seed + 77_000)
    k = 6
    amps = rng.uniform(-0.35, 0.35, size=(k, 3))
    phases = rng.uniform(0.0, 2 * np.pi, size=(k,))
    return amps, phases


def field_sigma_rgb(pts: np.ndarray, seed: int = 0, t: float | None = None):
    """Analytic density + color at points (..., 3).  With ``t`` the blob
    centers oscillate (AnimatedNeRF ground truth, cfg.use_time)."""
    centers, radii, dens, colors = _blob_field(seed)
    if t is not None:
        amps, phases = _blob_motion(seed)
        centers = centers + amps * np.sin(np.pi * t + phases)[:, None]
    d2 = np.sum((pts[..., None, :] - centers) ** 2, axis=-1)        # (..., k)
    w = dens * np.exp(-d2 / (2 * radii ** 2))                        # (..., k)
    sigma = np.sum(w, axis=-1)
    rgb = np.sum(w[..., None] * colors, axis=-2) / (sigma[..., None] + 1e-8)
    return sigma, np.clip(rgb, 0.0, 1.0)


def _render_gt(c2w: np.ndarray, H: int, W: int, focal: float,
               near: float, far: float, n_samples: int, seed: int,
               t: float | None = None):
    """Ground-truth render of the analytic field (reference compositing math)."""
    i, j = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing="ij")
    dirs = np.stack([(j - W * 0.5) / focal, -(i - H * 0.5) / focal,
                     -np.ones_like(i)], axis=-1)
    dirs = np.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, 3], dirs.shape)

    z = np.linspace(near, far, n_samples)
    pts = origins[..., None, :] + dirs[..., None, :] * z[:, None]    # (H,W,S,3)
    sigma, rgb = field_sigma_rgb(pts, seed, t)

    dists = np.diff(z)
    dists = np.concatenate([dists, [1e-3]])
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = np.sum(weights[..., None] * rgb, axis=-2)
    acc = np.sum(weights, axis=-1)
    return rgb_map, acc


@functools.lru_cache(maxsize=8)
def _gt_row_renderer(H: int, W: int, focal: float, near: float, far: float,
                     n_samples: int, seed: int, row_chunk: int):
    """Build (once per geometry) the jitted row-chunk GT renderer — cached so
    a 100-view scene compiles a single executable, not one per view."""
    import jax
    import jax.numpy as jnp

    centers, radii, dens, colors = _blob_field(seed)
    centers = jnp.asarray(centers, jnp.float32)
    inv_two_r2 = jnp.asarray(1.0 / (2 * radii ** 2), jnp.float32)
    dens = jnp.asarray(dens, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    z = jnp.linspace(near, far, n_samples, dtype=jnp.float32)
    dists = jnp.concatenate([jnp.diff(z), jnp.asarray([1e-3], jnp.float32)])

    # largest divisor of H not exceeding the requested chunk (one compile)
    row_chunk = max(d for d in range(1, min(row_chunk, H) + 1) if H % d == 0)

    @jax.jit
    def render_rows(i0, c2w_):
        i = i0 + jnp.arange(row_chunk, dtype=jnp.float32)[:, None]
        j = jnp.arange(W, dtype=jnp.float32)[None, :]
        i = jnp.broadcast_to(i, (row_chunk, W))
        j = jnp.broadcast_to(j, (row_chunk, W))
        dirs = jnp.stack([(j - W * 0.5) / focal, -(i - H * 0.5) / focal,
                          -jnp.ones_like(i)], axis=-1)
        dirs = jnp.sum(dirs[..., None, :] * c2w_[:3, :3], axis=-1)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        pts = c2w_[:3, 3] + dirs[..., None, :] * z[:, None]      # (r,W,S,3)
        d2 = jnp.sum((pts[..., None, :] - centers) ** 2, axis=-1)
        w = dens * jnp.exp(-d2 * inv_two_r2)
        sigma = jnp.sum(w, axis=-1)
        rgb = jnp.sum(w[..., None] * colors, axis=-2) / (sigma[..., None] + 1e-8)
        rgb = jnp.clip(rgb, 0.0, 1.0)
        alpha = 1.0 - jnp.exp(-sigma * dists)
        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                             1.0 - alpha + 1e-10], axis=-1), axis=-1)[..., :-1]
        weights = alpha * trans
        return jnp.sum(weights[..., None] * rgb, axis=-2), jnp.sum(weights, -1)

    return render_rows, row_chunk


def _render_gt_jax(c2w: np.ndarray, H: int, W: int, focal: float,
                   near: float, far: float, n_samples: int, seed: int,
                   row_chunk: int = 100):
    """Device-accelerated ground-truth render: the same analytic field and
    compositing math as ``_render_gt``, in f32 jax.numpy, chunked over image
    rows so 800x800x192-sample views fit comfortably in HBM.  Used by the
    full-scale study (examples/full_scale.py) where the NumPy path takes
    ~1 min/view on this host; agreement with the NumPy path is pinned in
    tests/test_data.py."""
    import jax.numpy as jnp

    render_rows, row_chunk = _gt_row_renderer(
        H, W, float(focal), float(near), float(far), n_samples, seed,
        row_chunk)
    c2w_j = jnp.asarray(c2w, jnp.float32)
    rgb_rows, acc_rows = [], []
    for i0 in range(0, H, row_chunk):
        r, a = render_rows(jnp.float32(i0), c2w_j)
        rgb_rows.append(np.asarray(r))
        acc_rows.append(np.asarray(a))
    return np.concatenate(rgb_rows), np.concatenate(acc_rows)


def make_synthetic_scene(split: str = "train", n_images: int | None = None,
                         height: int = 100, width: int = 100,
                         near: float = 2.0, far: float = 6.0,
                         n_samples: int = 192, seed: int = 0,
                         backend: str = "numpy") -> RayDataset:
    """Build a RayDataset of ground-truth renders from poses on a sphere.

    Pose layout mirrors the reference's circular camera paths at radius 4
    (run.py:119-147) with per-split deterministic jitter so train/val/test see
    distinct viewpoints.
    """
    from danerf_tpu.ops.rays import look_at_c2w

    if n_images is None:
        n_images = {"train": 20, "val": 4, "test": 8}.get(split, 8)

    split_seed = {"train": 1, "val": 2, "test": 3}.get(split, 4)
    rng = np.random.default_rng(seed * 100 + split_seed)

    focal = 0.5 * width / np.tan(0.5 * 0.6911)  # blender-like ~0.69 rad FOV
    radius = 4.0

    images, alphas, c2ws = [], [], []
    for k in range(n_images):
        theta = 2 * np.pi * k / n_images + rng.uniform(0, 0.3)
        phi = rng.uniform(-0.35, 0.35)
        pos = np.array([radius * np.cos(phi) * np.sin(theta),
                        radius * np.sin(phi),
                        radius * np.cos(phi) * np.cos(theta)])
        c2w = look_at_c2w(pos, np.zeros(3), np.array([0.0, 1.0, 0.0]))
        render = _render_gt_jax if backend == "jax" else _render_gt
        rgb, acc = render(c2w.astype(np.float64), height, width, focal,
                          near, far, n_samples, seed)
        images.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        alphas.append((np.clip(acc, 0, 1) * 255).astype(np.uint8))
        c2ws.append(c2w)

    return RayDataset(images=np.stack(images), alphas=np.stack(alphas),
                      c2ws=np.stack(c2ws), focal=float(focal),
                      near=near, far=far, split=split)


def make_time_varying_scene(split: str = "train", n_images: int | None = None,
                            height: int = 64, width: int = 64,
                            near: float = 2.0, far: float = 6.0,
                            n_samples: int = 128,
                            seed: int = 0) -> RayDataset:
    """Time-varying procedural scene for the AnimatedNeRF variant
    (cfg.use_time; reference /root/reference/src/models.py:165-265 declares
    the model but ships no data path for it).

    Each view k carries a capture time t_k = k / (n-1) in [0, 1], and the
    blob centers oscillate with t (``_blob_motion``), so a model trained
    WITHOUT the time input cannot fit all views — the time channel is
    genuinely load-bearing (asserted in tests/test_time.py)."""
    from danerf_tpu.ops.rays import look_at_c2w

    if n_images is None:
        n_images = {"train": 16, "val": 4, "test": 8}.get(split, 8)

    split_seed = {"train": 1, "val": 2, "test": 3}.get(split, 4)
    rng = np.random.default_rng(seed * 100 + split_seed)

    focal = 0.5 * width / np.tan(0.5 * 0.6911)
    radius = 4.0

    images, alphas, c2ws, times = [], [], [], []
    for k in range(n_images):
        theta = 2 * np.pi * k / n_images + rng.uniform(0, 0.3)
        phi = rng.uniform(-0.35, 0.35)
        pos = np.array([radius * np.cos(phi) * np.sin(theta),
                        radius * np.sin(phi),
                        radius * np.cos(phi) * np.cos(theta)])
        c2w = look_at_c2w(pos, np.zeros(3), np.array([0.0, 1.0, 0.0]))
        t_k = k / max(n_images - 1, 1)
        rgb, acc = _render_gt(c2w.astype(np.float64), height, width, focal,
                              near, far, n_samples, seed, t=t_k)
        images.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        alphas.append((np.clip(acc, 0, 1) * 255).astype(np.uint8))
        c2ws.append(c2w)
        times.append(t_k)

    return RayDataset(images=np.stack(images), alphas=np.stack(alphas),
                      c2ws=np.stack(c2ws), focal=float(focal),
                      near=near, far=far, split=split,
                      times=np.asarray(times, np.float32))
