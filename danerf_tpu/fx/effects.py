"""The 13 post-processing effects as jitted on-device image ops.

Formula-for-formula re-implementations of the reference's NumPy/OpenCV
PostProcessor (/root/reference/src/post_processor.py:60-493; per-effect line
cites below), designed to consume the renderer's depth buffer directly on
device — no PNG round-trip, no host copy (BASELINE.json north star).

Interface: ``apply_effect(name, image, depth=None, params=None, key=None)``
with image uint8/float (H, W, 3) RGB and depth float (H, W) normalized to
[0, 1].  Returns uint8.  Parameters are Python scalars treated as static (they
select kernel sizes); each (effect, params, shape) combination compiles once
and is cached.

Where the reference's behavior is an artifact of its implementation rather
than its declared intent, the code comments say so explicitly (e.g. the
hologram channel gains contradict their own comments; we replicate the code).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from danerf_tpu.fx import imageops as io


def default_params() -> dict:
    """Default parameter set (reference src/post_processor.py:33-55)."""
    return {
        "toon_levels": 5,
        "toon_edge_strength": 1.0,
        "edge_threshold": 20,
        "color_saturation": 1.5,
        "bloom_strength": 0.3,
        "bloom_size": 15,
        "vignette_strength": 0.5,
        "fog_density": 5.0,
        "fog_color_r": 255,
        "fog_color_g": 255,
        "fog_color_b": 255,
        "fog_start": 0.1,
        "fog_exponent": 3.0,   # hardcoded 3.0 in the reference (:483)
        "fog_visibility": 0.3,  # hardcoded 0.3 in the reference (:486)
        "film_grain_amount": 0.2,
        "sketch_strength": 1.0,
        "posterize_levels": 4,
        "neon_glow_intensity": 0.7,
        "neon_glow_radius": 10,
        "hologram_lines": 50,
        "hologram_intensity": 0.8,
    }


def _u8(x):
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


# ------------------------------------------------------------------ effects
# Every effect: (image f32 [0,255] (H,W,3), depth f32 [0,1] (H,W) | None,
#                p: dict static, key | None) -> f32 [0,255]

def _fx_original(img, depth, p, key):
    # src/post_processor.py:60-62
    return img


def _fx_toon(img, depth, p, key):
    # src/post_processor.py:64-117
    levels = p["toon_levels"]
    strength = p["toon_edge_strength"]
    quant = jnp.floor(img / 255.0 * levels) / levels * 255.0
    if depth is not None:
        d = io.bilateral_filter(depth, 9, 75.0, 75.0)
        grad = io.sobel_magnitude(d)
        grad = grad / jnp.maximum(grad.max(), 1e-12)
        edges = jnp.where(grad > 0.05, 1.0, 0.0)
        edges = jnp.clip(io.dilate3(edges), 0.0, 1.0)
    else:
        gray = io.rgb_to_gray(img)
        e = jnp.abs(io.laplacian(gray))
        e = e / jnp.maximum(e.max(), 1e-12)
        edges = jnp.where(e > 0.1, 1.0, 0.0)
    return quant * (1.0 - strength * edges[..., None])


def _fx_color_boost(img, depth, p, key):
    # src/post_processor.py:119-129
    h, s, v = io.rgb_to_hsv_u8(img)
    s = jnp.clip(s * p["color_saturation"], 0, 255)
    return io.hsv_to_rgb_u8(h, s, v)


def _fx_sepia(img, depth, p, key):
    # src/post_processor.py:131-144
    m = jnp.asarray([[0.393, 0.769, 0.189],
                     [0.349, 0.686, 0.168],
                     [0.272, 0.534, 0.131]], jnp.float32)
    return img @ m.T


def _fx_bloom(img, depth, p, key):
    # src/post_processor.py:146-159
    size = int(p["bloom_size"])
    if size % 2 == 0:
        size += 1
    blur = io.gaussian_blur(img, size, 0.0)
    return img + blur * p["bloom_strength"]


def _radial(img_shape, scale_by="diag"):
    h, w = img_shape[:2]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    cy, cx = h // 2, w // 2
    d2 = (x - cx) ** 2 + (y - cy) ** 2
    if scale_by == "diag":
        return jnp.sqrt(d2) / np.sqrt(cx ** 2 + cy ** 2)
    return d2 / (w / 2) ** 2  # the (w/2)^2 normalization several effects use


def _fx_vignette(img, depth, p, key):
    # src/post_processor.py:161-186
    dist = _radial(img.shape, "diag")
    v = jnp.clip(1.0 - dist * p["vignette_strength"], 0.0, 1.0)
    return img * v[..., None]


def _fx_night_vision(img, depth, p, key):
    # src/post_processor.py:188-212
    gray = io.equalize_hist_u8(io.rgb_to_gray(img))
    noise = 15.0 * jax.random.normal(key, gray.shape)
    green = jnp.clip(gray + noise, 0, 255)
    out = jnp.stack([jnp.zeros_like(green), green, jnp.zeros_like(green)], axis=-1)
    mask = jnp.clip(2.0 - _radial(img.shape, "w2") * 1.5, 0.0, 1.0)
    return jnp.floor(out) * mask[..., None]


def _fx_film_grain(img, depth, p, key):
    # src/post_processor.py:214-224
    grain = 50.0 * jax.random.normal(key, img.shape)
    return img + grain * p["film_grain_amount"]


def _fx_sketch(img, depth, p, key):
    # src/post_processor.py:226-269
    gray = io.rgb_to_gray(img)
    inv_blur = 255.0 - io.gaussian_blur(255.0 - gray, 21, 0.0)
    # cv2.divide(gray, inv_blur, scale=256) with saturation
    sketch = jnp.clip(gray / jnp.maximum(inv_blur, 1e-6) * 256.0, 0, 255)
    strength = p["sketch_strength"]
    if depth is not None:
        thresh = jnp.percentile(depth, 70.0)
        mask = 1.0 - jnp.clip((depth - thresh) * 5.0, 0.0, 1.0)
    else:
        mask = jnp.ones_like(gray)
    blend = (1.0 - strength) * img + strength * sketch[..., None]
    return blend * mask[..., None] + img * (1.0 - mask[..., None])


def _fx_cross_processing(img, depth, p, key):
    # src/post_processor.py:271-298
    f = img / 255.0
    f = jnp.stack([jnp.clip(f[..., 0] * 1.1, 0, 1),
                   jnp.clip(f[..., 1] * 1.3, 0, 1),
                   jnp.clip(f[..., 2] * 0.8, 0, 1)], axis=-1)
    f = (f - 0.5) * 1.4 + 0.5
    out = jnp.clip(f * 255.0, 0, 255)
    mask = jnp.clip(1.2 - _radial(img.shape, "w2") * 0.4, 0.0, 1.0)
    # the reference casts to uint8 before the vignette multiply (:286-296)
    return jnp.floor(out) * mask[..., None]


def _fx_posterize(img, depth, p, key):
    # src/post_processor.py:300-318
    levels = p["posterize_levels"]
    poster = jnp.floor(img / 255.0 * levels) / levels * 255.0
    gray = io.rgb_to_gray(img)
    e = jnp.abs(io.laplacian(gray))
    edges = jnp.where(e > 20.0, 255.0, 0.0)
    edges3 = edges[..., None] * jnp.ones((3,), jnp.float32)
    return jnp.where(edges3 > 0, edges3 * 0.3 + poster * 0.7, poster)


def _fx_neon_glow(img, depth, p, key):
    # src/post_processor.py:320-371
    if depth is not None:
        edges = io.canny_simple(jnp.clip(depth, 0, 1) * 255.0, 50.0, 150.0)
    else:
        edges = io.canny_simple(io.rgb_to_gray(img), 50.0, 150.0)
    edges = jnp.clip(io.dilate3(edges), 0.0, 255.0)
    h, s, v = io.rgb_to_hsv_u8(img)
    edge_hue = jnp.mod(h + 120.0, 180.0)
    edge_rgb = io.hsv_to_rgb_u8(edge_hue, jnp.full_like(s, 255.0),
                                jnp.minimum(edges, 255.0))
    radius = int(p["neon_glow_radius"])
    glow = io.gaussian_blur(edge_rgb, radius * 2 + 1, 0.0)
    return jnp.clip(img * 0.7 + glow * p["neon_glow_intensity"], 0, 255)


def _hologram_scanlines(height: int, num_lines: int) -> np.ndarray:
    """Row darkening mask replicating the reference's int-truncated bands
    (src/post_processor.py:385-393)."""
    mask = np.ones((height,), np.float32)
    lh = height / num_lines
    for i in range(num_lines):
        y0 = int(i * lh)
        y1 = int(min((i + 0.7) * lh, height))
        mask[y0:y1] *= 0.85
    return mask


def _fx_hologram(img, depth, p, key):
    # src/post_processor.py:373-449
    f = img / 255.0
    # Reference code multiplies channels (R,G,B) by (0.8, 1.0, 0.2) — its own
    # comments claim the opposite tint, but the code is authoritative (:379-382).
    cyan = f * jnp.asarray([0.8, 1.0, 0.2], jnp.float32)
    scan = jnp.asarray(_hologram_scanlines(img.shape[0], int(p["hologram_lines"])))
    base = cyan * scan[:, None, None]
    k_noise, k_lines = jax.random.split(key)
    noise = 0.03 * jax.random.normal(k_noise, f.shape)
    if depth is not None:
        e = io.sobel_magnitude(depth)
        e = e / jnp.maximum(e.max(), 1e-12)
        edge_glow = jnp.stack([e * 0.1, e * 0.6, e * 0.3], axis=-1)
    else:
        edge_glow = jnp.zeros_like(f)
    holo = base + edge_glow + noise
    # 3 random vertical CRT streaks brightened 1.5x (:443-447)
    w = img.shape[1]
    xs = jax.random.randint(k_lines, (3,), 0, w)
    widths = jax.random.randint(jax.random.fold_in(k_lines, 1), (3,), 2, 6)
    col = jnp.arange(w)
    streak = jnp.zeros((w,), jnp.bool_)
    for i in range(3):
        streak = streak | ((col >= xs[i]) & (col < jnp.minimum(xs[i] + widths[i], w)))
    holo = jnp.where(streak[None, :, None], holo * 1.5, holo)
    return jnp.clip(holo * 255.0, 0, 255)


def _fx_fog(img, depth, p, key):
    # src/post_processor.py:451-493
    fog_color = jnp.asarray([p["fog_color_r"], p["fog_color_g"], p["fog_color_b"]],
                            jnp.float32)
    if depth is None:
        return img * 0.05 + fog_color * 0.95
    start = p["fog_start"]
    adj = jnp.clip(jnp.maximum(depth - start, 0.0) / (1.0 - start), 0.0, 1.0)
    adj = adj ** p["fog_exponent"]
    adj = adj * p["fog_visibility"]
    vis = adj[..., None]
    return img * vis + fog_color * (1.0 - vis)


EFFECTS = {
    "Original": _fx_original,
    "Toon Shader": _fx_toon,
    "Color Boost": _fx_color_boost,
    "Sepia": _fx_sepia,
    "Bloom": _fx_bloom,
    "Vignette": _fx_vignette,
    "Night Vision": _fx_night_vision,
    "Film Grain": _fx_film_grain,
    "Pencil Sketch": _fx_sketch,
    "Cross Processing": _fx_cross_processing,
    "Posterize": _fx_posterize,
    "Neon Glow": _fx_neon_glow,
    "Hologram": _fx_hologram,
    "Fog": _fx_fog,
}

_NOISE_EFFECTS = {"Night Vision", "Film Grain", "Hologram"}

_jit_cache: dict = {}


def apply_effect(name: str, image, depth=None, params: Optional[dict] = None,
                 key=None):
    """Apply effect ``name`` to an RGB image (uint8 or float, (H, W, 3)).

    depth: optional (H, W) float in [0, 1] (the renderer's normalized depth
    buffer).  key: PRNG key for the noise-bearing effects (defaults to key(0)
    for reproducibility).  Returns uint8 (H, W, 3).
    """
    if name not in EFFECTS:
        # Accept slug forms ("fog", "toon_shader", "neon-glow") for the CLI.
        slug = name.lower().replace("_", " ").replace("-", " ")
        match = next((k for k in EFFECTS if k.lower() == slug), None)
        if match is None:
            raise KeyError(f"unknown effect {name!r}; options: {list(EFFECTS)}")
        name = match
    p = default_params()
    if params:
        p.update(params)
    img = jnp.asarray(image).astype(jnp.float32)
    dep = None if depth is None else jnp.asarray(depth).astype(jnp.float32)
    if dep is not None and dep.ndim == 3:  # (H, W, 1) buffers, like the
        dep = dep[..., 0]                  # reference (post_processor.py:474-475)
    if key is None:
        key = jax.random.key(0)

    cache_key = (name, tuple(sorted(p.items())), img.shape,
                 None if dep is None else dep.shape)
    fn = _jit_cache.get(cache_key)
    if fn is None:
        eff = EFFECTS[name]
        fn = jax.jit(lambda i, d, k: _u8(eff(i, d, p, k)))
        _jit_cache[cache_key] = fn
    return fn(img, dep, key)
