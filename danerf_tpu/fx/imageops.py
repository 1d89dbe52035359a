"""Image-processing primitives as jittable jax.numpy ops.

These replace the OpenCV calls the reference's PostProcessor leans on
(/root/reference/src/post_processor.py): separable Gaussian blur (incl. cv2's
sigma-from-ksize rule), Sobel/Laplacian kernels, 3x3 dilation, bilateral
filtering, HSV round-trips with cv2's uint8 conventions, histogram
equalization, and a simplified Canny.  Everything is pure elementwise/conv
work — the VPU path on TPU — and composes under one jit per effect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- convolution

def _pad_reflect101(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """cv2 BORDER_REFLECT_101 == numpy 'reflect' padding (edge not repeated)."""
    return jnp.pad(x, [(ph, ph), (pw, pw)] + [(0, 0)] * (x.ndim - 2), mode="reflect")


def conv2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2-D correlation with reflect-101 borders.

    img: (H, W) or (H, W, C); kernel: (kh, kw).  Applied per channel.
    """
    kh, kw = kernel.shape
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = _pad_reflect101(img, kh // 2, kw // 2)
    # NHWC with depthwise conv: one group per channel.
    c = x.shape[-1]
    lhs = x[None].astype(jnp.float32)
    rhs = jnp.broadcast_to(kernel.astype(jnp.float32)[:, :, None, None], (kh, kw, 1, c))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )[0]
    return out[..., 0] if squeeze else out


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel: sigma<=0 => 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    i = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(i ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur matching cv2.GaussianBlur(img, (k,k), sigma)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    out = conv2d(img, k[:, None])
    return conv2d(out, k[None, :])


SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
SOBEL_Y = SOBEL_X.T
LAPLACIAN = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)


def sobel_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """sqrt(Sx^2 + Sy^2) with 3x3 Sobel kernels (cv2.Sobel ksize=3)."""
    gx = conv2d(img, jnp.asarray(SOBEL_X))
    gy = conv2d(img, jnp.asarray(SOBEL_Y))
    return jnp.sqrt(gx ** 2 + gy ** 2)


def laplacian(img: jnp.ndarray) -> jnp.ndarray:
    return conv2d(img, jnp.asarray(LAPLACIAN))


def dilate3(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary/gray dilation with a 3x3 all-ones structuring element."""
    out = mask
    for _ in range(iterations):
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return out


def bilateral_filter(img: jnp.ndarray, d: int = 9, sigma_color: float = 75.0,
                     sigma_space: float = 75.0) -> jnp.ndarray:
    """cv2.bilateralFilter for a single-channel float image.

    d x d neighborhood; weights = spatial gaussian * range gaussian on value
    difference.  Used on the depth buffer by the toon effect
    (reference src/post_processor.py:82).
    """
    r = d // 2
    x = _pad_reflect101(img, r, r)
    H, W = img.shape
    acc = jnp.zeros_like(img)
    norm = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            w_s = np.exp(-(dy * dy + dx * dx) / (2.0 * sigma_space ** 2))
            patch = jax.lax.dynamic_slice(x, (dy + r, dx + r), (H, W))
            w_r = jnp.exp(-((patch - img) ** 2) / (2.0 * sigma_color ** 2))
            w = w_s * w_r
            acc = acc + w * patch
            norm = norm + w
    return acc / norm


# --------------------------------------------------------------- color space

def rgb_to_hsv_u8(img: jnp.ndarray):
    """cv2.cvtColor(RGB2HSV) on uint8 semantics: H in [0,180), S,V in [0,255].

    Input (H, W, 3) float in [0, 255].  Returns float (h, s, v) channels.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 packs H/2 into u8
    s = jnp.where(v == 0, 0.0, 255.0 * diff / jnp.where(v == 0, 1.0, v))
    return h, s, v


def hsv_to_rgb_u8(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb_to_hsv_u8 (cv2 uint8 conventions)."""
    h = h * 2.0  # back to degrees
    s = s / 255.0
    c = v * s
    hp = h / 60.0
    xval = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, xval, z, z, xval, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [xval, c, c, xval, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, xval, c, c, xval])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """cv2 RGB2GRAY weights."""
    return 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]


def equalize_hist_u8(gray: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist on a float image holding uint8 values [0,255]."""
    g = jnp.clip(jnp.round(gray), 0, 255).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.float32).at[g.reshape(-1)].add(1.0)
    cdf = jnp.cumsum(hist)
    # cv2: lut = round((cdf - cdf_min) / (total - cdf_min) * 255)
    nz_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf))
    total = g.size
    denom = jnp.maximum(total - nz_min, 1.0)
    lut = jnp.clip(jnp.round((cdf - nz_min) / denom * 255.0), 0, 255)
    return lut[g]


def canny_simple(gray_u8: jnp.ndarray, low: float = 50.0, high: float = 150.0) -> jnp.ndarray:
    """Simplified Canny: Gaussian 5x5 -> Sobel magnitude -> non-max suppression
    -> double threshold with one-pass hysteresis (weak pixels survive next to
    strong ones).  Functionally equivalent edge maps for the neon/hologram
    effects (reference uses cv2.Canny at src/post_processor.py:340,344).
    Returns a {0, 255} float mask.
    """
    g = gaussian_blur(gray_u8, 5, 0.0)
    gx = conv2d(g, jnp.asarray(SOBEL_X))
    gy = conv2d(g, jnp.asarray(SOBEL_Y))
    mag = jnp.sqrt(gx ** 2 + gy ** 2)

    # quantize gradient direction to 0/45/90/135 and compare both neighbors
    ang = jnp.arctan2(gy, gx) * 180.0 / np.pi
    ang = jnp.mod(ang, 180.0)
    p = jnp.pad(mag, 1, mode="constant")

    def nb(dy, dx):
        return jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), mag.shape)

    d0 = (ang < 22.5) | (ang >= 157.5)
    d45 = (ang >= 22.5) & (ang < 67.5)
    d90 = (ang >= 67.5) & (ang < 112.5)
    n1 = jnp.select([d0, d45, d90], [nb(0, 1), nb(-1, 1), nb(-1, 0)], nb(-1, -1))
    n2 = jnp.select([d0, d45, d90], [nb(0, -1), nb(1, -1), nb(1, 0)], nb(1, 1))
    keep = (mag >= n1) & (mag >= n2)
    thin = jnp.where(keep, mag, 0.0)

    strong = thin >= high
    weak = (thin >= low) & ~strong
    strong_grown = dilate3(strong.astype(jnp.float32)) > 0
    edges = strong | (weak & strong_grown)
    return edges.astype(jnp.float32) * 255.0
