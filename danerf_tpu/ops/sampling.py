"""Point sampling along rays: stratified bins and inverse-CDF importance.

Numerics replicate the reference exactly so golden tests can assert allclose:
- stratified: /root/reference/src/ray_utils.py:52-88 (linear z in [near, far],
  jitter within [lower, upper] bins when perturbed).
- importance: /root/reference/src/ray_utils.py:90-149 (eps=1e-5 weight floor,
  cumsum CDF with 0 prepended, per-bin jittered uniforms, searchsorted +
  bracket gather, guarded linear interpolation, concat + sort).

All functions are PRNG-key-threaded and shape-static, so they trace once under
``jit`` and the sort/searchsorted lower to XLA's static-shape kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_aabb_bounds(rays_o, rays_d, aabb_min, aabb_max, near, far):
    """Tighten per-ray [near, far] to the ray's axis-aligned-box overlap.

    Slab method.  Rays that miss the box collapse to [far, far - eps] ordered
    as an empty interval clamped back to a degenerate far band, so sample
    shapes stay static (the TPU-friendly form of empty-space culling; the
    dynamic-shape pruning of the NerfAcc lineage does not map to XLA).

    Args:
        rays_o, rays_d: (..., 3); rays_d need not be unit (bounds are in the
            same parameterization as z_vals: o + d * t).
        aabb_min, aabb_max: (3,) box corners.
        near, far: scalar global bounds; output is clamped inside them.

    Returns:
        t_near, t_far: (..., 1) per-ray bounds, t_near <= t_far.
    """
    aabb_min = jnp.asarray(aabb_min, rays_o.dtype)
    aabb_max = jnp.asarray(aabb_max, rays_o.dtype)
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-10,
                            jnp.full_like(rays_d, 1e-10), rays_d)
    t0 = (aabb_min - rays_o) * inv_d
    t1 = (aabb_max - rays_o) * inv_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    t_near = jnp.max(t_lo, axis=-1, keepdims=True)
    t_far = jnp.min(t_hi, axis=-1, keepdims=True)
    hit = t_far > jnp.maximum(t_near, 0.0)
    t_near = jnp.clip(t_near, near, far)
    t_far = jnp.clip(t_far, near, far)
    # misses: park all samples in a thin band at the far plane
    t_near = jnp.where(hit, t_near, far - 1e-3)
    t_far = jnp.where(hit, jnp.maximum(t_far, t_near + 1e-4), far)
    return t_near, t_far


def sample_stratified(key, rays_o, rays_d, near, far, n_samples: int, perturb: bool = True):
    """Sample ``n_samples`` depths per ray in [near, far].

    Args:
        key: PRNG key (unused when perturb=False).
        rays_o, rays_d: (..., 3).
        near, far: scalars.
        n_samples: static int.
        perturb: static bool; jitter within bins (ray_utils.py:76-81).

    Returns:
        z_vals: (..., n_samples) depths; pts: (..., n_samples, 3) positions.
    """
    dtype = rays_o.dtype
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    z_vals = near + t_vals * (far - near)
    z_vals = jnp.broadcast_to(z_vals, rays_o.shape[:-1] + (n_samples,))

    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * t_rand

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return z_vals, pts


def importance_uniforms(key, batch_shape, n_importance: int,
                        perturb: bool = True, dtype=jnp.float32):
    """The stratified uniforms ``u`` that sample_pdf inverts the CDF at
    (ray_utils.py:115-119).  Factored out so the fully-fused hierarchical
    train kernel can draw the SAME u outside the kernel and invert the CDF
    in-kernel: u depends only on the key/shape, never on the weights.

    Returns (*batch_shape, n_importance), strictly increasing along the last
    axis (bin offsets < bin width), so the inverse-CDF output is sorted.
    """
    u = jnp.linspace(0.0, 1.0, n_importance + 1, dtype=dtype)[:-1]
    u = jnp.broadcast_to(u, tuple(batch_shape) + (n_importance,))
    if perturb:
        u = u + jax.random.uniform(key, u.shape, dtype=dtype) / n_importance
    else:
        u = u + 0.5 / n_importance
    return u


def sample_pdf(key, z_vals, weights, n_importance: int, perturb: bool = True,
               u: "jnp.ndarray | None" = None):
    """Inverse-CDF importance sampling of new depths (ray_utils.py:105-139).

    Args:
        key: PRNG key for the per-bin jitter (ray_utils.py:119).
        z_vals: (..., n_samples) coarse depths.
        weights: (..., n_samples) compositing weights from the coarse pass.
        n_importance: static int count of new samples.
        perturb: static bool; when False the uniforms sit at bin centers
            (deterministic path for golden tests; the reference always jitters).
        u: optional (..., n_importance) pre-drawn stratified uniforms
            (importance_uniforms semantics); overrides key/perturb.  Used by
            the torch-pairing mirror (benchmarks/jax_reference.py), which
            must invert the CDF at uniforms drawn from a shared host stream.

    Returns:
        z_fine: (..., n_importance) new depths (unsorted, like the reference's
        ``z_vals_fine`` before the combine step).
    """
    dtype = z_vals.dtype
    eps = 1e-5
    weights = weights + eps
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)

    cdf = jnp.cumsum(weights, axis=-1)                                   # (..., n)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., n+1)

    if u is None:
        u = importance_uniforms(key, cdf.shape[:-1], n_importance, perturb, dtype)

    # First index where cdf[idx] >= u (torch.searchsorted right=False).  The
    # boolean prefix mask lt[r,i,j] = (cdf[r,j] < u[r,i]) encodes it: the
    # bracketing VALUES are recovered with masked max/min reductions instead
    # of take_along_axis — row-indexed gathers lower to a slow generic-gather
    # loop on TPU (measured 44.6 ms/16k-ray chunk with gathers vs ~3 ms with
    # reductions; both are bit-identical selections since cdf and z are
    # sorted).  All of it fuses into one VPU pass over (rays, n_imp, n+1).
    lt = cdf[..., None, :] < u[..., :, None]                      # (R, NI, n+1)
    inds = jnp.sum(lt.astype(jnp.int32), axis=-1)
    n_z = z_vals.shape[-1]

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    cdfb = cdf[..., None, :]
    # cdf[below]: prefix {j < inds} is exactly lt; empty prefix -> 0 == cdf[0].
    cdf_below = jnp.max(jnp.where(lt, cdfb, 0.0), axis=-1)
    # cdf[above]: suffix {j >= inds} is ~lt.  When float-cumsum rounding lands
    # cdf[-1] slightly below a u, the suffix is empty and cdf_above = big; the
    # resulting huge denom drives t toward 0, and z_below == z_above == z[last]
    # anyway (sfx clamps with n_z - 1), matching the reference's clamped gather.
    cdf_above = jnp.min(jnp.where(lt, big, cdfb), axis=-1)

    # z at the same (clamped) indices: z_below = z[max(inds-1, 0) clamped],
    # z_above = z[min(inds, n_z-1)].  lt restricted to j < n_z is the z_below
    # prefix; the z_above suffix needs its own iota compare.
    lt_z = lt[..., :n_z]
    zb = z_vals[..., None, :]
    z_below = jnp.max(jnp.where(lt_z, zb, -big), axis=-1)
    z_below = jnp.where(inds == 0, z_vals[..., None, 0], z_below)
    j_z = jnp.arange(n_z, dtype=jnp.int32)
    sfx = j_z >= jnp.minimum(inds, n_z - 1)[..., None]
    z_above = jnp.min(jnp.where(sfx, zb, big), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    z_fine = z_below + t * (z_above - z_below)
    return z_fine


def combine_z(rays_o, rays_d, z_coarse, z_fine):
    """Merge coarse + fine depths, sort, and return positions
    (ray_utils.py:142-147).

    Returns:
        z_combined: (..., n+n_imp) sorted depths;
        pts: (..., n+n_imp, 3) sample positions.
    """
    z_combined = jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_combined[..., :, None]
    return z_combined, pts
