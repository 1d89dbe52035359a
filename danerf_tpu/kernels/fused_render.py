"""Fully-fused ray-march render kernel (forward-only).

The per-sample field kernel (fused_mlp.py) still reads/writes (rays*samples,
feat) arrays in HBM.  For whole-frame rendering those arrays are narrow —
(N, 3), (N, 1), (N, 32) — and the TPU's (8, 128) tiled layout pads them 4-128x
(an XLA memory dump showed 4 GB temps for 96 MB of payload, and the 64+64
hierarchical 800x800 frame OOMed outright).  This kernel moves the whole ray
march into VMEM: HBM sees only per-RAY tensors.

    in : rays_o (R,3), rays_d (R,3), emb (R,E), z (R,S) [+ t (R,1)]
    out: rgb (R,1,3), depth/acc (R,1,1), weights (R,1,S)

Per tile of TR rays it computes sample positions via the linearity of the
encoding matmul (enc(o + z*d) phase ``y = o@M + z*(d@M)`` — no (N,3) pts array
even in VMEM), runs the MLP on the flattened (TR*S, feat) tile, and composites
in a rays-by-samples lane layout where the exclusive-cumprod transmittance is
one (S,S) triangular matmul on the MXU (jnp.cumsum along lanes is not a Mosaic
primitive; the matmul form is).

Numerics match ops.composite + the XLA field path (reference semantics
src/render.py:56-80): 1e-3 tail distance, 1e-10 transmittance floor and depth
normalizer.

Differentiable via a custom VJP (``_march_apply``): the backward kernel
recomputes the tile forward in VMEM, runs the compositing chain's transpose in
the same (TR, 1, S) lane layout — weight cotangents gathered from the
rgb/depth/acc losses, the transmittance backward (a reverse exclusive cumsum)
as one strict-lower-triangular matmul, d_sigma = g_alpha*(1-alpha)*dists —
and feeds the shared transposed MLP chain from fused_mlp.  Training uses this
when ``cfg.use_fused_train`` (default): the whole loss forward+backward is two
kernels with per-ray HBM I/O (+21% over the per-sample kernel at the reference
batch).  Ray geometry and z receive zero gradients (they are data; the
renderer stop-gradients z into the importance sampler).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from danerf_tpu.config import NeRFConfig
from danerf_tpu.kernels.fused_mlp import (_COMPILER_PARAMS, _accumulate_grads,
                                          _bwd_tile, _const_spec,
                                          _enc_const_args, _encode,
                                          _field_bwd_from_res, _field_from_enc,
                                          pack_params)

# Samples per tile (TR = RENDER_TILE // S rays).  Swept on v5e
# (benchmarks/ab_render_hier.py): 4096 is the 800x800 frame's best for both
# coarse (446 ms vs 454 @ 2048) and hierarchical (955 ms vs 997 @ 2048);
# 8192/16384 regress.  fp32 halves the safe budget.
RENDER_TILE = int(os.environ.get("DANERF_PALLAS_RENDER_TILE", "4096"))


def _field_on_tile(cfg: NeRFConfig, has_time: bool, tr: int, s: int,
                   o, d, emb2, z, t, enc_consts, p):
    """Encoding + MLP on one (TR rays, S samples) tile.

    Returns (rgb (TR*S,3), sigma (TR*S,1), res, emb_flat) — the shared prefix
    of the lane-layout march (_march_tile) and the 2D train composite
    (_train_kernel)."""
    f32 = jnp.float32
    n_t = tr * s
    mp, pp, ip = enc_consts[0], enc_consts[1], enc_consts[2]

    # Positional encoding of o + z*d without materializing points:
    # y = (o + z d) @ M = o@M + z * (d@M).
    a = jnp.dot(o, mp, preferred_element_type=f32)        # (TR, P)
    b = jnp.dot(d, mp, preferred_element_type=f32)        # (TR, P)
    z3 = z[..., None]                                     # (TR, S, 1)
    y = a[:, None, :] + z3 * b[:, None, :]                # (TR, S, P)
    y = y.reshape(n_t, -1)                                # (TR*S, P)
    enc_x = jnp.where(ip > 0, y, jnp.sin(y + pp))

    enc_d = _encode(d, *enc_consts[3:6])                  # (TR, D)
    enc_d = jnp.broadcast_to(enc_d[:, None, :], (tr, s, enc_d.shape[-1]))
    enc_d = enc_d.reshape(n_t, -1)

    if has_time:
        enc_t = _encode(t, *enc_consts[6:9])              # (TR, T)
        enc_t = jnp.broadcast_to(enc_t[:, None, :], (tr, s, enc_t.shape[-1]))
        enc_x = jnp.concatenate([enc_x, enc_t.reshape(n_t, -1)], axis=-1)

    emb_flat = jnp.broadcast_to(
        emb2[:, None, :], (tr, s, emb2.shape[-1])).reshape(n_t, -1)
    rgb, sigma, res = _field_from_enc(cfg, enc_x, enc_d, emb_flat, p)
    return rgb, sigma, res, emb_flat


def _march_tile(cfg: NeRFConfig, has_time: bool, tr: int, s: int,
                o, d, emb2, z, t, enc_consts, p, want_field: bool = False):
    """Full ray march on one (TR rays, S samples) tile.

    Returns (rgb_map (TR,1,3), depth (TR,1,1), acc (TR,1,1), w (TR,1,S), aux)
    where aux carries everything the in-kernel backward needs.  With
    ``want_field`` aux also holds "field" (TR, 4, S): the per-sample
    [r, g, b, sigma] values in lane layout, consumed by the hierarchical
    merged-composite kernel so the fine pass can reuse them instead of
    re-evaluating the MLP at the coarse depths.
    """
    f32 = jnp.float32
    rgb, sigma, res, emb_flat = _field_on_tile(
        cfg, has_time, tr, s, o, d, emb2, z, t, enc_consts, p)

    # ---- compositing in (TR, 1, S) lane layout ----------------------------
    # sigma (N,1) -> (TR,S,1) is a free leading-dim split; the move of S into
    # lanes is one (S,S) identity matmul (sublane->lane via the MXU).
    eye = jnp.eye(s, dtype=f32)
    # dot_general output dims = (lhs free, rhs free) = (TR, 1, S)
    sigma_l = jax.lax.dot_general(
        sigma.reshape(tr, s, 1), eye,
        dimension_numbers=(((1,), (0,)), ((), ())),
    )

    z_l = z[:, None, :]                                   # (TR, 1, S)
    dists = jnp.concatenate(
        [z_l[..., 1:] - z_l[..., :-1],
         jnp.full((tr, 1, 1), 1e-3, f32)], axis=-1)

    alpha = 1.0 - jnp.exp(-sigma_l * dists)               # (TR, 1, S)
    # Exclusive cumprod as a strict-upper-triangular matmul in log space.
    triu = jnp.triu(jnp.ones((s, s), f32), k=1)
    log_t = jax.lax.dot_general(
        jnp.log(1.0 - alpha + 1e-10), triu,
        dimension_numbers=(((2,), (0,)), ((), ())),
    )                                                     # (TR, 1, S)
    trans = jnp.exp(log_t)
    w = alpha * trans                                     # (TR, 1, S)

    acc = jnp.sum(w, axis=-1, keepdims=True)              # (TR, 1, 1)
    depth = jnp.sum(w * z_l, axis=-1, keepdims=True) / (acc + 1e-10)
    # rgb_map[r, c] = sum_s w[r,s] * rgb[r,s,c]: batched (1,S)@(S,3) per ray.
    rgb_map = jax.lax.dot_general(
        w, rgb.reshape(tr, s, 3),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    )                                                     # (TR, 1, 3)

    aux = dict(res=res, rgb=rgb, alpha=alpha, trans=trans, z_l=z_l,
               dists=dists, emb_flat=emb_flat)
    if want_field:
        # rgb to lane layout via the same sublane->lane identity matmul
        rgb_l = jax.lax.dot_general(
            rgb.reshape(tr, s, 3), eye,
            dimension_numbers=(((1,), (0,)), ((), ())),
        )                                                 # (TR, 3, S)
        aux["field"] = jnp.concatenate([rgb_l, sigma_l], axis=1)  # (TR, 4, S)
    return rgb_map, depth, acc, w, aux


def _render_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                   tr: int, s: int, want_field: bool, *refs):
    n_data = 5 if has_time else 4
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, z_ref = ins[:4]
    t = ins[4][:] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    rgb_ref, depth_ref, acc_ref, w_ref = outs[:4]

    rgb_map, depth, acc, w, aux = _march_tile(
        cfg, has_time, tr, s, o_ref[:], d_ref[:], emb_ref[:], z_ref[:], t,
        enc_consts, p, want_field=want_field)
    rgb_ref[:] = rgb_map
    depth_ref[:] = depth
    acc_ref[:] = acc
    w_ref[:] = w
    if want_field:
        outs[4][:] = aux["field"]


def _composite_bwd_lanes(tr, s, g_rgbmap, g_depth, g_acc, g_w_in,
                         rgb_l, w, alpha, trans, z_l, dists, depth, acc):
    """Transpose of the lane-layout compositing chain.

    All operands are (TR, k, S) lane-layout tensors; ``rgb_l`` is the
    per-sample rgb as (TR, 3, S).  Returns (g_rgb_l (TR,3,S),
    g_sigma_l (TR,1,S)).
    """
    f32 = jnp.float32
    # d loss / d w_s: rgb term, depth term (z_s - depth)/(acc+eps), acc term,
    # external weights term.
    g_w = g_w_in + jax.lax.dot_general(
        g_rgbmap, rgb_l,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    )                                                     # (TR, 1, S)
    g_w = g_w + g_depth * (z_l - depth) / (acc + 1e-10) + g_acc

    # w = alpha * T;  T = exp(triu-cumsum(log(1 - alpha + eps)))
    g_alpha = g_w * trans
    g_t = g_w * alpha
    # dT_s/dL_j = T_s for j < s  ->  g_L = (g_T * T) @ strict-lower mask
    tril = jnp.tril(jnp.ones((s, s), f32), k=-1)          # [s, j]: j < s
    g_log = jax.lax.dot_general(
        g_t * trans, tril,
        dimension_numbers=(((2,), (0,)), ((), ())),
    )                                                     # (TR, 1, S) over j
    g_alpha = g_alpha - g_log / (1.0 - alpha + 1e-10)
    # alpha = 1 - exp(-sigma*dists): d alpha/d sigma = (1 - alpha) * dists
    g_sigma_l = g_alpha * (1.0 - alpha) * dists           # (TR, 1, S)
    # rgb_map = sum_s w_s * rgb_s: d rgb_l[c, s] = w_s * g_rgbmap[c]
    g_rgb_l = jnp.swapaxes(g_rgbmap, 1, 2) * w            # (TR, 3, S)
    return g_rgb_l, g_sigma_l


def _march_bwd_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                      tr: int, s: int, want_field: bool, *refs):
    """Backward of the fused ray march: recompute the tile forward, run the
    compositing VJP in (TR, 1, S) lane layout, then the shared transposed MLP
    chain.  Parameter grads accumulate across the sequential grid; the per-ray
    appearance cotangent streams out per tile.

    Cotangent inputs (g_rgb (TR,1,3), g_depth/g_acc (TR,1,1), g_w (TR,1,S)
    [, g_field (TR,4,S) when want_field]) arrive pre-shaped 3-D so no
    in-kernel relayout is needed for them.
    """
    n_cot = 5 if want_field else 4
    n_data = (5 if has_time else 4) + n_cot
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, z_ref = ins[:4]
    t = ins[4][:] if has_time else None
    cot = ins[n_data - n_cot:n_data]
    g_rgb_ref, g_depth_ref, g_acc_ref, g_w_ref = cot[:4]
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    dparam_refs, demb_ref = list(outs[:-1]), outs[-1]

    n_t = tr * s

    rgb_map, depth, acc, w, aux = _march_tile(
        cfg, has_time, tr, s, o_ref[:], d_ref[:], emb_ref[:], z_ref[:], t,
        enc_consts, p)
    rgb, alpha, trans = aux["rgb"], aux["alpha"], aux["trans"]
    z_l, dists = aux["z_l"], aux["dists"]

    # per-sample rgb in lane layout for the compositing transpose
    eye = jnp.eye(s, dtype=jnp.float32)
    rgb_l = jax.lax.dot_general(
        rgb.reshape(tr, s, 3), eye,
        dimension_numbers=(((1,), (0,)), ((), ())),
    )                                                     # (TR, 3, S)

    g_rgb_l, g_sigma_l = _composite_bwd_lanes(
        tr, s, g_rgb_ref[:], g_depth_ref[:], g_acc_ref[:], g_w_ref[:],
        rgb_l, w, alpha, trans, z_l, dists, depth, acc)

    if want_field:
        g_field = cot[4][:]                               # (TR, 4, S)
        g_rgb_l = g_rgb_l + g_field[:, :3, :]
        g_sigma_l = g_sigma_l + g_field[:, 3:4, :]

    # lanes -> sublanes for the per-sample cotangents feeding the MLP chain.
    g_sigma_flat = jnp.swapaxes(g_sigma_l, 1, 2).reshape(n_t, 1)
    g_rgb_flat = jnp.swapaxes(g_rgb_l, 1, 2).reshape(n_t, 3)

    grads, demb_flat = _field_bwd_from_res(
        cfg, n_params, p, aux["res"], aux["emb_flat"], g_rgb_flat, g_sigma_flat)
    demb_ref[:] = jnp.sum(demb_flat.reshape(tr, s, -1), axis=1)
    _accumulate_grads(dparam_refs, grads)


def _ray_spec(feat, tr):
    return pl.BlockSpec((tr, feat), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _ray_spec3(mid, feat, tr):
    return pl.BlockSpec((tr, mid, feat), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _pad_rays(arrs, tr):
    """Pad leading (ray) dim of every array to a multiple of ``tr``."""
    r = arrs[0].shape[0]
    pad = (-r) % tr
    if pad == 0:
        return arrs, r
    out = []
    for x in arrs:
        if x is None:
            out.append(None)
        else:
            out.append(jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0))
    return out, r


def _march_pallas_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg: NeRFConfig,
                      want_field: bool = False):
    """Run the forward march kernel; returns UNPADDED (R,1,3)/(R,1,1)/(R,1,S)
    [+ field (R,4,S) when want_field]."""
    interpret = jax.default_backend() != "tpu"
    s = z_vals.shape[-1]
    has_time = t is not None
    budget = RENDER_TILE if cfg.use_bf16 else RENDER_TILE // 2
    tr = max(1, budget // s)
    (rays_o, rays_d, emb, z_vals, t), r = _pad_rays(
        [rays_o, rays_d, emb, z_vals, t], tr)
    rp = rays_o.shape[0]
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_vals]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(s, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))

    out_specs = [_ray_spec3(1, 3, tr), _ray_spec3(1, 1, tr),
                 _ray_spec3(1, 1, tr), _ray_spec3(1, s, tr)]
    out_shape = [jax.ShapeDtypeStruct((rp, 1, 3), jnp.float32),
                 jax.ShapeDtypeStruct((rp, 1, 1), jnp.float32),
                 jax.ShapeDtypeStruct((rp, 1, 1), jnp.float32),
                 jax.ShapeDtypeStruct((rp, 1, s), jnp.float32)]
    if want_field:
        out_specs.append(_ray_spec3(4, s, tr))
        out_shape.append(jax.ShapeDtypeStruct((rp, 4, s), jnp.float32))

    kernel = functools.partial(_render_kernel, cfg, len(packed), has_time,
                               tr, s, want_field)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    return tuple(o[:r] for o in outs)


def _march_bwd_call(packed, rays_o, rays_d, emb, z_vals, t, cfg: NeRFConfig,
                    cotangents, want_field: bool):
    """Shared backward dispatch for both march VJPs."""
    interpret = jax.default_backend() != "tpu"
    s = z_vals.shape[-1]
    has_time = t is not None
    # The backward recomputes residuals per tile (same budget as the
    # per-sample train kernel's recompute VJP).
    tr = max(1, _bwd_tile(cfg) // s)
    padded, r = _pad_rays([rays_o, rays_d, emb, z_vals, t, *cotangents], tr)
    rays_o, rays_d, emb, z_vals, t = padded[:5]
    cots = padded[5:]
    rp = rays_o.shape[0]
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_vals]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(s, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))
    data += cots
    data_specs += [_ray_spec3(1, 3, tr), _ray_spec3(1, 1, tr),
                   _ray_spec3(1, 1, tr), _ray_spec3(1, s, tr)]
    if want_field:
        data_specs.append(_ray_spec3(4, s, tr))

    kernel = functools.partial(_march_bwd_kernel, cfg, len(packed), has_time,
                               tr, s, want_field)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_const_spec(wt.shape) for wt in packed]
        + [_ray_spec(emb.shape[-1], tr)],
        out_shape=[jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in packed]
        + [jax.ShapeDtypeStruct((rp, emb.shape[-1]), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    dpacked, demb = list(outs[:-1]), outs[-1][:r]
    dt = jnp.zeros((r, 1), jnp.float32) if has_time else None
    # Ray geometry and depths are data (z is stop-gradiented upstream).
    return (dpacked, jnp.zeros((r, 3), jnp.float32),
            jnp.zeros((r, 3), jnp.float32), demb, jnp.zeros((r, s), jnp.float32),
            dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _march_apply(packed, rays_o, rays_d, emb, z_vals, t, cfg: NeRFConfig):
    return _march_pallas_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg)


def _march_vjp_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg: NeRFConfig):
    out = _march_pallas_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg)
    return out, (packed, rays_o, rays_d, emb, z_vals, t)


def _march_vjp_bwd(cfg: NeRFConfig, residuals, cotangents):
    packed, rays_o, rays_d, emb, z_vals, t = residuals
    return _march_bwd_call(packed, rays_o, rays_d, emb, z_vals, t, cfg,
                           list(cotangents), want_field=False)


_march_apply.defvjp(_march_vjp_fwd, _march_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _march_field_apply(packed, rays_o, rays_d, emb, z_vals, t, cfg: NeRFConfig):
    """March variant that also returns the per-sample field (R, 4, S) so the
    hierarchical merged composite can reuse the coarse MLP evaluations."""
    return _march_pallas_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg,
                             want_field=True)


def _march_field_vjp_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg):
    out = _march_pallas_fwd(packed, rays_o, rays_d, emb, z_vals, t, cfg,
                            want_field=True)
    return out, (packed, rays_o, rays_d, emb, z_vals, t)


def _march_field_vjp_bwd(cfg: NeRFConfig, residuals, cotangents):
    packed, rays_o, rays_d, emb, z_vals, t = residuals
    return _march_bwd_call(packed, rays_o, rays_d, emb, z_vals, t, cfg,
                           list(cotangents), want_field=True)


_march_field_apply.defvjp(_march_field_vjp_fwd, _march_field_vjp_bwd)


# --------------------------------------------------------------------------
# Single-pass train kernel: forward + MSE + backward in ONE kernel.
#
# The custom-VJP train path costs 4x the forward matmul FLOPs: the fwd kernel
# runs once for the loss value, then the bwd kernel RECOMPUTES the tile
# forward before the transposed chain (the remat trade).  But the training
# loss is in-kernel computable — MSE against the ray's target pixel
# (reference src/train.py:87) — so one kernel can march the tile, form the
# rgb cotangent g = 2*(rgb - target)/(B*3) on the spot, and run the backward
# immediately while every residual is still live in VMEM.  Total matmul work
# drops to 3x forward (fwd once + transposed chain), no recompute, and the
# loss scalar accumulates across the grid like the parameter grads.
# Measured same-day A/B at the reference batch: see BENCH_NOTES.
# --------------------------------------------------------------------------

def _train_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                  tr: int, s: int, n_real: int, *refs):
    n_data = (5 if has_time else 4) + 1            # + target
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, z_ref, tgt_ref = ins[:5]
    t = ins[5][:] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    dparam_refs = list(outs[:n_params])
    demb_ref, loss_ref = outs[n_params], outs[n_params + 1]

    f32 = jnp.float32
    n_t = tr * s
    inv_denom = 1.0 / (n_real * 3.0)

    if cfg.fused_composite2d:
        # Dense (TR, S) composite chain: the transcendental/elementwise ops
        # fill all 8 sublanes per vreg (the (TR,1,S) layout uses 1 of 8) and
        # the cumsum + its transpose are plain (TR,S)@(S,S) matmuls.  The
        # per-ray rgb contractions stay in (TR,1,S) lane layout (Mosaic
        # requires a non-empty lhs free dim), and the train loss needs
        # neither depth nor acc so they are never computed.
        rgb, sigma, res, emb_flat = _field_on_tile(
            cfg, has_time, tr, s, o_ref[:], d_ref[:], emb_ref[:], z_ref[:],
            t, enc_consts, p)
        eye = jnp.eye(s, dtype=f32)
        # sublane->lane move of sigma via the MXU, then drop the unit dim
        sig2 = jax.lax.dot_general(
            sigma.reshape(tr, s, 1), eye,
            dimension_numbers=(((1,), (0,)), ((), ()))).reshape(tr, s)
        z2 = z_ref[:]                                     # (TR, S) lane-dense
        dists2 = jnp.concatenate(
            [z2[:, 1:] - z2[:, :-1], jnp.full((tr, 1), 1e-3, f32)], axis=-1)
        alpha2 = 1.0 - jnp.exp(-sig2 * dists2)
        triu = jnp.triu(jnp.ones((s, s), f32), k=1)
        log_t2 = jnp.dot(jnp.log(1.0 - alpha2 + 1e-10), triu,
                         preferred_element_type=f32)
        trans2 = jnp.exp(log_t2)
        w2 = alpha2 * trans2                              # (TR, S)

        w_l = w2[:, None, :]                              # (TR, 1, S)
        rgb3 = rgb.reshape(tr, s, 3)
        rgb_map = jax.lax.dot_general(
            w_l, rgb3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))))   # (TR, 1, 3)

        idx = (pl.program_id(0) * tr
               + jax.lax.broadcasted_iota(jnp.int32, (tr, 1, 1), 0))
        diff = (rgb_map - tgt_ref[:][:, None, :]) * (idx < n_real).astype(f32)
        loss_part = jnp.sum(diff * diff).reshape(1, 1) * inv_denom
        g_rgbmap = (2.0 * inv_denom) * diff               # (TR, 1, 3)

        rgb_l = jax.lax.dot_general(
            rgb3, eye,
            dimension_numbers=(((1,), (0,)), ((), ())))   # (TR, 3, S)
        g_w2 = jax.lax.dot_general(
            g_rgbmap, rgb_l,
            dimension_numbers=(((2,), (1,)), ((0,), (0,)))).reshape(tr, s)
        # transpose of the chain in dense (TR, S)
        g_alpha2 = g_w2 * trans2
        tril = jnp.tril(jnp.ones((s, s), f32), k=-1)
        g_log2 = jnp.dot(g_w2 * alpha2 * trans2, tril,
                         preferred_element_type=f32)
        g_alpha2 = g_alpha2 - g_log2 / (1.0 - alpha2 + 1e-10)
        g_sigma2 = g_alpha2 * (1.0 - alpha2) * dists2     # (TR, S)

        # back through lane layout for the flat (N,1) store (Mosaic has no
        # direct (TR,S)->(TR*S,1) shape cast)
        g_sigma_flat = jnp.swapaxes(
            g_sigma2[:, None, :], 1, 2).reshape(n_t, 1)
        g_rgb_l = jnp.swapaxes(g_rgbmap, 1, 2) * w_l      # (TR, 3, S)
        g_rgb_flat = jnp.swapaxes(g_rgb_l, 1, 2).reshape(n_t, 3)
    else:
        rgb_map, depth, acc, w, aux = _march_tile(
            cfg, has_time, tr, s, o_ref[:], d_ref[:], emb_ref[:], z_ref[:], t,
            enc_consts, p)
        rgb, alpha, trans = aux["rgb"], aux["alpha"], aux["trans"]
        z_l, dists = aux["z_l"], aux["dists"]
        res, emb_flat = aux["res"], aux["emb_flat"]

        # Padded rays contribute nothing: mask by global ray index.
        idx = (pl.program_id(0) * tr
               + jax.lax.broadcasted_iota(jnp.int32, (tr, 1, 1), 0))
        mask = (idx < n_real).astype(f32)

        diff = (rgb_map - tgt_ref[:][:, None, :]) * mask  # (TR, 1, 3)
        loss_part = jnp.sum(diff * diff).reshape(1, 1) * inv_denom
        g_rgbmap = (2.0 * inv_denom) * diff

        zero1 = jnp.zeros((tr, 1, 1), f32)
        eye = jnp.eye(s, dtype=f32)
        rgb_l = jax.lax.dot_general(
            rgb.reshape(tr, s, 3), eye,
            dimension_numbers=(((1,), (0,)), ((), ())))   # (TR, 3, S)
        g_rgb_l, g_sigma_l = _composite_bwd_lanes(
            tr, s, g_rgbmap, zero1, zero1, jnp.zeros((tr, 1, s), f32),
            rgb_l, w, alpha, trans, z_l, dists, depth, acc)

        g_sigma_flat = jnp.swapaxes(g_sigma_l, 1, 2).reshape(n_t, 1)
        g_rgb_flat = jnp.swapaxes(g_rgb_l, 1, 2).reshape(n_t, 3)

    grads, demb_flat = _field_bwd_from_res(
        cfg, n_params, p, res, emb_flat, g_rgb_flat, g_sigma_flat)
    demb_ref[:] = jnp.sum(demb_flat.reshape(tr, s, -1), axis=1)
    _accumulate_grads(dparam_refs + [loss_ref], grads + [loss_part])


def _train_pallas(packed, rays_o, rays_d, emb, z_vals, target, t,
                  cfg: NeRFConfig):
    """Dispatch the single-pass train kernel.

    Returns (mse scalar, dpacked list, demb (R, E))."""
    interpret = jax.default_backend() != "tpu"
    s = z_vals.shape[-1]
    has_time = t is not None
    n_real = rays_o.shape[0]
    tr = max(1, _bwd_tile(cfg) // s)
    (rays_o, rays_d, emb, z_vals, target, t), r = _pad_rays(
        [rays_o, rays_d, emb, z_vals, target, t], tr)
    rp = rays_o.shape[0]
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_vals, target]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(s, tr),
                  _ray_spec(3, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))

    kernel = functools.partial(_train_kernel, cfg, len(packed), has_time,
                               tr, s, n_real)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_const_spec(wt.shape) for wt in packed]
        + [_ray_spec(emb.shape[-1], tr), _const_spec((1, 1))],
        out_shape=[jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in packed]
        + [jax.ShapeDtypeStruct((rp, emb.shape[-1]), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    dpacked, demb, loss = list(outs[:-2]), outs[-2][:r], outs[-1]
    return loss[0, 0], dpacked, demb


def fused_train_loss_grads(params: dict, cfg: NeRFConfig, rays_o, rays_d,
                           z_vals, target, appearance_embedding=None, t=None):
    """Single-pass training core: MSE loss + gradients in one kernel.

    Args:
        params: model param pytree (init_nerf_params layout).
        rays_o, rays_d: (R, 3), rays_d unit-norm.
        z_vals: (R, S) sorted per-ray depths (stratified sample output).
        target: (R, 3) ground-truth pixels.
        appearance_embedding: optional (R, app_dim) per-ray embedding rows.

    Returns:
        (mse, model_grads pytree, demb (R, app_dim)) — numerics match
        ``jax.value_and_grad`` of mean((fused_render_rays_eval(...) - target)^2)
        up to f32 accumulation order.  demb is the per-RAY embedding
        cotangent; the caller scatter-adds it into the embedding table.
    """
    from danerf_tpu.kernels.fused_mlp import unpack_grads

    r = z_vals.shape[0]
    packed, emb = _packed_with_emb(params, cfg, r, appearance_embedding)
    mse, dpacked, demb = _train_pallas(
        packed, rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
        z_vals.astype(jnp.float32), target.astype(jnp.float32),
        None if t is None else t.astype(jnp.float32), cfg)
    grads = unpack_grads(dpacked, params, cfg)
    if appearance_embedding is None and "appearance_proj" in params:
        # emb=None zeroes the projection weights in the forward; its grads
        # are then meaningless — zero them like the VJP of a skipped term.
        grads["appearance_proj"] = jax.tree.map(
            jnp.zeros_like, params["appearance_proj"])
    return mse, grads, demb


# --------------------------------------------------------------------------
# Hierarchical merged-composite kernel.
#
# The naive fine pass re-evaluates the MLP at ALL Sc+Sf depths (reference
# semantics re-derived in render_rays; the reference itself stubs the pass,
# src/render.py:83-86).  But the model is ONE network — the field values at
# the coarse depths were already computed by the coarse pass and are
# bit-identical on re-evaluation.  This kernel therefore evaluates the field
# only at the Sf NEW importance depths and composites over the rank-merged
# Sc+Sf ordering, reusing the coarse values passed in as a (R, 4, Sc) lane
# tensor.  Hierarchical field FLOPs drop from (Sc + Sc+Sf) to (Sc + Sf)
# per ray — 64+64 training at ~2x coarse cost instead of 3x.
#
# The merge needs no sort: both z lists are already sorted (stratified bins;
# inverse-CDF of increasing u), so each element's merged position is its own
# index plus a count of cross-list elements before it — two vector compares —
# and the permutation is applied as one-hot MXU matmuls (gathers are ~20x
# slower on TPU, BENCH_NOTES).
# --------------------------------------------------------------------------

def _merged_field_permute(cfg: NeRFConfig, has_time: bool, tr: int, sc: int,
                          sf: int, o, d, emb2, z_c, field_c, z_f, t,
                          enc_consts, p):
    """Fine field eval + rank-merge on one (TR rays) tile — the shared
    prefix of the lane-layout merged composite (_merged_tile) and the 2D
    merged train composite (_merged_train_kernel).

    Returns (z_all (TR,1,S_all), rgb_all (TR,3,S_all), sigma_all
    (TR,1,S_all), oh_c, oh_f, res, emb_flat)."""
    f32 = jnp.float32
    s_all = sc + sf
    n_t = tr * sf
    mp, pp, ip = enc_consts[0], enc_consts[1], enc_consts[2]

    # Field eval at the NEW importance depths only (same encoding trick as
    # _march_tile: enc(o + z d) = phased-sin of o@M + z*(d@M)).
    a = jnp.dot(o, mp, preferred_element_type=f32)
    b = jnp.dot(d, mp, preferred_element_type=f32)
    y = a[:, None, :] + z_f[..., None] * b[:, None, :]
    y = y.reshape(n_t, -1)
    enc_x = jnp.where(ip > 0, y, jnp.sin(y + pp))
    enc_d = _encode(d, *enc_consts[3:6])
    enc_d = jnp.broadcast_to(enc_d[:, None, :],
                             (tr, sf, enc_d.shape[-1])).reshape(n_t, -1)
    if has_time:
        enc_t = _encode(t, *enc_consts[6:9])
        enc_t = jnp.broadcast_to(enc_t[:, None, :], (tr, sf, enc_t.shape[-1]))
        enc_x = jnp.concatenate([enc_x, enc_t.reshape(n_t, -1)], axis=-1)
    emb_flat = jnp.broadcast_to(
        emb2[:, None, :], (tr, sf, emb2.shape[-1])).reshape(n_t, -1)
    rgb_f, sigma_f, res = _field_from_enc(cfg, enc_x, enc_d, emb_flat, p)

    eye_f = jnp.eye(sf, dtype=f32)
    rgb_f_l = jax.lax.dot_general(
        rgb_f.reshape(tr, sf, 3), eye_f,
        dimension_numbers=(((1,), (0,)), ((), ())))       # (TR, 3, Sf)
    sigma_f_l = jax.lax.dot_general(
        sigma_f.reshape(tr, sf, 1), eye_f,
        dimension_numbers=(((1,), (0,)), ((), ())))       # (TR, 1, Sf)

    # Merge ranks reproducing jnp.sort(concat([z_c, z_f])) with stable ties
    # (coarse first): rank = own index + strict/non-strict cross counts.
    i32 = jnp.int32  # Mosaic's iota is integer-only
    zc3 = z_c[:, :, None]                                 # (TR, Sc, 1)
    zf3 = z_f[:, None, :]                                 # (TR, 1, Sf)
    cnt_c = jnp.sum((zf3 < zc3).astype(i32), axis=-1)     # (TR, Sc)
    cnt_f = jnp.sum((zc3 <= zf3).astype(i32), axis=1)     # (TR, Sf)
    rank_c = cnt_c + jax.lax.broadcasted_iota(i32, (tr, sc), 1)
    rank_f = cnt_f + jax.lax.broadcasted_iota(i32, (tr, sf), 1)
    lane = jax.lax.broadcasted_iota(i32, (tr, 1, s_all), 2)
    oh_c = (rank_c[:, :, None] == lane).astype(f32)       # (TR, Sc, S_all)
    oh_f = (rank_f[:, :, None] == lane).astype(f32)       # (TR, Sf, S_all)

    def permute(x_c, x_f):  # (TR,k,Sc) + (TR,k,Sf) -> (TR,k,S_all)
        return (jax.lax.dot_general(
                    x_c, oh_c, dimension_numbers=(((2,), (1,)), ((0,), (0,))))
                + jax.lax.dot_general(
                    x_f, oh_f, dimension_numbers=(((2,), (1,)), ((0,), (0,)))))

    z_all = permute(z_c[:, None, :], z_f[:, None, :])     # (TR, 1, S_all)
    rgb_all = permute(field_c[:, :3, :], rgb_f_l)         # (TR, 3, S_all)
    sigma_all = permute(field_c[:, 3:4, :], sigma_f_l)    # (TR, 1, S_all)
    return z_all, rgb_all, sigma_all, oh_c, oh_f, res, emb_flat


def _merged_tile(cfg: NeRFConfig, has_time: bool, tr: int, sc: int, sf: int,
                 o, d, emb2, z_c, field_c, z_f, t, enc_consts, p):
    """Fine field eval + rank-merge + composite on one (TR rays) tile.

    z_c (TR, Sc) and z_f (TR, Sf) must each be sorted per ray.  field_c is
    (TR, 4, Sc): coarse [r, g, b, sigma] in lane layout.  Returns
    (rgb_map (TR,1,3), depth, acc (TR,1,1), w (TR,1,S_all), z_all (TR,1,S_all),
    aux) with aux carrying the in-kernel backward's residuals.
    """
    f32 = jnp.float32
    s_all = sc + sf
    z_all, rgb_all, sigma_all, oh_c, oh_f, res, emb_flat = \
        _merged_field_permute(cfg, has_time, tr, sc, sf, o, d, emb2, z_c,
                              field_c, z_f, t, enc_consts, p)

    # Compositing over the merged ordering (numerics of ops.composite).
    dists = jnp.concatenate(
        [z_all[..., 1:] - z_all[..., :-1],
         jnp.full((tr, 1, 1), 1e-3, f32)], axis=-1)
    alpha = 1.0 - jnp.exp(-sigma_all * dists)
    triu = jnp.triu(jnp.ones((s_all, s_all), f32), k=1)
    log_t = jax.lax.dot_general(
        jnp.log(1.0 - alpha + 1e-10), triu,
        dimension_numbers=(((2,), (0,)), ((), ())))
    trans = jnp.exp(log_t)
    w = alpha * trans
    acc = jnp.sum(w, axis=-1, keepdims=True)
    depth = jnp.sum(w * z_all, axis=-1, keepdims=True) / (acc + 1e-10)
    rgb_map = jax.lax.dot_general(
        w, rgb_all, dimension_numbers=(((2,), (2,)), ((0,), (0,))))

    aux = dict(res=res, rgb_all=rgb_all, alpha=alpha, trans=trans,
               dists=dists, emb_flat=emb_flat, oh_c=oh_c, oh_f=oh_f,
               depth=depth, acc=acc, w=w, z_all=z_all)
    return rgb_map, depth, acc, w, z_all, aux


def _merged_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                   tr: int, sc: int, sf: int, *refs):
    n_data = 7 if has_time else 6
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, zc_ref, fc_ref, zf_ref = ins[:6]
    t = ins[6][:] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    rgb_ref, depth_ref, acc_ref, w_ref, zall_ref = outs

    rgb_map, depth, acc, w, z_all, _ = _merged_tile(
        cfg, has_time, tr, sc, sf, o_ref[:], d_ref[:], emb_ref[:], zc_ref[:],
        fc_ref[:], zf_ref[:], t, enc_consts, p)
    rgb_ref[:] = rgb_map
    depth_ref[:] = depth
    acc_ref[:] = acc
    w_ref[:] = w
    zall_ref[:] = z_all


def _merged_bwd_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                       tr: int, sc: int, sf: int, *refs):
    """Backward of the merged composite: recompute the tile forward, run the
    compositing transpose over S_all lanes, un-permute the per-sample
    cotangents back to the coarse/fine partitions (transposed one-hot
    matmuls), stream the coarse-field cotangent out per tile, and feed the
    fine side through the shared transposed MLP chain."""
    n_data = (7 if has_time else 6) + 4
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, zc_ref, fc_ref, zf_ref = ins[:6]
    t = ins[6][:] if has_time else None
    g_rgb_ref, g_depth_ref, g_acc_ref, g_w_ref = ins[n_data - 4:n_data]
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    dparam_refs = list(outs[:n_params])
    demb_ref, gfc_ref = outs[n_params], outs[n_params + 1]

    s_all = sc + sf
    n_t = tr * sf

    _, depth, acc, w, z_all, aux = _merged_tile(
        cfg, has_time, tr, sc, sf, o_ref[:], d_ref[:], emb_ref[:], zc_ref[:],
        fc_ref[:], zf_ref[:], t, enc_consts, p)

    g_rgb_all, g_sigma_all = _composite_bwd_lanes(
        tr, s_all, g_rgb_ref[:], g_depth_ref[:], g_acc_ref[:], g_w_ref[:],
        aux["rgb_all"], w, aux["alpha"], aux["trans"], z_all, aux["dists"],
        depth, acc)

    # Un-permute: x_part = x_all @ oh_part^T (one-hots are orthogonal).
    oh_c, oh_f = aux["oh_c"], aux["oh_f"]

    def unpermute(g_all, oh):  # (TR,k,S_all) x (TR,Sp,S_all) -> (TR,k,Sp)
        return jax.lax.dot_general(
            g_all, oh, dimension_numbers=(((2,), (2,)), ((0,), (0,))))

    gfc_ref[:] = jnp.concatenate(
        [unpermute(g_rgb_all, oh_c), unpermute(g_sigma_all, oh_c)], axis=1)

    g_rgb_f_l = unpermute(g_rgb_all, oh_f)                # (TR, 3, Sf)
    g_sigma_f_l = unpermute(g_sigma_all, oh_f)            # (TR, 1, Sf)
    g_rgb_flat = jnp.swapaxes(g_rgb_f_l, 1, 2).reshape(n_t, 3)
    g_sigma_flat = jnp.swapaxes(g_sigma_f_l, 1, 2).reshape(n_t, 1)

    grads, demb_flat = _field_bwd_from_res(
        cfg, n_params, p, aux["res"], aux["emb_flat"], g_rgb_flat, g_sigma_flat)
    demb_ref[:] = jnp.sum(demb_flat.reshape(tr, sf, -1), axis=1)
    _accumulate_grads(dparam_refs, grads)


def _merged_train_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                         tr: int, sc: int, sf: int, n_real: int, *refs):
    """Single-pass hierarchical fine stage: merged fwd + in-kernel fine MSE +
    backward in one kernel (the hier analogue of _train_kernel).  Streams the
    coarse-field cotangent out so the caller can feed the coarse pass's
    custom VJP; the merged forward is never recomputed."""
    n_data = (7 if has_time else 6) + 1              # + target
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, zc_ref, fc_ref, zf_ref, tgt_ref = ins[:7]
    t = ins[7][:] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    dparam_refs = list(outs[:n_params])
    demb_ref, gfc_ref, loss_ref = outs[n_params:]

    f32 = jnp.float32
    s_all = sc + sf
    n_t = tr * sf
    inv_denom = 1.0 / (n_real * 3.0)

    def unpermute(g_all, oh):  # (TR,k,S_all) x (TR,Sp,S_all) -> (TR,k,Sp)
        return jax.lax.dot_general(
            g_all, oh, dimension_numbers=(((2,), (2,)), ((0,), (0,))))

    if cfg.fused_composite2d:
        # Dense (TR, S_all) composite fwd+bwd (see _train_kernel): full
        # sublane occupancy for the transcendental chain, plain matmul
        # cumsums, and no depth/acc math (the fine MSE never consumes them).
        z_all, rgb_all, sigma_all, oh_c, oh_f, res, emb_flat = \
            _merged_field_permute(cfg, has_time, tr, sc, sf, o_ref[:],
                                  d_ref[:], emb_ref[:], zc_ref[:], fc_ref[:],
                                  zf_ref[:], t, enc_consts, p)
        z2 = z_all.reshape(tr, s_all)
        sig2 = sigma_all.reshape(tr, s_all)
        dists2 = jnp.concatenate(
            [z2[:, 1:] - z2[:, :-1], jnp.full((tr, 1), 1e-3, f32)], axis=-1)
        alpha2 = 1.0 - jnp.exp(-sig2 * dists2)
        triu = jnp.triu(jnp.ones((s_all, s_all), f32), k=1)
        log_t2 = jnp.dot(jnp.log(1.0 - alpha2 + 1e-10), triu,
                         preferred_element_type=f32)
        trans2 = jnp.exp(log_t2)
        w2 = alpha2 * trans2                              # (TR, S_all)

        w_l = w2[:, None, :]                              # (TR, 1, S_all)
        rgb_map = jax.lax.dot_general(
            w_l, rgb_all,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))))   # (TR, 1, 3)

        idx = (pl.program_id(0) * tr
               + jax.lax.broadcasted_iota(jnp.int32, (tr, 1, 1), 0))
        diff = (rgb_map - tgt_ref[:][:, None, :]) * (idx < n_real).astype(f32)
        loss_part = jnp.sum(diff * diff).reshape(1, 1) * inv_denom
        g_rgbmap = (2.0 * inv_denom) * diff               # (TR, 1, 3)

        g_w2 = jax.lax.dot_general(
            g_rgbmap, rgb_all,
            dimension_numbers=(((2,), (1,)), ((0,), (0,)))).reshape(tr, s_all)
        g_alpha2 = g_w2 * trans2
        tril = jnp.tril(jnp.ones((s_all, s_all), f32), k=-1)
        g_log2 = jnp.dot(g_w2 * alpha2 * trans2, tril,
                         preferred_element_type=f32)
        g_alpha2 = g_alpha2 - g_log2 / (1.0 - alpha2 + 1e-10)
        g_sigma2 = g_alpha2 * (1.0 - alpha2) * dists2     # (TR, S_all)

        g_sigma_all = g_sigma2[:, None, :]                # (TR, 1, S_all)
        g_rgb_all = jnp.swapaxes(g_rgbmap, 1, 2) * w_l    # (TR, 3, S_all)
    else:
        rgb_map, depth, acc, w, z_all, aux = _merged_tile(
            cfg, has_time, tr, sc, sf, o_ref[:], d_ref[:], emb_ref[:],
            zc_ref[:], fc_ref[:], zf_ref[:], t, enc_consts, p)
        res, emb_flat = aux["res"], aux["emb_flat"]
        oh_c, oh_f = aux["oh_c"], aux["oh_f"]

        idx = (pl.program_id(0) * tr
               + jax.lax.broadcasted_iota(jnp.int32, (tr, 1, 1), 0))
        mask = (idx < n_real).astype(f32)
        diff = (rgb_map - tgt_ref[:][:, None, :]) * mask
        loss_part = jnp.sum(diff * diff).reshape(1, 1) * inv_denom
        g_rgbmap = (2.0 * inv_denom) * diff

        zero1 = jnp.zeros((tr, 1, 1), f32)
        g_rgb_all, g_sigma_all = _composite_bwd_lanes(
            tr, s_all, g_rgbmap, zero1, zero1, jnp.zeros((tr, 1, s_all), f32),
            aux["rgb_all"], w, aux["alpha"], aux["trans"], z_all, aux["dists"],
            depth, acc)

    gfc_ref[:] = jnp.concatenate(
        [unpermute(g_rgb_all, oh_c), unpermute(g_sigma_all, oh_c)], axis=1)

    g_rgb_f_l = unpermute(g_rgb_all, oh_f)
    g_sigma_f_l = unpermute(g_sigma_all, oh_f)
    g_rgb_flat = jnp.swapaxes(g_rgb_f_l, 1, 2).reshape(n_t, 3)
    g_sigma_flat = jnp.swapaxes(g_sigma_f_l, 1, 2).reshape(n_t, 1)

    grads, demb_flat = _field_bwd_from_res(
        cfg, n_params, p, res, emb_flat, g_rgb_flat, g_sigma_flat)
    demb_ref[:] = jnp.sum(demb_flat.reshape(tr, sf, -1), axis=1)
    _accumulate_grads(dparam_refs + [loss_ref], grads + [loss_part])


def _merged_train_pallas(packed, rays_o, rays_d, emb, z_c, field_c, z_f,
                         target, t, cfg: NeRFConfig):
    """Dispatch the single-pass merged train kernel.

    Returns (mse_fine, dpacked, demb (R,E), g_field (R,4,Sc))."""
    interpret = jax.default_backend() != "tpu"
    sc, sf = z_c.shape[-1], z_f.shape[-1]
    s_all = sc + sf
    has_time = t is not None
    n_real = rays_o.shape[0]
    tr = _merged_tr(cfg, _bwd_tile(cfg), sc, sf)
    (rays_o, rays_d, emb, z_c, field_c, z_f, target, t), r = _pad_rays(
        [rays_o, rays_d, emb, z_c, field_c, z_f, target, t], tr)
    rp = rays_o.shape[0]
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_c, field_c, z_f, target]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(sc, tr),
                  _ray_spec3(4, sc, tr), _ray_spec(sf, tr), _ray_spec(3, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))

    kernel = functools.partial(_merged_train_kernel, cfg, len(packed),
                               has_time, tr, sc, sf, n_real)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_const_spec(wt.shape) for wt in packed]
        + [_ray_spec(emb.shape[-1], tr), _ray_spec3(4, sc, tr),
           _const_spec((1, 1))],
        out_shape=[jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in packed]
        + [jax.ShapeDtypeStruct((rp, emb.shape[-1]), jnp.float32),
           jax.ShapeDtypeStruct((rp, 4, sc), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    dpacked = list(outs[:-3])
    demb, gfc, loss = outs[-3][:r], outs[-2][:r], outs[-1]
    return loss[0, 0], dpacked, demb, gfc


def fused_hier_train_loss_grads(params: dict, cfg: NeRFConfig, rays_o, rays_d,
                                z_coarse, field_coarse, z_fine, target,
                                appearance_embedding=None, t=None):
    """Single-pass fine stage of hierarchical training.

    Like fused_train_loss_grads but over the rank-merged coarse+fine samples,
    reusing the coarse field values.  Returns (mse_fine, fine-side model
    grads, demb (R,E), g_field (R,4,Sc)); the caller feeds ``g_field`` (plus
    the coarse rgb loss cotangent) to the coarse pass's custom VJP so the
    TOTAL parameter gradient matches autodiff of
    mse(merged) + w*mse(coarse) exactly.
    """
    from danerf_tpu.kernels.fused_mlp import unpack_grads

    r = z_coarse.shape[0]
    packed, emb = _packed_with_emb(params, cfg, r, appearance_embedding)
    mse, dpacked, demb, gfc = _merged_train_pallas(
        packed, rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
        z_coarse.astype(jnp.float32), field_coarse.astype(jnp.float32),
        z_fine.astype(jnp.float32), target.astype(jnp.float32),
        None if t is None else t.astype(jnp.float32), cfg)
    grads = unpack_grads(dpacked, params, cfg)
    if appearance_embedding is None and "appearance_proj" in params:
        grads["appearance_proj"] = jax.tree.map(
            jnp.zeros_like, params["appearance_proj"])
    return mse, grads, demb, gfc


def _merged_tr(cfg: NeRFConfig, budget: int, sc: int, sf: int) -> int:
    # field cost scales with Sf; lane tensors with Sc+Sf -> size by their sum.
    # Pallas requires the sublane block dim be a multiple of 8: clamp there
    # (the VMEM budget numbers are heuristics; the hard cap is VMEM_LIMIT).
    tr = max(1, budget // (sf + sc + sf))
    return max(8, 8 * (tr // 8))


def _hier_pallas_fwd(packed, rays_o, rays_d, emb, z_c, field_c, z_f, t,
                     cfg: NeRFConfig):
    interpret = jax.default_backend() != "tpu"
    sc, sf = z_c.shape[-1], z_f.shape[-1]
    s_all = sc + sf
    has_time = t is not None
    budget = RENDER_TILE if cfg.use_bf16 else RENDER_TILE // 2
    tr = _merged_tr(cfg, budget, sc, sf)
    (rays_o, rays_d, emb, z_c, field_c, z_f, t), r = _pad_rays(
        [rays_o, rays_d, emb, z_c, field_c, z_f, t], tr)
    rp = rays_o.shape[0]
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_c, field_c, z_f]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(sc, tr),
                  _ray_spec3(4, sc, tr), _ray_spec(sf, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))

    kernel = functools.partial(_merged_kernel, cfg, len(packed), has_time,
                               tr, sc, sf)
    rgb, depth, acc, w, z_all = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_ray_spec3(1, 3, tr), _ray_spec3(1, 1, tr),
                   _ray_spec3(1, 1, tr), _ray_spec3(1, s_all, tr),
                   _ray_spec3(1, s_all, tr)],
        out_shape=[jax.ShapeDtypeStruct((rp, 1, 3), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, s_all), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, s_all), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    return rgb[:r], depth[:r], acc[:r], w[:r], z_all[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _hier_apply(packed, rays_o, rays_d, emb, z_c, field_c, z_f, t,
                cfg: NeRFConfig):
    return _hier_pallas_fwd(packed, rays_o, rays_d, emb, z_c, field_c, z_f,
                            t, cfg)


def _hier_vjp_fwd(packed, rays_o, rays_d, emb, z_c, field_c, z_f, t, cfg):
    out = _hier_pallas_fwd(packed, rays_o, rays_d, emb, z_c, field_c, z_f,
                           t, cfg)
    return out, (packed, rays_o, rays_d, emb, z_c, field_c, z_f, t)


def _hier_vjp_bwd(cfg: NeRFConfig, residuals, cotangents):
    packed, rays_o, rays_d, emb, z_c, field_c, z_f, t = residuals
    g_rgb, g_depth, g_acc, g_w, _g_zall = cotangents  # z is data: cot ignored
    interpret = jax.default_backend() != "tpu"
    sc, sf = z_c.shape[-1], z_f.shape[-1]
    has_time = t is not None
    tr = _merged_tr(cfg, _bwd_tile(cfg), sc, sf)
    (rays_o, rays_d, emb, z_c, field_c, z_f, t,
     g_rgb, g_depth, g_acc, g_w), r = _pad_rays(
        [rays_o, rays_d, emb, z_c, field_c, z_f, t,
         g_rgb, g_depth, g_acc, g_w], tr)
    rp = rays_o.shape[0]
    s_all = sc + sf
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_c, field_c, z_f]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(sc, tr),
                  _ray_spec3(4, sc, tr), _ray_spec(sf, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))
    data += [g_rgb, g_depth, g_acc, g_w]
    data_specs += [_ray_spec3(1, 3, tr), _ray_spec3(1, 1, tr),
                   _ray_spec3(1, 1, tr), _ray_spec3(1, s_all, tr)]

    kernel = functools.partial(_merged_bwd_kernel, cfg, len(packed), has_time,
                               tr, sc, sf)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_const_spec(wt.shape) for wt in packed]
        + [_ray_spec(emb.shape[-1], tr), _ray_spec3(4, sc, tr)],
        out_shape=[jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in packed]
        + [jax.ShapeDtypeStruct((rp, emb.shape[-1]), jnp.float32),
           jax.ShapeDtypeStruct((rp, 4, sc), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    dpacked = list(outs[:-2])
    demb, gfc = outs[-2][:r], outs[-1][:r]
    dt = jnp.zeros((r, 1), jnp.float32) if has_time else None
    return (dpacked, jnp.zeros((r, 3), jnp.float32),
            jnp.zeros((r, 3), jnp.float32), demb,
            jnp.zeros((r, sc), jnp.float32), gfc,
            jnp.zeros((r, sf), jnp.float32), dt)


_hier_apply.defvjp(_hier_vjp_fwd, _hier_vjp_bwd)


def _packed_with_emb(params: dict, cfg: NeRFConfig, r: int,
                     appearance_embedding):
    """Shared packing: zero appearance projection when no embedding is given
    (matches nerf_apply(emb=None): the term is skipped, not zero-evaluated)."""
    if appearance_embedding is None:
        emb = jnp.zeros((r, cfg.appearance_dim), jnp.float32)
    else:
        emb = appearance_embedding.astype(jnp.float32)
    packed = pack_params(params, cfg)
    if appearance_embedding is None:
        i_app = 2 * cfg.num_layers + 4
        packed[i_app] = jnp.zeros_like(packed[i_app])
        packed[i_app + 1] = jnp.zeros_like(packed[i_app + 1])
    return packed, emb


def fused_render_rays_coarse_field(params: dict, cfg: NeRFConfig, rays_o,
                                   rays_d, z_vals, appearance_embedding=None,
                                   t=None):
    """Coarse pass for the hierarchical fused path: like
    fused_render_rays_eval but also returns "field" — the per-sample
    [r, g, b, sigma] values as (R, 4, Sc) — for reuse by
    fused_render_rays_merged.  Differentiable (the field output's cotangent
    flows back through the same recompute VJP)."""
    r = z_vals.shape[0]
    packed, emb = _packed_with_emb(params, cfg, r, appearance_embedding)
    rgb, depth, acc, w, field = _march_field_apply(
        packed, rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
        z_vals.astype(jnp.float32),
        None if t is None else t.astype(jnp.float32), cfg)
    return {
        "rgb": rgb[:, 0, :],
        "depth": depth[:, 0, 0],
        "acc": acc[:, 0, 0],
        "weights": w[:, 0, :],
        "field": field,
    }


def fused_render_rays_merged(params: dict, cfg: NeRFConfig, rays_o, rays_d,
                             z_coarse, field_coarse, z_fine,
                             appearance_embedding=None, t=None):
    """Hierarchical fine pass without re-evaluating the coarse samples.

    Args:
        z_coarse: (R, Sc) sorted coarse depths.
        field_coarse: (R, 4, Sc) coarse per-sample [r, g, b, sigma] from
            fused_render_rays_coarse_field (do NOT stop-gradient: parameter
            gradients from the fine composite flow back through it).
        z_fine: (R, Sf) sorted importance depths (sample_pdf output is sorted
            because its stratified u grid is increasing).

    Returns:
        dict rgb (R,3), depth (R,), acc (R,), weights (R, Sc+Sf),
        z_vals (R, Sc+Sf) in merged (sorted) order — numerics identical to
        evaluating the field at all Sc+Sf depths and compositing.
    """
    r = z_coarse.shape[0]
    packed, emb = _packed_with_emb(params, cfg, r, appearance_embedding)
    rgb, depth, acc, w, z_all = _hier_apply(
        packed, rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
        z_coarse.astype(jnp.float32), field_coarse.astype(jnp.float32),
        z_fine.astype(jnp.float32),
        None if t is None else t.astype(jnp.float32), cfg)
    return {
        "rgb": rgb[:, 0, :],
        "depth": depth[:, 0, 0],
        "acc": acc[:, 0, 0],
        "weights": w[:, 0, :],
        "z_vals": z_all[:, 0, :],
    }


def fused_render_rays_eval(params: dict, cfg: NeRFConfig, rays_o, rays_d,
                           z_vals, appearance_embedding=None, t=None):
    """Fused sample->encode->MLP->composite over a ray batch (differentiable).

    Args:
        params: model param pytree (init_nerf_params layout).
        cfg: static config.
        rays_o, rays_d: (R, 3); rays_d must be unit-norm.
        z_vals: (R, S) per-ray sample depths (sorted).
        appearance_embedding: optional (R, app_dim) per-ray embedding.
        t: optional (R, 1) time (cfg.use_time).

    Returns:
        dict rgb (R, 3), depth (R,), acc (R,), weights (R, S) — identical
        numerics to composite(nerf_apply(...)) up to matmul association.
        Differentiable wrt params and appearance_embedding via a custom VJP
        whose backward also runs fully in VMEM (compositing chain included);
        ray geometry and z receive zero gradients (they are data).
    """
    r = z_vals.shape[0]
    packed, emb = _packed_with_emb(params, cfg, r, appearance_embedding)
    rgb, depth, acc, w = _march_apply(
        packed, rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
        z_vals.astype(jnp.float32),
        None if t is None else t.astype(jnp.float32), cfg)

    return {
        "rgb": rgb[:, 0, :],
        "depth": depth[:, 0, 0],
        "acc": acc[:, 0, 0],
        "weights": w[:, 0, :],
    }


# --------------------------------------------------------------------------
# Fully-fused hierarchical train kernel: the ENTIRE default train-loss
# forward + backward in ONE pallas_call.
#
# The two-kernel hierarchical path (coarse custom-VJP + merged train kernel)
# pays 7 forward-matmul units per step: coarse fwd (1), merged fine one-pass
# (3: fwd + transposed chain), then the coarse BACKWARD kernel recomputes the
# coarse forward (3) because the coarse-field cotangent only exists after the
# merged kernel ran.  Fusing everything into one kernel keeps the coarse
# residuals alive in VMEM across the fine stage, so the coarse backward needs
# no recompute: 6 units — coarse fwd (1) + fine fwd (1) + two transposed
# chains (2 + 2) — the FLOP floor for a hierarchical step that differentiates
# both passes.  It also deletes two kernel dispatches, the XLA sample_pdf
# between them, and the (R,4,Sc) field / g_field HBM round-trips.
#
# The inverse-CDF importance sampler runs IN-KERNEL (lane layout): its
# stratified uniforms u depend only on the PRNG key, never on the weights
# (ops/sampling.importance_uniforms), so they stream in as a (R, Sf) input;
# the CDF cumsum is one upper-triangular (Sc, Sc) MXU matmul and the
# searchsorted bracketing uses the same masked max/min reductions as
# ops/sampling.sample_pdf:115-150 (gathers are ~20x slower on TPU).  Like the
# trainer's stop_gradient into sample_pdf, no gradient flows through the
# resampling (z is data).
# --------------------------------------------------------------------------

def _pdf_tile(tr: int, sc: int, sf: int, z_c, w, u):
    """In-kernel inverse-CDF importance sampling on one tile.

    Mirrors ops/sampling.sample_pdf exactly (same eps, same masked-reduction
    searchsorted, reference semantics ray_utils.py:105-139), with the cumsum
    as a triangular MXU matmul (Mosaic has no cumsum primitive — the only
    numerics difference is f32 summation order).

    Args:
        z_c: (TR, Sc) sorted coarse depths.  w: (TR, Sc) coarse weights.
        u: (TR, Sf) stratified uniforms (importance_uniforms output).

    Returns (TR, Sf) new depths, sorted (u is strictly increasing).
    """
    f32 = jnp.float32
    wgt = w + 1e-5
    wgt = wgt / jnp.sum(wgt, axis=-1, keepdims=True)
    # Inclusive cumsum: cdf_j = sum_{i<=j} w_i  ->  one (Sc,Sc) matmul.
    tri = jnp.triu(jnp.ones((sc, sc), f32), k=0)
    cdf = jnp.dot(wgt, tri, preferred_element_type=f32)     # (TR, Sc)
    cdf_p = jnp.concatenate(
        [jnp.zeros((tr, 1), f32), cdf], axis=-1)            # (TR, Sc+1)

    lt = cdf_p[:, None, :] < u[:, :, None]                  # (TR, Sf, Sc+1)
    inds = jnp.sum(lt.astype(jnp.int32), axis=-1)           # (TR, Sf)

    big = jnp.asarray(jnp.finfo(f32).max, f32)
    cdfb = cdf_p[:, None, :]
    cdf_below = jnp.max(jnp.where(lt, cdfb, 0.0), axis=-1)
    cdf_above = jnp.min(jnp.where(lt, big, cdfb), axis=-1)

    lt_z = lt[..., :sc]
    zb = z_c[:, None, :]
    z_below = jnp.max(jnp.where(lt_z, zb, -big), axis=-1)
    z_below = jnp.where(inds == 0, z_c[:, 0:1], z_below)
    j_z = jax.lax.broadcasted_iota(jnp.int32, (tr, sf, sc), 2)
    sfx = j_z >= jnp.minimum(inds, sc - 1)[..., None]
    z_above = jnp.min(jnp.where(sfx, zb, big), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return z_below + t * (z_above - z_below)


def _hier_onepass_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                         tr: int, sc: int, sf: int, n_real: int, *refs):
    """One-kernel hierarchical train step (see block comment above).

    Outputs: per-param grad accumulators, demb (TR, E) per ray, and a (1, 2)
    loss accumulator [sum fine MSE part, sum coarse MSE part]."""
    n_data = (7 if has_time else 6)          # o, d, emb, z_c, u, target [, t]
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, zc_ref, u_ref, tgt_ref = ins[:6]
    t = ins[6][:] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    dparam_refs = list(outs[:n_params])
    demb_ref, loss_ref = outs[n_params], outs[n_params + 1]

    f32 = jnp.float32
    s_all = sc + sf
    o, d, emb2, z_c = o_ref[:], d_ref[:], emb_ref[:], zc_ref[:]

    # 1) coarse march; field values kept for the merge, residuals for its bwd.
    rgb_c, depth_c, acc_c, w_c, aux_c = _march_tile(
        cfg, has_time, tr, sc, o, d, emb2, z_c, t, enc_consts, p,
        want_field=True)

    # 2) in-kernel importance resampling (gradient-free: z is data).
    z_f = _pdf_tile(tr, sc, sf, z_c, w_c.reshape(tr, sc), u_ref[:])

    # 3) merged fine stage reusing the coarse field straight from VMEM.
    rgb_map, depth, acc, w, z_all, aux = _merged_tile(
        cfg, has_time, tr, sc, sf, o, d, emb2, z_c, aux_c["field"], z_f, t,
        enc_consts, p)

    # 4) both MSE terms; padded rays masked by global index.
    idx = (pl.program_id(0) * tr
           + jax.lax.broadcasted_iota(jnp.int32, (tr, 1, 1), 0))
    mask = (idx < n_real).astype(f32)
    inv_denom = 1.0 / (n_real * 3.0)
    tgt = tgt_ref[:][:, None, :]
    diff_f = (rgb_map - tgt) * mask
    loss_f = jnp.sum(diff_f * diff_f).reshape(1, 1) * inv_denom
    g_rgbmap_f = (2.0 * inv_denom) * diff_f
    diff_c = (rgb_c - tgt) * mask
    loss_c = jnp.sum(diff_c * diff_c).reshape(1, 1) * inv_denom
    g_rgbmap_c = (2.0 * cfg.coarse_loss_weight * inv_denom) * diff_c
    loss_part = jnp.concatenate([loss_f, loss_c], axis=-1)  # (1, 2)

    # 5) merged-composite backward -> fine MLP cotangents + coarse-field cot.
    zero1 = jnp.zeros((tr, 1, 1), f32)
    g_rgb_all, g_sigma_all = _composite_bwd_lanes(
        tr, s_all, g_rgbmap_f, zero1, zero1, jnp.zeros((tr, 1, s_all), f32),
        aux["rgb_all"], w, aux["alpha"], aux["trans"], z_all, aux["dists"],
        depth, acc)
    oh_c, oh_f = aux["oh_c"], aux["oh_f"]

    def unpermute(g_all, oh):  # (TR,k,S_all) x (TR,Sp,S_all) -> (TR,k,Sp)
        return jax.lax.dot_general(
            g_all, oh, dimension_numbers=(((2,), (2,)), ((0,), (0,))))

    n_tf = tr * sf
    g_rgb_flat_f = jnp.swapaxes(
        unpermute(g_rgb_all, oh_f), 1, 2).reshape(n_tf, 3)
    g_sigma_flat_f = jnp.swapaxes(
        unpermute(g_sigma_all, oh_f), 1, 2).reshape(n_tf, 1)
    grads_f, demb_flat_f = _field_bwd_from_res(
        cfg, n_params, p, aux["res"], aux["emb_flat"],
        g_rgb_flat_f, g_sigma_flat_f)

    # 6) coarse backward: composite transpose of the coarse aux loss, plus
    #    the merge's field cotangent, through ONE transposed MLP chain over
    #    the still-resident coarse residuals (this is the recompute saved).
    g_rgb_l_c, g_sigma_l_c = _composite_bwd_lanes(
        tr, sc, g_rgbmap_c, zero1, zero1, jnp.zeros((tr, 1, sc), f32),
        aux_c["field"][:, :3, :], w_c, aux_c["alpha"], aux_c["trans"],
        aux_c["z_l"], aux_c["dists"], depth_c, acc_c)
    g_rgb_l_c = g_rgb_l_c + unpermute(g_rgb_all, oh_c)
    g_sigma_l_c = g_sigma_l_c + unpermute(g_sigma_all, oh_c)
    n_tc = tr * sc
    g_rgb_flat_c = jnp.swapaxes(g_rgb_l_c, 1, 2).reshape(n_tc, 3)
    g_sigma_flat_c = jnp.swapaxes(g_sigma_l_c, 1, 2).reshape(n_tc, 1)
    grads_c, demb_flat_c = _field_bwd_from_res(
        cfg, n_params, p, aux_c["res"], aux_c["emb_flat"],
        g_rgb_flat_c, g_sigma_flat_c)

    demb_ref[:] = (jnp.sum(demb_flat_f.reshape(tr, sf, -1), axis=1)
                   + jnp.sum(demb_flat_c.reshape(tr, sc, -1), axis=1))
    grads = [gf + gc for gf, gc in zip(grads_f, grads_c)]
    _accumulate_grads(dparam_refs + [loss_ref], grads + [loss_part])


def _hier_onepass_tr(cfg: NeRFConfig, budget: int, sc: int, sf: int) -> int:
    # BOTH residual sets live across the tile (coarse Sc + fine Sf samples)
    # plus the (Sc+Sf)-lane merge tensors: size by 2*(Sc+Sf).  Sublane blocks
    # must be multiples of 8 (budget is a heuristic; VMEM_LIMIT is the cap).
    env = os.environ.get("DANERF_HIER_ONEPASS_RAYS")
    if env:
        return max(8, 8 * (int(env) // 8))
    tr = max(1, budget // (2 * (sc + sf)))
    return max(8, 8 * (tr // 8))


def _hier_onepass_pallas(packed, rays_o, rays_d, emb, z_c, u, target, t,
                         cfg: NeRFConfig):
    """Dispatch the one-kernel hierarchical train step.

    Returns (mse_fine, mse_coarse, dpacked, demb (R, E))."""
    interpret = jax.default_backend() != "tpu"
    sc, sf = z_c.shape[-1], u.shape[-1]
    has_time = t is not None
    n_real = rays_o.shape[0]
    tr = _hier_onepass_tr(cfg, _bwd_tile(cfg), sc, sf)
    (rays_o, rays_d, emb, z_c, u, target, t), r = _pad_rays(
        [rays_o, rays_d, emb, z_c, u, target, t], tr)
    rp = rays_o.shape[0]
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o, rays_d, emb, z_c, u, target]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(sc, tr),
                  _ray_spec(sf, tr), _ray_spec(3, tr)]
    if has_time:
        data.append(t)
        data_specs.append(_ray_spec(1, tr))

    kernel = functools.partial(_hier_onepass_kernel, cfg, len(packed),
                               has_time, tr, sc, sf, n_real)
    outs = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_const_spec(wt.shape) for wt in packed]
        + [_ray_spec(emb.shape[-1], tr), _const_spec((1, 2))],
        out_shape=[jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in packed]
        + [jax.ShapeDtypeStruct((rp, emb.shape[-1]), jnp.float32),
           jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    dpacked, demb, loss = list(outs[:-2]), outs[-2][:r], outs[-1]
    return loss[0, 0], loss[0, 1], dpacked, demb


def fused_hier_onepass_train(params: dict, cfg: NeRFConfig, rays_o, rays_d,
                             z_coarse, u, target,
                             appearance_embedding=None, t=None):
    """Whole hierarchical train-loss core — ONE kernel for fwd + bwd.

    Args:
        z_coarse: (R, Sc) sorted stratified depths.
        u: (R, Sf) stratified uniforms from ops/sampling.importance_uniforms
            (strictly increasing per ray; the in-kernel inverse CDF then
            yields sorted importance depths).
        target: (R, 3) ground-truth pixels.

    Returns:
        (mse_fine, mse_coarse, model grads of
        mse(fine) + coarse_loss_weight*mse(coarse), demb (R, E)) — numerics
        match the two-kernel hierarchical path (coarse custom VJP + merged
        train kernel) up to f32 summation order of the in-kernel CDF cumsum.
    """
    from danerf_tpu.kernels.fused_mlp import unpack_grads

    r = z_coarse.shape[0]
    packed, emb = _packed_with_emb(params, cfg, r, appearance_embedding)
    mse_f, mse_c, dpacked, demb = _hier_onepass_pallas(
        packed, rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
        z_coarse.astype(jnp.float32), u.astype(jnp.float32),
        target.astype(jnp.float32),
        None if t is None else t.astype(jnp.float32), cfg)
    grads = unpack_grads(dpacked, params, cfg)
    if appearance_embedding is None and "appearance_proj" in params:
        grads["appearance_proj"] = jax.tree.map(
            jnp.zeros_like, params["appearance_proj"])
    return mse_f, mse_c, grads, demb
