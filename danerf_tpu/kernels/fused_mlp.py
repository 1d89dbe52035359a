"""Fused NeRF field evaluation as Pallas TPU kernels.

This is the speed-of-light pass over the hot loop (SURVEY.md §7 step 7): the
reference's dominant FLOPs are the 8x256 MLP over rays*samples points
(src/render.py:49, src/train.py analysis in SURVEY.md §3.1).  The XLA path
(models/nerf.py) is correct but stores every trunk activation to HBM for the
backward — ~0.5 GB per 65k-sample step each way.  These kernels instead:

- forward: positional encoding + trunk + heads for a tile of samples entirely
  in VMEM; HBM sees only (pts, dirs, emb) in and (rgb, sigma) out.
- backward (custom VJP): recomputes the tile's activations in VMEM, then runs
  the transposed chain, accumulating parameter gradients across the
  sequential TPU grid into VMEM-resident accumulators.  No activation ever
  round-trips HBM, trading ~1/3 more matmul FLOPs for the entire activation
  bandwidth — the standard remat trade, taken all the way to the register
  level.

Gradients flow only to parameters and appearance embeddings: ray positions,
directions and sample depths are data (the sampler's z is stop-gradiented in
the renderer), so the VJP legitimately returns zeros for pts/dirs.

Weights live in fp32; matmuls run in bf16 with fp32 accumulation when
``cfg.use_bf16`` (MXU-native), mirroring the XLA path's numerics.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from danerf_tpu.config import NeRFConfig

# Samples per grid step of the fwd+bwd kernel at fp32 residuals.  512 keeps
# VMEM (params + grads + 8 trunk activations + concat buffers) under the
# ~16 MB budget; fp32 @ 1024 -> 21 MB and @ 2048 -> 41 MB both fail Mosaic's
# scoped-vmem check on v5e.  With bf16 residuals (use_bf16) the activations
# halve and 1024 fits (2048 -> 26.8 MB still fails); measured +5% rays/s.
# Env-overridable for tuning sweeps (DANERF_PALLAS_TILE).
TILE = int(os.environ.get("DANERF_PALLAS_TILE", "512"))
# Forward-only tile: without gradient accumulators or stashed activations the
# VMEM budget allows 4x larger tiles (better MXU occupancy for rendering).
FWD_TILE = int(os.environ.get("DANERF_PALLAS_FWD_TILE", str(TILE * 4)))


# Scoped-VMEM ceiling passed to Mosaic.  XLA's default cap is 16 MB, well
# under the v5e's physical VMEM; the bwd kernel at the bf16 tile of 1024
# needs ~16.1 MB (85 KB over the default), so the cap is raised explicitly.
VMEM_LIMIT = int(os.environ.get("DANERF_PALLAS_VMEM_MB", "64")) * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _bwd_tile(cfg: NeRFConfig) -> int:
    return 2 * TILE if cfg.use_bf16 else TILE


# ------------------------------------------------------------------ packing

def pack_params(params: dict, cfg: NeRFConfig):
    """Flatten the param pytree into the kernel argument list.

    Biases are reshaped to (1, d) — TPU kernels want >=2-D operands.  A model
    without appearance projection gets zero weights so one kernel shape serves
    both configurations.
    """
    arrs = []
    for layer in params["trunk"]:
        arrs += [layer["w"], layer["b"].reshape(1, -1)]
    # Density weight travels TRANSPOSED, (1, hidden): its head is computed on
    # the VPU (broadcast-multiply + lane reduction) because a (N,256)@(256,1)
    # matmul pads the single output lane to 128 on the MXU — 128x wasted MACs
    # in the forward and again in each of its two backward matmuls.
    arrs += [params["density"]["w"].reshape(1, -1),
             params["density"]["b"].reshape(1, -1)]
    arrs += [params["dir"]["w"], params["dir"]["b"].reshape(1, -1)]
    app = params.get("appearance_proj")
    if app is not None:
        arrs += [app["w"], app["b"].reshape(1, -1)]
    else:
        arrs += [jnp.zeros((cfg.appearance_dim, cfg.hidden_dim // 2), jnp.float32),
                 jnp.zeros((1, cfg.hidden_dim // 2), jnp.float32)]
    arrs += [params["rgb"]["w"], params["rgb"]["b"].reshape(1, -1)]
    return arrs


def unpack_grads(grads: list, params: dict, cfg: NeRFConfig) -> dict:
    """Inverse of pack_params for the gradient pytree."""
    it = iter(grads)
    out: dict[str, Any] = {"trunk": []}
    for _ in params["trunk"]:
        w, b = next(it), next(it)
        out["trunk"].append({"w": w, "b": b.reshape(-1)})
    w, b = next(it), next(it)
    out["density"] = {"w": w.reshape(-1, 1), "b": b.reshape(-1)}
    w, b = next(it), next(it)
    out["dir"] = {"w": w, "b": b.reshape(-1)}
    w, b = next(it), next(it)
    if "appearance_proj" in params:
        out["appearance_proj"] = {"w": w, "b": b.reshape(-1)}
    w2, b2 = next(it), next(it)
    out["rgb"] = {"w": w2, "b": b2.reshape(-1)}
    return out


# ------------------------------------------------------------------ forward

def _dot(a, w, compute_dtype):
    return jnp.dot(a.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _encode_consts(num_frequencies: int, dim: int = 3):
    """Constants for the matmul-form positional encoding.

    gamma(x) is expressed as  where(is_input, y, sin(y + phase))  with
    y = x @ M: M scatters each input dim into its [x, sin(2^i x), cos(2^i x)]
    columns with the frequency folded in, and phase shifts the cos columns by
    pi/2 (cos t = sin(t + pi/2)).  One small MXU matmul + one VPU sin replace
    2L+1 narrow concats, which Mosaic would otherwise pad to full lanes each.
    """
    out_dim = dim * (1 + 2 * num_frequencies)
    M = np.zeros((dim, out_dim), np.float32)
    phase = np.zeros((1, out_dim), np.float32)
    is_input = np.zeros((1, out_dim), np.float32)
    for j in range(dim):
        M[j, j] = 1.0
        is_input[0, j] = 1.0
    for i in range(num_frequencies):
        f = 2.0 ** i
        base = dim + i * 2 * dim
        for j in range(dim):
            M[j, base + j] = f              # sin block
            M[j, base + dim + j] = f        # cos block
            phase[0, base + dim + j] = np.pi / 2
    return M, phase, is_input


def _encode(x, M, phase, is_input):
    """Positional encoding, matmul form; feature order matches
    ops.encoding.positional_encoding.  The constants arrive as kernel inputs
    (Pallas forbids captured array constants)."""
    y = jnp.dot(x, M, preferred_element_type=jnp.float32)
    return jnp.where(is_input > 0, y, jnp.sin(y + phase))


def _field_from_enc(cfg: NeRFConfig, enc_x, enc_d, emb, p):
    """MLP trunk + heads on pre-encoded inputs; returns (rgb, sigma, res).

    Shared by the per-sample kernels here and the fused ray-march kernels in
    fused_render.py (which build enc_x from rays+z instead of points).
    Residuals only feed the in-kernel backward (VMEM / registers).
    """
    cdt = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    n_layers = cfg.num_layers
    # Activations are held in the compute dtype: with bf16 this halves the
    # residual VMEM (the matmuls cast to bf16 anyway, so the values entering
    # every dot are unchanged) and lifts the fwd+bwd tile from 512 to 1024.
    enc_x = enc_x.astype(cdt)
    enc_d = enc_d.astype(cdt)

    hs = []      # post-relu trunk activations
    ins = []     # layer inputs (possibly concat with enc_x)
    gates = []   # relu masks (bool), saved so the backward's gate is one
    #            # select instead of cast-to-f32 + compare per layer
    #            # (Mosaic has no bf16 vector compare)
    h = enc_x
    for i in range(n_layers):
        if i in cfg.skip_connect_layers and i > 0:
            h = jnp.concatenate([h, enc_x], axis=-1)
        ins.append(h)
        w, b = p[2 * i], p[2 * i + 1]
        pre = _dot(h, w, cdt) + b                    # f32 accumulate
        gates.append(pre > 0)
        h = jax.nn.relu(pre).astype(cdt)
        hs.append(h)

    wd, bd = p[2 * n_layers], p[2 * n_layers + 1]   # wd (1, hidden): see pack
    # VPU head: f32 products (more accurate than the MXU's bf16 multiply) and
    # a lane reduction; runs concurrently with the dir-branch MXU matmul.
    sigma_pre = jnp.sum(h.astype(jnp.float32) * wd, axis=-1, keepdims=True) + bd
    if cfg.density_activation == "softplus":
        sigma = jax.nn.softplus(sigma_pre)
    else:
        sigma = jax.nn.relu(sigma_pre)

    wdir, bdir = p[2 * n_layers + 2], p[2 * n_layers + 3]
    dcat = jnp.concatenate([h, enc_d], axis=-1)
    hdir_pre = _dot(dcat, wdir, cdt) + bdir
    dir_gate = hdir_pre > 0  # stashed as bool, like the trunk gates
    hdir = jax.nn.relu(hdir_pre)

    wapp, bapp = p[2 * n_layers + 4], p[2 * n_layers + 5]
    happ = hdir + _dot(emb, wapp, cdt) + bapp

    wrgb, brgb = p[2 * n_layers + 6], p[2 * n_layers + 7]
    rgb = jnp.asarray(jax.nn.sigmoid(_dot(happ, wrgb, cdt) + brgb))

    # Residual dtype discipline: happ is stashed in the COMPUTE dtype — its
    # only backward consumer is dotT_a(happ, .), which casts to cdt anyway,
    # so bf16 storage is value-identical and halves the stash.  hdir_pre is
    # stashed as its relu gate (bool); hdir itself is not needed backward.
    res = dict(enc_x=enc_x, enc_d=enc_d, hs=hs, ins=ins, gates=gates,
               sigma_pre=sigma_pre, dcat=dcat, dir_gate=dir_gate,
               happ=happ.astype(cdt), rgb=rgb)
    return rgb, sigma, res


def _forward_tile(cfg: NeRFConfig, pts, dirs, emb, p, enc_consts, t=None):
    """Shared fwd math on one tile of points; returns (rgb, sigma, res).

    p: list of param arrays in pack_params order.  enc_consts: the encoding
    constant arrays (pos M/phase/mask, dir M/phase/mask, and time M/phase/mask
    when ``t`` is given).
    """
    enc_x = _encode(pts, *enc_consts[:3])
    enc_d = _encode(dirs, *enc_consts[3:6])
    if t is not None:
        # AnimatedNeRF (reference src/models.py:228-234): encoded time is
        # concatenated to the encoded position at the input and every skip.
        enc_x = jnp.concatenate([enc_x, _encode(t, *enc_consts[6:9])], axis=-1)
    return _field_from_enc(cfg, enc_x, enc_d, emb, p)


def _fwd_kernel(cfg: NeRFConfig, n_params: int, has_time: bool, *refs):
    n_data = 4 if has_time else 3
    n_enc = 9 if has_time else 6
    n_in = n_data + n_enc + n_params
    ins, outs = refs[:n_in], refs[n_in:]
    pts_ref, dirs_ref, emb_ref = ins[:3]
    t = ins[3][:] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    rgb_ref, sigma_ref = outs
    rgb, sigma, _ = _forward_tile(cfg, pts_ref[:], dirs_ref[:], emb_ref[:], p,
                                  enc_consts, t=t)
    rgb_ref[:] = rgb
    sigma_ref[:] = sigma


# ----------------------------------------------------------------- backward

def _bwd_kernel(cfg: NeRFConfig, n_params: int, has_time: bool, *refs):
    n_data = 6 if has_time else 5
    n_enc = 9 if has_time else 6
    n_in = n_data + n_enc + n_params
    ins = refs[:n_in]
    outs = refs[n_in:]
    pts_ref, dirs_ref, emb_ref = ins[:3]
    t = ins[3][:] if has_time else None
    g_rgb_ref, g_sigma_ref = ins[n_data - 2:n_data]
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    dparam_refs, demb_ref = list(outs[:-1]), outs[-1]

    # Recompute the tile forward, keeping residuals in VMEM.
    emb = emb_ref[:]
    _, _, r = _forward_tile(cfg, pts_ref[:], dirs_ref[:], emb, p, enc_consts, t=t)

    grads, demb = _field_bwd_from_res(cfg, n_params, p, r, emb,
                                      g_rgb_ref[:], g_sigma_ref[:])
    demb_ref[:] = demb
    _accumulate_grads(dparam_refs, grads)


def _field_bwd_from_res(cfg: NeRFConfig, n_params: int, p, r, emb,
                        g_rgb, g_sigma):
    """Transposed MLP chain from recomputed residuals ``r``.

    Returns (param grad list in pack order, demb).  Shared by the per-sample
    VJP here and the fused ray-march VJP in fused_render.py.
    """
    cdt = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    n_layers = cfg.num_layers
    hidden = cfg.hidden_dim

    def dotT_a(a, g):  # contribution to dW: a^T @ g, transpose-free on the MXU
        return jax.lax.dot_general(
            a.astype(cdt), g.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_wT(g, w):  # upstream: g @ w^T, contracting both trailing dims
        return jax.lax.dot_general(
            g.astype(cdt), w.astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    grads = [None] * n_params

    # rgb head: rgb = sigmoid(happ @ Wrgb + brgb)
    wrgb = p[2 * n_layers + 6]
    d_pre_rgb = g_rgb * r["rgb"] * (1.0 - r["rgb"])
    grads[2 * n_layers + 6] = dotT_a(r["happ"], d_pre_rgb)
    grads[2 * n_layers + 7] = jnp.sum(d_pre_rgb, axis=0, keepdims=True)
    d_happ = dot_wT(d_pre_rgb, wrgb)

    # appearance projection: happ = hdir + emb @ Wapp + bapp
    wapp = p[2 * n_layers + 4]
    grads[2 * n_layers + 4] = dotT_a(emb, d_happ)
    grads[2 * n_layers + 5] = jnp.sum(d_happ, axis=0, keepdims=True)
    demb = dot_wT(d_happ, wapp)

    # dir branch: hdir = relu([h8, enc_d] @ Wdir + bdir)
    wdir = p[2 * n_layers + 2]
    d_hdir_pre = jnp.where(r["dir_gate"], d_happ, 0.0)
    grads[2 * n_layers + 2] = dotT_a(r["dcat"], d_hdir_pre)
    grads[2 * n_layers + 3] = jnp.sum(d_hdir_pre, axis=0, keepdims=True)
    d_h = dot_wT(d_hdir_pre, wdir)[:, :hidden]  # enc_d part is data

    # density head: sigma = relu(sum(h8 * wd) + bd), wd packed (1, hidden).
    # All three density grads/upstreams stay on the VPU (see pack_params).
    wd = p[2 * n_layers]
    if cfg.density_activation == "softplus":
        d_sigma_pre = g_sigma * jax.nn.sigmoid(r["sigma_pre"])  # (N, 1)
    else:
        d_sigma_pre = g_sigma * (r["sigma_pre"] > 0)            # (N, 1)
    grads[2 * n_layers] = jnp.sum(
        r["hs"][-1].astype(jnp.float32) * d_sigma_pre, axis=0, keepdims=True)
    grads[2 * n_layers + 1] = jnp.sum(d_sigma_pre, axis=0, keepdims=True)
    d_h = d_h + d_sigma_pre * wd

    # trunk, reversed, dropping skip-concat grads into the previous layer
    for i in range(n_layers - 1, -1, -1):
        w = p[2 * i]
        # gate saved from the forward: one select instead of cast + compare
        d_pre = jnp.where(r["gates"][i], d_h, 0.0)
        grads[2 * i] = dotT_a(r["ins"][i], d_pre)
        grads[2 * i + 1] = jnp.sum(d_pre, axis=0, keepdims=True)
        if i > 0:
            d_in = dot_wT(d_pre, w)
            d_h = d_in[:, :hidden]  # enc_x tail (skip layers) is data

    return grads, demb


def _accumulate_grads(dparam_refs, grads):
    """Accumulate parameter grads across the sequential TPU grid."""
    first = pl.program_id(0) == 0
    for ref, g in zip(dparam_refs, grads):
        @pl.when(first)
        def _(ref=ref, g=g):
            ref[:] = g

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, g=g):
            ref[:] = ref[:] + g


# ----------------------------------------------------------------- wrappers

def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _tile_spec(feat, tile=None):
    t = TILE if tile is None else tile
    return pl.BlockSpec((t, feat), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _pad_to_tile(x, tile=None):
    t = TILE if tile is None else tile
    n = x.shape[0]
    pad = (-n) % t
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_apply(packed, pts, dirs, emb, t, cfg: NeRFConfig):
    return _fused_fwd_call(packed, pts, dirs, emb, t, cfg)


def _enc_const_args(cfg: NeRFConfig, has_time: bool):
    mp, pp, ip = _encode_consts(cfg.pos_enc_levels)
    md, pd, idd = _encode_consts(cfg.dir_enc_levels)
    out = [mp, pp, ip, md, pd, idd]
    if has_time:
        out += list(_encode_consts(cfg.time_enc_levels, dim=1))
    return [jnp.asarray(a) for a in out]


def _fused_fwd_call(packed, pts, dirs, emb, t, cfg: NeRFConfig):
    interpret = jax.default_backend() != "tpu"
    n_params = len(packed)
    has_time = t is not None
    # fp32 activations need 2x the VMEM of bf16: cap the fwd tile accordingly
    # (measured: fp32 @ 2048 -> 21.4 MB scoped vmem, over the 16 MB limit).
    max_t = FWD_TILE if cfg.use_bf16 else min(FWD_TILE, 2 * TILE)
    tile = max_t if pts.shape[0] % max_t == 0 else TILE
    n_tiles = pts.shape[0] // tile
    enc_args = _enc_const_args(cfg, has_time)
    kernel = functools.partial(_fwd_kernel, cfg, n_params, has_time)
    data = [pts, dirs, emb] + ([t] if has_time else [])
    data_specs = [_tile_spec(3, tile), _tile_spec(3, tile),
                  _tile_spec(emb.shape[-1], tile)]
    if has_time:
        data_specs.append(_tile_spec(1, tile))
    rgb, sigma = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(w.shape) for w in packed],
        out_specs=[_tile_spec(3, tile), _tile_spec(1, tile)],
        out_shape=[jax.ShapeDtypeStruct((pts.shape[0], 3), jnp.float32),
                   jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    return rgb, sigma


def _fused_vjp_fwd(packed, pts, dirs, emb, t, cfg: NeRFConfig):
    out = _fused_fwd_call(packed, pts, dirs, emb, t, cfg)
    return out, (packed, pts, dirs, emb, t)


def _fused_vjp_bwd(cfg: NeRFConfig, residuals, cotangents):
    packed, pts, dirs, emb, t = residuals
    g_rgb, g_sigma = cotangents
    interpret = jax.default_backend() != "tpu"
    n_params = len(packed)
    has_time = t is not None
    bt = _bwd_tile(cfg)
    n_tiles = pts.shape[0] // bt
    enc_args = _enc_const_args(cfg, has_time)
    kernel = functools.partial(_bwd_kernel, cfg, n_params, has_time)
    data = [pts, dirs, emb] + ([t] if has_time else []) + [g_rgb, g_sigma]
    data_specs = [_tile_spec(3, bt), _tile_spec(3, bt),
                  _tile_spec(emb.shape[-1], bt)]
    if has_time:
        data_specs.append(_tile_spec(1, bt))
    data_specs += [_tile_spec(3, bt), _tile_spec(1, bt)]
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(w.shape) for w in packed],
        out_specs=[_const_spec(w.shape) for w in packed]
        + [_tile_spec(emb.shape[-1], bt)],
        out_shape=[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed]
        + [jax.ShapeDtypeStruct(emb.shape, jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)
    dparams, demb = list(outs[:-1]), outs[-1]
    dt = jnp.zeros_like(t) if has_time else None
    return (dparams, jnp.zeros_like(pts), jnp.zeros_like(dirs), demb, dt)


_fused_apply.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_nerf_apply(params: dict, cfg: NeRFConfig, x, d,
                     appearance_embedding=None, t=None):
    """Drop-in replacement for models.nerf.nerf_apply on flattened inputs.

    x, d: (..., 3); appearance_embedding: (..., app_dim) or None;
    t: (..., 1) time in [0, 1] when ``cfg.use_time`` (AnimatedNeRF variant,
    reference src/models.py:165-265).
    Returns rgb (..., 3), sigma (...,).
    """
    if cfg.use_time and t is None:
        raise ValueError("cfg.use_time=True requires a time input t")
    lead = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    df = jnp.broadcast_to(d, x.shape).reshape(-1, 3).astype(jnp.float32)
    if appearance_embedding is None:
        ef = jnp.zeros((xf.shape[0], cfg.appearance_dim), jnp.float32)
    else:
        ef = jnp.broadcast_to(
            appearance_embedding, lead + (appearance_embedding.shape[-1],)
        ).reshape(-1, appearance_embedding.shape[-1]).astype(jnp.float32)

    bt = _bwd_tile(cfg)
    xf, n = _pad_to_tile(xf, bt)
    df, _ = _pad_to_tile(df, bt)
    ef, _ = _pad_to_tile(ef, bt)
    tf = None
    if cfg.use_time:
        tf = jnp.broadcast_to(t, lead + (1,)).reshape(-1, 1).astype(jnp.float32)
        tf, _ = _pad_to_tile(tf, bt)

    packed = pack_params(params, cfg)
    if appearance_embedding is None:
        # Match nerf_apply(emb=None): the appearance term (including its bias)
        # is skipped entirely, not evaluated at a zero embedding.
        i_app = 2 * cfg.num_layers + 4
        packed[i_app] = jnp.zeros_like(packed[i_app])
        packed[i_app + 1] = jnp.zeros_like(packed[i_app + 1])
    rgb, sigma = _fused_apply(packed, xf, df, ef, tf, cfg)
    rgb = rgb[:n].reshape(*lead, 3)
    sigma = sigma[:n, 0].reshape(lead)
    return rgb, sigma
