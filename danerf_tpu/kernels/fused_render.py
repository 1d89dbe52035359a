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
normalizer.  Forward-only by design — training differentiates the per-sample
kernel's custom VJP; rendering (run.py:212-228's no_grad loop in the
reference) never needs this backward.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from danerf_tpu.config import NeRFConfig
from danerf_tpu.kernels.fused_mlp import (_COMPILER_PARAMS, _const_spec,
                                          _enc_const_args, _encode, pack_params)

# Samples per tile (TR = RENDER_TILE // S rays).  Matches the forward-only
# VMEM budget of the per-sample kernel (bf16 @ 2048; fp32 halves it).
RENDER_TILE = int(os.environ.get("DANERF_PALLAS_RENDER_TILE", "2048"))


def _render_kernel(cfg: NeRFConfig, n_params: int, has_time: bool,
                   tr: int, s: int, *refs):
    n_data = 5 if has_time else 4
    n_enc = 9 if has_time else 6
    ins = refs[:n_data + n_enc + n_params]
    outs = refs[n_data + n_enc + n_params:]
    o_ref, d_ref, emb_ref, z_ref = ins[:4]
    t_ref = ins[4] if has_time else None
    enc_consts = [r[:] for r in ins[n_data:n_data + n_enc]]
    p = [r[:] for r in ins[n_data + n_enc:]]
    rgb_ref, depth_ref, acc_ref, w_ref = outs

    cdt = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    f32 = jnp.float32
    n_layers = cfg.num_layers
    n_t = tr * s

    o = o_ref[:]            # (TR, 3)
    d = d_ref[:]            # (TR, 3) unit
    z = z_ref[:]            # (TR, S)
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
        enc_t = _encode(t_ref[:], *enc_consts[6:9])       # (TR, T)
        enc_t = jnp.broadcast_to(enc_t[:, None, :], (tr, s, enc_t.shape[-1]))
        enc_x = jnp.concatenate([enc_x, enc_t.reshape(n_t, -1)], axis=-1)

    def dot(x, w):
        return jnp.dot(x.astype(cdt), w.astype(cdt), preferred_element_type=f32)

    h = enc_x
    for i in range(n_layers):
        if i in cfg.skip_connect_layers and i > 0:
            h = jnp.concatenate([h, enc_x], axis=-1)
        h = jax.nn.relu(dot(h, p[2 * i]) + p[2 * i + 1])

    sigma = jax.nn.relu(dot(h, p[2 * n_layers]) + p[2 * n_layers + 1])  # (N,1)

    hdir = jax.nn.relu(
        dot(jnp.concatenate([h, enc_d], axis=-1), p[2 * n_layers + 2])
        + p[2 * n_layers + 3])
    emb = jnp.broadcast_to(emb_ref[:][:, None, :], (tr, s, emb_ref.shape[-1]))
    happ = hdir + dot(emb.reshape(n_t, -1), p[2 * n_layers + 4]) + p[2 * n_layers + 5]
    rgb = jax.nn.sigmoid(dot(happ, p[2 * n_layers + 6]) + p[2 * n_layers + 7])

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

    rgb_ref[:] = rgb_map
    depth_ref[:] = depth
    acc_ref[:] = acc
    w_ref[:] = w


def _ray_spec(feat, tr):
    return pl.BlockSpec((tr, feat), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _ray_spec3(mid, feat, tr):
    return pl.BlockSpec((tr, mid, feat), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def fused_render_rays_eval(params: dict, cfg: NeRFConfig, rays_o, rays_d,
                           z_vals, appearance_embedding=None, t=None):
    """Fused sample->encode->MLP->composite forward over a ray batch.

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
    """
    interpret = jax.default_backend() != "tpu"
    r, s = z_vals.shape
    has_time = t is not None

    budget = RENDER_TILE if cfg.use_bf16 else RENDER_TILE // 2
    tr = max(1, budget // s)
    pad = (-r) % tr
    if pad:
        def padr(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        rays_o, rays_d, z_vals = padr(rays_o), padr(rays_d), padr(z_vals)
        if appearance_embedding is not None:
            appearance_embedding = padr(appearance_embedding)
        if t is not None:
            t = padr(t)
    rp = r + pad

    if appearance_embedding is None:
        emb = jnp.zeros((rp, cfg.appearance_dim), jnp.float32)
    else:
        emb = appearance_embedding.astype(jnp.float32)

    packed = pack_params(params, cfg)
    if appearance_embedding is None:
        i_app = 2 * cfg.num_layers + 4
        packed[i_app] = jnp.zeros_like(packed[i_app])
        packed[i_app + 1] = jnp.zeros_like(packed[i_app + 1])
    enc_args = _enc_const_args(cfg, has_time)

    data = [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32), emb,
            z_vals.astype(jnp.float32)]
    data_specs = [_ray_spec(3, tr), _ray_spec(3, tr),
                  _ray_spec(emb.shape[-1], tr), _ray_spec(s, tr)]
    if has_time:
        data.append(t.astype(jnp.float32))
        data_specs.append(_ray_spec(1, tr))

    kernel = functools.partial(_render_kernel, cfg, len(packed), has_time, tr, s)
    rgb, depth, acc, w = pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=data_specs
        + [_const_spec(a.shape) for a in enc_args]
        + [_const_spec(wt.shape) for wt in packed],
        out_specs=[_ray_spec3(1, 3, tr), _ray_spec3(1, 1, tr),
                   _ray_spec3(1, 1, tr), _ray_spec3(1, s, tr)],
        out_shape=[jax.ShapeDtypeStruct((rp, 1, 3), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, 1, s), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*data, *enc_args, *packed)

    return {
        "rgb": rgb[:r, 0, :],
        "depth": depth[:r, 0, 0],
        "acc": acc[:r, 0, 0],
        "weights": w[:r, 0, :],
    }
