"""The NeRF-W MLP: 8x256 density trunk, view-direction color branch, per-image
appearance embeddings, and an optional time conditioning (AnimatedNeRF).

Architecture matches the reference (/root/reference/src/models.py:57-162):
- trunk: ``num_layers`` Linear(hidden)->ReLU with the encoded position
  concatenated back in before each layer listed in ``skip_connect_layers``
  (src/models.py:86-90, 129-134),
- density head Linear(hidden, 1) -> ReLU (src/models.py:93, 137-138),
- direction branch Linear(hidden + dir_enc, hidden//2) -> ReLU
  (src/models.py:96, 141-143),
- appearance embedding projected by Linear(app_dim, hidden//2) and ADDED to the
  direction feature (src/models.py:100, 146-156),
- rgb head Linear(hidden//2, 3) -> sigmoid (src/models.py:101, 159-160).

The time-conditioned variant (reference ``AnimatedNeRF``, src/models.py:165-265,
declared but never runnable there because its config lacks ``time_enc_levels``)
is folded in as ``use_time``: the encoded time is concatenated to the encoded
position at the input and at every skip.

Design: params are a plain pytree of fp32 weight dicts and ``nerf_apply`` is a
pure function.  This keeps the model trivially shardable with NamedSharding
(tensor-parallel over the hidden dim), donate-able, and swappable underneath by
the Pallas fused kernel without touching any module machinery.  Matmuls run in
bf16 on the MXU with fp32 accumulation when ``use_bf16``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from danerf_tpu.config import NeRFConfig
from danerf_tpu.ops.encoding import positional_encoding


def _init_linear(key, in_dim: int, out_dim: int):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for W and b.

    Matching the reference's init distribution keeps training trajectories
    statistically equivalent for the PSNR-parity bar.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    # Stored as (in, out) so applications are x @ W (row-major batch on MXU).
    w = jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_params(key, cfg: NeRFConfig):
    """Initialize the MLP parameter pytree."""
    pos_in = cfg.pos_enc_dim + (cfg.time_enc_dim if cfg.use_time else 0)
    keys = iter(jax.random.split(key, cfg.num_layers + 4))

    trunk = []
    in_dim = pos_in
    for i in range(cfg.num_layers):
        if i in cfg.skip_connect_layers and i > 0:
            in_dim = cfg.hidden_dim + pos_in
        trunk.append(_init_linear(next(keys), in_dim, cfg.hidden_dim))
        in_dim = cfg.hidden_dim

    density = _init_linear(next(keys), cfg.hidden_dim, 1)
    if cfg.density_bias_init:
        # Escape hatch for born-dead ReLU density heads (see config.py):
        # shifts the head's pre-activation alive at init.
        density["b"] = density["b"] + cfg.density_bias_init
    params = {
        "trunk": trunk,
        "density": density,
        "dir": _init_linear(next(keys), cfg.hidden_dim + cfg.dir_enc_dim, cfg.hidden_dim // 2),
        "rgb": _init_linear(next(keys), cfg.hidden_dim // 2, 3),
    }
    if cfg.use_appearance:
        params["appearance_proj"] = _init_linear(next(keys), cfg.appearance_dim, cfg.hidden_dim // 2)
    return params


def init_appearance_embeddings(key, num_images: int, appearance_dim: int):
    """Per-image N(0,1) embeddings (reference src/dataset.py:81-83).

    In the reference these live on the *dataset* and are smuggled into the
    optimizer (src/train.py:36-37); here they are first-class trainable params
    carried next to the model pytree.
    """
    return jax.random.normal(key, (num_images, appearance_dim), jnp.float32)


def _linear(p, x, compute_dtype):
    y = jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return y + p["b"]


def nerf_apply(
    params,
    cfg: NeRFConfig,
    x: jnp.ndarray,
    d: jnp.ndarray,
    appearance_embedding: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
):
    """Evaluate the field at positions ``x`` with view dirs ``d``.

    Args:
        params: pytree from :func:`init_nerf_params`.
        cfg: static config (closed over by jit).
        x: (..., 3) positions; d: (..., 3) unit view directions.
        appearance_embedding: optional (..., appearance_dim) per-sample
            embedding (already gathered per ray/sample).
        t: optional (..., 1) time in [0, 1] when ``cfg.use_time``.

    Returns:
        rgb (..., 3) in [0, 1]; sigma (...,) non-negative density.
    """
    compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    enc_x = positional_encoding(x, cfg.pos_enc_levels)
    enc_d = positional_encoding(d, cfg.dir_enc_levels)
    if cfg.use_time:
        if t is None:
            raise ValueError("cfg.use_time=True requires a time input t")
        enc_x = jnp.concatenate([enc_x, positional_encoding(t, cfg.time_enc_levels)], axis=-1)

    h = enc_x
    for i, layer in enumerate(params["trunk"]):
        if i in cfg.skip_connect_layers and i > 0:
            h = jnp.concatenate([h, enc_x], axis=-1)
        h = jax.nn.relu(_linear(layer, h, compute_dtype))

    act = (jax.nn.softplus if cfg.density_activation == "softplus"
           else jax.nn.relu)
    sigma = act(_linear(params["density"], h, compute_dtype))[..., 0]

    h_dir = jnp.concatenate([h, enc_d], axis=-1)
    h_dir = jax.nn.relu(_linear(params["dir"], h_dir, compute_dtype))

    if cfg.use_appearance and appearance_embedding is not None:
        h_dir = h_dir + _linear(params["appearance_proj"], appearance_embedding, compute_dtype)

    rgb = jax.nn.sigmoid(_linear(params["rgb"], h_dir, compute_dtype))
    return rgb, sigma


def nerf_param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
