"""Import reference (PyTorch) checkpoints into this framework.

A user of the reference has ``checkpoint_*.pt`` files written by
/root/reference/src/train.py:113-125: a dict with ``model_state_dict`` (keys
``pts_linears.{i}.{weight,bias}``, ``density_head.*``, ``dir_linear.*``,
``appearance_projection.*``, ``rgb_linear.*``), optional
``appearance_embeddings``, plus optimizer state / loss / psnr / iteration.
This module converts that payload into this framework's param pytree so
existing trained models keep working after the switch.

torch stores Linear weights as (out, in); this framework stores (in, out) so
applications are ``x @ W`` — weights are transposed on the way in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from danerf_tpu.config import NeRFConfig


def convert_state_dict(state_dict: dict, cfg: NeRFConfig) -> dict:
    """Convert a reference ``model_state_dict`` (tensors or ndarrays) to the
    params pytree of :func:`danerf_tpu.models.init_nerf_params`."""

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    def linear(prefix):
        return {"w": arr(f"{prefix}.weight").T, "b": arr(f"{prefix}.bias")}

    trunk = []
    i = 0
    while f"pts_linears.{i}.weight" in state_dict:
        trunk.append(linear(f"pts_linears.{i}"))
        i += 1
    if i != cfg.num_layers:
        raise ValueError(f"checkpoint has {i} trunk layers, config expects {cfg.num_layers}")

    params = {
        "trunk": trunk,
        "density": linear("density_head"),
        "dir": linear("dir_linear"),
        "rgb": linear("rgb_linear"),
    }
    if "appearance_projection.weight" in state_dict:
        params["appearance_proj"] = linear("appearance_projection")
    return params


def load_reference_checkpoint(path: str, cfg: NeRFConfig
                              ) -> Tuple[dict, Optional[np.ndarray], dict]:
    """Load a reference ``.pt`` checkpoint file.

    Returns (model_params, appearance_embeddings | None, metadata).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = convert_state_dict(ckpt["model_state_dict"], cfg)
    emb = None
    if ckpt.get("appearance_embeddings") is not None:
        e = ckpt["appearance_embeddings"]
        emb = (e.detach().cpu().numpy() if hasattr(e, "detach")
               else np.asarray(e)).astype(np.float32)
    meta = {k: ckpt[k] for k in ("loss", "psnr", "iteration") if k in ckpt}
    return params, emb, meta
