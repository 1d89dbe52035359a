"""Checkpoint / resume.

The reference torch.saves ``{model_state_dict, optimizer_state_dict, loss,
psnr, iteration, appearance_embeddings}`` every 1000 iterations and at the end
(/root/reference/src/train.py:113-125,176-187) but has NO resume path — render
scripts restore weights only (run.py:361-366).  Here checkpointing is
first-class: the full train state (params, optimizer state, step, PRNG key)
round-trips, enabling true ``--resume`` (SURVEY.md §5.4).

Primary backend is Orbax (sharded-aware on multi-host); a msgpack fallback via
flax.serialization keeps checkpoints working if the Orbax API is unavailable.
Directory layout: ``{save_dir}/checkpoint_{step:06d}`` + ``checkpoint_final``,
mirroring the reference's naming scheme.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _is_key(x) -> bool:
    try:
        return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def _to_host(tree):
    """Host numpy copy; typed PRNG keys are stored as their raw key data."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(jax.random.key_data(x)) if _is_key(x) else np.asarray(x),
        tree)


def save_checkpoint(save_dir: str, name: str, state_tree: Any, metadata: Optional[dict] = None):
    """Save a pytree checkpoint under ``{save_dir}/{name}``."""
    path = os.path.join(save_dir, name)
    os.makedirs(path, exist_ok=True)
    host_tree = _to_host(state_tree)
    try:
        import orbax.checkpoint as ocp

        ckpt_path = os.path.abspath(os.path.join(path, "state"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(ckpt_path, host_tree, force=True)
        ckptr.wait_until_finished()
        backend = "orbax"
    except Exception:
        from flax import serialization

        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(host_tree))
        backend = "msgpack"
    meta = dict(metadata or {})
    meta["backend"] = backend
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def restore_checkpoint(path: str, target_tree: Any):
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    ``target_tree`` supplies the pytree structure/dtypes (abstract template).
    Returns (state_tree, metadata).
    """
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    host_target = _to_host(target_tree)
    if meta.get("backend") == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), host_target
        )
        state = ckptr.restore(os.path.abspath(os.path.join(path, "state")), abstract)
    else:
        from flax import serialization

        with open(os.path.join(path, "state.msgpack"), "rb") as f:
            state = serialization.msgpack_restore(f.read())
        state = jax.tree_util.tree_map(lambda t, s: np.asarray(s, t.dtype),
                                       host_target, state)
    # Re-wrap PRNG key leaves (stored as raw key data).
    state = jax.tree_util.tree_map(
        lambda t, s: jax.random.wrap_key_data(jnp_asarray_u32(s)) if _is_key(t) else s,
        target_tree, state)
    return state, meta


def jnp_asarray_u32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.uint32)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Path of the newest step checkpoint (or the final one) in ``save_dir``."""
    final = os.path.join(save_dir, "checkpoint_final")
    candidates = []
    for p in glob.glob(os.path.join(save_dir, "checkpoint_*")):
        m = re.search(r"checkpoint_(\d+)$", p)
        if m and os.path.exists(os.path.join(p, "meta.json")):
            candidates.append((int(m.group(1)), p))
    if os.path.exists(os.path.join(final, "meta.json")):
        candidates.append((1 << 60, final))
    if not candidates:
        return None
    return max(candidates)[1]
