"""Workspace bootstrap (reference ensure_dirs.py:4-49 — which, as shipped,
cannot run due to a stray backquote at :50; the capability is reimplemented).
"""

from __future__ import annotations

import os


def ensure_directories(base: str = ".") -> list[str]:
    """Create the standard working directories; returns the created paths."""
    dirs = [os.path.join(base, d) for d in ("checkpoints", "output", "shaders")]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    return dirs


def list_checkpoints(base: str = ".") -> dict:
    """Map scene -> newest checkpoint path across checkpoints_* dirs."""
    from danerf_tpu.utils.checkpoint import latest_checkpoint

    out = {}
    for entry in sorted(os.listdir(base)):
        if entry.startswith("checkpoints"):
            path = latest_checkpoint(os.path.join(base, entry))
            if path:
                scene = entry.replace("checkpoints_", "") or "default"
                out[scene] = path
    return out
