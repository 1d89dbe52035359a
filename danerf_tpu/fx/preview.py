"""Headless effect preview — the non-GUI equivalent of the reference's Tk
editors.

The reference ships two interactive editors: PostProcessor.show_editor_ui
(/root/reference/src/post_processor.py:501-661, per-effect parameter sliders)
and the moderngl ShaderEditor (/root/reference/src/shader_editor.py:250-391,
auto-discovered uniform sliders).  This environment is headless, so the
declared capability — explore effect parameters interactively — maps to a
parameter-file-driven preview (SURVEY.md §7 non-goals): a JSON spec of
effects + parameter sweeps in, a contact sheet of processed previews out.

Spec format::

    {
      "effects": [
        {"name": "Fog", "sweep": {"fog_start": [0.0, 0.2, 0.4]}},
        {"name": "Toon Shader", "params": {"toon_levels": 8}}
      ]
    }
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Optional

import numpy as np

from danerf_tpu.fx.effects import EFFECTS, apply_effect, default_params


def _slug(name: str, params: dict) -> str:
    parts = [name.lower().replace(" ", "_")]
    parts += [f"{k}={v:g}" for k, v in sorted(params.items())]
    return "__".join(parts)


def expand_spec(spec: dict):
    """Yield (effect_name, params) combos from a preview spec."""
    for entry in spec.get("effects", []):
        name = entry["name"]
        if name not in EFFECTS:
            raise KeyError(f"unknown effect {name!r}")
        base = dict(entry.get("params", {}))
        sweep = entry.get("sweep", {})
        if not sweep:
            yield name, base
            continue
        keys = sorted(sweep)
        for combo in itertools.product(*(sweep[k] for k in keys)):
            p = dict(base)
            p.update(dict(zip(keys, combo)))
            yield name, p


def render_previews(image: np.ndarray, depth: Optional[np.ndarray],
                    spec: dict, output_dir: str) -> list[str]:
    """Write one preview PNG per (effect, parameter combo); returns paths."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for name, params in expand_spec(spec):
        out = np.asarray(apply_effect(name, image, depth, params))
        path = os.path.join(output_dir, _slug(name, params) + ".png")
        Image.fromarray(out).save(path)
        written.append(path)
    # manifest records the full parameter set used for each preview
    manifest = []
    for (name, params), path in zip(expand_spec(spec), written):
        full = default_params()
        full.update(params)
        manifest.append({"effect": name, "path": os.path.basename(path),
                         "params": full})
    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return written


def preview_from_files(image_path: str, depth_path: Optional[str],
                       spec_path: str, output_dir: str) -> list[str]:
    from PIL import Image

    with Image.open(image_path) as img:
        image = np.asarray(img)[..., :3]
    depth = None
    if depth_path:
        with Image.open(depth_path) as img:
            d = np.asarray(img).astype(np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        depth = d / 255.0
    with open(spec_path) as f:
        spec = json.load(f)
    return render_previews(image, depth, spec, output_dir)
