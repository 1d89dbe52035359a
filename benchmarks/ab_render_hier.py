"""Same-day A/B of the 800x800 frame render: coarse-only vs 64+64
hierarchical through the CURRENT merged-kernel path (VERDICT item 4 — the
README table quoted a pre-merged-kernel 1374 ms figure).

Sweeps DANERF_PALLAS_RENDER_TILE when --sweep is given (the env var is read
at import, so the sweep re-execs itself per value).

Run on the real TPU:  python benchmarks/ab_render_hier.py [--sweep]
Writes benchmarks/render_hier_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = W = 800
ITERS = 3


def measure():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.models import init_nerf_params
    from danerf_tpu.render.renderer import render_frame

    cfg = NeRFConfig(use_bf16=True, use_pallas=True)
    params = init_nerf_params(jax.random.key(0), cfg)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0
    focal = 0.5 * W / np.tan(0.5 * 0.6911)

    def frame(n_imp):
        return render_frame(params, cfg, jax.random.key(1), c2w, H, W, focal,
                            n_importance=n_imp, perturb=False)

    out = {}
    for name, n_imp in [("coarse64", 0), ("hier64+64", 64)]:
        rgb, depth, acc = frame(n_imp)          # compile + warm
        float(jnp.sum(rgb))                     # force through the tunnel
        t0 = time.perf_counter()
        for _ in range(ITERS):
            rgb, depth, acc = frame(n_imp)
        float(jnp.sum(rgb))
        out[name] = (time.perf_counter() - t0) / ITERS * 1000.0
    out["ratio"] = out["hier64+64"] / out["coarse64"]
    return out


def main():
    if "--child" in sys.argv:
        print(json.dumps(measure()))
        return

    tiles = [None]
    if "--sweep" in sys.argv:
        tiles = [None, "4096", "8192", "16384"]

    results = {}
    for tile in tiles:
        env = dict(os.environ)
        if tile is not None:
            env["DANERF_PALLAS_RENDER_TILE"] = tile
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--child"], env=env, capture_output=True,
                           text=True)
        label = f"tile={tile or 'default(2048)'}"
        if r.returncode != 0:
            results[label] = {"error": r.stderr[-500:]}
            print(label, "FAILED", file=sys.stderr)
            continue
        results[label] = json.loads(r.stdout.strip().splitlines()[-1])
        print(label, results[label], flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "render_hier_ab.json")
    with open(out_path, "w") as f:
        json.dump({"resolution": [H, W], "iters": ITERS,
                   "results": results}, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
