"""Estimate the born-dead-density-head rate for both init families.

The reference's ReLU density head under torch-default init can be BORN DEAD
(sigma_pre < 0 at every visible point -> zero gradients forever; see
config.py density_activation note).  The parity study excludes dead seeds
symmetrically; this probe measures the rate itself over many seeds for
(a) genuine torch inits and (b) this repo's jax inits (same U(+-1/sqrt(in))
distribution, different RNG), so the report can say whether the two init
families share the hazard at the same rate.

Writes examples/parity_runs/dead_rates.json.
Run: python benchmarks/dead_rate_probe.py --n 60
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--scene", default="examples/procedural_scene")
    ap.add_argument("--out", default="examples/parity_runs/dead_rates.json")
    args = ap.parse_args()

    import jax

    # hermetic CPU probe: never attach to the (possibly busy) TPU tunnel;
    # the env image pins JAX_PLATFORMS=axon in sitecustomize, so the config
    # knob is the only reliable override (same as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from benchmarks.jax_reference import (density_alive_probe,
                                          sample_torch_init,
                                          torch_init_to_params)
    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data.blender import load_blender_scene
    from danerf_tpu.models import init_nerf_params

    ds = load_blender_scene(args.scene, "train")
    cfg = NeRFConfig(num_importance=0, use_pallas=False, use_bf16=False,
                     near=ds.near, far=ds.far)

    def alive(params_model):
        return density_alive_probe(params_model, cfg, ds.images.shape,
                                   ds.c2ws, ds.focal) > 0.0

    torch_alive = [alive(torch_init_to_params(
        sample_torch_init(cfg, ds.n_images, s), cfg)["model"])
        for s in range(args.n)]
    jax_alive = [alive(init_nerf_params(
        jax.random.split(jax.random.key(s), 3)[0], cfg))
        for s in range(args.n)]
    # NOTE: the jax probe uses the SAME key derivation as
    # train.create_train_state (k_model = split(key(seed), 3)[0]) so the rates
    # describe exactly the seeds the study draws.

    report = {
        "n_seeds": args.n,
        "torch_init_dead_rate": 1.0 - float(np.mean(torch_alive)),
        "jax_init_dead_rate": 1.0 - float(np.mean(jax_alive)),
        "torch_dead_seeds": [s for s, a in enumerate(torch_alive) if not a],
        "jax_dead_seeds": [s for s, a in enumerate(jax_alive) if not a],
        "note": "same fixed probe set both families (density_alive_probe); "
                "the hazard is a property of the reference architecture "
                "(ReLU density head, U(+-1/sqrt(in)) init), not of either "
                "framework",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
