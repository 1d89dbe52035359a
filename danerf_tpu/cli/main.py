"""Unified CLI: train / render / spiral / effects / video.

Preserves the user-visible knob set of the reference's entry points —
run.py:15-61 (~25 flags incl. quality presets, camera paths, shader/effect
selection, frame ranges), render_aligned_spiral.py:211-219,
apply_all_shaders.py:178-183, create_video.py:79-86 — as subcommands of one
``python -m danerf_tpu.cli.main``.  Config overrides land on the frozen
NeRFConfig dataclass instead of mutating a global class.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="danerf", description="TPU NeRF-W framework")
    try:
        from importlib.metadata import version

        ver = version("danerf-tpu")
    except Exception:  # not installed as a package (repo checkout)
        ver = "dev"
    p.add_argument("--version", action="version", version=f"danerf {ver}")
    sub = p.add_subparsers(dest="cmd", required=True)

    # ---- train (reference run.py --mode train) ----
    t = sub.add_parser("train", help="train a NeRF-W model")
    t.add_argument("--scene", type=str, default="lego")
    t.add_argument("--dataset_path", type=str, default="data/nerf_synthetic")
    t.add_argument("--iters", type=int, default=None)
    t.add_argument("--batch_size", type=int, default=None)
    t.add_argument("--save_dir", type=str, default=None)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--no_appearance", action="store_true")
    t.add_argument("--num_importance", type=int, default=None)
    t.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel axis size (0 = all devices)")
    t.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel axis size")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--profile", type=str, default=None,
                   help="capture a jax.profiler trace of ~20 steps to this dir")
    t.add_argument("--density_activation", type=str, default=None,
                   choices=["relu", "softplus"],
                   help="density head activation (default relu = reference; "
                        "softplus avoids born-dead seeds, see config.py)")
    t.add_argument("--density_bias_init", type=float, default=None,
                   help="added to the density bias at init (e.g. 0.5 to "
                        "start the head alive)")
    t.add_argument("--no_pallas", action="store_true",
                   help="disable the fused Pallas kernel (on by default on TPU)")
    t.add_argument("--white_background", action="store_true",
                   help="composite RGBA training targets over white and "
                        "render with a white background (the nerf_synthetic "
                        "convention; reference src/dataset.py:159-161 splits "
                        "alpha without compositing)")
    t.add_argument("--use_time", action="store_true",
                   help="train the time-conditioned AnimatedNeRF variant "
                        "(reference src/models.py:165-265, declared but "
                        "unrunnable there); needs a dataset with per-image "
                        "times — the procedural time-varying scene supplies "
                        "them when no Blender data is present")
    # multi-host runtime (jax.distributed.initialize; SURVEY.md §5.8).  On a
    # TPU pod all three may be omitted if any one is passed as 'auto'.
    t.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host training)")
    t.add_argument("--num_processes", type=int, default=None,
                   help="total number of hosts")
    t.add_argument("--process_id", type=int, default=None,
                   help="this host's index in [0, num_processes)")

    # ---- render (reference run.py --mode render) ----
    r = sub.add_parser("render", help="render novel views along a camera path")
    r.add_argument("--scene", type=str, default="hotdog")
    r.add_argument("--dataset_path", type=str, default="data/nerf_synthetic")
    r.add_argument("--checkpoint", type=str, default=None)
    r.add_argument("--output_dir", type=str, default="output")
    r.add_argument("--frames", type=int, default=120)
    r.add_argument("--quality", type=str, default="high",
                   choices=["preview", "medium", "high"])
    r.add_argument("--width", type=int, default=800)
    r.add_argument("--height", type=int, default=800)
    r.add_argument("--start_frame", type=int, default=0)
    r.add_argument("--end_frame", type=int, default=None)
    r.add_argument("--camera_path", type=str, default="circle",
                   choices=["circle", "spiral", "hemisphere", "horizontal_only"])
    r.add_argument("--spiral_loops", type=float, default=2.0)
    r.add_argument("--height_range", type=float, nargs=2, default=[-0.5, 0.5])
    r.add_argument("--effect", type=str, default=None,
                   help="depth-aware effect applied per frame (replaces --use_shader)")
    r.add_argument("--save_depth", action="store_true")
    r.add_argument("--raw_output", action="store_true")
    r.add_argument("--create_video", action="store_true")
    r.add_argument("--fps", type=int, default=30)
    r.add_argument("--no_pallas", action="store_true")
    r.add_argument("--chunk", type=int, default=None,
                   help="rays per device call (default: quality preset)")
    r.add_argument("--mesh_data", type=int, default=1,
                   help="shard each frame's rays over this many devices "
                        "(0 = all devices)")
    r.add_argument("--white_background", action="store_true",
                   help="fill acc<1 rays with white (match a model trained "
                        "with --white_background)")
    r.add_argument("--use_time", action="store_true",
                   help="render an AnimatedNeRF checkpoint (time-conditioned)")
    r.add_argument("--time", type=float, default=None,
                   help="fixed frame time in [0,1] for --use_time renders")
    r.add_argument("--animate_time", action="store_true",
                   help="sweep t from 0 to 1 across the rendered frames")

    # ---- spiral (reference render_aligned_spiral.py) ----
    s = sub.add_parser("spiral", help="aligned spiral render + video")
    s.add_argument("--scene", type=str, default="chair")
    s.add_argument("--dataset_path", type=str, default="data/nerf_synthetic")
    s.add_argument("--checkpoint", type=str, default=None)
    s.add_argument("--output_dir", type=str, default="spiral_render")
    s.add_argument("--frames", type=int, default=120)
    s.add_argument("--fps", type=int, default=60)
    s.add_argument("--loops", type=float, default=2)
    s.add_argument("--rotation", type=str, default="x",
                   choices=["x", "y", "z", "none"])
    s.add_argument("--width", type=int, default=800)
    s.add_argument("--height", type=int, default=800)
    s.add_argument("--no_pallas", action="store_true")
    s.add_argument("--mesh_data", type=int, default=1,
                   help="shard each frame's rays over this many devices "
                        "(0 = all devices)")

    # ---- effects (reference apply_all_shaders.py) ----
    e = sub.add_parser("effects", help="apply effects to rendered frames")
    e.add_argument("--input_dir", type=str, required=True)
    e.add_argument("--output_dir", type=str, default=None)
    e.add_argument("--effect", type=str, default=None,
                   help="one effect; default: all")
    e.add_argument("--skip_effects", type=str, nargs="+", default=[])
    e.add_argument("--fog_only", action="store_true")
    e.add_argument("--fps", type=int, default=60)

    # ---- eval (PSNR/SSIM on a held-out split; new — the reference only
    #      eyeballs a 1000-ray strip, src/train.py:127-173) ----
    ev = sub.add_parser("eval", help="render a split and report PSNR/SSIM")
    ev.add_argument("--scene", type=str, default="lego")
    ev.add_argument("--dataset_path", type=str, default="data/nerf_synthetic")
    ev.add_argument("--checkpoint", type=str, default=None)
    ev.add_argument("--split", type=str, default="val")
    ev.add_argument("--max_views", type=int, default=None)
    ev.add_argument("--num_importance", type=int, default=None)
    ev.add_argument("--out", type=str, default=None, help="write JSON report")
    ev.add_argument("--no_pallas", action="store_true")
    ev.add_argument("--optimize_embeddings", action="store_true",
                    help="NeRF-W held-out protocol: per view, fit a fresh "
                         "appearance embedding on the left half and score "
                         "the right half")
    ev.add_argument("--opt_steps", type=int, default=50,
                    help="embedding-optimization steps per view")
    ev.add_argument("--use_time", action="store_true",
                    help="evaluate an AnimatedNeRF checkpoint (per-view "
                         "times come from the dataset)")
    ev.add_argument("--white_background", action="store_true",
                    help="score against white-composited GT and render with "
                         "a white background")

    # ---- preview (headless replacement for the Tk/moderngl editors) ----
    pv = sub.add_parser("preview", help="parameter-sweep effect previews")
    pv.add_argument("--image", type=str, required=True)
    pv.add_argument("--depth", type=str, default=None)
    pv.add_argument("--spec", type=str, required=True,
                    help="JSON spec: {effects: [{name, params?, sweep?}]}")
    pv.add_argument("--output_dir", type=str, default="previews")

    # ---- video (reference create_video.py) ----
    v = sub.add_parser("video", help="encode an image sequence to video")
    v.add_argument("--input_dir", type=str, required=True)
    v.add_argument("--output", type=str, required=True)
    v.add_argument("--pattern", type=str, default="rgb_*.png")
    v.add_argument("--fps", type=int, default=30)
    v.add_argument("--resolution", type=int, nargs=2, default=None)
    return p


def _make_config(args):
    import jax

    from danerf_tpu.config import NeRFConfig

    cfg = NeRFConfig(scene=args.scene, dataset_path=args.dataset_path)
    over = {}
    if getattr(args, "batch_size", None):
        over["batch_size"] = args.batch_size
    if getattr(args, "no_appearance", False):
        over["use_appearance"] = False
    if getattr(args, "num_importance", None) is not None:
        over["num_importance"] = args.num_importance
    if getattr(args, "density_activation", None):
        over["density_activation"] = args.density_activation
    if getattr(args, "density_bias_init", None) is not None:
        over["density_bias_init"] = args.density_bias_init
    if getattr(args, "use_time", False):
        over["use_time"] = True
    if getattr(args, "white_background", False):
        over["white_background"] = True
    # fused kernel by default on real TPU (fastest path, 20x faster compiles);
    # CPU keeps XLA (pallas would run interpreted there)
    if jax.default_backend() == "tpu" and not getattr(args, "no_pallas", False):
        over["use_pallas"] = True
    return cfg.replace(**over) if over else cfg


def _load_checkpoint_params(args, cfg, n_images, want_table=False):
    """Restore params (+ appearance) for rendering (reference run.py:349-366).

    Accepts both this framework's checkpoint directories and the reference's
    torch ``.pt`` files (converted on the fly — migration path for existing
    trained models).  With ``want_table`` the third return value is the full
    (N_img, app_dim) embedding table (or None) for per-view evaluation.
    """
    import jax

    from danerf_tpu.train import create_train_state
    from danerf_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

    ckpt = args.checkpoint
    if not ckpt:
        default_dir = f"checkpoints_{args.scene}"
        ckpt = latest_checkpoint(default_dir)
        if ckpt is None:
            sys.exit(f"No checkpoint found in {default_dir}; pass --checkpoint")
        print(f"Using checkpoint: {ckpt}")

    if ckpt.endswith(".pt"):
        from danerf_tpu.utils.convert import load_reference_checkpoint

        model, emb_table, meta = load_reference_checkpoint(ckpt, cfg)
        emb = None
        if cfg.use_appearance and emb_table is not None:
            emb = emb_table[0]  # reference uses embedding 0 (run.py:205)
        print(f"Imported reference checkpoint (iteration {meta.get('iteration')})")
        if want_table:
            return model, emb, emb_table if cfg.use_appearance else None
        return model, emb

    template = create_train_state(jax.random.key(0), cfg, n_images)
    state, _ = restore_checkpoint(ckpt, template)
    params = state[0]
    emb = None
    table = None
    if cfg.use_appearance and "appearance" in params:
        table = params["appearance"]
        emb = table[0]  # reference uses embedding 0 (run.py:205)
    if want_table:
        return params["model"], emb, table
    return params["model"], emb


def _make_render_mesh(args):
    """Optional frame-sharding mesh for render/spiral commands."""
    if getattr(args, "mesh_data", 1) == 1:
        return None
    import jax

    from danerf_tpu.parallel import make_mesh

    data = args.mesh_data or len(jax.devices())
    if data > len(jax.devices()):
        print(f"--mesh_data {data} > {len(jax.devices())} devices; "
              "rendering single-device")
        return None
    return make_mesh(data=data, model=1, devices=jax.devices()[:data])


def cmd_train(args):
    # Multi-host init MUST precede any other jax usage (parallel/mesh.py).
    if (args.coordinator_address is not None or args.num_processes is not None
            or args.process_id is not None):
        from danerf_tpu.parallel import initialize_distributed

        coord = args.coordinator_address
        if coord == "auto":  # TPU pod: resolved from the environment
            coord = None
        if initialize_distributed(coord, args.num_processes, args.process_id):
            import jax

            print(f"distributed: process {jax.process_index()}/"
                  f"{jax.process_count()}, {len(jax.devices())} global devices")

    import jax
    import jax.numpy as jnp

    from danerf_tpu.data import load_dataset
    from danerf_tpu.models import init_nerf_params, nerf_apply
    from danerf_tpu.train import train

    cfg = _make_config(args)

    # Startup smoke test before committing to training (reference
    # run.py:327-344): 10 random points through the model, with and without
    # an appearance embedding.
    params = init_nerf_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (10, 3))
    d = jax.random.normal(jax.random.key(2), (10, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tt = jnp.full((10, 1), 0.5) if cfg.use_time else None
    rgb, sigma = nerf_apply(params, cfg, x, d, t=tt)
    assert rgb.shape == (10, 3) and sigma.shape == (10,)
    if cfg.use_appearance:
        emb = jax.random.normal(jax.random.key(3), (10, cfg.appearance_dim))
        rgb, sigma = nerf_apply(params, cfg, x, d, emb, t=tt)
        assert rgb.shape == (10, 3)
    print(f"model smoke test passed: rgb={rgb.shape}, sigma={sigma.shape}")
    del params

    ds = load_dataset(cfg, "train")
    mesh = None
    if args.mesh_data != 1 or args.mesh_model != 1:
        import jax

        from danerf_tpu.parallel import make_mesh

        data = args.mesh_data or len(jax.devices()) // args.mesh_model
        if data * args.mesh_model <= len(jax.devices()):
            mesh = make_mesh(data=data, model=args.mesh_model)
            cfg = cfg.replace(mesh_data=data, mesh_model=args.mesh_model)
    save_dir = args.save_dir or f"checkpoints_{args.scene}"

    if args.profile:
        # Short profiled run before the real one (SURVEY.md §5.1).
        from danerf_tpu.utils.profiling import trace

        with trace(args.profile):
            train(cfg, ds, save_dir=save_dir, num_iterations=20,
                  checkpoint_every=0, progress=False)
        print(f"profiler trace written to {args.profile}")

    train(cfg, ds, save_dir=save_dir, resume=args.resume,
          num_iterations=args.iters, seed=args.seed, mesh=mesh,
          log_path=os.path.join(save_dir, "metrics.jsonl"))


def cmd_render(args):
    from danerf_tpu.data import load_dataset
    from danerf_tpu.render.frames import render_path

    cfg = _make_config(args)
    ds = load_dataset(cfg, "train")
    params, emb = _load_checkpoint_params(args, cfg, ds.n_images)
    render_path(params, cfg, args.output_dir, appearance_embedding=emb,
                num_frames=args.frames, quality=args.quality,
                width=args.width, height=args.height,
                start_frame=args.start_frame, end_frame=args.end_frame,
                camera_path_kind=args.camera_path,
                spiral_loops=args.spiral_loops,
                height_range=tuple(args.height_range), effect=args.effect,
                save_depth=args.save_depth, raw_output=args.raw_output,
                make_video=args.create_video, fps=args.fps,
                dataset_width=ds.width, focal=ds.focal,
                chunk=args.chunk, mesh=_make_render_mesh(args),
                time=args.time, animate_time=args.animate_time)


def cmd_spiral(args):
    from danerf_tpu.data import load_dataset
    from danerf_tpu.render.frames import render_aligned_spiral

    cfg = _make_config(args)
    ds = load_dataset(cfg, "train")
    params, emb = _load_checkpoint_params(args, cfg, ds.n_images)
    out = args.output_dir
    if not out.startswith("output/"):  # reference render_aligned_spiral.py:21-22
        out = os.path.join("output", out)
    render_aligned_spiral(params, cfg, out, appearance_embedding=emb,
                          num_frames=args.frames, fps=args.fps,
                          loops=args.loops, rotation_axis=args.rotation,
                          height=args.height, width=args.width, focal=ds.focal,
                          mesh=_make_render_mesh(args))


def cmd_effects(args):
    from danerf_tpu.fx.batch import apply_all_effects, apply_effect_to_frames

    out = args.output_dir or args.input_dir + "_effects"
    if args.effect:
        apply_effect_to_frames(args.input_dir,
                               os.path.join(out, args.effect.lower().replace(" ", "_")),
                               args.effect, fps=args.fps)
    else:
        apply_all_effects(args.input_dir, out, fog_only=args.fog_only,
                          skip=args.skip_effects, fps=args.fps)


def cmd_eval(args):
    import json

    from danerf_tpu.data import load_dataset
    from danerf_tpu.train.evaluate import evaluate

    cfg = _make_config(args)
    ds = load_dataset(cfg, args.split)
    params, emb, table = _load_checkpoint_params(args, cfg, ds.n_images,
                                                 want_table=True)
    import numpy as np

    appearance = None
    if cfg.use_appearance:
        if args.split == "train" and table is not None \
                and np.shape(table)[0] == ds.n_images:
            # per-view embeddings: each train view gets the embedding that
            # was optimized for it
            appearance = np.asarray(table)
        elif emb is not None:
            # held-out views: embedding 0 (reference run.py:205), unless
            # --optimize_embeddings fits per-view ones
            appearance = np.asarray(emb)[None].repeat(ds.n_images, 0)
    res = evaluate(params, cfg, ds, appearance=appearance,
                   max_views=args.max_views, n_importance=args.num_importance,
                   optimize_embeddings=args.optimize_embeddings,
                   opt_steps=args.opt_steps)
    print(json.dumps({k: res[k]
                      for k in ("psnr", "ssim", "mse", "n_views", "protocol")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


def cmd_preview(args):
    from danerf_tpu.fx.preview import preview_from_files

    written = preview_from_files(args.image, args.depth, args.spec, args.output_dir)
    print(f"wrote {len(written)} previews to {args.output_dir}")


def cmd_video(args):
    from danerf_tpu.viz.video import create_video_from_images

    ok = create_video_from_images(args.input_dir, args.output, args.pattern,
                                  args.fps,
                                  tuple(args.resolution) if args.resolution else None)
    if not ok:
        sys.exit(f"no images matching {args.pattern} in {args.input_dir}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    {"train": cmd_train, "render": cmd_render, "spiral": cmd_spiral,
     "effects": cmd_effects, "video": cmd_video,
     "preview": cmd_preview, "eval": cmd_eval}[args.cmd](args)


if __name__ == "__main__":
    main()
