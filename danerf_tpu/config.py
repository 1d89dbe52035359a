"""Frozen configuration for the TPU NeRF-W framework.

Mirrors the user-visible knob set of the reference's static ``Config`` class
(/root/reference/config.py:3-36) plus the CLI flags scattered across its entry
points (/root/reference/run.py:15-61), unified as one immutable dataclass with
override helpers.  Immutability matters on TPU: configs are closed over by
``jax.jit``-traced functions, so they must be hashable and static.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    # --- dataset (reference config.py:5-7) ---
    dataset_type: str = "nerf_synthetic"
    dataset_path: str = "data/nerf_synthetic"
    scene: str = "lego"

    # --- model (reference config.py:10-14) ---
    hidden_dim: int = 256
    num_layers: int = 8
    skip_connect_layers: Tuple[int, ...] = (4,)
    num_samples: int = 64        # coarse samples per ray
    num_importance: int = 64     # fine (importance) samples per ray

    # --- density head robustness (new; defaults are reference-exact) ---
    # The reference's ReLU density head under torch-default init can be BORN
    # DEAD: for some PRNG seeds sigma_pre < 0 at every visible point, the
    # relu gate zeroes every gradient, and training never moves (observed:
    # 1 of 3 seeds on the parity scene, examples/parity_report.json; the
    # torch semantics carry the same hazard).  Mitigations, both off by
    # default to preserve parity with /root/reference/src/models.py:93:
    #   density_bias_init > 0 shifts the head alive at init (e.g. 0.5);
    #   density_activation = "softplus" has no hard-zero gradient region.
    density_activation: str = "relu"       # "relu" | "softplus"
    density_bias_init: float = 0.0

    # --- appearance embedding (reference config.py:17-18) ---
    use_appearance: bool = True
    appearance_dim: int = 32

    # --- animated (time-conditioned) variant (reference src/models.py:165-265;
    #     the reference declares it but its config lacks time_enc_levels) ---
    use_time: bool = False
    time_enc_levels: int = 6

    # --- training (reference config.py:21-25) ---
    batch_size: int = 1024       # rays per step (global across the mesh)
    learning_rate: float = 5e-4
    num_iterations: int = 30000
    scheduler_step_size: int = 10000
    scheduler_gamma: float = 0.5
    warmup_batch_size: int = 64  # reference src/train.py:26,56-57
    warmup_iters: int = 5

    # --- scene bounds (reference config.py:28-29) ---
    near: float = 2.0
    far: float = 6.0
    # Optional (xmin, ymin, zmin, xmax, ymax, zmax) scene box: per-ray
    # [near, far] is tightened to the ray/box overlap (static-shape empty-space
    # culling — same sample count concentrated where the scene is).  None
    # reproduces the reference's global bounds exactly.
    scene_aabb: "tuple | None" = None

    # --- loss (new): auxiliary MSE on the coarse pass when the hierarchical
    # fine pass is active.  The reference's loss covers only the final output
    # (src/train.py:87) but its fine pass never ran; standard NeRF supervises
    # both, which stabilizes the importance distribution. ---
    coarse_loss_weight: float = 1.0

    # --- encodings (reference config.py:32-33) ---
    pos_enc_levels: int = 10
    dir_enc_levels: int = 4

    # --- TPU-specific (new; no analogue in the reference) ---
    # bf16 matmuls on the MXU with fp32 params/accumulation.
    use_bf16: bool = True
    # Fused Pallas ray-march kernel instead of the XLA-fused jnp path.
    use_pallas: bool = False
    # Route the TRAINING loss through the fully-fused ray-march custom VJP
    # (field eval AND compositing in one kernel pair, per-ray HBM I/O)
    # instead of the per-sample kernel + XLA compositing.  Requires
    # use_pallas; gradients verified equal to the core path in tests.
    use_fused_train: bool = True
    # 2D (TR, S) composite inside the fused train kernel: the forward +
    # backward compositing chain runs on dense rays-by-samples tensors
    # (full 8-sublane occupancy per vreg) instead of (TR, 1, S) lane
    # tensors that use 1 of 8 sublanes, and the cumsum/cotangent
    # dot_generals become plain (TR,S)@(S,S) matmuls.  A/B on v5e:
    # see BENCH_NOTES.md round 4.  Gradients verified equal in tests.
    fused_composite2d: bool = True
    # Hierarchical training as ONE pallas_call per step: coarse march,
    # in-kernel inverse-CDF resampling, rank-merged fine stage, both MSE
    # terms, and the full backward share a VMEM tile — the coarse forward
    # is never recomputed (6x forward-matmul FLOPs vs 7x for the
    # coarse-custom-VJP + merged-kernel pair).  Gradients verified against
    # the two-kernel path in tests.  DEFAULT OFF: measured SLOWER on v5e
    # (219k vs 234k rays/s) despite the 14% FLOP saving — the monolithic
    # kernel's VMEM pressure costs more in Mosaic scheduling than the saved
    # recompute (larger tiles are worse still; BENCH_NOTES.md "Negative
    # results").  Kept as an opt-in for future Mosaic versions.
    use_hier_onepass: bool = False
    # Rematerialize the field evaluation in the backward pass (trades ~1/3
    # more FLOPs for dropping all trunk activations from HBM).  Measured on
    # v5e: the un-remat'd XLA path OOMs at a 65536-ray batch (33 GB of
    # activation temps); remat makes large batches feasible.
    remat: bool = False
    # White-background alpha compositing of training targets.
    white_background: bool = False
    # Data-parallel mesh axis sizes (data, model). model=1 => pure DP.
    mesh_data: int = 1
    mesh_model: int = 1

    # --- rendering (reference run.py:89-100) ---
    render_chunk: int = 65536    # rays per device call when rendering frames

    def __post_init__(self):
        # use_hier_onepass only takes effect on the fused one-pass train path
        # with an active fine pass (train.trainer.use_onepass); warn instead
        # of silently benchmarking the wrong kernel.
        if self.use_hier_onepass and not (
                self.use_pallas and self.use_fused_train
                and self.num_importance > 0 and not self.use_time):
            import warnings

            warnings.warn(
                "use_hier_onepass=True is ignored: it requires use_pallas, "
                "use_fused_train, num_importance>0 and use_time=False "
                "(train/trainer.py use_onepass)", stacklevel=2)

    # --- derived dims ---
    @property
    def pos_enc_dim(self) -> int:
        # gamma(x) = [x, sin(2^i x), cos(2^i x)]  (reference src/models.py:49-54)
        return 3 * (1 + 2 * self.pos_enc_levels)

    @property
    def dir_enc_dim(self) -> int:
        return 3 * (1 + 2 * self.dir_enc_levels)

    @property
    def time_enc_dim(self) -> int:
        return 1 * (1 + 2 * self.time_enc_levels)

    def replace(self, **kw) -> "NeRFConfig":
        return dataclasses.replace(self, **kw)


# Quality presets for frame rendering (reference run.py:89-100).  The
# reference's chunk sizes (8192/4096/2048) bounded GPU memory; on TPU the
# fused per-ray kernel keeps HBM per-chunk cost small and LARGER chunks are
# faster (BENCH_NOTES tile sweep), so the preset chunks are TPU-tuned —
# higher quality still maps to smaller chunks (more samples per ray live
# per chunk).  render_path honors these; an explicit --chunk overrides.
RENDER_PRESETS = {
    # name: (samples_scale, chunk, perturb, use_importance)
    "preview": dict(samples_scale=0.5, chunk=65536, perturb=False, importance=False),
    "medium": dict(samples_scale=1.0, chunk=65536, perturb=True, importance=True),
    "high": dict(samples_scale=1.0, chunk=32768, perturb=True, importance=True),
}
