from danerf_tpu.kernels.fused_mlp import fused_nerf_apply

__all__ = ["fused_nerf_apply"]
