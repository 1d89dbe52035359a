from danerf_tpu.models.nerf import (
    init_nerf_params,
    init_appearance_embeddings,
    nerf_apply,
    nerf_param_count,
)

__all__ = [
    "init_nerf_params",
    "init_appearance_embeddings",
    "nerf_apply",
    "nerf_param_count",
]
