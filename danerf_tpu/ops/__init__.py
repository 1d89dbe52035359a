from danerf_tpu.ops.encoding import positional_encoding, encoding_output_dim
from danerf_tpu.ops.rays import generate_rays, rays_for_pixels, look_at_c2w
from danerf_tpu.ops.sampling import sample_stratified, sample_pdf, combine_z
from danerf_tpu.ops.composite import composite

__all__ = [
    "positional_encoding",
    "encoding_output_dim",
    "generate_rays",
    "rays_for_pixels",
    "look_at_c2w",
    "sample_stratified",
    "sample_pdf",
    "combine_z",
    "composite",
]
