from danerf_tpu.data.dataset import RayDataset, load_dataset
from danerf_tpu.data.blender import load_blender_scene
from danerf_tpu.data.synthetic import make_synthetic_scene

__all__ = ["RayDataset", "load_dataset", "load_blender_scene", "make_synthetic_scene"]
