"""danerf_tpu — a TPU-native NeRF-W framework with depth-aware shader effects.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
``ByeongKyuPark/Depth-Aware-Shader-Effects-for-NeRF`` (the reference is a
single-GPU PyTorch research repo; this is a TPU-first production framework):

- ``ops``      pure-function math core: positional encoding, ray generation,
               stratified + inverse-CDF importance sampling, alpha compositing
               (reference: src/models.py:6-54, src/ray_utils.py, src/render.py:56-80)
- ``models``   the NeRF-W MLP with appearance embeddings and the time-conditioned
               AnimatedNeRF variant (reference: src/models.py:57-265)
- ``render``   volume renderer with the hierarchical coarse->fine pass actually
               wired (the reference stubs it at src/render.py:83-86)
- ``data``     Blender-synthetic loader + device-resident ray pool + a procedural
               scene generator (reference: src/dataset.py)
- ``train``    jitted train step, optax Adam + step decay, checkpoint/resume
               (reference: src/train.py)
- ``parallel`` device mesh + sharding: data-parallel over rays, optional tensor
               parallel over the MLP hidden dim (the reference has no
               distributed code at all)
- ``kernels``  Pallas TPU kernels for the fused ray-march hot path
- ``fx``       the 13 depth-aware image effects as jitted on-device ops
               (reference: src/post_processor.py:8-499)
- ``viz``      camera paths, depth colormaps, video encoding
               (reference: run.py:63-282, render_aligned_spiral.py, create_video.py)
- ``cli``      train/render/video/effects entry points (reference: run.py:15-61)
"""

__version__ = "0.1.0"

from danerf_tpu.config import NeRFConfig  # noqa: F401
