"""rnb_tpu — TPU-native reflectance+normal multi-view surface reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of RNb-NeuS
(CVPR 2024): NeuS-style neural-SDF surface reconstruction supervised by
photometric-stereo normal/albedo maps re-rendered under virtual lights.

Layer map (mirrors the reference's layering, reference files cited per module):

  cli / exp entrypoint      rnb_tpu.cli
  runner (train/validate)   rnb_tpu.train.runner
  volume renderer           rnb_tpu.models.renderer
  neural fields             rnb_tpu.models.fields, rnb_tpu.models.embedder
  dataset / cameras/lights  rnb_tpu.data.dataset, rnb_tpu.data.lights
  parallelism               rnb_tpu.parallel  (greenfield: mesh/shard_map/psum)
  kernels                   rnb_tpu.ops       (Pallas MLP kernels, C++ marching cubes)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# JAX's DEFAULT matmul precision truncates inputs to bf16 (TPU MXU fast path).
# That is fine for the big MLP matmuls once validated, but it silently breaks
# parity-critical small geometry math (camera rays, light frames) and SDF
# zero-crossing placement. Default the package to full-f32 ('highest');
# override with RNB_MATMUL_PRECISION=default|high|highest for perf experiments
# (the Pallas kernels control their own precision explicitly).
_prec = _os.environ.get("RNB_MATMUL_PRECISION", "highest")
_jax.config.update("jax_default_matmul_precision", _prec)

