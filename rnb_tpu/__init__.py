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

# Global matmul precision. On the TPU MXU an f32 'highest' dot costs 6 bf16
# passes, 'high' costs 3 (bf16_3x, ~f32-accurate), 'default' costs 1 (raw
# bf16 inputs). Convergence validation on the synthetic-sphere scene
# (tools/validate_precision.py, 400 steps, v5e) shows identical mesh accuracy
# at all three (radius err 0.003-0.004) with high 24% and default 37% faster
# than highest, so the package defaults to 'high': near-f32 numerics on the
# differentiable path at 2x the MXU rate. RNB_MATMUL_PRECISION=default is the
# validated turbo option; =highest restores exact-f32 for parity studies.
# (No-grad up-sampling sweeps run in explicit bf16 regardless — see
# fields.sdf_only_lowp; Pallas kernels control their own precision.)
_prec = _os.environ.get("RNB_MATMUL_PRECISION", "high")
_jax.config.update("jax_default_matmul_precision", _prec)

# Persistent compilation cache: the train-step program (Pallas kernels
# included) costs 100-340 s to compile on this image's remote-compile
# service; resume/validation/bench processes re-pay it without a cache.
try:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # older jaxlib without the knobs — cache is an optimization
    pass

