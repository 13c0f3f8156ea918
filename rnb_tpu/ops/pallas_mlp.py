"""Pallas TPU kernel: fused SDF-MLP inference.

The NeuS up-sampling loop and the marching-cubes grid query evaluate the SDF
network with no gradient, millions of times (`/root/reference/models/
renderer.py:965-984` — 5 sweeps per train step; `renderer.py:10-25` — 512³ ≈
134M evals at mesh time). Under plain XLA each of the 9 linear layers round-
trips its [N,256] f32 activations through HBM; this kernel keeps the whole
chain (positional encoding -> 8x256 skip-MLP -> sdf head) in VMEM per point
block, loading every weight exactly once per grid step.

VMEM budget at block 1024, f32: weights ~2.1 MB + 3 activation buffers
~1 MB + PE scratch — comfortably inside 16 MB.

Inference-only by design: the two call sites are under stop_gradient, so no
custom VJP is needed (the differentiable path stays in XLA, see
fields.sdf_value_feat_grad).
"""

from __future__ import annotations

import functools
import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnb_tpu.models.fields import SDFConfig

BLOCK = 1024


def _dense_weights(params) -> List[tuple]:
    """Fold weight norm into plain (W [in,out], b [out]) per layer."""
    out = []
    for layer in params:
        if "v" in layer:
            v = layer["v"]
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (layer["g"][None, :] / jnp.maximum(norm, 1e-12))
        else:
            w = layer["w"]
        out.append((w, layer["b"]))
    return out


def supported(cfg: SDFConfig) -> bool:
    """The kernel is specialized to PE + skip-MLP architectures (any width);
    everything the shipped confs use."""
    return cfg.multires > 0 and cfg.d_in == 3


def _kernel(cfg: SDFConfig, n_layers: int, pts_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]

    x = pts_ref[...] * cfg.scale  # [B, 3]
    # positional encoding [x, sin(2^k x), cos(2^k x)]
    parts = [x]
    for k in range(cfg.multires):
        ang = x * (2.0 ** k)
        parts.append(jnp.sin(ang))
        parts.append(jnp.cos(ang))
    inputs = jnp.concatenate(parts, axis=-1)  # [B, input_ch]

    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    h = inputs
    for l in range(n_layers):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        h = jnp.dot(h, w_refs[l][...],
                    preferred_element_type=jnp.float32) + b_refs[l][...]
        if l < n_layers - 1:
            h = jax.nn.softplus(h * 100.0) / 100.0
    out_ref[...] = h[:, :1] / cfg.scale


@functools.partial(jax.jit, static_argnums=(0, 2))
def _run(cfg: SDFConfig, flat_args, interpret: bool):
    pts_pad, weights, biases = flat_args
    n_layers = len(weights)
    n = pts_pad.shape[0]
    grid = (n // BLOCK,)

    mspace = pl.ANY if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((BLOCK, 3), lambda i: (i, 0), memory_space=mspace)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=mspace))
    for b in biases:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                     memory_space=mspace))

    return pl.pallas_call(
        functools.partial(_kernel, cfg, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                               memory_space=mspace),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(pts_pad, *weights, *biases)


def use_fused(cfg: SDFConfig) -> bool:
    """Dispatch gate: kernel-capable architecture, TPU backend, enabled via
    RNB_PALLAS=1 (opt-in until the compiled path is benchmarked on hardware;
    the interpret-mode path is covered by tests/test_pallas.py)."""
    import os
    if os.environ.get("RNB_PALLAS", "0") != "1":
        return False
    return supported(cfg) and jax.default_backend() == "tpu"


def sdf_only_fused(cfg: SDFConfig, params, pts: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """[N,3] -> [N] sdf values; bit-comparable to fields.sdf_only (f32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pts.shape[0]
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    pts_pad = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    dense = _dense_weights(params)
    # slice the sdf head to one column (see fields.sdf_only)
    w_last, b_last = dense[-1]
    dense = dense[:-1] + [(w_last[:, :1], b_last[:1])]
    weights = tuple(w for w, _ in dense)
    biases = tuple(b for _, b in dense)
    out = _run(cfg, (pts_pad, weights, biases), interpret)
    return out[:n, 0]
