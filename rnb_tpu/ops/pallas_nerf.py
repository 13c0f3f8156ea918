"""Pallas TPU kernel: the fused background NeRF (NeRF++ inverted-sphere net).

Active only in womask-style configs with ``n_outside > 0``
(`/root/reference/models/renderer.py:93-130`, net at `fields.py:219-314`),
but there it is expensive under XLA: the 8x256 chain + heads evaluated at
batch x (n_samples + n_outside) points costs **5.6 ms of a 16.1 ms womask
step** (measured round 5 by differencing n_outside=4 vs 0) — per-layer
activations round-tripping HBM in forward and backward, like the other two
nets before fusion. This kernel runs PE(pts4) + PE(views) + the skip-concat
ReLU chain + alpha/feature/views/rgb heads in VMEM per point-block with a
hand-derived VJP.

Unlike the SDF core and albedo kernels, ALL inputs are non-differentiable
here (sample positions come from stop-gradient z values, view dirs from
data), so the VJP covers params only — a plain reverse sweep with ReLU
masks, no tangent slabs and no input cotangents:

    bar through heads:  rgb -> views_layer (ReLU) -> split -> feature
                        (+ alpha head joining at the trunk output)
    trunk layer i:      dW_i = x_iᵀ bar_z_i,  db_i = Σ bar_z_i,
                        bar_x = bar_z_i @ W_iᵀ,  bar_z_{i-1} gated by
                        [z_{i-1} > 0] (skip concats drop their PE slice)

Output activations (sigmoid on rgb, softplus on density) stay OUTSIDE the
op, in render_core_outside — the kernel returns the raw head values like
fields.nerf_apply.

Weight layout: NeRF layers are plain {w, b} (no weight norm), flattened in
the order [pts_layers..., alpha, feature, views, rgb].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnb_tpu.models.fields import NeRFConfig
from rnb_tpu.ops.pallas_sdf_core import _dot, _dot_t, _specs_weights

import os as _os
# r5 sweep at 67.6k points, production 8x256 widths: 512/512 fastest both
# standalone (3.94 ms fwd+bwd vs 4.30 at 512/256) and in-step (14.13 ms
# womask step vs 14.36). Measurement note: the first timing loop after
# compile can report wildly inflated times through the remote tunnel —
# warm up >=5 steps and repeat trials before believing a regression.
FWD_BLOCK = int(_os.environ.get("RNB_NERF_FWD_BLOCK", "512"))
BWD_BLOCK = int(_os.environ.get("RNB_NERF_BWD_BLOCK", "512"))


def supported(cfg: NeRFConfig) -> bool:
    return (cfg.use_viewdirs and cfg.multires > 0 and cfg.multires_view > 0
            and not (cfg.skips and max(cfg.skips) >= cfg.D - 1))


def flatten_params(params):
    """dict pytree -> (ws, bs) tuples in the kernel's canonical order."""
    layers = list(params["pts_layers"]) + [
        params["alpha_layer"], params["feature_layer"],
        params["views_layer"], params["rgb_layer"]]
    ws = tuple(l["w"] for l in layers)
    bs = tuple(l["b"][None, :] for l in layers)
    return ws, bs


def unflatten_grads(params, dws, dbs):
    D = len(params["pts_layers"])
    out = {"pts_layers": [
        {"w": dws[i], "b": dbs[i][0]} for i in range(D)]}
    for j, name in enumerate(("alpha_layer", "feature_layer", "views_layer",
                              "rgb_layer")):
        out[name] = {"w": dws[D + j], "b": dbs[D + j][0]}
    return out


def _pe(multires: int, x):
    """Reference embedder layout [x, sin(f0 x), cos(f0 x), ...] (any channel
    count) via the double-angle recurrence."""
    parts = [x]
    s, c = jnp.sin(x), jnp.cos(x)
    for k in range(multires):
        parts += [s, c]
        if k + 1 < multires:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    return jnp.concatenate(parts, axis=-1)


def _trunk_forward(cfg: NeRFConfig, w_refs, b_refs, pe, dtype, record=None):
    """The skip-concat ReLU chain. Returns trunk output h [B, W] (bf16)."""
    h = pe.astype(dtype)
    for i in range(cfg.D):
        z = _dot(h, w_refs[i][...], dtype) + b_refs[i][...]
        if record is not None:
            record.append(z)
        h = jnp.maximum(z, 0.0).astype(dtype)
        if i in cfg.skips:
            h = jnp.concatenate([pe.astype(dtype), h], axis=-1)
    return h


def _fwd_kernel(cfg: NeRFConfig, dtype, pts_ref, views_ref, *refs):
    n_mats = cfg.D + 4
    w_refs = refs[:n_mats]
    b_refs = refs[n_mats:2 * n_mats]
    alpha_ref, rgb_ref = refs[2 * n_mats:]
    pe = _pe(cfg.multires, pts_ref[...])
    pe_v = _pe(cfg.multires_view, views_ref[...])
    h = _trunk_forward(cfg, w_refs, b_refs, pe, dtype)
    D = cfg.D
    alpha_ref[...] = _dot(h, w_refs[D][...], dtype) + b_refs[D][...]
    feature = _dot(h, w_refs[D + 1][...], dtype) + b_refs[D + 1][...]
    h2 = jnp.concatenate([feature.astype(dtype), pe_v.astype(dtype)], axis=-1)
    z_v = _dot(h2, w_refs[D + 2][...], dtype) + b_refs[D + 2][...]
    hv = jnp.maximum(z_v, 0.0).astype(dtype)
    rgb_ref[...] = _dot(hv, w_refs[D + 3][...], dtype) + b_refs[D + 3][...]


def _bwd_kernel(cfg: NeRFConfig, dtype, pts_ref, views_ref, *refs):
    n_mats = cfg.D + 4
    w_refs = refs[:n_mats]
    b_refs = refs[n_mats:2 * n_mats]
    calpha_ref, crgb_ref = refs[2 * n_mats:2 * n_mats + 2]
    dw_refs = refs[2 * n_mats + 2:3 * n_mats + 2]
    db_refs = refs[3 * n_mats + 2:4 * n_mats + 2]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)
        for r in db_refs:
            r[...] = jnp.zeros_like(r)

    pe = _pe(cfg.multires, pts_ref[...])
    pe_v = _pe(cfg.multires_view, views_ref[...])
    pe16 = pe.astype(dtype)

    # recompute the trunk + heads, recording pre-activations
    recs = []
    h = _trunk_forward(cfg, w_refs, b_refs, pe, dtype, record=recs)
    D = cfg.D
    feature = _dot(h, w_refs[D + 1][...], dtype) + b_refs[D + 1][...]
    h2 = jnp.concatenate([feature.astype(dtype), pe_v.astype(dtype)], axis=-1)
    z_v = _dot(h2, w_refs[D + 2][...], dtype) + b_refs[D + 2][...]
    hv = jnp.maximum(z_v, 0.0).astype(dtype)

    def trunk_input(i):
        """Rebuild trunk layer i's matmul input x_i (bf16)."""
        if i == 0:
            return pe16
        x = jnp.maximum(recs[i - 1], 0.0).astype(dtype)
        if (i - 1) in cfg.skips:
            x = jnp.concatenate([pe16, x], axis=-1)
        return x

    # --- heads backward ---
    c_rgb = crgb_ref[...]
    dw_refs[D + 3][...] += jnp.dot(hv.T, c_rgb.astype(dtype),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    db_refs[D + 3][...] += jnp.sum(c_rgb, axis=0, keepdims=True)
    bar_zv = (_dot_t(c_rgb, w_refs[D + 3][...], dtype)
              * (z_v > 0.0).astype(jnp.float32))
    dw_refs[D + 2][...] += jnp.dot(h2.T, bar_zv.astype(dtype),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    db_refs[D + 2][...] += jnp.sum(bar_zv, axis=0, keepdims=True)
    bar_h2 = _dot_t(bar_zv, w_refs[D + 2][...], dtype)
    bar_feature = bar_h2[:, :feature.shape[-1]]   # PE(views) slice dropped
    dw_refs[D + 1][...] += jnp.dot(h.T, bar_feature.astype(dtype),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    db_refs[D + 1][...] += jnp.sum(bar_feature, axis=0, keepdims=True)
    c_alpha = calpha_ref[...]
    dw_refs[D][...] += jnp.dot(h.T, c_alpha.astype(dtype),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
    db_refs[D][...] += jnp.sum(c_alpha, axis=0, keepdims=True)
    bar_h = (_dot_t(bar_feature, w_refs[D + 1][...], dtype)
             + _dot_t(c_alpha, w_refs[D][...], dtype))

    # --- trunk backward ---
    for i in range(D - 1, -1, -1):
        if i in cfg.skips:
            bar_h = bar_h[:, pe.shape[-1]:]       # concat put PE first
        bar_z = bar_h * (recs[i] > 0.0).astype(jnp.float32)
        x_i = trunk_input(i)
        dw_refs[i][...] += jnp.dot(x_i.T, bar_z.astype(dtype),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
        db_refs[i][...] += jnp.sum(bar_z, axis=0, keepdims=True)
        if i > 0:
            bar_h = _dot_t(bar_z, w_refs[i][...], dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP (params only)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _run_fwd(cfg: NeRFConfig, flat, interpret: bool, dtype, block: int):
    pts, views, weights, biases = flat
    n = pts.shape[0]
    mspace = pl.ANY if interpret else pltpu.VMEM
    row = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=mspace)
    in_specs = [row(pts.shape[1]), row(3)]
    in_specs += _specs_weights(weights, biases, mspace)
    out_specs = [row(1), row(3)]
    out_shape = [jax.ShapeDtypeStruct((n, 1), jnp.float32),
                 jax.ShapeDtypeStruct((n, 3), jnp.float32)]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, dtype),
        grid=(n // block,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret, **kwargs,
    )(pts, views, *weights, *biases)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _run_bwd(cfg: NeRFConfig, flat, interpret: bool, dtype, block: int):
    pts, views, weights, biases, calpha, crgb = flat
    n = pts.shape[0]
    mspace = pl.ANY if interpret else pltpu.VMEM
    row = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=mspace)
    in_specs = [row(pts.shape[1]), row(3)]
    in_specs += _specs_weights(weights, biases, mspace)
    in_specs += [row(1), row(3)]
    out_specs, out_shape = [], []
    for w in weights:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=mspace))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in biases:
        out_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                      memory_space=mspace))
        out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, dtype),
        grid=(n // block,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
    )(pts, views, *weights, *biases, calpha, crgb)


def _pad_rows(x, blk):
    n = x.shape[0]
    n_pad = ((n + blk - 1) // blk) * blk
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _op(cfg: NeRFConfig, interpret: bool, dtype, fwd_block, bwd_block,
        ws, bs, pts, views):
    out, _ = _op_fwd(cfg, interpret, dtype, fwd_block, bwd_block,
                     ws, bs, pts, views)
    return out


def _op_fwd(cfg, interpret, dtype, fwd_block, bwd_block, ws, bs, pts, views):
    blk = math.lcm(fwd_block, bwd_block)
    n = pts.shape[0]
    alpha, rgb = _run_fwd(cfg, (_pad_rows(pts, blk), _pad_rows(views, blk),
                                ws, bs), interpret, dtype, fwd_block)
    return (alpha[:n], rgb[:n]), (ws, bs, pts, views)


def _op_bwd(cfg, interpret, dtype, fwd_block, bwd_block, res, cots):
    ws, bs, pts, views = res
    c_alpha, c_rgb = cots
    blk = math.lcm(fwd_block, bwd_block)
    outs = _run_bwd(cfg, (_pad_rows(pts, blk), _pad_rows(views, blk), ws, bs,
                          _pad_rows(c_alpha, blk), _pad_rows(c_rgb, blk)),
                    interpret, dtype, bwd_block)
    n_mats = len(ws)
    dws = tuple(outs[:n_mats])
    dbs = tuple(outs[n_mats:])
    # pts/views declared non-differentiable (module docstring)
    return dws, dbs, jnp.zeros_like(pts), jnp.zeros_like(views)


_op.defvjp(_op_fwd, _op_bwd)


def nerf_apply_fused(cfg: NeRFConfig, params, input_pts, input_views,
                     interpret: bool | None = None, dtype=jnp.bfloat16,
                     fwd_block: int | None = None,
                     bwd_block: int | None = None):
    """Drop-in for fields.nerf_apply: ([N,d_in],[N,3]) -> (density_raw [N,1],
    rgb_raw [N,3]), differentiable w.r.t. params in one fused reverse
    pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ws, bs = flatten_params(params)
    return _op(cfg, interpret, dtype, fwd_block or FWD_BLOCK,
               bwd_block or BWD_BLOCK, ws, bs, input_pts, input_views)
