"""Pallas TPU kernel: the fused differentiable SDF core (value+feature+grad
with a hand-derived VJP).

This is the hot differentiable path of training (`/root/reference/models/
renderer.py:492-498`: SDF MLP forward + ∇SDF + reverse through both,
including the second-order eikonal term). Under plain XLA every one of the
~9 linear layers round-trips its [N,256] f32 activations through HBM in the
forward, the gradient pass, AND the transposed backward — measured 24 GB
of HBM traffic per 512-ray step, which (not FLOPs) bounds the step at
~25 ms (docs/ARCHITECTURE.md; XLA cost analysis in tools/bench_step.py
history). This kernel keeps the entire chain in VMEM per point-block.

Key structural idea: ∇SDF is computed by FORWARD-mode tangents that ride the
primal matmuls as 3 extra row-blocks — each layer is ONE [4B, in]x[in, out]
MXU matmul for {primal, ∂/∂x, ∂/∂y, ∂/∂z}. Because the gradient is then a
*primal output* of the op, the eikonal term is first-order in it: the whole
train-step backward is a single hand-derived reverse sweep through the
primal+tangent chains (implemented in the backward kernel, recomputing
activations in VMEM), and torch-style double-backprop
(`/root/reference/models/fields.py:114-127`) disappears from the program.

Derivation of the backward (per layer l, row-stacked X_l = [a; T0; T1; T2],
Z_l = X_l @ W_l; primal rows get +b and softplus100, tangent rows get
σ'(z)⊙):

    dW_l  = X_lᵀ @ bar_Z_l          db_l = Σ_batch bar_z_l (primal rows)
    bar_X_l = bar_Z_l @ W_lᵀ
    through the activation that produced X_{l+1}:
      bar_z_l  = bar_h ⊙ σ'(z_l) + Σ_d bar_Th^d ⊙ Tz^d_l ⊙ σ''(z_l)
      bar_Tz^d = bar_Th^d ⊙ σ'(z_l)
    with σ = softplus(100·)/100, σ' = sigmoid(100z), σ'' = 100·s(1-s),
    and the skip concat at l∈skip_in contributing bar/√2 to its inputs.

Matmul operands are bf16 with f32 accumulation (op_dtype param; f32 for the
interpret-mode exactness tests). Accuracy at bf16 operands is validated by
tools/validate_precision.py (sphere radius error) and the round-3 end-to-end
Chamfer run.

pts is treated as NON-differentiable (its VJP slot returns zeros): in this
framework sample points never require gradients (z_vals are stop_gradient'd
and rays come from data). Do not reuse this op where ∂/∂pts is needed.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnb_tpu.models.fields import SDFConfig

import os as _os
# pts per grid step (X rows = 4*BLOCK). Defaults from the r4 sweep
# (tools/tune_kernel.py on v5e): fwd 256 is ~5% faster than 128 and stores
# nothing; the bwd kernel keeps all 9 layers' pre-activations per block in
# VMEM and at 256 sits 1.16 MB OVER the 16 MB scoped-VMEM limit (compiles
# only marginally, OOMs depending on surrounding program), so it stays at
# 128 — the measured cost of 128 vs 256 was 2.4% on the fwd+bwd contraction.
FWD_BLOCK = int(_os.environ.get("RNB_CORE_FWD_BLOCK",
                                _os.environ.get("RNB_CORE_BLOCK", "256")))
BWD_BLOCK = int(_os.environ.get("RNB_CORE_BWD_BLOCK",
                                _os.environ.get("RNB_CORE_BLOCK", "128")))


def supported(cfg: SDFConfig) -> bool:
    return cfg.multires > 0 and cfg.d_in == 3


def _fold_dense(params):
    """Fold weight norm into plain (W [in,out], b [out]) — differentiable XLA
    ops on O(params) data, so autodiff carries the kernel's dW back to the
    {v, g} parameterization for free."""
    dense = []
    for layer in params:
        if "v" in layer:
            v = layer["v"]
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (layer["g"][None, :] / jnp.maximum(norm, 1e-12))
        else:
            w = layer["w"]
        dense.append((w, layer["b"]))
    return dense


# ---------------------------------------------------------------------------
# shared in-kernel pieces
# ---------------------------------------------------------------------------

def _pe_rows(cfg: SDFConfig, pts):
    """[B,3] points -> X0 [4B, in_ch] f32: stacked [e; T0; T1; T2] where e is
    the positional encoding of u = pts*scale and T^d = ∂e/∂u_d (dense).

    The sin/cos octave ladder uses the double-angle recurrence
    (sin 2x = 2 sin x cos x, cos 2x = 1 - 2 sin²x) — 2 VPU transcendentals
    per coordinate instead of 2*multires (f32 recurrence error ~1e-6 over 6
    octaves, far below the bf16 matmul operand precision downstream)."""
    u = pts * cfg.scale
    e_parts = [u]
    t_parts = [[], [], []]
    B = u.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 3), 1)
    eye = [(lane == d).astype(jnp.float32) for d in range(3)]
    for d in range(3):
        t_parts[d].append(eye[d])
    s, c = jnp.sin(u), jnp.cos(u)
    for k in range(cfg.multires):
        f = 2.0 ** k
        e_parts += [s, c]
        for d in range(3):
            t_parts[d] += [f * c * eye[d], -f * s * eye[d]]
        if k + 1 < cfg.multires:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    e = jnp.concatenate(e_parts, axis=-1)
    ts = [jnp.concatenate(p, axis=-1) for p in t_parts]
    return jnp.concatenate([e] + ts, axis=0)


def _softplus100_pair(z):
    """(sigmoid(100 z), softplus(100 z)/100) from ONE exp + ONE log1p,
    numerically stable both tails: with t = e^(-100|z|),
      sigmoid = 1/(1+t) for z>=0, t/(1+t) otherwise;
      softplus(100 z)/100 = max(z, 0) + log1p(t)/100."""
    t = jnp.exp(-100.0 * jnp.abs(z))
    inv = 1.0 / (1.0 + t)
    s = jnp.where(z >= 0, inv, t * inv)
    h = jnp.maximum(z, 0.0) + jnp.log1p(t) * 0.01
    return s, h


def _layer_matmul(X, w_ref, dtype):
    # precision pinned explicitly: the kernel controls precision via operand
    # dtype, and Mosaic rejects the global 'high' default leaking in
    return jnp.dot(X.astype(dtype), w_ref[...].astype(dtype),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _forward_chain(cfg: SDFConfig, n_layers: int, w_refs, b_refs, pts, dtype,
                   record=None):
    """Run the primal+tangent chain with the primal rows ([B, C]) and the
    tangent rows ([3B, C]) kept as SEPARATE slabs, both stored in the matmul
    operand dtype: no [4B] concat copy per layer and no per-matmul casts.
    Numerics: identical to the pre-split kernel EXCEPT at skip layers, where
    the concat-then-*inv_sqrt2 now happens on already-bf16 operands (one
    extra bf16 rounding per element vs f32-multiply-then-cast) — at most
    1 ulp on bf16 operands, inside the kernel's validated tolerances, but
    not bit-identical to old goldens.
    Returns the final pre-activations (z [B, d_out], Tz [3B, d_out]), both
    f32 (accumulator outputs, bias NOT yet added to z).
    If `record` is a list, appends (z_l, Tz_l) f32 pairs per layer for the
    backward sweep."""
    B = pts.shape[0]
    X0 = _pe_rows(cfg, pts)                      # [4B, in_ch] f32
    e16 = X0[:B].astype(dtype)                   # skip-concat sources
    T16 = X0[B:].astype(dtype)
    inv_sqrt2 = jnp.asarray(1.0 / math.sqrt(2.0), dtype)
    h, Th = e16, T16
    z = Tz = None
    for l in range(n_layers):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2
            Th = jnp.concatenate([Th, T16], axis=-1) * inv_sqrt2
        w16 = w_refs[l][...].astype(dtype)
        z = jnp.dot(h, w16, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)       # [B, out] f32
        Tz = jnp.dot(Th, w16, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT)      # [3B, out] f32
        if record is not None:
            record.append((z, Tz))
        if l < n_layers - 1:
            zb = z + b_refs[l][...]
            s, hh = _softplus100_pair(zb)
            s3 = jnp.concatenate([s, s, s], axis=0)            # [3B, out]
            h = hh.astype(dtype)
            Th = (Tz * s3).astype(dtype)
    return z, Tz


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: SDFConfig, n_layers: int, dtype, pts_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    sdf_ref, feat_ref, grad_ref = refs[2 * n_layers:]

    B = pts_ref.shape[0]
    z, Tz = _forward_chain(cfg, n_layers, w_refs, b_refs, pts_ref[...], dtype)
    z8 = z + b_refs[n_layers - 1][...]
    sdf_ref[...] = z8[:, :1] / cfg.scale
    feat_ref[...] = z8[:, 1:]
    # grad w.r.t. original x: sdf = z8[0]/scale with u = x*scale, so the
    # 1/scale and the PE-input scale cancel: grad_d = Tz^d[:, 0]
    grad_ref[...] = jnp.transpose(Tz[:, 0].reshape(3, B), (1, 0))


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: SDFConfig, n_layers: int, dtype, pts_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    csdf_ref, cfeat_ref, cgrad_ref = refs[2 * n_layers:2 * n_layers + 3]
    dw_refs = refs[2 * n_layers + 3:3 * n_layers + 3]
    db_refs = refs[3 * n_layers + 3:4 * n_layers + 3]

    B = pts_ref.shape[0]
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)
        for r in db_refs:
            r[...] = jnp.zeros_like(r)

    # --- recompute the forward, recording (z_l, Tz_l) f32 pairs ---
    # (the final layer's pair is recorded but unused here — its dots are
    # dead code the compiler removes, so the recompute is n_layers-1 deep)
    recs = []
    _forward_chain(cfg, n_layers, w_refs, b_refs, pts_ref[...], dtype,
                   record=recs)
    X0 = _pe_rows(cfg, pts_ref[...])
    e16 = X0[:B].astype(dtype)
    T16 = X0[B:].astype(dtype)
    inv_sqrt2_16 = jnp.asarray(inv_sqrt2, dtype)

    def x_input(l):
        """Rebuild layer l's matmul inputs (h16 [B,in], Th16 [3B,in])."""
        if l == 0:
            h, Th = e16, T16
        else:
            zp, Tzp = recs[l - 1]
            s, hh = _softplus100_pair(zp + b_refs[l - 1][...])
            s3 = jnp.concatenate([s, s, s], axis=0)
            h, Th = hh.astype(dtype), (Tzp * s3).astype(dtype)
        if l in cfg.skip_in:
            h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2_16
            Th = jnp.concatenate([Th, T16], axis=-1) * inv_sqrt2_16
        return h, Th

    # --- initialize output cotangents ---
    bar_z = jnp.concatenate([csdf_ref[...] / cfg.scale, cfeat_ref[...]],
                            axis=-1)                       # [B, d_out] f32
    d_out = bar_z.shape[-1]
    # tangent cotangents: only column 0 (the sdf channel) carries c_grad
    col0 = (jax.lax.broadcasted_iota(jnp.int32, (B, d_out), 1) == 0)
    cg = cgrad_ref[...]                                    # [B, 3]
    bar_T = jnp.concatenate(
        [jnp.where(col0, cg[:, d:d + 1], 0.0) for d in range(3)], axis=0)

    # --- reverse sweep over separate primal/tangent slabs ---
    for l in range(n_layers - 1, -1, -1):
        h16, Th16 = x_input(l)
        bz16 = bar_z.astype(dtype)
        bT16 = bar_T.astype(dtype)
        # parameter gradients (accumulated across grid steps; the TPU grid
        # is sequential so += on the revisited output block is safe).
        # dW = hᵀ@bar_z + Thᵀ@bar_T via EXPLICIT transposes: Mosaic lowers
        # a dim-0-contracting dot_general pathologically (measured 3-4x the
        # whole rest of this kernel)
        dw_refs[l][...] += (
            jnp.dot(h16.T, bz16, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            + jnp.dot(Th16.T, bT16, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT))
        db_refs[l][...] += jnp.sum(bar_z, axis=0, keepdims=True)
        if l == 0:
            break
        w16 = w_refs[l][...].astype(dtype)
        bar_h = jax.lax.dot_general(
            bz16, w16, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [B, in_l]
        bar_Th = jax.lax.dot_general(
            bT16, w16, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [3B, in_l]
        if l in cfg.skip_in:
            h_dim = bar_h.shape[-1] - e16.shape[-1]
            bar_h = bar_h[:, :h_dim] * inv_sqrt2
            bar_Th = bar_Th[:, :h_dim] * inv_sqrt2
        # through the softplus100 that produced layer l's inputs
        zp, Tzp = recs[l - 1]
        s, _ = _softplus100_pair(zp + b_refs[l - 1][...])
        prod = bar_Th * Tzp
        tang_dot = prod[:B] + prod[B:2 * B] + prod[2 * B:]   # Σ_d bar_Th⊙Tz
        bar_z = bar_h * s + tang_dot * (100.0 * s * (1.0 - s))
        s3 = jnp.concatenate([s, s, s], axis=0)
        bar_T = bar_Th * s3


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _specs_weights(weights, biases, mspace):
    specs = []
    for w in weights:
        specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                  memory_space=mspace))
    for b in biases:
        specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                  memory_space=mspace))
    return specs


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _run_fwd(cfg: SDFConfig, flat, interpret: bool, dtype, block: int):
    pts_pad, weights, biases = flat
    n_layers = len(weights)
    n = pts_pad.shape[0]
    d_out = weights[-1].shape[1]
    mspace = pl.ANY if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((block, 3), lambda i: (i, 0),
                             memory_space=mspace)]
    in_specs += _specs_weights(weights, biases, mspace)
    out_specs = [
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=mspace),
        pl.BlockSpec((block, d_out - 1), lambda i: (i, 0),
                     memory_space=mspace),
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=mspace),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, d_out - 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
    ]
    kwargs = {}
    if not interpret:
        # fwd grid steps are independent (disjoint output blocks) — let
        # Mosaic pipeline them; the bwd kernel accumulates dW across steps
        # and must stay sequential
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, n_layers, dtype),
        grid=(n // block,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret, **kwargs,
    )(pts_pad, *weights, *biases)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _run_bwd(cfg: SDFConfig, flat, interpret: bool, dtype, block: int):
    pts_pad, weights, biases, csdf, cfeat, cgrad = flat
    n_layers = len(weights)
    n = pts_pad.shape[0]
    d_out = weights[-1].shape[1]
    mspace = pl.ANY if interpret else pltpu.VMEM
    in_specs = [pl.BlockSpec((block, 3), lambda i: (i, 0),
                             memory_space=mspace)]
    in_specs += _specs_weights(weights, biases, mspace)
    in_specs += [
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=mspace),
        pl.BlockSpec((block, d_out - 1), lambda i: (i, 0),
                     memory_space=mspace),
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=mspace),
    ]
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
        functools.partial(_bwd_kernel, cfg, n_layers, dtype),
        grid=(n // block,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
    )(pts_pad, *weights, *biases, csdf, cfeat, cgrad)


# ---------------------------------------------------------------------------
# public op with custom VJP over the dense (folded) weights
# ---------------------------------------------------------------------------

# padding granularity (tests import this): the lcm, so padded point counts
# divide evenly into BOTH kernels' grids — with max() alone, env-set
# FWD/BWD blocks that don't divide each other would leave a tail block the
# smaller-grid kernel never computes (silent garbage outputs)
BLOCK = math.lcm(FWD_BLOCK, BWD_BLOCK)


def _pad_pts(pts, fwd_block: int, bwd_block: int):
    n = pts.shape[0]
    blk = math.lcm(fwd_block, bwd_block)
    n_pad = ((n + blk - 1) // blk) * blk
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    return pts, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _core(cfg: SDFConfig, interpret: bool, dtype, fwd_block, bwd_block,
          ws, bs, pts):
    out, _ = _core_fwd(cfg, interpret, dtype, fwd_block, bwd_block,
                       ws, bs, pts)
    return out


def _core_fwd(cfg, interpret, dtype, fwd_block, bwd_block, ws, bs, pts):
    pts_pad, n = _pad_pts(pts, fwd_block, bwd_block)
    sdf, feat, grad = _run_fwd(cfg, (pts_pad, ws, bs), interpret, dtype,
                               fwd_block)
    return (sdf[:n, 0], feat[:n], grad[:n]), (ws, bs, pts)


def _core_bwd(cfg, interpret, dtype, fwd_block, bwd_block, res, cots):
    ws, bs, pts = res
    c_sdf, c_feat, c_grad = cots
    pts_pad, n = _pad_pts(pts, fwd_block, bwd_block)
    pad = pts_pad.shape[0] - n
    csdf = jnp.pad(c_sdf[:, None], ((0, pad), (0, 0)))
    cfeat = jnp.pad(c_feat, ((0, pad), (0, 0)))
    cgrad = jnp.pad(c_grad, ((0, pad), (0, 0)))
    outs = _run_bwd(cfg, (pts_pad, ws, bs, csdf, cfeat, cgrad), interpret,
                    dtype, bwd_block)
    n_layers = len(ws)
    dws = tuple(outs[:n_layers])
    dbs = tuple(outs[n_layers:])   # keep [1, out] — must match bs' shapes
    # pts declared non-differentiable (see module docstring)
    return dws, dbs, jnp.zeros_like(pts)


_core.defvjp(_core_fwd, _core_bwd)


def sdf_value_feat_grad_fused(cfg: SDFConfig, params, pts,
                              interpret: bool | None = None,
                              dtype=jnp.bfloat16,
                              fwd_block: int | None = None,
                              bwd_block: int | None = None):
    """Drop-in for fields.sdf_value_feat_grad: [N,3] -> (sdf [N], feat [N,F],
    grad [N,3]), differentiable w.r.t. params (incl. weight norm) in ONE
    reverse pass. The sdf output of the kernel is pre-divided... scale note:
    the kernel divides the sdf channel by cfg.scale and emits ∂/∂x directly.

    fwd_block/bwd_block: points per grid step (default: RNB_CORE_FWD_BLOCK /
    RNB_CORE_BWD_BLOCK env, else 256 fwd / 128 bwd — see the module-top
    comment for the sweep behind those numbers) — call-time parameters so
    tools/tune_kernel.py can sweep them in one process.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dense = _fold_dense(params)
    ws = tuple(w for w, _ in dense)
    bs = tuple(b[None, :] for _, b in dense)   # [1, out] for 2-D tiling
    return _core(cfg, interpret, dtype, fwd_block or FWD_BLOCK,
                 bwd_block or BWD_BLOCK, ws, bs, pts)
