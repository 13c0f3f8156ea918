"""Pallas TPU kernel: the fused differentiable SDF core (value+feature+grad
with a hand-derived VJP).

This is the hot differentiable path of training (`/root/reference/models/
renderer.py:492-498`: SDF MLP forward + ∇SDF + reverse through both,
including the second-order eikonal term). Under plain XLA every one of the
~9 linear layers round-trips its [N,256] f32 activations through HBM in the
forward, the gradient pass, AND the transposed backward — measured 24 GB
of HBM traffic per 512-ray step, which (not FLOPs) bounds the step at
~25 ms (docs/ARCHITECTURE.md). This kernel keeps the entire chain in VMEM
per point-block.

Two structural ideas (round 5 — halving the round-4 kernel's FLOPs):

FORWARD: ∇SDF is a vector-Jacobian product of a SINGLE output channel, so
reverse mode is the cheap direction — the kernel runs the primal chain
(one [B,in]x[in,out] MXU matmul per layer), keeps the pre-activations in
VMEM, and sweeps back with one [B,C]x[C,C] matmul per layer, seeding the
sweep with W_last[:,0] (the one-hot output cotangent contracted into the
last weight). Total 2x primal FLOPs — the round-4 design carried 3
forward-mode tangent rows through every matmul (4x primal FLOPs). ∇SDF is
still a *primal output* of the op, so the eikonal term stays first-order.

BACKWARD (the hand-derived VJP): the output cotangent c_grad enters only
through Σ_d c_grad_d · ∂(∇SDF_d)/∂W. Because tangent propagation is LINEAR
in the tangent input and cotangent propagation is LINEAR in the cotangent
seed, the three per-axis tangent slabs of the naive formulation collapse
EXACTLY (in exact arithmetic) into ONE directional slab:

    tangent input  T'_0[i] = Σ_d c_grad[i,d] · ∂e/∂u_d[i]   (per point)
    cotangent seed bar_T'_L[i] = one-hot(col 0)

so the whole train-step backward is one reverse sweep through a
primal+single-tangent chain (recomputed in VMEM) — 6x primal FLOPs per
layer vs 12x for the round-4 three-slab sweep. Derivation per layer l
(row slabs X_l = [a; T'], Z_l = X_l @ W_l; primal rows get +b and
softplus100, tangent rows get σ'(z)⊙):

    dW_l  = a_lᵀ @ bar_z_l + T'_lᵀ @ bar_T'_l     db_l = Σ_batch bar_z_l
    bar_X_l = bar_Z_l @ W_lᵀ
    through the activation that produced X_{l+1}:
      bar_z_l  = bar_h ⊙ σ'(z_l) + (bar_Th' ⊙ Tz'_l) ⊙ σ''(z_l)
      bar_Tz'  = bar_Th' ⊙ σ'(z_l)
    with σ = softplus(100·)/100, σ' = sigmoid(100z), σ'' = 100·s(1-s),
    and the skip concat at l∈skip_in contributing bar/√2 to its inputs.

Matmul operands are bf16 with f32 accumulation (op_dtype param; f32 for the
interpret-mode exactness tests). Accuracy at bf16 operands is validated by
tools/validate_precision.py and end-to-end Chamfer gates (PARITY_r*.json).

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
# pts per grid step. Round-5 sweep on v5e (65k points): fwd standalone is
# flat 128 vs 256 (3.0-3.1 ms) but the fwd+bwd contraction is best at
# fwd 128 / bwd 256 (7.17 ms vs 7.29 at 256/256; 512-point blocks OOM the
# 16 MB scoped-VMEM limit — Mosaic keeps ~40 KB/point live across the
# recorded-preactivation chain).
FWD_BLOCK = int(_os.environ.get("RNB_CORE_FWD_BLOCK",
                                _os.environ.get("RNB_CORE_BLOCK", "128")))
BWD_BLOCK = int(_os.environ.get("RNB_CORE_BWD_BLOCK",
                                _os.environ.get("RNB_CORE_BLOCK", "256")))


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

def _pe_parts(cfg: SDFConfig, pts):
    """[B,3] points -> (e [B, in_ch], (T0, T1, T2)) f32: the positional
    encoding of u = pts*scale and its per-axis input tangents T^d = ∂e/∂u_d
    (dense [B, in_ch] each).

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
    ts = tuple(jnp.concatenate(p, axis=-1) for p in t_parts)
    return e, ts


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


def _dot(a, b, dtype):
    """Matmul with both operands in the kernel's op dtype, f32 accumulation,
    precision pinned explicitly (the global 'high' default must not leak
    into Mosaic). Casting an already-cast operand is free. Shared with
    ops/pallas_albedo."""
    return jnp.dot(a.astype(dtype), b.astype(dtype),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _dot_t(a, b, dtype):
    """a @ b.T without materializing the transpose (contract dim 1 vs 1)."""
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


# ---------------------------------------------------------------------------
# forward kernel: primal chain + reverse sweep for ∇SDF
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: SDFConfig, n_layers: int, dtype, pts_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    sdf_ref, feat_ref, grad_ref = refs[2 * n_layers:]

    B = pts_ref.shape[0]
    e, Ts = _pe_parts(cfg, pts_ref[...])
    e16 = e.astype(dtype)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    inv_sqrt2_16 = jnp.asarray(inv_sqrt2, dtype)

    # --- primal chain, recording biased pre-activations for the sweep ---
    h = e16
    recs = []
    z = None
    for l in range(n_layers):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2_16
        w16 = w_refs[l][...].astype(dtype)
        z = _dot(h, w16, dtype)
        if l < n_layers - 1:
            zb = z + b_refs[l][...]
            recs.append(zb)
            _, hh = _softplus100_pair(zb)
            h = hh.astype(dtype)
    z8 = z + b_refs[n_layers - 1][...]
    sdf_ref[...] = z8[:, :1] / cfg.scale
    feat_ref[...] = z8[:, 1:]

    # --- reverse sweep: grad = ∂ z8[:,0] / ∂u (PE-input scale and the
    # 1/scale on the sdf channel cancel, so this IS ∂sdf/∂x) ---
    bar_e = jnp.zeros_like(e)
    bar_h = None
    for l in range(n_layers - 1, -1, -1):
        if l == n_layers - 1:
            # one-hot output cotangent through the last layer. NOT a
            # wl[:, 0] lane-slice + broadcast: Mosaic materializes that
            # pattern catastrophically (measured +38 MB VMEM — an OOM);
            # the equivalent one-hot matmul costs one [B,d_out]x[d_out,in]
            # MXU pass and keeps the kernel in budget.
            d_out = w_refs[l].shape[1]
            oh = (jax.lax.broadcasted_iota(jnp.int32, (B, d_out), 1) == 0
                  ).astype(jnp.float32)
            bar_x = _dot_t(oh, w_refs[l][...].astype(dtype), dtype)
        else:
            s, _ = _softplus100_pair(recs[l])
            bar_z = bar_h * s
            bar_x = _dot_t(bar_z, w_refs[l][...].astype(dtype), dtype)
        if l in cfg.skip_in:
            h_dim = bar_x.shape[-1] - e.shape[-1]
            bar_e = bar_e + bar_x[:, h_dim:] * inv_sqrt2
            bar_h = bar_x[:, :h_dim] * inv_sqrt2
        else:
            bar_h = bar_x
    bar_e = bar_e + bar_h
    grad_ref[...] = jnp.concatenate(
        [jnp.sum(bar_e * T, axis=-1, keepdims=True) for T in Ts], axis=-1)


# ---------------------------------------------------------------------------
# backward kernel: collapsed single-tangent-slab reverse sweep
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: SDFConfig, n_layers: int, dtype, pts_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    csdf_ref, cfeat_ref, cgrad_ref = refs[2 * n_layers:2 * n_layers + 3]
    dw_refs = refs[2 * n_layers + 3:3 * n_layers + 3]
    db_refs = refs[3 * n_layers + 3:4 * n_layers + 3]

    B = pts_ref.shape[0]
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    inv_sqrt2_16 = jnp.asarray(inv_sqrt2, dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)
        for r in db_refs:
            r[...] = jnp.zeros_like(r)

    # --- directional tangent input: T' = Σ_d c_grad_d ∂e/∂u_d ---
    e, Ts = _pe_parts(cfg, pts_ref[...])
    cg = cgrad_ref[...]                                   # [B, 3]
    Tdir = (cg[:, 0:1] * Ts[0] + cg[:, 1:2] * Ts[1] + cg[:, 2:3] * Ts[2])
    e16 = e.astype(dtype)
    T16 = Tdir.astype(dtype)

    # --- recompute the forward with ONE tangent slab, recording (z, Tz) ---
    # (the final layer's pair is recorded but only its dots feed dW; dead
    # parts are removed by the compiler)
    recs = []
    h, Th = e16, T16
    for l in range(n_layers):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2_16
            Th = jnp.concatenate([Th, T16], axis=-1) * inv_sqrt2_16
        w16 = w_refs[l][...].astype(dtype)
        z = _dot(h, w16, dtype)
        Tz = _dot(Th, w16, dtype)
        recs.append((z, Tz))
        if l < n_layers - 1:
            zb = z + b_refs[l][...]
            s, hh = _softplus100_pair(zb)
            h = hh.astype(dtype)
            Th = (Tz * s).astype(dtype)

    def x_input(l):
        """Rebuild layer l's matmul inputs (h16 [B,in], Th16 [B,in])."""
        if l == 0:
            h, Th = e16, T16
        else:
            zp, Tzp = recs[l - 1]
            s, hh = _softplus100_pair(zp + b_refs[l - 1][...])
            h, Th = hh.astype(dtype), (Tzp * s).astype(dtype)
        if l in cfg.skip_in:
            h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2_16
            Th = jnp.concatenate([Th, T16], axis=-1) * inv_sqrt2_16
        return h, Th

    # --- initialize output cotangents ---
    bar_z = jnp.concatenate([csdf_ref[...] / cfg.scale, cfeat_ref[...]],
                            axis=-1)                      # [B, d_out] f32
    d_out = bar_z.shape[-1]
    # collapsed tangent cotangent: UNIT seed in the sdf column (the per-axis
    # c_grad weights already ride the tangent slab — see module docstring)
    bar_T = (jax.lax.broadcasted_iota(jnp.int32, (B, d_out), 1) == 0
             ).astype(jnp.float32)

    # --- reverse sweep over the primal + single tangent slab ---
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
        bar_h = _dot_t(bz16, w16, dtype)                  # [B, in_l]
        bar_Th = _dot_t(bT16, w16, dtype)                 # [B, in_l]
        if l in cfg.skip_in:
            h_dim = bar_h.shape[-1] - e16.shape[-1]
            bar_h = bar_h[:, :h_dim] * inv_sqrt2
            bar_Th = bar_Th[:, :h_dim] * inv_sqrt2
        # through the softplus100 that produced layer l's inputs
        zp, Tzp = recs[l - 1]
        s, _ = _softplus100_pair(zp + b_refs[l - 1][...])
        bar_z = bar_h * s + (bar_Th * Tzp) * (100.0 * s * (1.0 - s))
        bar_T = bar_Th * s


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
    reverse pass. The kernel divides the sdf channel by cfg.scale and emits
    ∂sdf/∂x directly.

    fwd_block/bwd_block: points per grid step (default: RNB_CORE_FWD_BLOCK /
    RNB_CORE_BWD_BLOCK env, else 256/256 — see the module-top comment) —
    call-time parameters so tools/tune_kernel.py can sweep them in one
    process.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dense = _fold_dense(params)
    ws = tuple(w for w, _ in dense)
    bs = tuple(b[None, :] for _, b in dense)   # [1, out] for 2-D tiling
    return _core(cfg, interpret, dtype, fwd_block or FWD_BLOCK,
                 bwd_block or BWD_BLOCK, ws, bs, pts)
