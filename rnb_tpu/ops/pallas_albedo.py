"""Pallas TPU kernel: the fused differentiable albedo (rendering) network.

The RNb albedo net (`/root/reference/models/fields.py:131-215`, mode
`no_view_dir`: albedo = MLP(PE(points), PE(normals), feature)) is tiny —
3 matmuls at the shipped conf — yet its XLA path cost 3.1 ms of an 11.4 ms
train step (measured round 5 by differencing a `no_albedo` step): per-layer
[N,256] f32 activations round-trip HBM in forward AND backward, the PE and
weight-norm folding materialize full-width intermediates, and the backward
is a second chain of the same traffic. This kernel fuses the whole chain —
PE, concat, matmuls, ReLU, sigmoid — in VMEM per point-block, with a
hand-derived VJP (same design as ops/pallas_sdf_core):

    forward:   x0 = [PE(p), PE(n), feat];  z_l = x_l @ W_l + b_l;
               x_{l+1} = relu(z_l);  out = sigmoid(z_last)
    backward:  bar_z_last = c_out ⊙ s(1-s);
               dW_l = x_lᵀ @ bar_z_l,  db_l = Σ bar_z_l,
               bar_x_l = bar_z_l @ W_lᵀ,  bar_z_{l-1} = bar_x ⊙ [z>0];
               c_feat  = bar_x0[:, 2E:]
               c_normal_d = bar_n_d + Σ_k 2^k (cos(2^k n_d)·bar_sin_{k,d}
                                               − sin(2^k n_d)·bar_cos_{k,d})

c_normals matters: the albedo net's normal input IS ∇SDF, so this cotangent
joins the eikonal/shading cotangents flowing into the SDF core's backward.
points are non-differentiable throughout this framework (sample positions
are stop-gradient'd); their VJP slot returns zeros.

Supported: mode='no_view_dir' with multires_view>0 (the shipped confs).
Other modes fall back to the XLA path in fields.rendering_apply.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnb_tpu.models.fields import RenderingConfig

import os as _os

# numerics-sensitive helpers shared with the SDF core kernel so fixes to
# the weight-norm fold epsilon / matmul precision pinning / Mosaic
# workarounds can never drift between the two kernels
from rnb_tpu.ops.pallas_sdf_core import (_dot, _dot_t, _fold_dense,
                                         _specs_weights)

# r5 sweep at 65k points (fwd+bwd contraction): 1024/512 is fastest
# (3.55 ms vs 3.64 at 512/256); 2048-point blocks OOM the 16 MB
# scoped-VMEM window
FWD_BLOCK = int(_os.environ.get("RNB_ALBEDO_FWD_BLOCK", "1024"))
BWD_BLOCK = int(_os.environ.get("RNB_ALBEDO_BWD_BLOCK", "512"))


def supported(cfg: RenderingConfig) -> bool:
    return (cfg.mode == "no_view_dir" and cfg.multires_view > 0
            and cfg.squeeze_out)


def _pe(multires: int, x):
    """Reference embedder layout [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]
    via the double-angle recurrence (2 transcendentals per coordinate)."""
    parts = [x]
    s, c = jnp.sin(x), jnp.cos(x)
    for k in range(multires):
        parts += [s, c]
        if k + 1 < multires:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    return jnp.concatenate(parts, axis=-1)


def _sigmoid(z):
    t = jnp.exp(-jnp.abs(z))
    inv = 1.0 / (1.0 + t)
    return jnp.where(z >= 0, inv, t * inv)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: RenderingConfig, n_layers: int, dtype,
                pts_ref, nrm_ref, feat_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    pe_p = _pe(cfg.multires_view, pts_ref[...])
    pe_n = _pe(cfg.multires_view, nrm_ref[...])
    h = jnp.concatenate([pe_p, pe_n, feat_ref[...]], axis=-1).astype(dtype)
    z = None
    for l in range(n_layers):
        z = _dot(h, w_refs[l][...], dtype) + b_refs[l][...]
        if l < n_layers - 1:
            h = jnp.maximum(z, 0.0).astype(dtype)
    out_ref[...] = _sigmoid(z)


def _bwd_kernel(cfg: RenderingConfig, n_layers: int, dtype,
                pts_ref, nrm_ref, feat_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    cout_ref = refs[2 * n_layers]
    dw_refs = refs[2 * n_layers + 1:3 * n_layers + 1]
    db_refs = refs[3 * n_layers + 1:4 * n_layers + 1]
    cnrm_ref, cfeat_ref = refs[4 * n_layers + 1:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)
        for r in db_refs:
            r[...] = jnp.zeros_like(r)

    n = nrm_ref[...]
    pe_p = _pe(cfg.multires_view, pts_ref[...])
    pe_n = _pe(cfg.multires_view, n)
    x0 = jnp.concatenate([pe_p, pe_n, feat_ref[...]], axis=-1).astype(dtype)

    # recompute forward, recording pre-activations
    recs = []
    h = x0
    z = None
    for l in range(n_layers):
        z = _dot(h, w_refs[l][...], dtype) + b_refs[l][...]
        recs.append(z)
        if l < n_layers - 1:
            h = jnp.maximum(z, 0.0).astype(dtype)

    s = _sigmoid(recs[-1])
    bar_z = cout_ref[...] * s * (1.0 - s)
    bar_x = None
    for l in range(n_layers - 1, -1, -1):
        h_l = (x0 if l == 0
               else jnp.maximum(recs[l - 1], 0.0).astype(dtype))
        bz16 = bar_z.astype(dtype)
        # explicit transpose: Mosaic lowers dim-0-contracting dot_general
        # pathologically (see ops/pallas_sdf_core.py)
        dw_refs[l][...] += jnp.dot(h_l.T, bz16,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
        db_refs[l][...] += jnp.sum(bar_z, axis=0, keepdims=True)
        bar_x = _dot_t(bz16, w_refs[l][...], dtype)
        if l > 0:
            bar_z = bar_x * (recs[l - 1] > 0.0).astype(jnp.float32)

    E = pe_p.shape[-1]
    cfeat_ref[...] = bar_x[:, 2 * E:]
    # c_normals: reverse through PE(normals). Layout [n, sin f0 n, cos f0 n,
    # sin f1 n, ...] with f_k = 2^k; d sin(f n_d)/d n_d = f cos(f n_d) etc.
    bar_pe_n = bar_x[:, E:2 * E]
    cn = bar_pe_n[:, 0:3]
    sk, ck = jnp.sin(n), jnp.cos(n)
    for k in range(cfg.multires_view):
        f = 2.0 ** k
        bar_s = bar_pe_n[:, 3 + 6 * k:6 + 6 * k]
        bar_c = bar_pe_n[:, 6 + 6 * k:9 + 6 * k]
        cn = cn + f * (ck * bar_s - sk * bar_c)
        if k + 1 < cfg.multires_view:
            sk, ck = 2.0 * sk * ck, 1.0 - 2.0 * sk * sk
    cnrm_ref[...] = cn


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _run_fwd(cfg: RenderingConfig, flat, interpret: bool, dtype, block: int):
    pts, nrm, feat, weights, biases = flat
    n_layers = len(weights)
    n = pts.shape[0]
    d_out = weights[-1].shape[1]
    F = feat.shape[1]
    mspace = pl.ANY if interpret else pltpu.VMEM
    row = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=mspace)
    in_specs = [row(3), row(3), row(F)]
    in_specs += _specs_weights(weights, biases, mspace)
    out_specs = row(d_out)
    out_shape = jax.ShapeDtypeStruct((n, d_out), jnp.float32)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, n_layers, dtype),
        grid=(n // block,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret, **kwargs,
    )(pts, nrm, feat, *weights, *biases)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _run_bwd(cfg: RenderingConfig, flat, interpret: bool, dtype, block: int):
    pts, nrm, feat, weights, biases, cout = flat
    n_layers = len(weights)
    n = pts.shape[0]
    d_out = weights[-1].shape[1]
    F = feat.shape[1]
    mspace = pl.ANY if interpret else pltpu.VMEM
    row = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=mspace)
    in_specs = [row(3), row(3), row(F)]
    in_specs += _specs_weights(weights, biases, mspace)
    in_specs += [row(d_out)]
    out_specs, out_shape = [], []
    for w in weights:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=mspace))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in biases:
        out_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                      memory_space=mspace))
        out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
    out_specs += [row(3), row(F)]
    out_shape += [jax.ShapeDtypeStruct((n, 3), jnp.float32),
                  jax.ShapeDtypeStruct((n, F), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, n_layers, dtype),
        grid=(n // block,),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
    )(pts, nrm, feat, *weights, *biases, cout)


def _pad_rows(x, blk):
    n = x.shape[0]
    n_pad = ((n + blk - 1) // blk) * blk
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _op(cfg: RenderingConfig, interpret: bool, dtype, fwd_block, bwd_block,
        ws, bs, nrm, feat, pts):
    out, _ = _op_fwd(cfg, interpret, dtype, fwd_block, bwd_block,
                     ws, bs, nrm, feat, pts)
    return out


def _op_fwd(cfg, interpret, dtype, fwd_block, bwd_block, ws, bs, nrm, feat,
            pts):
    blk = math.lcm(fwd_block, bwd_block)
    n = pts.shape[0]
    out = _run_fwd(cfg, (_pad_rows(pts, blk), _pad_rows(nrm, blk),
                         _pad_rows(feat, blk), ws, bs),
                   interpret, dtype, fwd_block)
    return out[:n], (ws, bs, nrm, feat, pts)


def _op_bwd(cfg, interpret, dtype, fwd_block, bwd_block, res, cout):
    ws, bs, nrm, feat, pts = res
    blk = math.lcm(fwd_block, bwd_block)
    n = pts.shape[0]
    outs = _run_bwd(cfg, (_pad_rows(pts, blk), _pad_rows(nrm, blk),
                          _pad_rows(feat, blk), ws, bs,
                          _pad_rows(cout, blk)),
                    interpret, dtype, bwd_block)
    n_layers = len(ws)
    dws = tuple(outs[:n_layers])
    dbs = tuple(outs[n_layers:2 * n_layers])
    cnrm = outs[2 * n_layers][:n]
    cfeat = outs[2 * n_layers + 1][:n]
    # pts declared non-differentiable (module docstring)
    return dws, dbs, cnrm, cfeat, jnp.zeros_like(pts)


_op.defvjp(_op_fwd, _op_bwd)


def albedo_apply_fused(cfg: RenderingConfig, params, points, normals,
                       feature_vectors, interpret: bool | None = None,
                       dtype=jnp.bfloat16,
                       fwd_block: int | None = None,
                       bwd_block: int | None = None):
    """Drop-in for fields.rendering_apply in mode 'no_view_dir':
    [N,3],[N,3],[N,F] -> albedo [N,d_out], differentiable w.r.t. params
    (incl. weight norm), normals, and features in one fused reverse pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dense = _fold_dense(params)
    ws = tuple(w for w, _ in dense)
    bs = tuple(b[None, :] for _, b in dense)
    return _op(cfg, interpret, dtype, fwd_block or FWD_BLOCK,
               bwd_block or BWD_BLOCK, ws, bs, normals, feature_vectors,
               points)
