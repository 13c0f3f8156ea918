"""Pallas TPU megakernel: the entire NeuS hierarchical up-sampling loop.

The reference's up-sampling (`/root/reference/models/renderer.py:965-984`)
is 4 sequential rounds of {weights from SDF -> inverse-CDF 16 samples ->
re-query SDF -> merge-sort}, preceded by a 64-sample SDF sweep. As XLA
programs this is ~60 small kernels per step (5 MLP sweeps x ~11 layers plus
sorts/searchsorteds over [512, <=128] arrays) — latency-bound, ~8 ms of a
~25 ms train step, and barely faster at bf16 because the MXU is never the
bottleneck.

This kernel runs the WHOLE loop for a block of rays without leaving VMEM:

  * SDF MLP (PE -> skip-MLP -> sdf head) with bf16 operands / f32
    accumulation, weights resident across grid steps (weight-norm folded and
    the head column-sliced outside the kernel, in f32);
  * per-round NeuS section weights (`renderer.py:132-176`) with cumulative
    transmittance computed as exp(cumsum(log)) where cumsum is a triangular
    matmul (no lax.cumprod inside the kernel);
  * deterministic inverse-CDF sampling (`renderer.py:39-69`, det=True):
    searchsorted as a comparison-count, gathers as one-hot reductions;
  * sorted merge WITHOUT sorting: both lists are already sorted (z_vals by
    construction, new samples because the inverse CDF of an increasing u grid
    is non-decreasing), so ranks are index + cross-count, and the scatter is
    a one-hot sum. Tie-break matches jnp.argsort(stable) on concat([z, new]).

Everything is static-shaped; the 4 rounds are unrolled at trace time. The
kernel is inference-only (the call site is under stop_gradient).

Numerics note: z-values match the XLA path to ~1e-3 (bf16 MLP operands in
both; the log/exp transmittance and f32 triangular-matmul cumsum introduce
only f32-level noise). Sample *placement* is the only consumer.
"""

from __future__ import annotations

import functools
import math


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnb_tpu.models.fields import SDFConfig

RAY_BLOCK = int(__import__("os").environ.get("RNB_UPSAMPLE_BLOCK", "32"))


def _folded_dense_bf16(params):
    """Fold weight norm (f32) and slice the sdf head to 1 column; cast bf16."""
    dense = []
    for layer in params:
        if "v" in layer:
            v = layer["v"]
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (layer["g"][None, :] / jnp.maximum(norm, 1e-12))
        else:
            w = layer["w"]
        dense.append((w, layer["b"]))
    w_last, b_last = dense[-1]
    dense = dense[:-1] + [(w_last[:, :1], b_last[:1])]
    weights = tuple(w.astype(jnp.bfloat16) for w, _ in dense)
    biases = tuple(b.astype(jnp.float32) for _, b in dense)
    return weights, biases


def _mlp_sdf(cfg: SDFConfig, w_refs, b_refs, pts):
    """[N,3] -> [N] sdf, bf16 matmuls / f32 accumulation (mirrors
    fields.sdf_only_lowp)."""
    x = pts * cfg.scale
    parts = [x]
    for k in range(cfg.multires):
        ang = x * (2.0 ** k)
        parts.append(jnp.sin(ang))
        parts.append(jnp.cos(ang))
    inputs = jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)

    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    n_layers = len(w_refs)
    h = inputs
    for l in range(n_layers):
        if l in cfg.skip_in:
            h = (jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
                 ).astype(jnp.bfloat16)
        z = jnp.dot(h, w_refs[l][...],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + b_refs[l][...]
        if l < n_layers - 1:
            h = (jax.nn.softplus(z * 100.0) / 100.0).astype(jnp.bfloat16)
        else:
            h = z
    return h[:, 0] / cfg.scale


def _tri_cumsum(x, inclusive: bool, n_out: int | None = None):
    """Row-wise cumulative sum over the last axis via a triangular matmul
    (cumsum/cumprod primitives are avoided inside the kernel). x [R, n] ->
    [R, n_out or n]; with n_out = n+1 and inclusive=False this yields the
    zero-prepended CDF without any concatenate (Mosaic can't lower
    offset-shifted concats)."""
    n = x.shape[-1]
    m = n if n_out is None else n_out
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    tri = (rows <= cols) if inclusive else (rows < cols)
    return jnp.dot(x, tri.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _onehot_gather(vals, idx):
    """vals [R, n], idx [R, s] int -> vals[r, idx[r, s]] as [R, s]."""
    n = vals.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n,),
                                    len(idx.shape))
    onehot = (idx[..., None] == cols).astype(jnp.float32)
    return (vals[:, None, :] * onehot).sum(axis=-1)


def _round_weights(z, sdf, a2, ob, o2, inv_s: float):
    """NeuS section weights for one up-sample round (`renderer.py:132-176`).
    z/sdf [R, n]; a2 = |d|^2, ob = o.d, o2 = |o|^2 per ray [R, 1]."""
    R, n = z.shape
    radius2 = o2 + 2.0 * z * ob + (z * z) * a2          # |o + d z|^2
    inside = (radius2 < 1.0)
    inside_sec = jnp.logical_or(inside[:, :-1], inside[:, 1:]).astype(
        jnp.float32)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z[:, :-1], z[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    # prev_cos = [0, cos_val[:-1]] without a shifted concat (Mosaic limit):
    # roll right by one and zero the wrapped-around first column
    shifted = pltpu.roll(cos_val, shift=1, axis=1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, cos_val.shape, 1) == 0
    prev_cos = jnp.where(col0, 0.0, shifted)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sec

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)

    # transmittance = prod_{k<j}(1-alpha_k+1e-7) = exp(strict-cumsum(log))
    log_t = jnp.log(jnp.maximum(1.0 - alpha + 1e-7, 1e-30))
    trans = jnp.exp(_tri_cumsum(log_t, inclusive=False))
    return alpha * trans                                  # [R, n-1]


def _sample_pdf_det(z, weights, n_new: int):
    """Deterministic inverse-CDF sampling (`renderer.py:39-69`).
    z [R, n] bins, weights [R, n-1] -> [R, n_new] (sorted)."""
    R, n = z.shape
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    # zero-prepended CDF directly from the rectangular strict-triangular
    # matmul: cdf[r, j] = sum_{k<j} pdf[r, k], j in [0, n)
    cdf = _tri_cumsum(pdf, inclusive=False, n_out=n)      # [R, n]

    u_row = (jnp.asarray(0.5 / n_new, jnp.float32)
             + jax.lax.broadcasted_iota(jnp.int32, (R, n_new), 1)
             .astype(jnp.float32) * (1.0 / n_new))         # linspace midpoints

    # searchsorted right: count of cdf[k] <= u
    le = (cdf[:, None, :] <= u_row[:, :, None]).astype(jnp.int32)
    inds = le.sum(axis=-1)                                 # [R, n_new]
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n - 1)

    cdf_b = _onehot_gather(cdf, below)
    cdf_a = _onehot_gather(cdf, above)
    z_b = _onehot_gather(z, below)
    z_a = _onehot_gather(z, above)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u_row - cdf_b) / denom
    return z_b + t * (z_a - z_b)


def _merge_ranks(z, nz):
    """Ranks of (z, nz) in their sorted union; both inputs sorted row-wise.
    Tie-break: z entries first (matches stable argsort of concat([z, nz]))."""
    n = z.shape[-1]
    m = nz.shape[-1]
    cnt_new_lt = (nz[:, None, :] < z[:, :, None]).astype(jnp.int32).sum(-1)
    rank_z = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + cnt_new_lt
    cnt_z_le = (z[:, None, :] <= nz[:, :, None]).astype(jnp.int32).sum(-1)
    rank_new = jax.lax.broadcasted_iota(jnp.int32, nz.shape, 1) + cnt_z_le
    return rank_z, rank_new, n + m


def _scatter_by_rank(vals, ranks, width: int):
    """vals [R, k], ranks [R, k] unique in [0, width) -> [R, width]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, ranks.shape + (width,), 2)
    onehot = (ranks[..., None] == cols).astype(jnp.float32)
    return (vals[..., None] * onehot).sum(axis=1)


def _kernel(cfg: SDFConfig, n_samples: int, per_round: int, rounds: int,
            n_layers: int, o_ref, d_ref, z_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]

    o = o_ref[...]                                        # [R, 3]
    d = d_ref[...]
    z = z_ref[...]                                        # [R, n_samples]
    R = z.shape[0]

    a2 = (d * d).sum(-1, keepdims=True)                   # [R, 1]
    ob = (o * d).sum(-1, keepdims=True)
    o2 = (o * o).sum(-1, keepdims=True)

    def sdf_at(zv):
        pts = o[:, None, :] + d[:, None, :] * zv[..., None]   # [R, k, 3]
        flat = pts.reshape(-1, 3)
        return _mlp_sdf(cfg, w_refs, b_refs, flat).reshape(zv.shape)

    sdf = sdf_at(z)
    for i in range(rounds):
        weights = _round_weights(z, sdf, a2, ob, o2, float(64 * 2 ** i))
        nz = _sample_pdf_det(z, weights, per_round)
        rank_z, rank_new, width = _merge_ranks(z, nz)
        z_merged = (_scatter_by_rank(z, rank_z, width)
                    + _scatter_by_rank(nz, rank_new, width))
        if i + 1 < rounds:
            new_sdf = sdf_at(nz)
            sdf = (_scatter_by_rank(sdf, rank_z, width)
                   + _scatter_by_rank(new_sdf, rank_new, width))
        z = z_merged
    out_ref[...] = z


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 5))
def _run(cfg: SDFConfig, n_samples: int, per_round: int, rounds: int,
         flat_args, interpret: bool):
    rays_o, rays_d, z_vals, weights, biases = flat_args
    n_layers = len(weights)
    B = z_vals.shape[0]
    total = n_samples + per_round * rounds
    grid = (B // RAY_BLOCK,)
    mspace = pl.ANY if interpret else pltpu.VMEM

    in_specs = [
        pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=mspace),
        pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=mspace),
        pl.BlockSpec((RAY_BLOCK, n_samples), lambda i: (i, 0),
                     memory_space=mspace),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=mspace))
    for b in biases:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                     memory_space=mspace))

    kwargs = {}
    if not interpret:
        # the unrolled 4-round body keeps ~27 MB of stack intermediates live
        # at RAY_BLOCK=32 — above the 16 MB default scoped limit but well
        # within the v5e core's 128 MB VMEM
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, cfg, n_samples, per_round, rounds,
                          n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((RAY_BLOCK, total), lambda i: (i, 0),
                               memory_space=mspace),
        out_shape=jax.ShapeDtypeStruct((B, total), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(rays_o, rays_d, z_vals, *weights, *biases)


def supported(cfg: SDFConfig, n_importance: int, up_sample_steps: int) -> bool:
    return (cfg.multires > 0 and cfg.d_in == 3 and up_sample_steps > 0
            and n_importance > 0 and n_importance % up_sample_steps == 0)


def env_forced() -> bool:
    """RNB_FUSED_UPSAMPLE=1 force-enables the kernel regardless of conf
    (the conf key is model.neus_renderer.use_fused_upsample).

    Measured on v5e (batch 512, 64+64 samples): 6.2 ms/step vs 7.9 ms for the
    XLA loop at bf16 — a real but modest win that costs ~8 minutes of Mosaic
    compile for the fully-unrolled 4-round body (one-hot merges/gathers
    generate large vector programs). Off by default until the compile cost is
    tamed; the XLA loop with bf16 sweeps (fields.sdf_only_lowp) is the
    production path."""
    import os
    return os.environ.get("RNB_FUSED_UPSAMPLE", "0") == "1"


def use_fused(cfg: SDFConfig, n_importance: int, up_sample_steps: int) -> bool:
    return (env_forced() and supported(cfg, n_importance, up_sample_steps)
            and jax.default_backend() == "tpu")


def upsample_fused(cfg: SDFConfig, params, rays_o, rays_d, z_vals,
                   n_importance: int, up_sample_steps: int,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for renderer.upsampled_z_vals' loop body.
    rays_o/rays_d [B,3], z_vals [B, n_samples] -> [B, n_samples+n_importance].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, n_samples = z_vals.shape
    per_round = n_importance // up_sample_steps
    weights, biases = _folded_dense_bf16(params)

    pad = (-B) % RAY_BLOCK
    if pad:
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)), mode="edge")
        rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), mode="edge")
        z_vals = jnp.pad(z_vals, ((0, pad), (0, 0)), mode="edge")
    out = _run(cfg, n_samples, per_round, up_sample_steps,
               (rays_o, rays_d, z_vals, weights, biases), interpret)
    return out[:B]
