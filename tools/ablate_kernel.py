#!/usr/bin/env python
"""Attribute the fwd-kernel time by timing STRIPPED kernel variants —
profiler traces are opaque inside a Mosaic custom call, so ablation is the
measurement tool. Round-5 kernel shape (primal chain + reverse sweep for
∇SDF, ops/pallas_sdf_core._fwd_kernel):

    full        the production forward kernel dataflow
    no_pe       PE replaced by a broadcast of the raw coords (isolates the
                sin/cos ladder + tangent-basis construction)
    no_act      softplus/sigmoid pair replaced by cheap multiplies with the
                SAME dataflow (isolates ONLY the transcendentals)
    primal_only reverse sweep dropped (isolates the ∇SDF sweep cost; this is
                also the shape of a pure inference kernel)

Numerics of the variants are WRONG by construction — timing only.
Usage (free TPU): python tools/ablate_kernel.py [--n 65536] [--block 128]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)
    assert args.n % args.block == 0, (
        f"--n {args.n} must divide by --block {args.block} (no pad here; "
        "a partial grid would silently mistime)")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rnb_tpu.models import fields
    from rnb_tpu.ops import pallas_sdf_core as core

    cfg = fields.SDFConfig()
    params = fields.init_sdf_network(jax.random.PRNGKey(3), cfg)
    dense = core._fold_dense(params)
    # device-resident operands: numpy args would re-upload through the
    # (slow) remote-TPU tunnel on every call and dominate the timing
    ws = tuple(jax.device_put(np.asarray(w)) for w, _ in dense)
    bs = tuple(jax.device_put(np.asarray(b)[None, :]) for _, b in dense)
    n_layers = len(ws)
    pts = jax.device_put(np.random.default_rng(0).uniform(
        -0.8, 0.8, (args.n, 3)).astype(np.float32))
    dtype = jnp.bfloat16

    def make_kernel(mode):
        def kern(pts_ref, *refs):
            w_refs = refs[:n_layers]
            b_refs = refs[n_layers:2 * n_layers]
            sdf_ref, grad_ref = refs[2 * n_layers:]
            B = pts_ref.shape[0]
            inv_sqrt2 = jnp.asarray(1.0 / math.sqrt(2.0), dtype)
            if mode == "no_pe":
                e = jnp.broadcast_to(pts_ref[...][:, :1],
                                     (B, cfg.input_ch)).astype(jnp.float32)
                Ts = (e, e, e)
            else:
                e, Ts = core._pe_parts(cfg, pts_ref[...])
            e16 = e.astype(dtype)
            h = e16
            recs = []
            z = None
            for l in range(n_layers):
                if l in cfg.skip_in:
                    h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2
                w16 = w_refs[l][...].astype(dtype)
                z = core._dot(h, w16, dtype)
                if l < n_layers - 1:
                    zb = z + b_refs[l][...]
                    recs.append(zb)
                    if mode == "no_act":
                        hh = zb * 0.25
                    else:
                        _, hh = core._softplus100_pair(zb)
                    h = hh.astype(dtype)
            sdf_ref[...] = z[:, :1]
            if mode == "primal_only":
                grad_ref[...] = jnp.zeros((B, 3), jnp.float32)
                return
            # reverse sweep (same shape as production)
            bar_e = jnp.zeros_like(e)
            bar_h = None
            for l in range(n_layers - 1, -1, -1):
                if l == n_layers - 1:
                    d_out = w_refs[l].shape[1]
                    oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (B, d_out), 1) == 0).astype(jnp.float32)
                    bar_x = core._dot_t(oh, w_refs[l][...].astype(dtype),
                                        dtype)
                else:
                    if mode == "no_act":
                        s = recs[l] * 0.5
                    else:
                        s, _ = core._softplus100_pair(recs[l])
                    bar_z = bar_h * s
                    bar_x = core._dot_t(bar_z,
                                        w_refs[l][...].astype(dtype), dtype)
                if l in cfg.skip_in:
                    hd = bar_x.shape[-1] - e.shape[-1]
                    bar_e = bar_e + bar_x[:, hd:] * (1.0 / math.sqrt(2.0))
                    bar_h = bar_x[:, :hd] * (1.0 / math.sqrt(2.0))
                else:
                    bar_h = bar_x
            bar_e = bar_e + bar_h
            grad_ref[...] = jnp.concatenate(
                [jnp.sum(bar_e * T, axis=-1, keepdims=True) for T in Ts],
                axis=-1)
        return kern

    def run(mode):
        blk = args.block
        mspace = pltpu.VMEM
        in_specs = [pl.BlockSpec((blk, 3), lambda i: (i, 0),
                                 memory_space=mspace)]
        in_specs += core._specs_weights(ws, bs, mspace)
        out_specs = [
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=mspace),
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=mspace)]
        out_shape = [jax.ShapeDtypeStruct((args.n, 1), jnp.float32),
                     jax.ShapeDtypeStruct((args.n, 3), jnp.float32)]
        call = pl.pallas_call(
            make_kernel(mode), grid=(args.n // blk,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)))
        f = jax.jit(lambda p, w, b: call(p, *w, *b))
        out = f(pts, ws, bs)
        float(np.asarray(out[0])[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(pts, ws, bs)
        float(np.asarray(out[0])[0, 0])
        return (time.perf_counter() - t0) / args.iters * 1000.0

    # 'full' times the production _fwd_kernel through the real entry point
    # (its feat output included) so the baseline tracks the shipped kernel
    def run_full():
        out = core._run_fwd(cfg, (pts, ws, bs), False, dtype, args.block)
        float(np.asarray(out[0])[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core._run_fwd(cfg, (pts, ws, bs), False, dtype, args.block)
        float(np.asarray(out[0])[0, 0])
        return (time.perf_counter() - t0) / args.iters * 1000.0

    res = {}
    for mode in ("full", "no_pe", "no_act", "primal_only"):
        try:
            res[mode] = round(run_full() if mode == "full" else run(mode), 3)
        except Exception as e:
            res[mode] = f"{e!r}"[:140]
        print(mode, res[mode], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
