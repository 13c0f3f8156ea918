#!/usr/bin/env python
"""Attribute the fwd-kernel time (roofline: ~3.1 ms vs 1.27 ms MXU-ideal at
65k points) by timing STRIPPED kernel variants — profiler traces are opaque
inside a Mosaic custom call, so ablation is the measurement tool:

    full        pallas_sdf_core._forward_chain itself (the production chain)
    no_pe       PE replaced by a broadcast of the raw coords (isolates the
                sin/cos ladder + tangent-basis construction)
    no_act      softplus/sigmoid pair replaced by cheap multiplies with the
                SAME dataflow (the Tz*s3 tangent scaling stays — isolates
                ONLY the transcendentals)
    primal_only tangent slabs dropped (isolates the 3x tangent matmul cost)

Numerics of the variants are WRONG by construction — timing only.
Usage (free TPU): python tools/ablate_kernel.py [--n 65536] [--block 256]
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
    ap.add_argument("--block", type=int, default=256)
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

    def chain(mode, w_refs, b_refs, p):
        """Stripped variants of core._forward_chain — mode 'full' is NOT
        handled here (it calls the production function directly, so the
        baseline can never desynchronize from the shipped kernel)."""
        inv_sqrt2 = jnp.asarray(1.0 / math.sqrt(2.0), dtype)
        B = p.shape[0]
        if mode == "no_pe":
            e = jnp.broadcast_to(p[:, :1], (B, cfg.input_ch)
                                 ).astype(jnp.float32)
            X0 = jnp.concatenate([e, e, e, e], axis=0)
        else:
            X0 = core._pe_rows(cfg, p)
        e16 = X0[:B].astype(dtype)
        T16 = X0[B:].astype(dtype)
        h, Th = e16, T16
        z = Tz = None
        for l in range(n_layers):
            if l in cfg.skip_in:
                h = jnp.concatenate([h, e16], axis=-1) * inv_sqrt2
                if mode != "primal_only":
                    Th = jnp.concatenate([Th, T16], axis=-1) * inv_sqrt2
            w16 = w_refs[l][...].astype(dtype)
            z = jnp.dot(h, w16, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            if mode != "primal_only":
                Tz = jnp.dot(Th, w16, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
            if l < n_layers - 1:
                zb = z + b_refs[l][...]
                if mode == "no_act":
                    # same dataflow as production, transcendentals replaced
                    # by multiplies
                    s, hh = zb * 0.5, zb * 0.25
                else:
                    s, hh = core._softplus100_pair(zb)
                h = hh.astype(dtype)
                if mode != "primal_only":
                    s3 = jnp.concatenate([s, s, s], axis=0)
                    Th = (Tz * s3).astype(dtype)
        if mode == "primal_only":
            Tz = jnp.zeros((3 * B, z.shape[-1]), jnp.float32)
        return z, Tz

    def make_kernel(mode):
        def kern(p_ref, *refs):
            w_refs = refs[:n_layers]
            b_refs = refs[n_layers:2 * n_layers]
            sdf_ref, grad_ref = refs[2 * n_layers:]
            B = p_ref.shape[0]
            if mode == "full":
                z, Tz = core._forward_chain(cfg, n_layers, w_refs, b_refs,
                                            p_ref[...], dtype)
            else:
                z, Tz = chain(mode, w_refs, b_refs, p_ref[...])
            sdf_ref[...] = z[:, :1]
            grad_ref[...] = jnp.transpose(Tz[:, 0].reshape(3, B), (1, 0))
        return kern

    def run(mode):
        blk = args.block
        mspace = pltpu.VMEM
        in_specs = [pl.BlockSpec((blk, 3), lambda i: (i, 0),
                                 memory_space=mspace)]
        in_specs += core._specs_weights(ws, bs, mspace)  # reads .shape only
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

    res = {}
    for mode in ("full", "no_pe", "no_act", "primal_only"):
        try:
            res[mode] = round(run(mode), 3)
        except Exception as e:
            res[mode] = f"{e!r}"[:140]
        print(mode, res[mode], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
