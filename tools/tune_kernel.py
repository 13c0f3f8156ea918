#!/usr/bin/env python
"""Block-size sweep for the fused SDF core kernel on real TPU.

The kernel's grid steps execute sequentially on the single TensorCore, so
points-per-block trades per-step launch/pipeline overhead against VMEM
footprint (~16 MB/core: the bwd kernel keeps all 9 layers' pre-activations
per block, ~4.7 MB f32 at block 128, plus weights, dW accumulators and
cotangent buffers). This sweeps both blocks and reports ms for the fwd op
and the fwd+bwd contraction at production point count (batch 512 x 128
samples), plus the full train step at the best setting.

Usage (TPU must be free — single-client tunnel):
    python tools/tune_kernel.py [--n 65536] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--fwd", type=int, nargs="*", default=[128, 256, 512, 1024])
    ap.add_argument("--bwd", type=int, nargs="*", default=[128, 256])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rnb_tpu.models import fields
    from rnb_tpu.ops import pallas_sdf_core as core

    cfg = fields.SDFConfig()
    params = fields.init_sdf_network(jax.random.PRNGKey(3), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (args.n, 3), jnp.float32,
                             -0.8, 0.8)
    cw = jax.random.normal(jax.random.PRNGKey(5), (args.n, 256)) * 0.01

    def timed(fn, *a):
        out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        return (time.perf_counter() - t0) / args.iters * 1000.0

    rows = []
    for fb in args.fwd:
        fwd = jax.jit(lambda p, x, fb=fb: core.sdf_value_feat_grad_fused(
            cfg, p, x, fwd_block=fb))
        try:
            ms = timed(fwd, params, pts)
        except Exception as e:
            rows.append({"fwd_block": fb, "fwd_ms": None,
                         "err": str(e).splitlines()[0][:120]})
            continue
        rows.append({"fwd_block": fb, "fwd_ms": round(ms, 3)})
        print(rows[-1], flush=True)

    for fb in args.fwd:
        for bb in args.bwd:
            def loss(p, x, fb=fb, bb=bb):
                sdf, feat, grad = core.sdf_value_feat_grad_fused(
                    cfg, p, x, fwd_block=fb, bwd_block=bb)
                eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
                return sdf.sum() * 1e-3 + (feat * cw).mean() + eik
            g = jax.jit(jax.grad(loss))
            try:
                ms = timed(g, params, pts)
            except Exception as e:
                rows.append({"fwd_block": fb, "bwd_block": bb,
                             "fwd_bwd_ms": None,
                             "err": str(e).splitlines()[0][:120]})
                print(rows[-1], flush=True)
                continue
            rows.append({"fwd_block": fb, "bwd_block": bb,
                         "fwd_bwd_ms": round(ms, 3)})
            print(rows[-1], flush=True)

    print(json.dumps({"n_pts": args.n, "rows": rows}))


if __name__ == "__main__":
    main()
