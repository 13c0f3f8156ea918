#!/usr/bin/env python
"""Quantified ICI scaling prediction (VERDICT r3 weak #1 / next #7).

Single-chip hardware is all this environment offers, so hardware scaling
cannot be *measured* here — but it can be *argued* with numbers instead of
left open. This tool computes the two quantities the data-parallel scaling
efficiency is made of and emits the model into SCALING_r4.json:

  * per-step collective volume: ONE gradient psum over the replicated param
    bundle (the only cross-device traffic in the replicated-data step;
    `rnb_tpu/parallel/train.py:140`) — counted EXACTLY from the production
    param pytree (f32 leaves). The view-sharded step has the same psum and
    zero data movement in its sampling path (each device samples its own
    views).
  * per-step compute time: measured on the real chip (bench.py /
    BENCH_r0N.json; pass --step_ms to override).

Weak-scaling efficiency model (global batch grows with N, per-chip work
constant):

    t_comm(N) = 2 * (N-1)/N * P_bytes / BW_allreduce      (ring allreduce)
    eff(N)    = t_step / (t_step + t_comm(N))

with BW_allreduce the per-chip ICI allreduce bandwidth (default 4.5e10 B/s,
the published v5e per-direction ICI bandwidth; an order-of-magnitude
underestimate would STILL leave eff > 0.95 here, which is the point: the
model is ~1M params against ~16 ms of compute)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # pure host math; never touch TPU

import numpy as np  # noqa: E402

from rnb_tpu.models import fields  # noqa: E402


def param_bytes() -> dict:
    statics = fields.ModelStatics(sdf=fields.SDFConfig(),
                                  color=fields.RenderingConfig(),
                                  nerf=fields.NeRFConfig())
    params = fields.init_model_bundle(jax.random.PRNGKey(0), statics)
    out = {}
    for name, sub in params.items():
        out[name] = int(sum(np.asarray(l).size * 4
                            for l in jax.tree_util.tree_leaves(sub)))
    out["total"] = sum(out.values())
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured per-step wall ms (default: parse "
                         "BENCH_r0*.json rays/s at batch 512)")
    ap.add_argument("--bw", type=float, default=4.5e10,
                    help="effective per-chip allreduce bandwidth B/s")
    ap.add_argument("--out", default="SCALING_r4.json")
    args = ap.parse_args(argv)

    pb = param_bytes()

    step_ms = args.step_ms
    bench_src = "--step_ms"
    if step_ms is None:
        import glob
        benches = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_r0*.json")))
        with open(benches[-1]) as f:
            b = json.load(f)
        parsed = b.get("parsed", b)
        rays_s = parsed["value"]
        step_ms = 512.0 / rays_s * 1000.0
        bench_src = os.path.basename(benches[-1])

    rows = []
    for n in (2, 4, 8, 16, 32, 64, 256):
        t_comm_ms = 2.0 * (n - 1) / n * pb["total"] / args.bw * 1000.0
        eff = step_ms / (step_ms + t_comm_ms)
        rows.append({"n_chips": n,
                     "t_comm_ms": round(t_comm_ms, 4),
                     "predicted_weak_scaling_efficiency": round(eff, 4)})

    out = {
        "note": ("PREDICTION, not measurement: single-chip hardware only in "
                 "this environment. The model is one ring-allreduce of the "
                 "f32 grad bundle per step vs the measured single-chip step "
                 "time; CPU-virtual multi-device runs (tools/bench_scaling."
                 "py) validate program semantics only. Run on a real pod "
                 "slice to replace these numbers."),
        "param_bytes": pb,
        "grad_psum_bytes_per_step": pb["total"],
        "step_ms_measured_1chip": round(step_ms, 3),
        "step_ms_source": bench_src,
        "assumed_allreduce_bw_B_per_s": args.bw,
        "predicted": rows,
        "sensitivity": {
            "bw_10x_worse": round(step_ms / (
                step_ms + 2.0 * pb["total"] / (args.bw / 10) * 1000.0), 4),
            "comment": ("even at 1/10 the assumed ICI bandwidth the "
                        "efficiency stays above this value at any N — the "
                        "grads are simply tiny next to the per-step render "
                        "compute"),
        },
        "target": ">=0.8 scaling efficiency (BASELINE.json north star)",
    }
    path = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"step_ms": out["step_ms_measured_1chip"],
                      "grad_bytes": pb["total"],
                      "eff_256chips": rows[-1][
                          "predicted_weak_scaling_efficiency"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
