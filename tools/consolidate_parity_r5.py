#!/usr/bin/env python
"""Assemble PARITY_r5.json from the round-5 evidence runs:

  * the kernel-numerics revalidation (PARITY_r5_kernel.json)
  * the non-square world-space row (PARITY_r5_worldspace.json)
  * the two FULL uncompressed 300k-schedule rows at DiLiGenT scale
    (gates written by /tmp-driven runs to the paths below, or re-gated
    here from the exp dirs if present)
  * the r4 4-variant compressed matrix (carried forward for reference —
    those runs predate the round-5 kernels; the kernel revalidation row is
    the bridge)

Usage: python tools/consolidate_parity_r5.py [--out PARITY_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    p = os.path.join(ROOT, path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def gate(exp_dir, threshold, warm_up_iter):
    g = subprocess.run(
        [sys.executable, "tools/acceptance.py", exp_dir, "--shape", "torus",
         "--warm_up_iter", str(warm_up_iter), "--threshold", str(threshold)],
        cwd=ROOT, capture_output=True, text=True)
    try:
        return json.loads(g.stdout.strip().splitlines()[-1])
    except (json.JSONDecodeError, IndexError):
        return {"accepted": False, "failures": [g.stderr[-300:]]}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r5.json")
    ap.add_argument("--womask_wall_s", type=float, default=None)
    ap.add_argument("--noalb_wall_s", type=float, default=None)
    args = ap.parse_args(argv)

    full = {}
    for name, threshold, wall in (
            ("womask_rnb", 0.008, args.womask_wall_s),
            ("wmask_rnb_noalbedo", 0.004, args.noalb_wall_s)):
        exp = os.path.join(ROOT, "exp", "torus_dlg", name)
        if os.path.isdir(os.path.join(exp, "meshes")):
            rec = gate(exp, threshold, 200000)
            if wall:
                rec["train_wall_s"] = wall
            rec["schedule"] = ("FULL uncompressed shipped conf: 300k iters / "
                               "200k warm-up" + (", n_outside=4 (bg NeRF "
                               "trained)" if name == "womask_rnb" else
                               ", zero overrides"))
            full[name] = rec

    wna = load("PARITY_r5_womask_noalb.json")
    out = {
        "round": 5,
        "kernel_revalidation_30k": load("PARITY_r5_kernel.json"),
        "worldspace_nonsquare_30k": load("PARITY_r5_worldspace.json"),
        "full_300k_diligent_scale": full,
        "womask_noalbedo_30k": wna,
        "r4_compressed_matrix_reference": (load("PARITY_r4.json") or
                                           {}).get("variants"),
        "all_accepted": all([
            (load("PARITY_r5_kernel.json") or {}).get("all_accepted"),
            (load("PARITY_r5_worldspace.json") or {}).get("all_accepted"),
            (wna or {}).get("all_accepted"),
            *(r.get("accepted") for r in full.values()),
            bool(full),
        ]),
    }
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"all_accepted": out["all_accepted"],
                      "full_rows": list(full)}))
    return 0 if out["all_accepted"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
