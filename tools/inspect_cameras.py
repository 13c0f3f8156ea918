#!/usr/bin/env python
"""Inspect / compare cameras.npz files (equivalent of the reference's
`cheminova/understanding_camerasnpz.py` debug tool, non-interactive).

Prints per-view decompositions (K, R, camera center) and, with two files,
per-view matrix diffs.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rnb_tpu.data.cameras import decompose_projection  # noqa: E402


def describe(path: str):
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("world_mat_")
            and not k.startswith("world_mat_inv"))
    print(f"{path}: {len(data.files)} arrays, {n} views")
    for i in range(n):
        w = data[f"world_mat_{i}"]
        s = data.get(f"scale_mat_{i}" if hasattr(data, "get") else None)
        s = data[f"scale_mat_{i}"] if f"scale_mat_{i}" in data.files else np.eye(4)
        P = (w @ s)[:3, :4]
        K, pose = decompose_projection(P)
        print(f"  view {i}: focal=({K[0, 0]:.1f},{K[1, 1]:.1f}) "
              f"pp=({K[0, 2]:.1f},{K[1, 2]:.1f}) "
              f"center={np.round(pose[:3, 3], 3).tolist()}")
    return data, n


def compare(a: str, b: str):
    da, na = describe(a)
    db, nb = describe(b)
    n = min(na, nb)
    for i in range(n):
        for kind in ("world_mat", "scale_mat"):
            ka = f"{kind}_{i}"
            if ka in da.files and ka in db.files:
                diff = np.abs(da[ka] - db[ka]).max()
                marker = "  OK " if diff < 1e-4 else "DIFF "
                print(f"{marker}{ka}: max |Δ| = {diff:.6g}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", help="cameras.npz to inspect")
    ap.add_argument("--compare", default=None, help="second npz to diff")
    args = ap.parse_args()
    if args.compare:
        compare(args.npz, args.compare)
    else:
        describe(args.npz)
