#!/usr/bin/env python
"""MSE/PSNR image comparison (equivalent of the reference's interactive
`cheminova/compare_image_similarities.py`, batch version).

Compares two images or two directories of same-named images; prints per-pair
MSE/PSNR and optionally writes |a-b| difference images.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rnb_tpu.utils import io  # noqa: E402


def compare_pair(a_path: str, b_path: str, diff_out: str | None = None):
    a = io.load_image(a_path)
    b = io.load_image(b_path)
    if a.shape != b.shape:
        return None
    mse = float(((a - b) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    if diff_out:
        io.save_image(diff_out, np.abs(a - b))
    return mse, psnr


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--diff_dir", default=None)
    args = ap.parse_args()

    if os.path.isdir(args.a):
        names = sorted(set(os.listdir(args.a)) & set(os.listdir(args.b)))
        names = [n for n in names if n.lower().endswith((".png", ".jpg"))]
        for n in names:
            diff = (os.path.join(args.diff_dir, n) if args.diff_dir else None)
            r = compare_pair(os.path.join(args.a, n), os.path.join(args.b, n),
                             diff)
            if r is None:
                print(f"{n}: SHAPE MISMATCH")
            else:
                print(f"{n}: mse={r[0]:.6f} psnr={r[1]:.2f} dB")
    else:
        r = compare_pair(args.a, args.b,
                         os.path.join(args.diff_dir, "diff.png")
                         if args.diff_dir else None)
        if r is None:
            raise SystemExit("shape mismatch")
        print(f"mse={r[0]:.6f} psnr={r[1]:.2f} dB")
