#!/usr/bin/env python
"""Parse a VisualSFM ``cameras_v2.txt`` reconstruction into ``world_mat_i``
matrices (equivalent of `/root/reference/cheminova/sfm_camera_txt_file_to_npz.py`).

cameras_v2.txt per-camera block (blank-line separated): image filename(s),
focal length, principal point, translation T, camera center C, axis-angle,
quaternion (4 numbers), then a 3x3 rotation matrix R, then distortion.
We build ``P = K [R | T]`` with K from the focal + principal point (the
reference script stored only [R|T]; storing the full projection is what the
IDR loader actually expects — pair with preprocess_cameras.py for scale mats).
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_cameras_v2(path: str):
    with open(path) as f:
        lines = [ln.strip() for ln in f.readlines()]

    start = 0
    for i, ln in enumerate(lines):
        if ln.startswith("#") and "number of cameras" in ln.lower().replace(
                "nubmer", "number"):
            start = i + 2
            break

    cameras, cur, r_rows, seen_q = [], {}, [], False

    def flush():
        nonlocal cur, r_rows, seen_q
        if cur.get("R") is not None or r_rows:
            if r_rows:
                cur["R"] = np.array(r_rows, dtype=np.float64)
            cameras.append(cur)
        cur, r_rows, seen_q = {}, [], False

    for ln in lines[start:]:
        if ln == "":
            if cur:
                flush()
            continue
        parts = ln.split()
        low = ln.lower()
        if low.endswith((".jpg", ".png", ".jpeg", ".tif")):
            cur.setdefault("filename", ln)
        elif len(parts) == 1:
            # first bare number is the focal; later singletons (distortion,
            # trailing zero) are ignored
            if "focal" not in cur:
                try:
                    cur["focal"] = float(parts[0])
                except ValueError:
                    pass
        elif len(parts) == 2:
            cur["pp"] = [float(x) for x in parts]
        elif len(parts) == 4:
            cur["Q"] = [float(x) for x in parts]
            seen_q = True
        elif len(parts) == 3:
            vals = [float(x) for x in parts]
            if "T" not in cur:
                cur["T"] = vals
            elif "C" not in cur:
                cur["C"] = vals
            elif seen_q and len(r_rows) < 3:
                r_rows.append(vals)
    if cur:
        flush()
    return cameras


def world_mats(cameras, width: int | None = None, height: int | None = None):
    mats = {}
    for idx, cam in enumerate(cameras):
        R = np.asarray(cam.get("R"))
        if R is None or R.shape != (3, 3):
            print(f"skipping camera {idx}: missing/invalid R")
            continue
        T = np.asarray(cam["T"], dtype=np.float64).reshape(3, 1)
        f = cam.get("focal", 1.0)
        if "pp" in cam:
            cx, cy = cam["pp"]
        else:
            cx = (width or 0) / 2.0
            cy = (height or 0) / 2.0
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
        P = K @ np.concatenate([R, T], axis=1)
        M = np.eye(4, dtype=np.float32)
        M[:3, :4] = P
        mats[f"world_mat_{idx}"] = M
        mats[f"scale_mat_{idx}"] = np.eye(4, dtype=np.float32)
    return mats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="cameras_v2.txt from VisualSFM")
    ap.add_argument("--out", default="cameras.npz")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    args = ap.parse_args()
    cams = parse_cameras_v2(args.input)
    mats = world_mats(cams, args.width, args.height)
    np.savez(args.out, **mats)
    print(f"saved {len(mats) // 2} cameras to {args.out}")
