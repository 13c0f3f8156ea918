#!/usr/bin/env python
"""Convert SDM-UniPS photometric-stereo outputs + a MATLAB calibration file
into the IDR data layout the framework trains on.

Equivalent of `/root/reference/preprocess/sdm2idr.py`: ``Calib_Results.mat``
holds ``KK`` (3x3 intrinsics) and per-view ``Rc_i``/``Tc_i`` world-to-camera
extrinsics (1-indexed); per-view SDM-UniPS output folders ``*.data`` hold
``normal.png``/``baseColor.png``; masks live under
``<source_dir>/view_NN/mask.png``. Emits ``world_mat_i = K[R|t]`` into
``cameras.npz`` plus renamed maps under ``{mask,normal,albedo}/NNN.png``.

Run preprocess_cameras.py afterwards to add the scale mats.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import numpy as np
import scipy.io


def convert(input_dir: str, source_dir: str, output_dir: str) -> int:
    data_folders = sorted(glob.glob(os.path.join(input_dir, "*.data")))
    n_views = len(data_folders)
    if n_views == 0:
        raise SystemExit(f"no *.data folders under {input_dir}")

    camera_dict = scipy.io.loadmat(os.path.join(source_dir,
                                                "Calib_Results.mat"))
    bottom = np.array([[0, 0, 0, 1]], dtype=float)
    K = np.concatenate(
        [np.concatenate([camera_dict["KK"], np.zeros((3, 1))], axis=1),
         bottom], axis=0)

    proj = {}
    for i in range(n_views):
        R = camera_dict[f"Rc_{i + 1}"].astype(np.float64)
        T = camera_dict[f"Tc_{i + 1}"].astype(np.float64).reshape(3, 1)
        RT = np.concatenate([np.concatenate([R, T], axis=1), bottom], axis=0)
        proj[f"world_mat_{i}"] = (K @ RT).astype(np.float32)

    for sub in ("mask", "normal", "albedo"):
        os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
    for i, folder in enumerate(data_folders):
        shutil.copy(os.path.join(source_dir, f"view_{i + 1:02d}", "mask.png"),
                    os.path.join(output_dir, "mask", f"{i:03d}.png"))
        shutil.copy(os.path.join(folder, "normal.png"),
                    os.path.join(output_dir, "normal", f"{i:03d}.png"))
        shutil.copy(os.path.join(folder, "baseColor.png"),
                    os.path.join(output_dir, "albedo", f"{i:03d}.png"))

    np.savez(os.path.join(output_dir, "cameras.npz"), **proj)
    return n_views


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Copy SDM-UniPS data to IDR format.")
    parser.add_argument("--input_dir", required=True,
                        help="dir containing per-view *.data folders")
    parser.add_argument("--source_dir", required=True,
                        help="dir with Calib_Results.mat and view_NN/mask.png")
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args()
    n = convert(args.input_dir, args.source_dir, args.output_dir)
    print(f"converted {n} views into {args.output_dir}")
