#!/usr/bin/env python
"""Organize SDM-UniPS photometric-stereo outputs into the IDR layout.

One tool covering both reference organizers
(`/root/reference/cheminova/organize_data_to_RNb.py` and
`organize_DiLiGenT-MV_to_RNB.py`): walk per-view subfolders of ``--input``
(naturally sorted), locate each view's ``mask.png`` plus its ``SDM_out/
{normal.png, baseColor.png}``, copy them to ``<out>/{mask,normal,albedo}/
NNN.png``, and copy the first ``cameras.npz`` found. ``--layout rti`` searches
for an ``rti`` folder inside each view (the lab capture layout);
``--layout view`` (DiLiGenT-MV style) expects the files directly under the
view folder.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
from pathlib import Path


def natural_sort(items):
    def key(p):
        return [int(c) if c.isdigit() else c.lower()
                for c in re.split(r"([0-9]+)", str(p))]
    return sorted(items, key=key)


def find_named_dir(root: Path, name: str):
    for dirpath, dirnames, _ in os.walk(root):
        if name in dirnames:
            return Path(dirpath) / name
    return None


def find_file(root: Path, name: str):
    for dirpath, _, filenames in os.walk(root):
        if name in filenames:
            return Path(dirpath) / name
    return None


def organize(input_dir: str, output_dir: str, layout: str = "view",
             sdm_dirname: str = "SDM_out") -> int:
    input_folder = Path(input_dir).resolve()
    out = Path(output_dir).resolve()
    for sub in ("albedo", "mask", "normal"):
        (out / sub).mkdir(parents=True, exist_ok=True)

    views = natural_sort([f for f in input_folder.iterdir() if f.is_dir()])
    cameras_copied = False
    n_ok = 0
    for idx, view in enumerate(views):
        if layout == "rti":
            base = find_named_dir(view, "rti")
            if base is None:
                print(f"no 'rti' folder under {view}, skipping")
                continue
        else:
            base = view
        sdm = base / sdm_dirname

        srcs = {
            "mask": base / "mask.png",
            "normal": sdm / "normal.png",
            "albedo": sdm / "baseColor.png",
        }
        name = f"{idx:03d}.png"
        copied_any = False
        for kind, src in srcs.items():
            if src.exists():
                shutil.copyfile(src, out / kind / name)
                copied_any = True
            else:
                print(f"{src} not found")
        if copied_any:
            n_ok += 1

        if not cameras_copied:
            cams = find_file(view, "cameras.npz")
            if cams is not None:
                shutil.copyfile(cams, out / "cameras.npz")
                cameras_copied = True

    if not cameras_copied:
        print("warning: no cameras.npz found; run sdm2idr.py or "
              "sfm_cameras_to_npz.py to produce one")
    return n_ok


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="Organize 3D data files.")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--layout", choices=("view", "rti"), default="view")
    ap.add_argument("--sdm_dirname", default="SDM_out")
    args = ap.parse_args()
    n = organize(args.input, args.output, args.layout, args.sdm_dirname)
    print(f"organized {n} views into {args.output}")
