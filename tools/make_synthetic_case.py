#!/usr/bin/env python
"""Emit a synthetic sphere scene to disk in the IDR data layout the loader
expects (`/root/reference/models/dataset.py:99-253`):

    data/<case>/cameras.npz   (world_mat_i, scale_mat_i)
    data/<case>/normal/NNN.png
    data/<case>/albedo/NNN.png
    data/<case>/mask/NNN.png

Lets the full CLI path (exp_runner.py --mode train_rnb --case <case>) run
without DiLiGenT-MV downloads; also the fixture for CLI-level tests.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scene synthesis is pure host work; forcing CPU avoids shipping the maps
# through the (slow) remote-TPU tunnel just to read them back for PNG writes
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rnb_tpu.data import dataset as ds  # noqa: E402
from rnb_tpu.utils import io  # noqa: E402


def write_case(out_dir: str, n_views: int = 8, H: int = 128, W: int = 128,
               radius: float = 0.4, seed: int = 0,
               shape: str = "sphere") -> str:
    if shape == "torus":
        scene = ds.make_torus_scene(n_views=n_views, H=H, W=W, seed=seed)
    else:
        scene = ds.make_sphere_scene(n_views=n_views, H=H, W=W, radius=radius,
                                     seed=seed)
    os.makedirs(out_dir, exist_ok=True)

    cams = {}
    for i in range(n_views):
        cams[f"world_mat_{i}"] = scene.world_mats_np[i]
        cams[f"scale_mat_{i}"] = scene.scale_mats_np[i]
    np.savez(os.path.join(out_dir, "cameras.npz"), **cams)

    normals = np.asarray(scene.arrays.normals)
    albedos = np.asarray(scene.arrays.albedos)
    masks = np.asarray(scene.arrays.masks)
    for i in range(n_views):
        io.save_normal(os.path.join(out_dir, "normal", f"{i:03d}.png"),
                       normals[i], bit_depth=16)
        io.save_image(os.path.join(out_dir, "albedo", f"{i:03d}.png"),
                      albedos[i], bit_depth=16)
        io.save_image(os.path.join(out_dir, "mask", f"{i:03d}.png"),
                      np.stack([masks[i]] * 3, axis=-1))
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./data/sphere")
    ap.add_argument("--n_views", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--radius", type=float, default=0.4)
    ap.add_argument("--shape", default="sphere", choices=["sphere", "torus"])
    args = ap.parse_args()
    path = write_case(args.out, args.n_views, args.size, args.size,
                      args.radius, shape=args.shape)
    print(f"wrote synthetic case to {path}")
