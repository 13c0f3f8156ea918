#!/usr/bin/env python
"""Chamfer-distance mesh evaluation (the reference's canonical accuracy
metric — DiLiGenT-MV Chamfer in mm, reported in the paper but absent from the
reference repo; SURVEY.md §6 / `README.md:12,106` in /root/reference).

Usage:
    python tools/eval_chamfer.py PRED.ply GT.ply [--n_points 100000]
        [--scale 1.0] [--max_dist inf] [--json]

Protocol (matches the common DiLiGenT-MV evaluation):
  * sample N points uniformly (area-weighted) on each mesh surface
  * d(P→Q) = mean over sampled p of the distance to the nearest point of Q's
    sample set (accuracy); d(Q→P) is completeness
  * chamfer = (d(P→Q) + d(Q→P)) / 2, reported in input units × --scale
    (DiLiGenT-MV meshes are in mm, so --scale 1)
  * --max_dist clips outlier correspondences (some protocols use 20 mm)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def sample_surface(vertices: np.ndarray, faces: np.ndarray, n: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Area-weighted uniform surface sampling -> [n,3]."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("mesh has zero surface area")
    idx = rng.choice(len(faces), size=n, p=areas / total)
    # uniform barycentric coordinates
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    a, b, c = 1.0 - r1, r1 * (1.0 - r2), r1 * r2
    return (a[:, None] * v0[idx] + b[:, None] * v1[idx] + c[:, None] * v2[idx])


def nn_distances(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """For each src point, distance to nearest dst point."""
    from scipy.spatial import cKDTree
    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1, workers=-1)
    return d


def chamfer(points_a: np.ndarray, points_b: np.ndarray,
            max_dist: float = np.inf) -> dict:
    d_ab = np.minimum(nn_distances(points_a, points_b), max_dist)
    d_ba = np.minimum(nn_distances(points_b, points_a), max_dist)
    return {
        "accuracy_mean": float(d_ab.mean()),
        "completeness_mean": float(d_ba.mean()),
        "chamfer_l1": float(0.5 * (d_ab.mean() + d_ba.mean())),
        "chamfer_l2": float(0.5 * ((d_ab ** 2).mean() + (d_ba ** 2).mean())),
        "accuracy_median": float(np.median(d_ab)),
        "completeness_median": float(np.median(d_ba)),
    }


def chamfer_between_meshes(pred_vf, gt_vf, n_points: int = 100000,
                           scale: float = 1.0, max_dist: float = np.inf,
                           seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    pa = sample_surface(np.asarray(pred_vf[0], np.float64) * scale,
                        np.asarray(pred_vf[1]), n_points, rng)
    pb = sample_surface(np.asarray(gt_vf[0], np.float64) * scale,
                        np.asarray(gt_vf[1]), n_points, rng)
    return chamfer(pa, pb, max_dist=max_dist)


def _load_mesh(path: str):
    if path.endswith(".ply"):
        sys.path.insert(0, ".")
        from rnb_tpu.utils.io import read_ply
        try:
            v, f, _ = read_ply(path)
            return v, f
        except Exception:
            pass  # not our binary format; fall through to trimesh
    try:
        import trimesh
        m = trimesh.load(path, force="mesh")
        return np.asarray(m.vertices), np.asarray(m.faces)
    except ImportError as e:
        raise SystemExit(f"cannot read {path}: {e}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("pred")
    ap.add_argument("gt")
    ap.add_argument("--n_points", type=int, default=100000)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="unit scale applied to both meshes before measuring")
    ap.add_argument("--max_dist", type=float, default=np.inf,
                    help="clip correspondence distances (outlier robustness)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    res = chamfer_between_meshes(_load_mesh(args.pred), _load_mesh(args.gt),
                                 n_points=args.n_points, scale=args.scale,
                                 max_dist=args.max_dist, seed=args.seed)
    if args.json:
        print(json.dumps(res))
    else:
        for k, v in res.items():
            print(f"{k:22s} {v:.6f}")
    return res


if __name__ == "__main__":
    main()
