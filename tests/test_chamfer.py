"""Chamfer evaluation tool: identity ≈ 0, radius delta measured correctly,
CLI JSON output (accuracy metric for DiLiGenT-MV parity, SURVEY.md §6)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from eval_chamfer import chamfer_between_meshes, sample_surface  # noqa: E402

from rnb_tpu.ops import marching_cubes as mc  # noqa: E402
from rnb_tpu.utils.io import write_ply  # noqa: E402


def _sphere_mesh(r=0.6, res=64):
    xs = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    grid = (r - np.linalg.norm(g, axis=-1)).astype(np.float32)  # -sdf
    verts, tris = mc.marching_cubes(grid, 0.0)
    verts = verts / (res - 1.0) * 2.0 - 1.0  # index -> world
    return verts, tris


def test_sample_surface_on_sphere():
    v, f = _sphere_mesh(0.6)
    pts = sample_surface(v, f, 5000, np.random.default_rng(0))
    assert pts.shape == (5000, 3)
    assert np.abs(np.linalg.norm(pts, axis=-1) - 0.6).max() < 0.08


def test_chamfer_identity_near_zero():
    m = _sphere_mesh(0.6)
    res = chamfer_between_meshes(m, m, n_points=20000)
    # sampling noise only: << voxel size
    assert res["chamfer_l1"] < 0.01


def test_chamfer_measures_radius_delta():
    a = _sphere_mesh(0.6)
    b = _sphere_mesh(0.5)
    res = chamfer_between_meshes(a, b, n_points=20000)
    assert res["chamfer_l1"] == pytest.approx(0.1, abs=0.02)
    # scale converts units linearly
    res_mm = chamfer_between_meshes(a, b, n_points=20000, scale=1000.0)
    assert res_mm["chamfer_l1"] == pytest.approx(res["chamfer_l1"] * 1000.0,
                                                 rel=0.05)


def test_cli_json(tmp_path):
    a = _sphere_mesh(0.6, res=48)
    b = _sphere_mesh(0.5, res=48)
    pa, pb = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    write_ply(pa, *a)
    write_ply(pb, *b)
    out = subprocess.run(
        [sys.executable, "tools/eval_chamfer.py", pa, pb,
         "--n_points", "5000", "--json"],
        capture_output=True, text=True, cwd=os.path.join(
            os.path.dirname(__file__), ".."), check=True)
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["chamfer_l1"] == pytest.approx(0.1, abs=0.03)
