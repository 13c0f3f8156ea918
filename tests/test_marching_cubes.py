"""Marching cubes validation: sphere geometry, watertightness (every edge
shared by exactly two faces), Euler characteristic, orientation, and the
bbox-rescale convention (`/root/reference/models/renderer.py:28-36`)."""

import numpy as np
import pytest

from rnb_tpu.ops import marching_cubes as mc


def _sphere_grid(res=48, r=0.6):
    """grid = -sdf of a sphere (the extraction convention: query = -sdf,
    `renderer.py:1219-1224`)."""
    xs = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf = np.linalg.norm(g, axis=-1) - r
    return (-sdf).astype(np.float32), xs


def _check_sphere_mesh(verts, tris, res, r):
    assert len(verts) > 100 and len(tris) > 100
    # vertices on the sphere (index space -> world)
    w = verts / (res - 1.0) * 2.0 - 1.0
    radii = np.linalg.norm(w, axis=-1)
    assert np.abs(radii - r).max() < 3.0 / res
    # watertight: every undirected edge appears exactly twice
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2), f"non-manifold edges: {np.unique(counts)}"
    # Euler characteristic of a sphere: V - E + F = 2
    V = len(np.unique(tris))
    E = len(np.unique(edges, axis=0))
    F = len(tris)
    assert V - E + F == 2


def test_native_module_builds():
    assert mc.native_available(), "C++ marching cubes failed to build"


def test_sphere_native():
    res, r = 48, 0.6
    grid, _ = _sphere_grid(res, r)
    verts, tris = mc.marching_cubes(grid, 0.0)
    _check_sphere_mesh(verts, tris, res, r)


def test_sphere_orientation_outward():
    """grid = -sdf: normals must point outward (positive dot with position)."""
    res, r = 32, 0.5
    grid, _ = _sphere_grid(res, r)
    verts, tris = mc.marching_cubes(grid, 0.0)
    w = verts / (res - 1.0) * 2.0 - 1.0
    a, b, c = w[tris[:, 0]], w[tris[:, 1]], w[tris[:, 2]]
    n = np.cross(b - a, c - a)
    center = (a + b + c) / 3.0
    dots = (n * center).sum(-1)
    frac_outward = (dots > 0).mean()
    assert frac_outward > 0.99 or frac_outward < 0.01  # consistent orientation
    assert frac_outward > 0.5  # and outward specifically


def test_fallback_tetrahedra_sphere():
    res, r = 40, 0.6
    grid, _ = _sphere_grid(res, r)
    verts, tris = mc._marching_tetrahedra(grid, 0.0)
    assert len(verts) > 100
    w = verts / (res - 1.0) * 2.0 - 1.0
    radii = np.linalg.norm(w, axis=-1)
    assert np.abs(radii - r).max() < 4.0 / res


def test_extract_geometry_rescale():
    res, r = 32, 0.5
    grid, _ = _sphere_grid(res, r)
    bmin = np.array([-2.0, -1.0, 0.0])
    bmax = np.array([2.0, 1.0, 4.0])
    verts, tris = mc.extract_geometry(grid, bmin, bmax, 0.0)
    assert verts.min(0)[0] >= bmin[0] and verts.max(0)[0] <= bmax[0]
    # center of mass near bbox center (sphere is centered in the grid)
    np.testing.assert_allclose(verts.mean(0), (bmin + bmax) / 2, atol=0.2)


def test_empty_grid():
    grid = -np.ones((8, 8, 8), np.float32)
    verts, tris = mc.marching_cubes(grid, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_threshold_shift():
    """Nonzero threshold moves the surface (mcube_threshold CLI arg,
    `exp_runner.py:679`)."""
    res = 40
    grid, _ = _sphere_grid(res, 0.6)
    v0, _ = mc.marching_cubes(grid, 0.0)
    v1, _ = mc.marching_cubes(grid, 0.1)  # -sdf = 0.1 => sdf = -0.1 (smaller r)
    r0 = np.linalg.norm(v0 / (res - 1) * 2 - 1, axis=-1).mean()
    r1 = np.linalg.norm(v1 / (res - 1) * 2 - 1, axis=-1).mean()
    assert r1 < r0
