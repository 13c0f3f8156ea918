"""Offline-tool tests: scene normalization recovers the synthetic sphere's
center/scale; sdm2idr and the VisualSFM parser round-trip synthetic inputs."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "preprocess"))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_normalization_recovers_sphere(tmp_path):
    """Build an un-normalized synthetic case (world = sphere at offset c,
    radius r, identity scale mats), run the normalization, and check the
    estimated scale_mat brings the object near the unit sphere."""
    from make_synthetic_case import write_case
    from preprocess_cameras import get_normalization

    case = str(tmp_path / "case")
    write_case(case, n_views=6, H=96, W=96, radius=0.45)

    norm = get_normalization(case, seed=0)
    # sphere is centered at origin with radius 0.45 -> centroid ~0,
    # scale ~ O(radius)
    assert np.abs(norm[:3, 3]).max() < 0.15
    s = norm[0, 0]
    assert 0.1 < s < 1.5
    # cameras.npz now contains scale mats; the Dataset must load it
    from rnb_tpu import config as cfglib
    from rnb_tpu.data import dataset as ds
    conf = cfglib.parse_string(
        f"data_dir = {case}\nrender_cameras_name = cameras.npz\n"
        "object_cameras_name = cameras.npz\nnormal_dir = normal\n"
        "albedo_dir = albedo\nmask_dir = mask\n")
    loaded = ds.Dataset.from_conf(conf)
    # after normalization the object bbox should be within ~unit range
    assert np.all(np.isfinite(loaded.object_bbox_min))
    assert np.all(loaded.object_bbox_max > loaded.object_bbox_min)


def test_visual_hull_refinement(tmp_path):
    """refine_visual_hull (`/root/reference/preprocess/preprocess_cameras.py:
    125-155`, disabled there): silhouette carving of the sphere case must
    recover a centroid near the true center and a tighter scale consistent
    with the true radius (hull scale = 3x mean point distance ~= 3*0.45*
    sqrt-moment, same order as the epipolar estimate)."""
    from make_synthetic_case import write_case
    from preprocess_cameras import (load_mask_points, refine_visual_hull)

    case = str(tmp_path / "case")
    write_case(case, n_views=6, H=96, W=96, radius=0.45)
    _, masks = load_mask_points(os.path.join(case, "mask"))
    cams = np.load(os.path.join(case, "cameras.npz"))
    Ps = np.array([cams[f"world_mat_{i}"][:3].astype(np.float64)
                   for i in range(6)])
    centroid, scale, pts = refine_visual_hull(
        masks, Ps, scale=1.0, center=np.zeros(3), grid_size=60)
    assert np.abs(centroid).max() < 0.1
    # hull of a radius-0.45 sphere: mean |p - c| in [0.2, 0.45] -> scale in
    # [0.6, 1.4] (x3); and all kept points lie inside ~the true sphere
    assert 0.6 < scale < 1.4
    d = np.linalg.norm(pts - centroid[None], axis=1)
    assert d.max() < 0.6
    # empty hull raises loudly instead of emitting a NaN scale_mat
    with pytest.raises(RuntimeError):
        refine_visual_hull(masks, Ps, scale=1.0,
                           center=np.array([50.0, 0, 0]), grid_size=10)


def test_sdm2idr_roundtrip(tmp_path):
    import scipy.io
    from sdm2idr import convert
    from rnb_tpu.utils import io

    src = tmp_path / "src"
    inp = tmp_path / "inp"
    out = tmp_path / "out"
    n_views = 3
    rng = np.random.default_rng(0)

    mats = {"KK": np.array([[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]])}
    for i in range(1, n_views + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        mats[f"Rc_{i}"] = R
        mats[f"Tc_{i}"] = rng.normal(size=(3, 1))
        os.makedirs(src / f"view_{i:02d}")
        io.save_image(str(src / f"view_{i:02d}" / "mask.png"),
                      np.ones((8, 8, 3)))
    os.makedirs(src, exist_ok=True)
    scipy.io.savemat(str(src / "Calib_Results.mat"), mats)

    img = rng.uniform(size=(8, 8, 3))
    for i in range(n_views):
        os.makedirs(inp / f"{i:03d}.data")
        io.save_image(str(inp / f"{i:03d}.data" / "normal.png"), img)
        io.save_image(str(inp / f"{i:03d}.data" / "baseColor.png"), img)

    n = convert(str(inp), str(src), str(out))
    assert n == n_views
    cams = np.load(out / "cameras.npz")
    for i in range(n_views):
        P = cams[f"world_mat_{i}"]
        assert P.shape == (4, 4)
        # world_mat = K [R|t]: check P[:3,:3] = KK @ R
        np.testing.assert_allclose(P[:3, :3], mats["KK"] @ mats[f"Rc_{i + 1}"],
                                   rtol=1e-5)
        assert os.path.exists(out / "normal" / f"{i:03d}.png")
        assert os.path.exists(out / "albedo" / f"{i:03d}.png")
        assert os.path.exists(out / "mask" / f"{i:03d}.png")


def test_sfm_parser(tmp_path):
    from sfm_cameras_to_npz import parse_cameras_v2, world_mats

    txt = tmp_path / "cameras_v2.txt"
    txt.write_text("""# Camera parameter file.
# The nubmer of cameras in this reconstruction
2

img_000.jpg
orig_000.jpg
800.5
320.0 240.0
0.1 0.2 0.3
1.0 2.0 3.0
0.0 0.0 0.0
1.0 0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
0.0

img_001.jpg
orig_001.jpg
900.0
320.0 240.0
0.4 0.5 0.6
4.0 5.0 6.0
0.0 0.0 0.0
1.0 0.0 0.0 0.0
0.0 1.0 0.0
1.0 0.0 0.0
0.0 0.0 -1.0
0.0
""")
    cams = parse_cameras_v2(str(txt))
    assert len(cams) == 2
    assert cams[0]["focal"] == 800.5
    assert cams[0]["T"] == [0.1, 0.2, 0.3]
    mats = world_mats(cams)
    assert "world_mat_0" in mats and "scale_mat_1" in mats
    P = mats["world_mat_0"]
    K = np.array([[800.5, 0, 320], [0, 800.5, 240], [0, 0, 1]])
    np.testing.assert_allclose(P[:3, :3], K @ np.eye(3), rtol=1e-6)
    np.testing.assert_allclose(P[:3, 3], K @ np.array([0.1, 0.2, 0.3]),
                               rtol=1e-5)


def test_compare_images_tool(tmp_path):
    from compare_images import compare_pair
    from rnb_tpu.utils import io
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(16, 16, 3))
    io.save_image(str(tmp_path / "a.png"), a, bit_depth=16)
    io.save_image(str(tmp_path / "b.png"), a, bit_depth=16)
    mse, psnr = compare_pair(str(tmp_path / "a.png"), str(tmp_path / "b.png"))
    assert mse < 1e-7 and psnr > 60


def test_organize_data_view_layout(tmp_path):
    """`--layout view` (DiLiGenT-MV style): files directly under each view
    folder, SDM outputs in SDM_out/ — the exact entry path of a real
    DiLiGenT parity run (reference organizer:
    `/root/reference/cheminova/organize_DiLiGenT-MV_to_RNB.py`)."""
    from organize_data import organize
    from rnb_tpu.utils import io

    src = tmp_path / "diligent"
    rng = np.random.default_rng(0)
    # natural sort must order view_2 before view_10
    names = ["view_1", "view_2", "view_10"]
    for v in names:
        (src / v / "SDM_out").mkdir(parents=True)
        io.save_image(str(src / v / "mask.png"), np.ones((8, 8, 3)))
        io.save_image(str(src / v / "SDM_out" / "normal.png"),
                      rng.uniform(size=(8, 8, 3)))
        io.save_image(str(src / v / "SDM_out" / "baseColor.png"),
                      rng.uniform(size=(8, 8, 3)))
    np.savez(str(src / "view_1" / "cameras.npz"),
             world_mat_0=np.eye(4), scale_mat_0=np.eye(4))

    out = tmp_path / "out"
    n = organize(str(src), str(out), layout="view")
    assert n == 3
    for kind in ("mask", "normal", "albedo"):
        got = sorted(os.listdir(out / kind))
        assert got == ["000.png", "001.png", "002.png"], (kind, got)
    assert (out / "cameras.npz").exists()
    # index 2 must be view_10 (natural order), i.e. its normal content
    a = io.load_image(str(out / "normal" / "002.png"))
    b = io.load_image(str(src / "view_10" / "SDM_out" / "normal.png"))
    assert np.allclose(a, b, atol=1e-3)


def test_organize_data_rti_layout(tmp_path):
    """`--layout rti` (lab capture layout): an 'rti' folder nested inside
    each view holds mask + SDM_out."""
    from organize_data import organize
    from rnb_tpu.utils import io

    src = tmp_path / "lab"
    for i in range(2):
        base = src / f"pos{i}" / "nested" / "rti"
        (base / "SDM_out").mkdir(parents=True)
        io.save_image(str(base / "mask.png"), np.ones((8, 8, 3)))
        io.save_image(str(base / "SDM_out" / "normal.png"),
                      np.ones((8, 8, 3)) * 0.5)
        io.save_image(str(base / "SDM_out" / "baseColor.png"),
                      np.ones((8, 8, 3)) * 0.25)
    out = tmp_path / "out"
    n = organize(str(src), str(out), layout="rti")
    assert n == 2
    assert sorted(os.listdir(out / "mask")) == ["000.png", "001.png"]


def test_degraded_capture_statistics(tmp_path):
    """The --degrade pass must actually produce SDM-UniPS-like artifacts:
    per-pixel angular normal noise at the configured magnitude, morphed mask
    boundaries, perturbed stored focals, 8-bit maps — while the underlying
    geometry stays the clean analytic scene (the acceptance gates measure
    against it)."""
    from make_synthetic_case import write_case
    from rnb_tpu.data import dataset as ds
    from rnb_tpu.utils import io

    case = str(tmp_path / "deg")
    write_case(case, n_views=4, H=64, W=64, shape="torus", degrade=True,
               normal_noise_deg=3.0, mask_morph_px=2, focal_err=0.002)

    clean = ds.make_torus_scene(n_views=4, H=64, W=64)
    clean_n = np.asarray(clean.arrays.normals)
    clean_m = np.asarray(clean.arrays.masks)

    # 8-bit PNGs
    import cv2 as cv
    img = cv.imread(os.path.join(case, "normal", "000.png"),
                    cv.IMREAD_UNCHANGED)
    assert img.dtype == np.uint8

    n0 = io.load_normal(os.path.join(case, "normal", "000.png"))
    m0 = io.load_mask(os.path.join(case, "mask", "000.png"))
    both = (clean_m[0] > 0.5) & (m0 > 0.5)
    dots = np.clip((n0[both] * clean_n[0][both]).sum(-1)
                   / np.maximum(np.linalg.norm(n0[both], axis=-1), 1e-9),
                   -1, 1)
    ang = np.degrees(np.arccos(dots))
    # folded N(0, 3deg) has mean ~2.4deg; 8-bit quantization adds ~0.3
    assert 1.0 < ang.mean() < 5.0, ang.mean()

    # masks morphed on every view, alternating erode/dilate
    area_clean = clean_m.sum(axis=(1, 2))
    for v in range(4):
        mv = io.load_mask(os.path.join(case, "mask", f"{v:03d}.png"))
        assert (clean_m[v] != mv).sum() > 0
        if v % 2 == 0:
            assert mv.sum() < area_clean[v]   # eroded
        else:
            assert mv.sum() > area_clean[v]   # dilated

    # stored cameras perturbed relative to the true render cameras
    cams = np.load(os.path.join(case, "cameras.npz"))
    deltas = [np.abs(cams[f"world_mat_{v}"] - clean.world_mats_np[v]).max()
              for v in range(4)]
    assert max(deltas) > 1e-4
