"""Dataset/camera/light tests: closed-form light-frame properties, camera
decomposition round-trips vs OpenCV, synthetic-scene consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnb_tpu.data import cameras, dataset, lights


# ---------------------------------------------------------------------------
# virtual lights
# ---------------------------------------------------------------------------

def test_base_light_dirs_unit_and_tilted():
    for slant in (lights.SLANT_WARMUP_DEG, lights.SLANT_MAIN_DEG):
        u = lights.base_light_dirs(slant)
        assert u.shape == (3, 3)
        np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-6)
        # all have the same (negative) z component = -cos(slant)
        np.testing.assert_allclose(u[:, 2], -np.cos(np.radians(slant)), atol=1e-6)
        # tilts 120° apart: x/y components sum to zero
        np.testing.assert_allclose(u[:, :2].sum(0), 0.0, atol=1e-6)


def test_normal_frames_are_rotations():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    R = np.asarray(lights.normal_frames(jnp.asarray(n)))
    # orthonormal columns, det +1
    eye = np.einsum("bij,bik->bjk", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # third column z-component is non-negative (reference R[2,2] fix,
    # `dataset.py:286-287`)
    assert np.all(R[:, 2, 2] >= -1e-6)
    # third column is ±n̂
    n_hat = n / np.linalg.norm(n, axis=-1, keepdims=True)
    dot = np.abs(np.einsum("bi,bi->b", R[:, :, 2], n_hat))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_per_pixel_shading_is_cos_slant():
    """The RNb invariant: for any valid normal, n·l_k = ||n||·cos(54.74°)
    for all three per-pixel lights — shading is linear in the normal
    (`dataset.py:268-292` and SURVEY.md §2 'virtual light generator')."""
    rng = np.random.default_rng(1)
    n = rng.normal(size=(128, 3)).astype(np.float32)
    n[:, 2] = -np.abs(n[:, 2])  # valid camera-space normals have n_z < 0
    l = np.asarray(lights.per_pixel_light_dirs_cam(jnp.asarray(n)))  # [3,128,3]
    ndotl = np.einsum("bi,lbi->lb", n, l)
    expected = np.linalg.norm(n, axis=-1) * np.cos(np.radians(lights.SLANT_MAIN_DEG))
    np.testing.assert_allclose(ndotl, np.broadcast_to(expected, ndotl.shape),
                               atol=1e-4)


def test_shading_synthesis_no_albedo_tiles_rgb():
    n = jnp.asarray([[0.0, 0.0, -1.0]])
    u = jnp.asarray(lights.warmup_light_dirs_cam())
    img = np.asarray(lights.shade(n, u, None))
    assert img.shape == (3, 1, 3)
    # shading = max(n·l, 0) = cos(30°) for the straight-on normal
    np.testing.assert_allclose(img, np.cos(np.radians(30.0)), atol=1e-5)
    # tiled across RGB
    assert np.allclose(img[..., 0], img[..., 1])


def test_shading_zero_for_background():
    n = jnp.zeros((4, 3))
    l = lights.per_pixel_light_dirs_cam(n)
    img = np.asarray(lights.shade(n, l, None))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(l)))


# ---------------------------------------------------------------------------
# camera decomposition
# ---------------------------------------------------------------------------

def _random_camera(rng):
    K = np.array([[500.0 + rng.uniform(-50, 50), 0.0, 320.0],
                  [0.0, 480.0 + rng.uniform(-50, 50), 240.0],
                  [0.0, 0.0, 1.0]])
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, np.pi)
    Kx = np.array([[0, -axis[2], axis[1]],
                   [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
    C = rng.normal(size=3) * 3.0
    t = -R @ C
    P = K @ np.concatenate([R, t[:, None]], axis=1)
    return K, R, C, P


def test_decompose_projection_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        K, R, C, P = _random_camera(rng)
        intr, pose = cameras.decompose_projection(P)
        np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], R.T, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(pose[:3, 3], C, rtol=1e-4, atol=1e-4)


def test_decompose_matches_opencv():
    cv = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    for _ in range(5):
        _, _, _, P = _random_camera(rng)
        out = cv.decomposeProjectionMatrix(P)
        K_cv = out[0] / out[0][2, 2]
        R_cv, t_cv = out[1], out[2]
        intr, pose = cameras.decompose_projection(P)
        np.testing.assert_allclose(intr[:3, :3], K_cv, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], R_cv.T, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(pose[:3, 3], (t_cv[:3] / t_cv[3])[:, 0],
                                   rtol=1e-4, atol=1e-4)


def test_near_far_from_sphere():
    o = np.array([[0.0, 0.0, -3.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    near, far = cameras.near_far_from_sphere(o, d)
    np.testing.assert_allclose(near, 2.0, atol=1e-6)
    np.testing.assert_allclose(far, 4.0, atol=1e-6)


# ---------------------------------------------------------------------------
# synthetic scene + sampling
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sphere_ds():
    return dataset.make_sphere_scene(n_views=4, H=48, W=48)


def test_sphere_scene_consistency(sphere_ds):
    ds = sphere_ds
    assert ds.arrays.normals.shape == (4, 48, 48, 3)
    masks = np.asarray(ds.arrays.masks)
    assert 0.05 < masks.mean() < 0.9
    # foreground camera-space normals: unit, z<0 (facing camera)
    n = np.asarray(ds.arrays.normals)
    fg = masks > 0.5
    norms = np.linalg.norm(n[fg], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert (n[fg][:, 2] < 0.2).mean() > 0.9


def test_rays_hit_sphere(sphere_ds):
    """Rays through mask-interior pixels must intersect the r=0.5 sphere."""
    ds = sphere_ds
    batch = dataset.sample_rays_on_all_lights(
        ds.arrays, 0, jax.random.PRNGKey(0), 256)
    o, d = np.asarray(batch.rays_o), np.asarray(batch.rays_d)
    m = np.asarray(batch.mask)[:, 0] > 0.5
    # distance from origin to ray
    t_closest = -(o * d).sum(-1)
    closest = o + t_closest[:, None] * d
    dist = np.linalg.norm(closest, axis=-1)
    assert (dist[m] < 0.52).mean() > 0.95
    assert (dist[~m] > 0.45).mean() > 0.9
    # near/far bracket the sphere
    assert np.all(np.asarray(batch.near) < t_closest[:, None] + 1e-3)
    assert np.all(np.asarray(batch.far) > t_closest[:, None] - 1e-3)


def test_sampled_supervision_matches_synth_images(sphere_ds):
    """Per-pixel sampled GT must equal the full-image synthesis at the same
    pixels (the reference materializes these; we compute on the fly)."""
    ds = sphere_ds
    batch = dataset.sample_rays_on_all_lights(
        ds.arrays, 1, jax.random.PRNGKey(1), 64)
    img_warm, img_main = jax.jit(dataset.synth_images)(ds.arrays, 1)
    px = np.asarray(batch.pixels_x)
    py = np.asarray(batch.pixels_y)
    np.testing.assert_allclose(np.asarray(batch.rgb_warmup),
                               np.asarray(img_warm)[:, py, px], atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch.rgb),
                               np.asarray(img_main)[:, py, px], atol=1e-5)


def test_main_supervision_value(sphere_ds):
    """main image = albedo * ||n|| cos(54.74°) on foreground."""
    ds = sphere_ds
    img_warm, img_main = jax.jit(dataset.synth_images)(ds.arrays, 0)
    m = np.asarray(ds.arrays.masks[0]) > 0.5
    a = np.asarray(ds.arrays.albedos[0])
    expected = a * np.cos(np.radians(lights.SLANT_MAIN_DEG))
    for li in range(3):
        np.testing.assert_allclose(np.asarray(img_main[li])[m], expected[m],
                                   atol=1e-4)


def test_world_lights_unit_norm(sphere_ds):
    ds = sphere_ds
    batch = dataset.sample_rays_on_all_lights(
        ds.arrays, 0, jax.random.PRNGKey(2), 32)
    ln = np.linalg.norm(np.asarray(batch.lights), axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)
    lw = np.linalg.norm(np.asarray(batch.lights_warmup), axis=-1)
    np.testing.assert_allclose(lw, 1.0, atol=1e-5)


def test_gen_rays_at_grid(sphere_ds):
    ds = sphere_ds
    rays_o, rays_d, px, py = dataset.gen_rays_at(ds.arrays, 0, resolution_level=2)
    assert rays_o.shape == (24, 24, 3)
    dn = np.linalg.norm(np.asarray(rays_d), axis=-1)
    np.testing.assert_allclose(dn, 1.0, atol=1e-5)


def test_quantized_upload_lossless_for_png_data(tmp_path):
    """upload_quantized must round-trip PNG-sourced data exactly: values that
    came from 16-bit PNGs are k/65535 grid points and masks are binary."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_synthetic_case import write_case
    from rnb_tpu import config as cfglib

    case = write_case(str(tmp_path / "case"), n_views=2, H=24, W=24)
    conf = cfglib.parse_string(
        'data_dir = %s\nrender_cameras_name = cameras.npz\n'
        'object_cameras_name = cameras.npz\nalbedo_dir = albedo\n' % case)
    from rnb_tpu.data import dataset as dslib
    d_q = dslib.Dataset.from_conf(conf)
    # reload without quantization by re-reading the same files
    from glob import glob
    from rnb_tpu.utils import io
    masks = np.stack([io.load_mask(p)
                      for p in sorted(glob(os.path.join(case, "mask/*.png")))])
    normals = np.stack([io.load_normal(p)
                        for p in sorted(glob(os.path.join(case,
                                                          "normal/*.png")))])
    albedos = np.stack([io.load_image(p)
                        for p in sorted(glob(os.path.join(case,
                                                          "albedo/*.png")))])
    cams = np.load(os.path.join(case, "cameras.npz"))
    wm = [cams[f"world_mat_{i}"] for i in range(2)]
    sm = [cams[f"scale_mat_{i}"] for i in range(2)]
    d_f = dslib.Dataset(normals, albedos, masks, wm, sm, upload_quantized=False)
    np.testing.assert_allclose(np.asarray(d_q.arrays.normals),
                               np.asarray(d_f.arrays.normals), atol=1e-7)
    np.testing.assert_allclose(np.asarray(d_q.arrays.albedos),
                               np.asarray(d_f.arrays.albedos), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(d_q.arrays.masks),
                                  np.asarray(d_f.arrays.masks))
