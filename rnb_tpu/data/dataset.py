"""Device-resident dataset with on-the-fly virtual-light supervision.

Redesign of `/root/reference/models/dataset.py` (class Dataset, lines 99-477)
for TPU:

  * The reference precomputes per-pixel SVD light frames and materializes
    ``images``/``images_warmup``/``light_directions`` as
    ``[n_views, 3, H, W, 3]`` CPU tensors (`dataset.py:153-182,219-223`), then
    gathers pixels on the host and uploads per iteration
    (`dataset.py:351-376`) — a host<->device boundary every step.
  * Here only the *source maps* (normals, albedo, masks) live in HBM as
    ``[V, H, W(,3)]`` arrays; the per-pixel lights, the synthesized warm-up and
    main supervision colors, the rays and the near/far bounds are all computed
    inside the jitted train step from the sampled pixel indices
    (see rnb_tpu.data.lights for the closed-form frame math). Zero per-step
    host traffic; the gathers and frame math fuse with the renderer.

Loads the IDR data layout: ``cameras.npz`` with ``world_mat_i``/``scale_mat_i``
(`dataset.py:184-205`), ``mask/*.png``, ``normal/*.png``, optional
``albedo/*.png``; ``albedo_dir=''`` forces no_albedo (`dataset.py:114-116`).
"""

from __future__ import annotations

import os
from glob import glob
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rnb_tpu.data import cameras as cam
from rnb_tpu.data import lights
from rnb_tpu.utils import io


class DataArrays(NamedTuple):
    """The pytree of device arrays the jitted sampling/training functions use."""
    normals: jnp.ndarray          # [V, H, W, 3] camera-space
    albedos: jnp.ndarray          # [V, H, W, 3] (ones when no_albedo)
    masks: jnp.ndarray            # [V, H, W]
    intrinsics_inv: jnp.ndarray   # [V, 4, 4]
    pose_all: jnp.ndarray         # [V, 4, 4] cam-to-world
    lights_warmup_world: jnp.ndarray  # [V, L, 3]


class RayBatch(NamedTuple):
    rays_o: jnp.ndarray           # [B, 3]
    rays_d: jnp.ndarray           # [B, 3]
    mask: jnp.ndarray             # [B, 1]
    rgb_warmup: jnp.ndarray       # [L, B, 3]
    rgb: jnp.ndarray              # [L, B, 3]
    lights_warmup: jnp.ndarray    # [L, 3]    world, per-view
    lights: jnp.ndarray           # [L, B, 3] world, per-pixel
    near: jnp.ndarray             # [B, 1]
    far: jnp.ndarray              # [B, 1]
    pixels_x: jnp.ndarray         # [B]
    pixels_y: jnp.ndarray         # [B]


# ---------------------------------------------------------------------------
# pure sampling functions (jit-fusable)
# ---------------------------------------------------------------------------

def _rays_from_pixels(arrays: DataArrays, view_idx, px, py):
    """Unproject pixel centers to world rays (`dataset.py:364-373`)."""
    p = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32),
                   jnp.ones_like(px, jnp.float32)], axis=-1)       # [B,3]
    Kinv = arrays.intrinsics_inv[view_idx, :3, :3]
    pose = arrays.pose_all[view_idx]
    d_cam = p @ Kinv.T
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    rays_d = d_cam @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def sample_rays_on_all_lights(arrays: DataArrays, view_idx, key,
                              batch_size: int) -> RayBatch:
    """TPU-native equivalent of ``ps_gen_random_rays_at_view_on_all_lights``
    (`dataset.py:351-376`) + the per-pixel light gather the reference does in
    the outer loop (`exp_runner.py:214-220`) + supervision synthesis
    (`dataset.py:153-182`) — all fused, all on device."""
    V, H, W, _ = arrays.normals.shape
    kx, ky = jax.random.split(key)
    px = jax.random.randint(kx, (batch_size,), 0, W)
    py = jax.random.randint(ky, (batch_size,), 0, H)

    n = arrays.normals[view_idx, py, px]          # [B,3] camera space
    a = arrays.albedos[view_idx, py, px]          # [B,3]
    m = arrays.masks[view_idx, py, px][:, None]   # [B,1]

    pose_r = arrays.pose_all[view_idx, :3, :3]

    # warm-up: fixed camera-space lights; supervision shading in camera space
    u_warm = jnp.asarray(lights.warmup_light_dirs_cam())     # [L,3]
    rgb_warmup = lights.shade(n, u_warm, a)                  # [L,B,3]
    lights_warmup_world = arrays.lights_warmup_world[view_idx]  # [L,3]

    # main: per-pixel closed-form frames
    l_cam = lights.per_pixel_light_dirs_cam(n)               # [L,B,3]
    rgb_main = lights.shade(n, l_cam, a)                     # [L,B,3]
    l_world = jnp.einsum("ij,lbj->lbi", pose_r, l_cam)       # [L,B,3]

    rays_o, rays_d = _rays_from_pixels(arrays, view_idx, px, py)
    near, far = cam.near_far_from_sphere(rays_o, rays_d, xp=jnp)

    return RayBatch(rays_o=rays_o, rays_d=rays_d, mask=m,
                    rgb_warmup=rgb_warmup, rgb=rgb_main,
                    lights_warmup=lights_warmup_world, lights=l_world,
                    near=near, far=far, pixels_x=px, pixels_y=py)


def gen_rays_at(arrays: DataArrays, view_idx: int, resolution_level: int = 1):
    """Full-view ray grid (`dataset.py:300-326`): pixels at
    linspace(0, W-1, W//l); returns rays_o/rays_d [H', W', 3] plus the float
    pixel grids."""
    _, H, W, _ = arrays.normals.shape
    l = resolution_level
    tx = jnp.linspace(0, W - 1, W // l)
    ty = jnp.linspace(0, H - 1, H // l)
    px, py = jnp.meshgrid(tx, ty, indexing="xy")   # [H', W']
    p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    Kinv = arrays.intrinsics_inv[view_idx, :3, :3]
    pose = arrays.pose_all[view_idx]
    d_cam = p @ Kinv.T
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    rays_d = d_cam @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d, px, py


def lights_at_pixels(arrays: DataArrays, view_idx, light_idx, px, py):
    """Per-pixel world main-light dirs for arbitrary (possibly float) pixels —
    used by validate_image (`exp_runner.py:444-448`). px/py int arrays [N]."""
    n = arrays.normals[view_idx, py, px]                      # [N,3]
    l_cam = lights.per_pixel_light_dirs_cam(n)[light_idx]     # [N,3]
    pose_r = arrays.pose_all[view_idx, :3, :3]
    return l_cam @ pose_r.T


def synth_images(arrays: DataArrays, view_idx):
    """Full warm-up + main supervision images for one view
    (replaces the materialized tensors behind ``image_at_ps``,
    `dataset.py:474-477`). Returns ([L,H,W,3], [L,H,W,3])."""
    n = arrays.normals[view_idx]
    a = arrays.albedos[view_idx]
    u_warm = jnp.asarray(lights.warmup_light_dirs_cam())
    img_warm = lights.shade(n, u_warm, a)
    l_cam = lights.per_pixel_light_dirs_cam(n)
    img_main = lights.shade(n, l_cam, a)
    return img_warm, img_main


# ---------------------------------------------------------------------------
# Dataset container
# ---------------------------------------------------------------------------

class Dataset:
    """Owns the device arrays + host-side camera matrices and bbox.

    upload_quantized: ship the maps to the device as uint16 (normals/albedo)
    and uint8 (masks) and decode to f32 on device — 2.2× less host→device
    traffic. EXACTLY lossless for PNG-sourced data (the float values are
    already k/65535 grid points, and masks are binary); `from_conf` turns it
    on. Matters because remote-TPU links can be upload-bound (~0.03 MB/s
    measured through this image's tunnel: a 63 MB DiLiGenT-scale dataset
    would otherwise cost ~35 min of every process launch).
    """

    def __init__(self, normals_np, albedos_np, masks_np, world_mats, scale_mats,
                 object_scale_mat=None, no_albedo: bool = False,
                 upload_quantized: bool = False, device_arrays: bool = True):
        self.no_albedo = bool(no_albedo or albedos_np is None)
        self.n_images, self.H, self.W = masks_np.shape[:3]
        self.n_lights = lights.N_LIGHTS

        intrinsics_list, pose_list = [], []
        self.world_mats_np = [np.asarray(w, np.float32) for w in world_mats]
        self.scale_mats_np = [np.asarray(s, np.float32) for s in scale_mats]
        for world_mat, scale_mat in zip(self.world_mats_np, self.scale_mats_np):
            P = (world_mat @ scale_mat)[:3, :4]
            intr, pose = cam.decompose_projection(P)
            intrinsics_list.append(intr)
            pose_list.append(pose)
        intrinsics_all = np.stack(intrinsics_list)
        pose_all = np.stack(pose_list)

        # warm-up lights rotated to world per view (`dataset.py:208-211`)
        u_warm = lights.warmup_light_dirs_cam()               # [L,3]
        lights_warmup_world = np.einsum("vij,lj->vli", pose_all[:, :3, :3], u_warm)

        if self.no_albedo:
            albedos_np = np.ones_like(normals_np)

        if not device_arrays:
            # host-side container (the multi-host assembler places arrays
            # itself via make_array_from_process_local_data)
            normals_d = np.asarray(normals_np, np.float32)
            albedos_d = np.asarray(albedos_np, np.float32)
            masks_d = np.asarray(masks_np, np.float32)
        elif upload_quantized:
            n16 = np.rint(np.clip((np.asarray(normals_np) + 1.0) * 0.5, 0, 1)
                          * 65535.0).astype(np.uint16)
            a16 = np.rint(np.clip(np.asarray(albedos_np), 0, 1)
                          * 65535.0).astype(np.uint16)
            m8 = (np.asarray(masks_np) > 0.5).astype(np.uint8)

            @jax.jit
            def _decode(n, a, m):
                return (n.astype(jnp.float32) / 65535.0 * 2.0 - 1.0,
                        a.astype(jnp.float32) / 65535.0,
                        m.astype(jnp.float32))

            normals_d, albedos_d, masks_d = _decode(
                jnp.asarray(n16), jnp.asarray(a16), jnp.asarray(m8))
        else:
            normals_d = jnp.asarray(normals_np, jnp.float32)
            albedos_d = jnp.asarray(albedos_np, jnp.float32)
            masks_d = jnp.asarray(masks_np, jnp.float32)

        _place = (jnp.asarray if device_arrays
                  else (lambda a, d=None: np.asarray(a, np.float32)))
        self.arrays = DataArrays(
            normals=normals_d,
            albedos=albedos_d,
            masks=masks_d,
            intrinsics_inv=_place(np.linalg.inv(intrinsics_all), jnp.float32),
            pose_all=_place(pose_all, jnp.float32),
            lights_warmup_world=_place(lights_warmup_world, jnp.float32),
        )
        self.intrinsics_all = intrinsics_all
        self.pose_all_np = pose_all
        self.focal = float(intrinsics_all[0, 0, 0])

        # mesh ROI bbox (`dataset.py:241-251`)
        if object_scale_mat is None:
            object_scale_mat = self.scale_mats_np[0]
        bbox_min = np.array([-1.01, -1.01, -1.01, 1.0])
        bbox_max = np.array([1.01, 1.01, 1.01, 1.0])
        inv0 = np.linalg.inv(self.scale_mats_np[0])
        self.object_bbox_min = (inv0 @ object_scale_mat @ bbox_min[:, None])[:3, 0]
        self.object_bbox_max = (inv0 @ object_scale_mat @ bbox_max[:, None])[:3, 0]

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_conf(cls, conf, no_albedo: bool = False,
                  view_subset: list[int] | None = None,
                  device_arrays: bool = True) -> "Dataset":
        """Disk loader matching `dataset.py:99-253` (IDR layout).

        view_subset: load ONLY these global view indices (in order, repeats
        allowed) — the per-host loading path for view-sharded multi-host
        training (parallel.data.host_local_view_indices gives each process
        its list); no host ever materializes the full dataset.
        device_arrays=False skips the device upload (the multi-host
        assembler places the arrays itself).
        """
        data_dir = conf.get_string("data_dir")
        normal_dir = conf.get_string("normal_dir", default="normal")
        albedo_dir = conf.get_string("albedo_dir", default="")
        mask_dir = conf.get_string("mask_dir", default="mask")
        render_cameras_name = conf.get_string("render_cameras_name")
        object_cameras_name = conf.get_string("object_cameras_name")
        if albedo_dir == "":
            no_albedo = True

        camera_dict = np.load(os.path.join(data_dir, render_cameras_name))

        mask_files = sorted(glob(os.path.join(data_dir, mask_dir, "*.png")))
        normal_files = sorted(glob(os.path.join(data_dir, normal_dir, "*.png")))
        albedo_files = (sorted(glob(os.path.join(data_dir, albedo_dir,
                                                 "*.png")))
                        if not no_albedo else [])
        sel = (list(view_subset) if view_subset is not None
               else list(range(len(mask_files))))

        masks_np = np.stack([io.load_mask(mask_files[i]) for i in sel])
        normals_np = np.stack([io.load_normal(normal_files[i]) for i in sel])
        albedos_np = None
        if not no_albedo:
            albedos_np = np.stack([io.load_image(albedo_files[i])
                                   for i in sel])

        world_mats = [camera_dict[f"world_mat_{i}"].astype(np.float32)
                      for i in sel]
        scale_mats = [camera_dict[f"scale_mat_{i}"].astype(np.float32)
                      for i in sel]
        object_scale_mat = np.load(
            os.path.join(data_dir, object_cameras_name))["scale_mat_0"]

        ds = cls(normals_np, albedos_np, masks_np, world_mats, scale_mats,
                 object_scale_mat=object_scale_mat, no_albedo=no_albedo,
                 upload_quantized=True, device_arrays=device_arrays)
        ds.normal_files = [normal_files[i] for i in sel]
        ds.global_view_indices = sel
        ds.n_images_global = len(mask_files)
        return ds

    # -- host-side helpers (validation only) ---------------------------------

    def near_far_from_sphere(self, rays_o, rays_d):
        return cam.near_far_from_sphere(rays_o, rays_d, xp=jnp)

    def image_at_ps(self, idv: int, idl: int, resolution_level: int = 1):
        """(warm-up, main) synthetic GT image for a view/light, resized
        (`dataset.py:474-477`)."""
        img_warm, img_main = jax.jit(synth_images)(self.arrays, idv)
        w, h = self.W // resolution_level, self.H // resolution_level
        return (io.resize_image(np.asarray(img_warm[idl]), w, h),
                io.resize_image(np.asarray(img_main[idl]), w, h))

    def normal_at(self, idv: int, resolution_level: int = 1):
        """World-space GT normal map, resized (`dataset.py:465-472`)."""
        n = np.asarray(self.arrays.normals[idv]).reshape(-1, 3)
        pose = self.pose_all_np[idv]
        n_world = (pose[:3, :3] @ n.T).T.reshape(self.H, self.W, 3)
        return io.resize_image(n_world,
                               self.W // resolution_level,
                               self.H // resolution_level)

    def gen_rays_between(self, idx_0: int, idx_1: int, ratio: float,
                         resolution_level: int = 1):
        """Slerp camera interpolation (`dataset.py:401-446`)."""
        from scipy.spatial.transform import Rotation as Rot
        from scipy.spatial.transform import Slerp

        l = resolution_level
        tx = np.linspace(0, self.W - 1, self.W // l)
        ty = np.linspace(0, self.H - 1, self.H // l)
        px, py = np.meshgrid(tx, ty, indexing="xy")
        p = np.stack([px, py, np.ones_like(px)], axis=-1)
        Kinv = np.linalg.inv(self.intrinsics_all[0])[:3, :3]
        d_cam = p @ Kinv.T
        d_cam = d_cam / np.linalg.norm(d_cam, axis=-1, keepdims=True)

        pose_0 = np.linalg.inv(self.pose_all_np[idx_0])
        pose_1 = np.linalg.inv(self.pose_all_np[idx_1])
        rots = Rot.from_matrix(np.stack([pose_0[:3, :3], pose_1[:3, :3]]))
        slerp = Slerp([0, 1], rots)
        rot = slerp(ratio)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot.as_matrix()
        pose[:3, 3] = ((1.0 - ratio) * pose_0 + ratio * pose_1)[:3, 3]
        pose = np.linalg.inv(pose)

        rays_d = d_cam @ pose[:3, :3].T
        rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
        return jnp.asarray(rays_o), jnp.asarray(rays_d)


# ---------------------------------------------------------------------------
# synthetic scenes (test fixtures / demos)
# ---------------------------------------------------------------------------

def torus_sdf(p: np.ndarray, R: float = 0.5, r: float = 0.22) -> np.ndarray:
    """Signed distance to a z-axis torus (closed form — also the exact
    point-to-surface distance, which makes Chamfer against this surface an
    exact measurement rather than a mesh-vs-mesh estimate)."""
    rho = np.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    return np.sqrt((rho - R) ** 2 + p[..., 2] ** 2) - r


def _torus_normal(p: np.ndarray, R: float = 0.5) -> np.ndarray:
    rho = np.maximum(np.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2), 1e-12)
    g = np.stack([p[..., 0] * (rho - R) / rho,
                  p[..., 1] * (rho - R) / rho,
                  p[..., 2]], axis=-1)
    return g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def make_torus_scene(n_views: int = 8, H: int = 128, W: int = 128,
                     R: float = 0.5, r: float = 0.22, cam_dist: float = 3.0,
                     albedo_rgb=(0.7, 0.55, 0.35), seed: int = 0,
                     center=(0.0, 0.0, 0.0)) -> Dataset:
    """Analytic torus scene rendered by sphere tracing — a NON-convex,
    genus-1 fixture whose surface differs qualitatively from the SDF
    network's unit-sphere geometric init (a much stronger end-to-end
    convergence test than the sphere: training must both shrink the surface
    and open the hole). Cameras/conventions identical to make_sphere_scene.

    center: world-space torus center. Off-origin centers (with cameras still
    ringing the ORIGIN) make the capture un-normalized — the fixture for
    exercising preprocess/preprocess_cameras.py scene normalization in the
    loop (then scale mats are genuinely non-identity, like DiLiGenT's;
    `/root/reference/models/dataset.py:197-205`).
    """
    center = np.asarray(center, np.float64)
    normals_np = np.zeros((n_views, H, W, 3), np.float32)
    albedos_np = np.zeros((n_views, H, W, 3), np.float32)
    masks_np = np.zeros((n_views, H, W), np.float32)
    world_mats, scale_mats = [], []
    focal = 1.2 * max(H, W)
    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1.0]])

    for v in range(n_views):
        theta = 2 * np.pi * v / n_views
        # tilt the ring so some views look into the hole
        phi = 0.9 * np.sin(theta * 2 + 1.0)
        C = cam_dist * np.array([np.cos(theta) * np.cos(phi),
                                 np.sin(theta) * np.cos(phi),
                                 np.sin(phi)])
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, 0.0, 1.0])
        if abs(np.dot(z, up)) > 0.99:
            up = np.array([0.0, 1.0, 0.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z])
        t = -R_w2c @ C
        P = K @ np.concatenate([R_w2c, t[:, None]], axis=1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P
        world_mats.append(world_mat)
        scale_mats.append(np.eye(4, dtype=np.float32))

        px, py = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
        pp = np.stack([px + 0.0, py + 0.0, np.ones_like(px, np.float64)],
                      axis=-1)
        d_cam = pp @ np.linalg.inv(K).T
        d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
        d_world = d_cam @ R_w2c

        # sphere-trace the torus SDF (evaluated about `center`); BOTH the
        # start and the far termination bound widen with |center| — an
        # off-origin object's far side can sit up to |center| beyond the
        # origin-centered bound, and clipping it there would corrupt the
        # ground-truth masks/normals silently
        c_norm = np.linalg.norm(center)
        t_far = cam_dist + 1.2 + c_norm
        t_ray = np.full((H, W), cam_dist - 1.2 - c_norm)
        alive = np.ones((H, W), bool)
        for _ in range(160):
            p = C[None, None] + t_ray[..., None] * d_world
            d = torus_sdf(p - center, R, r)
            t_ray = np.where(alive, t_ray + d, t_ray)
            alive = alive & (d > 1e-5) & (t_ray < t_far)
        p = C[None, None] + t_ray[..., None] * d_world
        hit = ((np.abs(torus_sdf(p - center, R, r)) < 1e-3)
               & (t_ray < t_far))

        n_world = _torus_normal(p - center, R)
        n_cam = n_world @ R_w2c.T
        normals_np[v] = np.where(hit[..., None], n_cam, 0.0)
        masks_np[v] = hit.astype(np.float32)
        tex = 0.5 + 0.5 * np.sin(6 * np.pi * p[..., 0]) * np.cos(
            6 * np.pi * p[..., 2])
        albedos_np[v] = np.where(
            hit[..., None],
            np.asarray(albedo_rgb)[None, None] * (0.5 + 0.5 * tex[..., None]),
            0.0)

    return Dataset(normals_np, albedos_np, masks_np, world_mats, scale_mats)


def make_sphere_scene(n_views: int = 8, H: int = 64, W: int = 64,
                      radius: float = 0.5, cam_dist: float = 3.0,
                      albedo_rgb=(0.8, 0.5, 0.3), seed: int = 0) -> Dataset:
    """Analytic textured sphere with known normals/albedo/masks — the golden
    fixture the test suite trains against (SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    focal = 1.2 * max(H, W)
    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1.0]])

    normals_np = np.zeros((n_views, H, W, 3), np.float32)
    albedos_np = np.zeros((n_views, H, W, 3), np.float32)
    masks_np = np.zeros((n_views, H, W), np.float32)
    world_mats, scale_mats = [], []

    for v in range(n_views):
        theta = 2 * np.pi * v / n_views
        phi = 0.3 * np.sin(theta * 2 + 1.0)
        # camera center on a ring looking at origin
        C = cam_dist * np.array([np.cos(theta) * np.cos(phi),
                                 np.sin(theta) * np.cos(phi),
                                 np.sin(phi)])
        # camera axes: z toward origin
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, 0.0, 1.0])
        if abs(np.dot(z, up)) > 0.99:
            up = np.array([0.0, 1.0, 0.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z])              # rows
        t = -R_w2c @ C
        P = K @ np.concatenate([R_w2c, t[:, None]], axis=1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P
        world_mats.append(world_mat)
        scale_mats.append(np.eye(4, dtype=np.float32))

        # render analytic sphere: per pixel ray, hit test
        px, py = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
        p = np.stack([px + 0.0, py + 0.0, np.ones_like(px, np.float64)], axis=-1)
        d_cam = p @ np.linalg.inv(K).T
        d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
        d_world = d_cam @ R_w2c            # rows are axes => cam->world is R^T
        oc = C[None, None, :]
        b = 2 * (d_world * oc).sum(-1)
        c = (oc * oc).sum(-1) - radius ** 2
        disc = b ** 2 - 4 * c
        hit = disc > 0
        t_hit = (-b - np.sqrt(np.maximum(disc, 0))) / 2.0
        pts = oc + t_hit[..., None] * d_world
        n_world = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-12)
        n_cam = n_world @ R_w2c.T          # world->cam
        # camera looks along +z; visible normals have n_cam_z < 0
        normals_np[v] = np.where(hit[..., None], n_cam, 0.0)
        masks_np[v] = hit.astype(np.float32)
        # smooth procedural albedo
        tex = 0.5 + 0.5 * np.sin(4 * np.pi * pts[..., 0]) * np.cos(4 * np.pi * pts[..., 1])
        albedos_np[v] = np.where(
            hit[..., None],
            np.asarray(albedo_rgb)[None, None] * (0.5 + 0.5 * tex[..., None]),
            0.0)

    return Dataset(normals_np, albedos_np, masks_np, world_mats, scale_mats)
