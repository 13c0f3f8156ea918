"""Image / normal-map / mesh I/O.

Mirrors the reference's bit-depth-aware loaders and sign conventions
(`/root/reference/models/dataset.py:48-96`):

  * images: uint8/uint16 PNG -> float [0,1], BGR->RGB
  * normal maps: image*2-1 with y and z components negated (camera space,
    z pointing *into* the scene for valid pixels)
  * savers are exact inverses

plus a dependency-free binary-PLY writer (the reference uses trimesh for
export only, `exp_runner.py:576-578`; trimesh is not available here).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2 as cv
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv = None
    _HAS_CV2 = False


def _imread_unchanged(path: str) -> np.ndarray:
    if _HAS_CV2:
        img = cv.imread(path, cv.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        return img
    from PIL import Image
    img = np.asarray(Image.open(path))
    if img.ndim == 3 and img.shape[2] >= 3:  # PIL gives RGB; convert to BGR
        img = img[..., [2, 1, 0] + list(range(3, img.shape[2]))]
    return img


def load_image(path: str) -> np.ndarray:
    """-> float32 [H,W,3] RGB in [0,1] (`dataset.py:48-57`)."""
    image = _imread_unchanged(path)
    if image.dtype == np.uint8:
        denom = np.float32(2 ** 8 - 1)
    elif image.dtype == np.uint16:
        denom = np.float32(2 ** 16 - 1)
    else:
        raise ValueError(f"unsupported bit depth {image.dtype} for {path}")
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    image = image[..., :3][..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(image, dtype=np.float32) / denom


def load_normal(path: str) -> np.ndarray:
    """-> float32 [H,W,3] camera-space normal in [-1,1] with y,z sign flips
    (`dataset.py:59-68`)."""
    normal = load_image(path) * 2.0 - 1.0
    normal[..., 1] = -normal[..., 1]
    normal[..., 2] = -normal[..., 2]
    return normal


def load_mask(path: str) -> np.ndarray:
    """-> float32 [H,W] binarized at 0.5 (`dataset.py:132-136`)."""
    img = _imread_unchanged(path)
    if img.ndim == 3:
        img = img[..., 0]
    img = img.astype(np.float64) / 255.0
    return np.where(img > 0.5, 1.0, 0.0).astype(np.float32)


def save_image(path: str, image: np.ndarray, bit_depth: int = 8) -> None:
    """[H,W,3] RGB float [0,1] -> PNG (`dataset.py:70-85`)."""
    arr = np.clip(np.asarray(image, np.float64) * (2 ** bit_depth - 1),
                  0, 2 ** bit_depth - 1)
    arr = arr.astype(np.uint8 if bit_depth == 8 else np.uint16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if _HAS_CV2:
        cv.imwrite(path, arr[..., ::-1], [cv.IMWRITE_PNG_COMPRESSION, 0])
    else:
        from PIL import Image
        Image.fromarray(arr).save(path)


def save_normal(path: str, normal: np.ndarray, bit_depth: int = 8) -> None:
    """Inverse of load_normal (`dataset.py:87-96`)."""
    n = np.array(normal, copy=True)
    n[..., 1] = -n[..., 1]
    n[..., 2] = -n[..., 2]
    save_image(path, (n + 1.0) / 2.0, bit_depth=bit_depth)


def resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    if _HAS_CV2:
        return cv.resize(img, (w, h))
    from PIL import Image
    return np.asarray(Image.fromarray((img * 255).astype(np.uint8)).resize((w, h))) / 255.0


# ---------------------------------------------------------------------------
# PLY export (binary little-endian, optional per-vertex color)
# ---------------------------------------------------------------------------

def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray,
              vertex_colors: np.ndarray | None = None) -> None:
    """Minimal binary PLY writer (replaces trimesh export,
    `exp_runner.py:576-578,620-622`). vertex_colors float [0,1] or uint8."""
    vertices = np.asarray(vertices, dtype="<f4")
    faces = np.asarray(faces, dtype="<i4")
    n_v, n_f = len(vertices), len(faces)

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n_v}",
              "property float x", "property float y", "property float z"]
    if vertex_colors is not None:
        vc = np.asarray(vertex_colors)
        if vc.dtype != np.uint8:
            vc = np.clip(vc * 255.0, 0, 255).astype(np.uint8)
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += [f"element face {n_f}", "property list uchar int vertex_indices",
               "end_header"]

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if vertex_colors is not None:
            vert_dt = np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec = np.empty(n_v, dtype=vert_dt)
            rec["xyz"] = vertices
            rec["rgb"] = vc
            rec.tofile(f)
        else:
            vertices.tofile(f)
        face_dt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        rec = np.empty(n_f, dtype=face_dt)
        rec["n"] = 3
        rec["idx"] = faces
        rec.tofile(f)


def read_ply(path: str):
    """Minimal reader for the files write_ply produces (tests/tools)."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply"
        n_v = n_f = 0
        has_color = False
        while True:
            line = f.readline().strip().decode()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line.startswith("property uchar red"):
                has_color = True
            elif line == "end_header":
                break
        if has_color:
            vert_dt = np.dtype([("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec = np.fromfile(f, dtype=vert_dt, count=n_v)
            verts, colors = rec["xyz"].copy(), rec["rgb"].copy()
        else:
            verts = np.fromfile(f, dtype="<f4", count=n_v * 3).reshape(n_v, 3)
            colors = None
        face_dt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        faces = np.fromfile(f, dtype=face_dt, count=n_f)["idx"].copy()
    return verts, faces, colors
