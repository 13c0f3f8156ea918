"""Chip-tiled SDF grid evaluation for marching cubes.

The 512³ extraction is ~134M MLP evaluations (`/root/reference/models/renderer.py:10-25`
runs them serially in 64³ chunks on one GPU). Here the flattened grid is
sharded over the ray mesh: each device evaluates its slice (embarrassingly
parallel, zero collectives), results gather to host for the C++ polygonizer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rnb_tpu.models.fields import ModelStatics
from rnb_tpu.models.renderer import sdf_grid_query


def extract_fields_sharded(statics: ModelStatics, params, bound_min, bound_max,
                           resolution: int, mesh: Mesh,
                           chunk: int = 2 ** 20, negate: bool = True
                           ) -> np.ndarray:
    """Evaluate (-sdf) on the dense grid, sharded across `mesh`'s devices."""
    n_dev = mesh.devices.size
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)

    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnums=(0,), out_shardings=shard)
    def eval_chunk(sdf_cfg, sdf_params, pts):
        # same kernel/precision policy as the single-device extraction
        # (renderer.sdf_grid_query: sliced sdf head, not the 257-wide
        # feature output — ~12% less matmul per sweep)
        return sdf_grid_query(sdf_cfg, sdf_params, pts, negate)

    params_repl = jax.device_put(params["sdf"], repl)

    total = resolution ** 3
    # chunk must divide evenly across devices
    chunk = max(n_dev, (chunk // n_dev) * n_dev)
    out = np.empty((total,), np.float32)

    # generate points lazily per chunk to bound host memory
    grid_y, grid_z = np.meshgrid(ys, zs, indexing="ij")
    plane = np.stack([grid_y, grid_z], axis=-1).reshape(-1, 2)  # [R*R, 2]
    plane_n = plane.shape[0]

    buf = np.empty((chunk, 3), np.float32)
    start = 0
    while start < total:
        end = min(start + chunk, total)
        n = end - start
        idx = np.arange(start, end)
        xi = idx // plane_n
        pi = idx % plane_n
        buf[:n, 0] = xs[xi]
        buf[:n, 1:] = plane[pi]
        if n < chunk:
            buf[n:] = 0.0
        pts = jax.device_put(jnp.asarray(buf), shard)
        vals = eval_chunk(statics.sdf, params_repl, pts)
        out[start:end] = np.asarray(vals)[:n]
        start = end
    return out.reshape(resolution, resolution, resolution)
