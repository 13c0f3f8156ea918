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
    """Evaluate (-sdf) on the dense grid, sharded across `mesh`'s devices.
    Grid points are generated ON DEVICE from the chunk's flat-index range
    (renderer.grid_chunk_points) — XLA partitions the iota+elementwise chain
    along the sharded output axis, so the host uploads nothing and fetches
    f16 results only."""
    from rnb_tpu.models.renderer import _query_grid_chunk

    n_dev = mesh.devices.size
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())

    eval_chunk = jax.jit(_query_grid_chunk.__wrapped__,
                         static_argnums=(0, 3, 4, 5), out_shardings=shard)

    params_repl = jax.device_put(params["sdf"], repl)
    bmin = tuple(float(x) for x in np.asarray(bound_min).reshape(-1))
    bmax = tuple(float(x) for x in np.asarray(bound_max).reshape(-1))

    total = resolution ** 3
    # chunk must divide evenly across devices
    chunk = max(n_dev, (chunk // n_dev) * n_dev)
    multihost = jax.process_count() > 1
    out = np.empty((total,), np.float32)
    start = 0
    while start < total:
        n = min(chunk, total - start)
        vals = eval_chunk(statics.sdf, params_repl,
                          jnp.asarray(start, jnp.int32), chunk, resolution,
                          negate, bmin, bmax)
        if multihost:
            # each process holds only its devices' slices; allgather the
            # full chunk so every process can polygonize (collective — all
            # processes reach here in lockstep)
            from jax.experimental import multihost_utils
            vals_np = np.asarray(
                multihost_utils.process_allgather(vals, tiled=True),
                np.float32)
        else:
            vals_np = np.asarray(vals, np.float32)
        out[start:start + n] = vals_np[:n]
        start += n
    return out.reshape(resolution, resolution, resolution)
