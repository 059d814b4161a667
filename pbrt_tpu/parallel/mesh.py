"""Device mesh construction and ray/tile sharding policy.

Mesh axes:
  data  — rays / pixel tiles (the renderer's batch axis). All current
          parallelism is data-parallel: path tracing is embarrassingly
          parallel over rays and the scene is replicated. Scene-sharded
          (BVH-partitioned) meshes are a later tier for giant scenes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_pixels(pixel_array, mesh: Mesh, axis: str = "data"):
    """Place a flat per-ray/per-pixel array sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(pixel_array, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. the Scene) on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
