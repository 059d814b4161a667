"""Scene container: the device-resident, fully-traceable scene description.

Reference analogue: BasicScene after CreateMaterials/CreateLights/
CreateAggregate (/root/reference/src/pbrt/scene.h:260-380) — but as one jax
pytree of flat arrays, so an entire scene is an argument to a jitted render
function and every continuous parameter (albedo, emission, vertex positions)
is differentiable.
"""

from __future__ import annotations

from typing import Optional

from .core.pytree import pytree
from .lights.buffers import LightBuffers
from .materials.buffers import MaterialBuffers
from .media.medium import MediumBuffers
from .shapes.geometry import GeometryBuffers


@pytree
class Scene:
    geom: GeometryBuffers
    materials: MaterialBuffers
    lights: LightBuffers
    # Scene-level participating medium (None == vacuum everywhere).
    medium: Optional[MediumBuffers] = None
    # Optional texture tables (textures.TextureBuffers).
    textures: Optional[object] = None
    # Optional triangle BVH (accel.bvh.BVH); None routes to the dense tester.
    bvh: Optional[object] = None
    # Optional Pallas cluster accelerator (ops.cluster.ClusterAccel) —
    # preferred over `bvh` when present.
    clusters: Optional[object] = None

    def with_accel(self, threshold: int = 1024) -> "Scene":
        """Attach the cluster accelerator when the triangle count warrants it.

        Below `threshold` triangles the dense lane-aligned tester wins on
        TPU; above it, Morton clusters + the Pallas cull/test kernel.
        """
        import numpy as np

        from .ops.cluster import build_clusters

        if self.geom.num_triangles <= threshold:
            return self
        return self.replace(
            clusters=build_clusters(
                np.asarray(self.geom.tri_verts),
                np.asarray(self.geom.tri_mat),
                np.asarray(self.geom.tri_light),
            )
        )
