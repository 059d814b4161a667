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
    # Shape-bounded interior media (media.MediumStack); rays switch via
    # per-material med_inside/med_outside on transmission (the per-shape
    # MediumInterface tier; media.h:55-80).
    media_stack: Optional[object] = None
    # Optional texture tables (textures.TextureBuffers).
    textures: Optional[object] = None
    # Optional triangle BVH (accel.bvh.BVH); None routes to the dense tester.
    bvh: Optional[object] = None
    # Optional Pallas cluster accelerator (ops.cluster.ClusterAccel) —
    # preferred over `bvh` when present.
    clusters: Optional[object] = None
    # Optional Pallas brute-force small-scene intersector
    # (ops.smallscene.SmallTriAccel) — used below the cluster threshold.
    small: Optional[object] = None
    # Optional SAH kd-tree (accel.kdtree.KdTree) — pbrt's alternate
    # aggregate (KdTreeAggregate); parity engine, cluster kernel is the
    # TPU performance path.
    kdtree: Optional[object] = None
    # Optional candidate-sweep accelerator (ops.sweep.SweepAccel) —
    # XLA-side per-tile candidate culling + t-ordered Pallas sweep; the
    # only accelerator supporting object instancing. Preferred over
    # `clusters` when present.
    sweep: Optional[object] = None
    # Animated instances (accel.instances.AnimatedInstances): TRS-
    # keyframed TransformedPrimitives handled in a separate per-instance
    # pass (accel/api.py). None = no motion-blurred instances.
    anim: Optional[object] = None

    def with_accel(self, threshold: int = 1024, kind: str = "auto") -> "Scene":
        """Attach the triangle intersector fitting the scene size.

        Up to `threshold` triangles: the Pallas brute-force VMEM kernel
        (ops/smallscene.py — scalar-broadcast triangle walk, ~10x the XLA
        dense tester). Above it: per-tile candidate culling + t-ordered
        sweep kernel (ops/sweep.py; kind="sweep") or the Morton cluster
        cull/test kernel (ops/cluster.py; kind="cluster").
        kind="auto" honors the PBRT_TPU_ACCEL env var, defaulting to
        sweep.
        """
        import os

        import numpy as np

        from .ops.smallscene import build_smallscene

        explicit = kind != "auto"
        if kind == "auto":
            kind = os.environ.get("PBRT_TPU_ACCEL", "cluster")
        if self.geom.num_triangles == 0:
            return self
        if self.geom.num_triangles <= threshold and not explicit:
            return self.replace(
                small=build_smallscene(
                    np.asarray(self.geom.tri_verts),
                    np.asarray(self.geom.tri_mat),
                    np.asarray(self.geom.tri_light),
                )
            )
        if kind == "cluster":
            from .ops.cluster import build_clusters

            return self.replace(
                clusters=build_clusters(
                    np.asarray(self.geom.tri_verts),
                    np.asarray(self.geom.tri_mat),
                    np.asarray(self.geom.tri_light),
                )
            )
        from .ops.sweep import build_sweep

        return self.replace(
            sweep=build_sweep(np.asarray(self.geom.tri_verts))
        )

    def with_kdtree(self, max_prims: int = 4) -> "Scene":
        """Attach the SAH kd-tree aggregate (KdTreeAggregate analogue)."""
        import numpy as np

        from .accel.kdtree import build_kdtree

        if self.geom.num_triangles == 0:
            return self
        return self.replace(
            kdtree=build_kdtree(
                np.asarray(self.geom.tri_verts), max_prims=max_prims
            )
        )
