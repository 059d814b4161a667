"""Render the built-in scene gallery (demo + smoke-check script).

Usage: python examples/render_gallery.py [outdir]
Renders Cornell (diffuse + specular), the mesh gallery, the volumetric
cloud, the many-light hall, and Cornell through the Navarro eye.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(outdir="/tmp/pbrt_tpu_gallery"):
    import jax

    from pbrt_tpu.cameras.humaneye import HumanEyeCamera
    from pbrt_tpu.core import transform
    from pbrt_tpu.core.colorspace import srgb_encode
    from pbrt_tpu.io.image import write_png
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.models.volpath import VolPathIntegrator
    from pbrt_tpu.render import render_chunked as render
    from pbrt_tpu.scenes.cloud import cloud_scene
    from pbrt_tpu.scenes.cornell import cornell_box
    from pbrt_tpu.scenes.manylight import manylight_scene
    from pbrt_tpu.scenes.meshes import mesh_gallery_scene

    os.makedirs(outdir, exist_ok=True)

    def save(name, img, exposure=1.0):
        img = np.asarray(img) * exposure
        tone = img / (1.0 + img)  # Reinhard for display
        write_png(
            os.path.join(outdir, name + ".png"),
            np.asarray(srgb_encode(np.clip(tone, 0, 1))),
        )
        print(f"{name}: mean {img.mean():.4f}")

    jobs = []
    scene, cam = cornell_box(resolution=(256, 256))
    jobs.append(("cornell", scene, cam, PathIntegrator(max_depth=5), 64, 2.0))
    scene, cam = cornell_box(resolution=(256, 256), variant="specular")
    jobs.append(
        ("cornell_specular", scene, cam, PathIntegrator(max_depth=7), 64, 2.0)
    )
    scene, cam = mesh_gallery_scene(resolution=(256, 256), subdiv=4)
    jobs.append(("mesh_gallery", scene, cam, PathIntegrator(max_depth=5), 32, 1.5))
    scene, cam = cloud_scene(resolution=(256, 192))
    jobs.append(
        ("cloud", scene, cam, VolPathIntegrator(max_depth=6), 32, 2.5)
    )
    scene, cam = manylight_scene(resolution=(256, 256))
    jobs.append(("manylight", scene, cam, PathIntegrator(max_depth=4), 32, 1.0))

    for name, scene, cam, integ, spp, exposure in jobs:
        t0 = time.perf_counter()
        sampler = "independent" if name == "cloud" else "sobol"
        img = render(scene, cam, integ, spp=spp, samples_per_pass=4,
                     sampler_kind=sampler)
        jax.block_until_ready(img)
        print(f"{name}: {time.perf_counter()-t0:.1f}s", end="  ")
        save(name, img, exposure)

    # Cornell through the human eye.
    scene, _ = cornell_box(resolution=(256, 256))
    c2w = transform.look_at(
        (0.5, 0.5, -1.45), (0.5, 0.5, 0.5), (0, 1, 0)
    ) @ transform.scale(0.001)
    eye = HumanEyeCamera.navarro(c2w, resolution=(256, 256))
    t0 = time.perf_counter()
    img = render(scene, eye, PathIntegrator(max_depth=5), spp=48,
                 samples_per_pass=4, sampler_kind="sobol")
    jax.block_until_ready(img)
    print(f"cornell_eye: {time.perf_counter()-t0:.1f}s", end="  ")
    save("cornell_eye", img, 30.0)


if __name__ == "__main__":
    main(*sys.argv[1:])
