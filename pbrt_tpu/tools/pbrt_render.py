"""Main renderer CLI (the `pbrt` executable equivalent).

Reference analogue: /root/reference/src/pbrt/cmd/pbrt.cpp. Usage:

    python -m pbrt_tpu.tools.pbrt_render scene.pbrt --outfile out.exr \
        [--spp N] [--seed S] [--maxdepth D] [--display-server host:port]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="pbrt_tpu")
    p.add_argument("scene")
    p.add_argument("--outfile", default="out.exr")
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--maxdepth", type=int, default=None)
    p.add_argument("--samples-per-pass", type=int, default=4)
    p.add_argument("--disable-pixel-jitter", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--stats", action="store_true")
    p.add_argument("--interactive", action="store_true",
                   help="serve a live viewer with keyboard camera controls "
                        "(the reference's GUI, as a built-in HTTP viewer)")
    p.add_argument("--gui-port", type=int, default=8788)
    p.add_argument("--display-server", default=None,
                   help="tev host:port for live preview")
    p.add_argument("--mse-reference-image", default=None,
                   help="compute MSE vs this converged EXR (the reference's "
                        "--mse-reference-image convergence harness)")
    p.add_argument("--mse-out", default=None,
                   help="append the MSE record as a JSON line to this file")
    p.add_argument("--gbuffer", action="store_true",
                   help="also write <outfile>_aov.exr with GBuffer channels")
    p.add_argument("--spectral-buckets", type=int, default=0,
                   help="also write <outfile>_spectral.exr with N buckets")
    p.add_argument("--debugstart", default=None, metavar="X,Y,SAMPLE",
                   help="replay a single pixel sample deterministically and "
                        "print its radiance record (the reference's "
                        "--debugstart, cpu/integrators.cpp:69-88; the "
                        "stateless RNG makes the replay exact)")
    p.add_argument("--format", action="store_true", dest="format_scene",
                   help="print a reformatted version of the scene to "
                        "stdout and exit (pbrt --format)")
    p.add_argument("--toply", action="store_true",
                   help="like --format, but write large triangle meshes "
                        "to PLY files (pbrt --toply)")
    p.add_argument("--upgrade", action="store_true",
                   help="upgrade a pbrt-v3 scene to the v4 format while "
                        "reformatting (pbrt --upgrade)")
    args = p.parse_args(argv)

    if args.format_scene or args.toply or args.upgrade:
        from .format_scene import format_file

        format_file(args.scene, to_ply=args.toply, upgrade=args.upgrade)
        return

    from ..io.image import write_exr
    from ..io.parser import load_pbrt
    from ..render import render

    t0 = time.perf_counter()
    scene, camera, settings = load_pbrt(args.scene)
    if not args.quiet:
        for w in settings["warnings"]:
            print(f"warning: {w}", file=sys.stderr)
        print(
            f"parsed {args.scene}: {scene.geom.num_triangles} tris, "
            f"{scene.geom.num_spheres} spheres, "
            f"{scene.lights.n_lights} lights "
            f"({time.perf_counter() - t0:.2f}s)",
            file=sys.stderr,
        )

    integrator = settings["integrator"]
    if args.maxdepth is not None:
        if hasattr(integrator, "base"):  # MLT wraps a base integrator
            integrator = integrator.replace(
                base=integrator.base.replace(max_depth=args.maxdepth)
            )
        elif hasattr(integrator, "max_depth"):
            integrator = integrator.replace(max_depth=args.maxdepth)
    spp = args.spp or settings["spp"]
    spp = max(args.samples_per_pass, spp - spp % args.samples_per_pass)

    if args.debugstart:
        import jax.numpy as jnp

        from ..films.rgb import spectrum_to_rgb
        from ..render import camera_rays

        parts = args.debugstart.split(",")
        px, py = int(parts[0]), int(parts[1])
        sidx = int(parts[2]) if len(parts) > 2 else 0
        nx, ny = camera.resolution
        pid = jnp.asarray([py * nx + px], jnp.int32)
        samp = jnp.asarray([sidx], jnp.int32)
        scene = scene.with_accel()
        o, d, wl = camera_rays(camera, pid, samp, jnp.int32(args.seed))
        L, stats = integrator.trace_with_stats(
            scene, o, d, wl, pid, samp, jnp.int32(args.seed)
        )
        rgb = spectrum_to_rgb(L, wl)
        rec = {
            "pixel": [px, py],
            "sample": sidx,
            "seed": args.seed,
            "ray_o": np.asarray(o)[0].tolist(),
            "ray_d": np.asarray(d)[0].tolist(),
            "lambdas": np.asarray(wl.lam)[0].tolist(),
            "L": np.asarray(L)[0].tolist(),
            "rgb": np.asarray(rgb)[0].tolist(),
            "rays": float(np.asarray(stats["rays"])),
        }
        print(json.dumps(rec))
        return 0

    if args.interactive:
        from ..utils.gui import GUI, interactive_render_loop

        gui = GUI(args.scene, camera.resolution, port=args.gui_port)
        print(f"interactive viewer: {gui.url}", file=sys.stderr)
        img = interactive_render_loop(
            scene, camera, integrator, gui,
            samples_per_pass=args.samples_per_pass, seed=args.seed,
        )
        gui.close()
        if img is not None:
            write_exr(args.outfile, np.asarray(img))
        return

    t0 = time.perf_counter()
    # Specialty integrators (MLT/SPPM/BDPT/LightPath) own their render loop;
    # wavefront integrators go through the shared sample-wave renderer
    # (the reference's equivalent dispatch: cpu/render.cpp RenderCPU).
    from ..models.bdpt import BDPTIntegrator
    from ..models.lightpath import LightPathIntegrator
    from ..models.mlt import MLTIntegrator
    from ..models.sppm import SPPMIntegrator

    from ..models.function import FunctionIntegrator

    if isinstance(integrator, FunctionIntegrator):
        est, exact = integrator.render(
            camera.resolution, spp=spp, sampler_kind=settings["sampler"],
            seed=args.seed,
        )
        est = np.asarray(est)
        print(f"function={integrator.func} exact={exact:.6g} "
              f"mse={float(np.mean((est - exact) ** 2)):.3e}")
        img = np.repeat(est[..., None], 3, axis=-1)
    elif isinstance(integrator, MLTIntegrator):
        from ..models.mlt import render_mlt

        img = render_mlt(
            scene, camera, max_depth=integrator.base.max_depth,
            seed=args.seed, mutations_per_pixel=spp,
            n_chains=integrator.n_chains, sigma=integrator.sigma,
            p_large=integrator.p_large,
        )
    elif isinstance(integrator, SPPMIntegrator):
        img = integrator.render(scene, camera, n_iterations=spp,
                                seed=args.seed)
    elif isinstance(integrator, BDPTIntegrator):
        from ..models.bdpt import render_bdpt

        img = render_bdpt(
            scene, camera, spp=spp, max_depth=integrator.max_depth,
            seed=args.seed,
        )
    elif isinstance(integrator, LightPathIntegrator):
        from ..models.lightpath import render_lightpath

        nx, ny = camera.resolution
        img = render_lightpath(
            scene, camera, n_paths_total=spp * nx * ny,
            max_depth=integrator.max_depth, seed=args.seed,
        )
    else:
        img = render(
            scene, camera, integrator,
            spp=spp,
            seed=args.seed,
            samples_per_pass=args.samples_per_pass,
            jitter=not args.disable_pixel_jitter,
            sampler_kind=settings["sampler"],
        )
    img = np.asarray(img)
    dt = time.perf_counter() - t0

    if args.display_server:
        from ..utils.display import send_to_tev

        host, _, port = args.display_server.partition(":")
        send_to_tev(img, name=args.outfile, host=host, port=int(port or 14158))

    meta = {
        "samplesPerPixel": str(spp),
        "renderTimeSeconds": f"{dt:.3f}",
        "generator": "pbrt_tpu",
    }
    if args.outfile.endswith(".exr"):
        write_exr(args.outfile, img, metadata=meta)
    else:
        from .imgtool import _write

        _write(args.outfile, img)
    if not args.quiet:
        print(f"rendered {spp} spp in {dt:.2f}s -> {args.outfile}",
              file=sys.stderr)
    if args.gbuffer or args.spectral_buckets:
        from ..films.gbuffer import render_aovs

        aovs = render_aovs(
            scene, camera, integrator, spp=min(spp, 8), seed=args.seed,
            spectral_buckets=args.spectral_buckets,
        )
        base = args.outfile.rsplit(".", 1)[0]
        if args.gbuffer:
            chans = np.concatenate(
                [aovs["p"], aovs["n"], aovs["albedo_rgb"],
                 aovs["depth"][..., None], aovs["material_id"][..., None],
                 aovs["prim_id"][..., None], aovs["variance"][..., None]],
                axis=-1,
            )
            names = ["Px", "Py", "Pz", "Nx", "Ny", "Nz", "AlbedoR",
                     "AlbedoG", "AlbedoB", "Depth", "MaterialId", "PrimId",
                     "Variance"]
            write_exr(base + "_aov.exr", chans, channel_names=names)
        if args.spectral_buckets:
            write_exr(
                base + "_spectral.exr", aovs["spectral"],
                channel_names=[
                    f"L{int(i):02d}" for i in range(args.spectral_buckets)
                ],
            )
    if args.mse_reference_image:
        from ..io.image import read_exr

        ref_img, chans, _ = read_exr(args.mse_reference_image)
        ref = np.stack(
            [ref_img[..., chans.index(c)] for c in "RGB"], axis=-1
        )
        mse = float(np.mean((img - ref) ** 2))
        rec = {"spp": spp, "seconds": dt, "mse": mse}
        print(json.dumps(rec))
        if args.mse_out:
            with open(args.mse_out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    if args.stats:
        print(json.dumps({"spp": spp, "seconds": dt,
                          "mean": float(img.mean())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
