"""Render checkpoint/resume at sample-wave boundaries.

Reference analogue: SURVEY.md section 5.4 — pbrt has no true resume (only
--write-partial-images with spp metadata); here the film accumulator state
(rgb sum, weight sum, next sample index, seed) IS the checkpoint, saved as
an .npz per wave, so a killed multi-hour render continues exactly where it
stopped (bitwise: sample indices are the RNG coordinates).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path: str, rgb_sum, spp_done: int, total_spp: int,
                    seed: int) -> None:
    np.savez(
        path,
        rgb_sum=np.asarray(rgb_sum),
        spp_done=spp_done,
        total_spp=total_spp,
        seed=seed,
    )


def load_checkpoint(path: str):
    z = np.load(path)
    return (
        jnp.asarray(z["rgb_sum"]),
        int(z["spp_done"]),
        int(z["total_spp"]),
        int(z["seed"]),
    )


def render_resumable(
    scene, camera, integrator, spp: int, checkpoint_path: str,
    seed: int = 0, samples_per_pass: int = 4, chunk_spp: int = 8, **kw,
):
    """Chunked render that checkpoints after every chunk and resumes from an
    existing checkpoint file. Returns the finished (ny, nx, 3) image."""
    from ..render import render

    nx, ny = camera.resolution
    if os.path.exists(checkpoint_path):
        rgb_sum, done, total, seed = load_checkpoint(checkpoint_path)
        assert total == spp, "checkpoint belongs to a different spp target"
    else:
        rgb_sum = jnp.zeros((ny, nx, 3), jnp.float32)
        done = 0
    while done < spp:
        cur = min(chunk_spp, spp - done)
        cur -= cur % min(samples_per_pass, cur)
        img = render(
            scene, camera, integrator,
            spp=cur,
            seed=seed,
            samples_per_pass=min(samples_per_pass, cur),
            sample_offset=done,
            total_spp=spp,
            **kw,
        )
        rgb_sum = rgb_sum + img * cur
        done += cur
        save_checkpoint(checkpoint_path, rgb_sum, done, spp, seed)
    return rgb_sum / spp
