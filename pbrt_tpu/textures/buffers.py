"""Flat texture tables + evaluation.

Supported variants (growing toward the reference's 28):
  CHECKER — two sub-albedos on a uv grid (CheckerboardTexture)
  IMAGE   — bilinear image lookup, texels pre-fitted to sigmoid spectra
            (ImageTexture over MIPMap; trilinear mips are a later tier)
  MARBLE  — fBm-warped sinusoid blending two albedos (MarbleTexture /
            the FBm procedural family via core.noise)

A material references a texture by id (-1 = constant albedo). Evaluation
rewrites the gathered per-ray albedo sigmoid coefficients, so the BxDF layer
is unchanged.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import noise, rgb2spec
from ..core.gather import gather_rows
from ..core.pytree import pytree, static_field

TEX_CHECKER = 0
TEX_IMAGE = 1
TEX_MARBLE = 2


@pytree
class TextureBuffers:
    kind: jnp.ndarray  # (T,) int32
    # Two-albedo parameters (checker, marble): sigmoid coeffs.
    c0: jnp.ndarray  # (T, 3)
    c1: jnp.ndarray  # (T, 3)
    uscale: jnp.ndarray  # (T,)
    vscale: jnp.ndarray  # (T,)
    # Image textures: shared padded stack.
    img_index: jnp.ndarray  # (T,) index into images, -1 if procedural
    img_coeffs: jnp.ndarray  # (I, H, W, 3)
    img_scale_arr: jnp.ndarray  # (I, H, W)
    n_textures: int = static_field(default=0)

    @staticmethod
    def build(specs) -> "TextureBuffers":
        """specs: list of dicts:
        {"kind": "checker"|"marble", "rgb0":, "rgb1":, "uscale":, "vscale":}
        {"kind": "image", "rgb_image": (H, W, 3)}
        """
        kinds, c0s, c1s, us, vs, img_idx = [], [], [], [], [], []
        images = []
        kind_map = {"checker": TEX_CHECKER, "image": TEX_IMAGE,
                    "marble": TEX_MARBLE}
        for s in specs:
            kinds.append(kind_map[s["kind"]])
            c0s.append(s.get("rgb0", (0.1, 0.1, 0.1)))
            c1s.append(s.get("rgb1", (0.9, 0.9, 0.9)))
            us.append(s.get("uscale", 1.0))
            vs.append(s.get("vscale", 1.0))
            if s["kind"] == "image":
                img_idx.append(len(images))
                images.append(np.asarray(s["rgb_image"], np.float32))
            else:
                img_idx.append(-1)
        n = len(specs)
        c0 = rgb2spec.fit_albedo(jnp.asarray(c0s, jnp.float32)) if n else jnp.zeros((0, 3))
        c1 = rgb2spec.fit_albedo(jnp.asarray(c1s, jnp.float32)) if n else jnp.zeros((0, 3))
        if images:
            h = max(im.shape[0] for im in images)
            w = max(im.shape[1] for im in images)
            stack = np.zeros((len(images), h, w, 3), np.float32)
            for i, im in enumerate(images):
                # Nearest-resample smaller images up to the shared size.
                yy = (np.arange(h) * im.shape[0] // h)
                xx = (np.arange(w) * im.shape[1] // w)
                stack[i] = im[yy][:, xx]
            # Albedo semantics: texels live in [0,1] and fit directly as
            # reflectance sigmoids (no per-texel scale to interpolate).
            coeffs = rgb2spec.fit_albedo(jnp.asarray(np.clip(stack, 0, 1)))
            scale = jnp.ones(coeffs.shape[:-1], jnp.float32)
        else:
            coeffs = jnp.zeros((0, 1, 1, 3), jnp.float32)
            scale = jnp.zeros((0, 1, 1), jnp.float32)
        return TextureBuffers(
            kind=jnp.asarray(kinds, jnp.int32).reshape(-1),
            c0=c0,
            c1=c1,
            uscale=jnp.asarray(us, jnp.float32).reshape(-1),
            vscale=jnp.asarray(vs, jnp.float32).reshape(-1),
            img_index=jnp.asarray(img_idx, jnp.int32).reshape(-1),
            img_coeffs=coeffs,
            img_scale_arr=scale,
            n_textures=n,
        )


def evaluate_albedo_coeffs(tex: TextureBuffers, tex_id, uv, p_world,
                           base_coeffs):
    """Per-ray albedo coefficients with textures applied.

    tex_id: (N,) int32 texture id per ray (-1 = keep base); uv: (N, 2);
    p_world: (N, 3) for solid/procedural textures; base_coeffs: (N, 3).
    """
    if tex is None or tex.n_textures == 0:
        return base_coeffs
    tid = jnp.clip(tex_id, 0, tex.n_textures - 1)
    kind = gather_rows(tex.kind, tid)
    c0 = gather_rows(tex.c0, tid)
    c1 = gather_rows(tex.c1, tid)
    us = gather_rows(tex.uscale, tid)
    vs = gather_rows(tex.vscale, tid)

    out = base_coeffs

    # Checkerboard.
    par = (
        jnp.floor(uv[..., 0] * us) + jnp.floor(uv[..., 1] * vs)
    ) % 2.0
    checker = jnp.where((par == 0.0)[..., None], c0, c1)
    out = jnp.where((kind == TEX_CHECKER)[..., None], checker, out)

    # Marble: fBm-warped sinusoid mix between the two albedos.
    m = noise.fbm(p_world * us[..., None], octaves=4)
    tmix = 0.5 + 0.5 * jnp.sin(
        us * (p_world[..., 0] + p_world[..., 1] + p_world[..., 2]) + 4.0 * m
    )
    marble = c0 * (1.0 - tmix[..., None]) + c1 * tmix[..., None]
    out = jnp.where((kind == TEX_MARBLE)[..., None], marble, out)

    # Image (bilinear over the fitted-coefficient image; scale folded into a
    # brightness multiplier on the constant coefficient is not valid for the
    # sigmoid basis, so the lookup interpolates coefficients directly —
    # exact at texels, smooth in between).
    if int(tex.img_coeffs.shape[0]) > 0 and bool(
        (np.asarray(tex.img_index) >= 0).any()
    ):
        ih, iw = tex.img_coeffs.shape[1:3]
        ii = jnp.clip(gather_rows(tex.img_index, tid), 0, None)
        x = jnp.clip(uv[..., 0] % 1.0, 0.0, 1.0) * (iw - 1)
        y = jnp.clip(uv[..., 1] % 1.0, 0.0, 1.0) * (ih - 1)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, iw - 1)
        y1 = jnp.minimum(y0 + 1, ih - 1)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def texel(yy, xx):
            return tex.img_coeffs[ii, yy, xx]

        c = (
            texel(y0, x0) * (1 - fx) * (1 - fy)
            + texel(y0, x1) * fx * (1 - fy)
            + texel(y1, x0) * (1 - fx) * fy
            + texel(y1, x1) * fx * fy
        )
        out = jnp.where((kind == TEX_IMAGE)[..., None], c, out)

    return jnp.where((tex_id >= 0)[..., None], out, base_coeffs)
