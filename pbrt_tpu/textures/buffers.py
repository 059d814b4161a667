"""Texture system: flat tables + branch-free batched evaluation.

Reference analogue: the texture variant families of
/root/reference/src/pbrt/textures.h:27-72 (Constant, Scale, Mix,
DirectionMix, Bilerp, Checkerboard, Dots, FBm, Windy, Wrinkled, Marble,
Image-over-MIPMap) and the TexCoord mappings (UVMapping, SphericalMapping,
CylindricalMapping, PlanarMapping; textures.h:75-180) plus Ptex per-face
texel sets (textures.h:1003, faces loaded by io/ptex.py and indexed by the
Interaction's per-triangle face id).

TPU-first design decisions:
  * One SOA row per texture; evaluation computes EVERY family's value for
    every ray and select-chains on the kind tag — the vector analogue of
    the reference's TaggedPointer dispatch.
  * Textures that reference other textures (Scale, Mix, DirectionMix,
    Checkerboard, Dots) are evaluated with ONE bounded nesting level: the
    sub-texture ids are resolved through a second leaf-evaluation pass.
    Deeper chains are flattened or rejected at parse time (lattice-free
    fixed-depth evaluation keeps the XLA graph static; arbitrarily deep
    texture graphs are vanishingly rare in practice).
  * Values are computed in linear RGB, then fitted per-ray to sigmoid
    spectral coefficients (core.rgb2spec Newton fit) — value-space
    filtering and mixing are exact, and the spectral lift happens once at
    the end (the reference's RGBAlbedoSpectrum construction,
    util/spectrum.h:195).
  * Image textures are mip pyramids in one flat texel table (see
    core/mipmap.py) with trilinear filtering; the LOD width comes from the
    camera-distance footprint heuristic (the wavefront reference uses a
    camera-based approximation too, wavefront/surfscatter.cpp:74-104).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import mipmap as mip
from ..core import noise, rgb2spec
from ..core.gather import gather_rows
from ..core.pytree import pytree, static_field

TEX_CONSTANT = 0
TEX_CHECKER = 1
TEX_IMAGE = 2
TEX_MARBLE = 3
TEX_SCALE = 4
TEX_MIX = 5
TEX_DIRECTIONMIX = 6
TEX_BILERP = 7
TEX_DOTS = 8
TEX_FBM = 9
TEX_WINDY = 10
TEX_WRINKLED = 11
TEX_PTEX = 12

MAP_UV = 0
MAP_SPHERICAL = 1
MAP_CYLINDRICAL = 2
MAP_PLANAR = 3

_KIND_NAMES = {
    "constant": TEX_CONSTANT, "checkerboard": TEX_CHECKER,
    "checker": TEX_CHECKER, "imagemap": TEX_IMAGE, "image": TEX_IMAGE,
    "marble": TEX_MARBLE, "scale": TEX_SCALE, "mix": TEX_MIX,
    "directionmix": TEX_DIRECTIONMIX, "bilerp": TEX_BILERP,
    "dots": TEX_DOTS, "fbm": TEX_FBM, "windy": TEX_WINDY,
    "wrinkled": TEX_WRINKLED, "ptex": TEX_PTEX,
}
_MAP_NAMES = {
    "uv": MAP_UV, "spherical": MAP_SPHERICAL,
    "cylindrical": MAP_CYLINDRICAL, "planar": MAP_PLANAR,
}


@pytree
class TextureBuffers:
    kind: jnp.ndarray  # (T,) int32 TEX_*
    # Colors: rgb0/rgb1 (two-color families), rgb2/rgb3 (bilerp corners).
    rgb0: jnp.ndarray  # (T, 3)
    rgb1: jnp.ndarray  # (T, 3)
    rgb2: jnp.ndarray  # (T, 3)
    rgb3: jnp.ndarray  # (T, 3)
    f0: jnp.ndarray  # (T,) scalar knob: scale factor / mix amount / octaves
    sub0: jnp.ndarray  # (T,) int32 sub-texture id or -1 (-> rgb0)
    sub1: jnp.ndarray  # (T,) int32 sub-texture id or -1 (-> rgb1)
    sub2: jnp.ndarray  # (T,) int32 amount sub-texture id or -1 (-> f0)
    # Mapping.
    mapping: jnp.ndarray  # (T,) int32 MAP_*
    uscale: jnp.ndarray  # (T,)
    vscale: jnp.ndarray  # (T,)
    udelta: jnp.ndarray  # (T,)
    vdelta: jnp.ndarray  # (T,)
    aux0: jnp.ndarray  # (T, 3) planar v1 / directionmix dir / mapping origin
    aux1: jnp.ndarray  # (T, 3) planar v2
    # Image textures: shared flat mip stack (all images padded to one size).
    img_index: jnp.ndarray  # (T,) image id or -1
    img_flat: jnp.ndarray  # (I, TX, 3) all mip levels, flattened
    # Ptex textures: per-face texel stacks resampled to one shared RxR
    # (PtexTexture, textures.h:1003; faces indexed by Interaction face id).
    ptex_index: jnp.ndarray  # (T,) int32 ptex id or -1
    ptex_flat: jnp.ndarray  # (TotalFaces, R, R, 3)
    ptex_base: jnp.ndarray  # (P,) int32 first face row per ptex texture
    ptex_nfaces: jnp.ndarray  # (P,) int32 face count per ptex texture
    img_offsets: tuple = static_field(default=())
    img_widths: tuple = static_field(default=())
    img_heights: tuple = static_field(default=())
    n_textures: int = static_field(default=0)
    # Static dispatch pruning: which families exist, and whether any row
    # references a sub-texture (the materials-table any_* flag pattern).
    families: tuple = static_field(default=())
    has_refs: bool = static_field(default=False)
    has_ptex: bool = static_field(default=False)
    ptex_res: int = static_field(default=1)

    @staticmethod
    def build(specs) -> "TextureBuffers":
        """specs: list of dicts with keys:
        kind (name), rgb0/rgb1/rgb2/rgb3, f0, sub0/sub1/sub2 (texture ids),
        mapping (name), uscale/vscale/udelta/vdelta, aux0/aux1,
        rgb_image ((H, W, 3) for image textures).
        """
        n = len(specs)

        def col(key, default, width=None):
            out = []
            for s in specs:
                v = s.get(key, default)
                out.append(v)
            a = np.asarray(out, np.float32 if width else np.float32)
            return a

        kinds = np.asarray(
            [_KIND_NAMES[s["kind"]] for s in specs], np.int32
        )
        maps = np.asarray(
            [_MAP_NAMES[s.get("mapping", "uv")] for s in specs], np.int32
        )
        images = []
        img_idx = []
        for s in specs:
            if s["kind"] in ("image", "imagemap"):
                img_idx.append(len(images))
                images.append(np.asarray(s["rgb_image"], np.float32))
            else:
                img_idx.append(-1)

        # Ptex face stacks: resample every face of every ptex texture onto
        # one shared RxR grid so a single static table serves all lookups.
        ptex_idx = []
        ptex_stacks = []
        for s in specs:
            if s["kind"] == "ptex":
                ptex_idx.append(len(ptex_stacks))
                ptex_stacks.append(s["ptex_faces"])
            else:
                ptex_idx.append(-1)
        if ptex_stacks:
            res = 4
            for st in ptex_stacks:
                for f in st:
                    res = max(res, f.shape[0], f.shape[1])
            res = min(1 << (res - 1).bit_length(), 64)
            rows, bases, counts = [], [], []
            for st in ptex_stacks:
                bases.append(len(rows))
                counts.append(len(st))
                for f in st:
                    f = np.asarray(f, np.float32)
                    if f.shape[-1] == 1:
                        f = np.repeat(f, 3, axis=-1)
                    yy = np.clip(
                        (np.arange(res) * f.shape[0] // res), 0,
                        f.shape[0] - 1,
                    )
                    xx = np.clip(
                        (np.arange(res) * f.shape[1] // res), 0,
                        f.shape[1] - 1,
                    )
                    rows.append(f[yy][:, xx, :3])
            ptex_flat = jnp.asarray(np.stack(rows))
            ptex_base = jnp.asarray(bases, jnp.int32)
            ptex_nfaces = jnp.asarray(counts, jnp.int32)
            ptex_res = int(res)
        else:
            ptex_flat = jnp.zeros((0, 1, 1, 3), jnp.float32)
            ptex_base = jnp.zeros((0,), jnp.int32)
            ptex_nfaces = jnp.zeros((0,), jnp.int32)
            ptex_res = 1

        if images:
            h = 1 << (max(im.shape[0] for im in images) - 1).bit_length()
            w = 1 << (max(im.shape[1] for im in images) - 1).bit_length()
            flats = []
            offs = ws = hs = None
            for im in images:
                # Bilinearly resample every image to the shared pow2 size so
                # one static mip layout serves the whole stack.
                yy = np.clip(
                    np.linspace(0, im.shape[0] - 1, h), 0, im.shape[0] - 1
                )
                xx = np.clip(
                    np.linspace(0, im.shape[1] - 1, w), 0, im.shape[1] - 1
                )
                y0 = yy.astype(int)
                x0 = xx.astype(int)
                y1 = np.minimum(y0 + 1, im.shape[0] - 1)
                x1 = np.minimum(x0 + 1, im.shape[1] - 1)
                fy = (yy - y0)[:, None, None]
                fx = (xx - x0)[None, :, None]
                rs = (
                    im[y0][:, x0] * (1 - fy) * (1 - fx)
                    + im[y0][:, x1] * (1 - fy) * fx
                    + im[y1][:, x0] * fy * (1 - fx)
                    + im[y1][:, x1] * fy * fx
                )
                m = mip.MIPMap.build(rs)
                flats.append(np.asarray(m.flat))
                offs, ws, hs = m.offsets, m.widths, m.heights
            img_flat = jnp.asarray(np.stack(flats))
        else:
            img_flat = jnp.zeros((0, 1, 3), jnp.float32)
            offs, ws, hs = (0,), (1,), (1,)

        def vec3(key, default):
            return jnp.asarray(
                [np.broadcast_to(
                    np.asarray(s.get(key, default), np.float32), (3,)
                ) for s in specs] or np.zeros((0, 3)),
                jnp.float32,
            ).reshape(n, 3)

        def scal(key, default, dtype=np.float32):
            return jnp.asarray(
                [s.get(key, default) for s in specs], dtype
            ).reshape(n)

        return TextureBuffers(
            kind=jnp.asarray(kinds).reshape(n),
            rgb0=vec3("rgb0", (0.0, 0.0, 0.0)),
            rgb1=vec3("rgb1", (1.0, 1.0, 1.0)),
            rgb2=vec3("rgb2", (0.0, 0.0, 0.0)),
            rgb3=vec3("rgb3", (1.0, 1.0, 1.0)),
            f0=scal("f0", 1.0),
            sub0=scal("sub0", -1, np.int32),
            sub1=scal("sub1", -1, np.int32),
            sub2=scal("sub2", -1, np.int32),
            mapping=jnp.asarray(maps).reshape(n),
            uscale=scal("uscale", 1.0),
            vscale=scal("vscale", 1.0),
            udelta=scal("udelta", 0.0),
            vdelta=scal("vdelta", 0.0),
            aux0=vec3("aux0", (1.0, 0.0, 0.0)),
            aux1=vec3("aux1", (0.0, 1.0, 0.0)),
            img_index=jnp.asarray(img_idx, jnp.int32).reshape(n),
            img_flat=img_flat,
            ptex_index=jnp.asarray(ptex_idx, jnp.int32).reshape(n),
            ptex_flat=ptex_flat,
            ptex_base=ptex_base,
            ptex_nfaces=ptex_nfaces,
            has_ptex=bool(ptex_stacks),
            ptex_res=ptex_res,
            img_offsets=tuple(offs),
            img_widths=tuple(ws),
            img_heights=tuple(hs),
            n_textures=n,
            families=tuple(sorted(set(int(k) for k in kinds))),
            has_refs=any(
                int(s.get("sub0", -1)) >= 0
                or int(s.get("sub1", -1)) >= 0
                or int(s.get("sub2", -1)) >= 0
                for s in specs
            ),
        )


def _map_uv(tex, row, uv, p_world):
    """Apply the texture's coordinate mapping (textures.h:75-180)."""
    mapping = row["mapping"]
    us, vs = row["uscale"], row["vscale"]
    ud, vd = row["udelta"], row["vdelta"]
    u0 = uv[..., 0] * us + ud
    v0 = uv[..., 1] * vs + vd

    r = jnp.sqrt(jnp.maximum(jnp.sum(p_world * p_world, -1), 1e-12))
    theta = jnp.arccos(jnp.clip(p_world[..., 2] / r, -1.0, 1.0))
    phi = jnp.arctan2(p_world[..., 1], p_world[..., 0])
    sph_u = phi / (2.0 * np.pi) * us + ud
    sph_v = theta / np.pi * vs + vd
    cyl_u = phi / (2.0 * np.pi) * us + ud
    cyl_v = p_world[..., 2] * vs + vd
    pla_u = jnp.sum(p_world * row["aux0"], -1) + ud
    pla_v = jnp.sum(p_world * row["aux1"], -1) + vd

    u = jnp.where(
        mapping == MAP_SPHERICAL, sph_u,
        jnp.where(mapping == MAP_CYLINDRICAL, cyl_u,
                  jnp.where(mapping == MAP_PLANAR, pla_u, u0)),
    )
    v = jnp.where(
        mapping == MAP_SPHERICAL, sph_v,
        jnp.where(mapping == MAP_CYLINDRICAL, cyl_v,
                  jnp.where(mapping == MAP_PLANAR, pla_v, v0)),
    )
    return u, v


def _gather_row(tex, tid):
    keys = ("kind", "rgb0", "rgb1", "rgb2", "rgb3", "f0", "sub0", "sub1",
            "sub2", "mapping", "uscale", "vscale", "udelta", "vdelta",
            "aux0", "aux1", "img_index", "ptex_index")
    return {k: gather_rows(getattr(tex, k), tid) for k in keys}


def _image_lookup(tex, row, u, v, width):
    """Trilinear mip lookup through the shared flat stack."""
    if int(tex.img_flat.shape[0]) == 0:
        return jnp.zeros(u.shape + (3,), jnp.float32)
    # ImageTextureBase flips t before lookup (textures.cpp:367): images
    # index top-down, texture space bottom-up.
    v = 1.0 - v
    ii = jnp.clip(row["img_index"], 0, tex.img_flat.shape[0] - 1)
    # Flatten the image axis into the texel axis so one MIPMap serves all.
    per = tex.img_flat.shape[1]
    flat = tex.img_flat.reshape(-1, 3)
    m = mip.MIPMap(
        flat=flat,
        offsets=tex.img_offsets,
        widths=tex.img_widths,
        heights=tex.img_heights,
    )
    # Shift each ray's level offsets by its image's base.
    base = (ii * per)[..., None] if False else ii * per
    # MIPMap handles offsets statically; emulate per-image base by adding
    # base texels: reuse _bilerp-level math with offset shift via a wrapper.
    n_lv = len(tex.img_offsets)
    lod = n_lv - 1 + jnp.log2(jnp.maximum(width, 1e-8))
    lod = jnp.clip(lod, 0.0, n_lv - 1 - 1e-4)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0)[..., None]

    def bil(li):
        offs = jnp.take(jnp.asarray(tex.img_offsets, jnp.int32), li)
        w = jnp.take(jnp.asarray(tex.img_widths, jnp.int32), li)
        h = jnp.take(jnp.asarray(tex.img_heights, jnp.int32), li)
        x = (u % 1.0) * w.astype(jnp.float32) - 0.5
        y = (v % 1.0) * h.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def tx(xi, yi):
            idx = base + offs + jnp.mod(yi, h) * w + jnp.mod(xi, w)
            return jnp.take(flat, idx, axis=0)

        return (
            tx(x0, y0) * (1 - fx) * (1 - fy)
            + tx(x0 + 1, y0) * fx * (1 - fy)
            + tx(x0, y0 + 1) * (1 - fx) * fy
            + tx(x0 + 1, y0 + 1) * fx * fy
        )

    return bil(l0) * (1 - f) + bil(l0 + 1) * f


def _eval_leaf(tex, tid, uv, p_world, width, n_shade=None, face=None):
    """RGB value of non-referencing texture families at each ray.

    Families absent from tex.families (a static build-time set) are pruned
    from the graph entirely — the texture analogue of the materials table's
    any_conductor static-dispatch flags.
    """
    fam = set(tex.families) if tex.families else set(range(12))
    row = _gather_row(tex, tid)
    kind = row["kind"]
    u, v = _map_uv(tex, row, uv, p_world)
    c0, c1 = row["rgb0"], row["rgb1"]

    out = c0  # constant

    if TEX_CHECKER in fam:
        par = (jnp.floor(u) + jnp.floor(v)) % 2.0
        out = jnp.where(
            (kind == TEX_CHECKER)[..., None],
            jnp.where((par == 0.0)[..., None], c0, c1), out,
        )

    if TEX_MARBLE in fam:
        m = noise.fbm(p_world * row["uscale"][..., None], octaves=4)
        tmix = 0.5 + 0.5 * jnp.sin(
            row["uscale"]
            * (p_world[..., 0] + p_world[..., 1] + p_world[..., 2])
            + 4.0 * m
        )
        out = jnp.where(
            (kind == TEX_MARBLE)[..., None],
            c0 * (1.0 - tmix[..., None]) + c1 * tmix[..., None], out,
        )

    # FBm / Wrinkled / Windy: scalar noise as gray (FloatTexture families;
    # textures.h FBmTexture/WrinkledTexture/WindyTexture).
    if TEX_FBM in fam:
        fbm_v = noise.fbm(p_world, octaves=6)
        out = jnp.where(
            (kind == TEX_FBM)[..., None],
            (0.5 + 0.5 * fbm_v)[..., None] * c1, out,
        )
    if TEX_WRINKLED in fam:
        turb = noise.turbulence(p_world, octaves=6)
        out = jnp.where(
            (kind == TEX_WRINKLED)[..., None], turb[..., None] * c1, out
        )
    if TEX_WINDY in fam:
        wind = jnp.abs(noise.fbm(0.1 * p_world, octaves=3)) * noise.fbm(
            p_world, octaves=6
        )
        out = jnp.where(
            (kind == TEX_WINDY)[..., None],
            (0.5 + 0.5 * wind)[..., None] * c1, out,
        )

    if TEX_BILERP in fam:
        # Bilerp corners (textures.h BilerpTexture): v00..v11 over unit uv.
        fu = u % 1.0
        fv = v % 1.0
        bil = (
            row["rgb0"] * ((1 - fu) * (1 - fv))[..., None]
            + row["rgb1"] * (fu * (1 - fv))[..., None]
            + row["rgb2"] * ((1 - fu) * fv)[..., None]
            + row["rgb3"] * (fu * fv)[..., None]
        )
        out = jnp.where((kind == TEX_BILERP)[..., None], bil, out)

    if TEX_DOTS in fam:
        # Dots (textures.h DotsTexture): hash-jittered dot per uv cell.
        cu = jnp.floor(u + 0.5)
        cv = jnp.floor(v + 0.5)
        from ..core import rng as _rng

        h0, h1, h2, _ = _rng.pcg4d(
            cu.astype(jnp.int32), cv.astype(jnp.int32), 17, 29
        )
        has_dot = _rng.u32_to_uniform(h0) < 0.5
        cx = cu + 0.35 * (_rng.u32_to_uniform(h1) - 0.5)
        cy = cv + 0.35 * (_rng.u32_to_uniform(h2) - 0.5)
        rad = 0.35
        inside = has_dot & (
            (u - cx) ** 2 + (v - cy) ** 2 < rad * rad
        )
        out = jnp.where(
            (kind == TEX_DOTS)[..., None],
            jnp.where(inside[..., None], c0, c1), out,
        )

    if int(tex.img_flat.shape[0]) > 0:
        img = _image_lookup(tex, row, u, v, width)
        out = jnp.where((kind == TEX_IMAGE)[..., None], img, out)

    if tex.has_ptex:
        # Ptex per-face bilinear lookup with clamp addressing at face
        # borders (the filtered cross-face blending of the reference's
        # PtexFilter is a planned refinement).
        pi = jnp.clip(row["ptex_index"], 0, tex.ptex_base.shape[0] - 1)
        fbase = jnp.take(tex.ptex_base, pi)
        nf = jnp.take(tex.ptex_nfaces, pi)
        fid = jnp.zeros_like(fbase) if face is None else face
        fi = fbase + jnp.clip(fid, 0, nf - 1)
        R = tex.ptex_res
        flat = tex.ptex_flat.reshape(-1, 3)
        x = jnp.clip(u, 0.0, 1.0) * R - 0.5
        y = jnp.clip(v, 0.0, 1.0) * R - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def ptx(xi, yi):
            xi = jnp.clip(xi, 0, R - 1)
            yi = jnp.clip(yi, 0, R - 1)
            return jnp.take(flat, (fi * R + yi) * R + xi, axis=0)

        pv = (
            ptx(x0, y0) * (1 - fx) * (1 - fy)
            + ptx(x0 + 1, y0) * fx * (1 - fy)
            + ptx(x0, y0 + 1) * (1 - fx) * fy
            + ptx(x0 + 1, y0 + 1) * fx * fy
        ) * row["f0"][..., None]
        out = jnp.where((kind == TEX_PTEX)[..., None], pv, out)
    return out


def _eval(tex, tid, uv, p_world, width, n_shade, depth, face=None):
    """Evaluate with `depth` remaining levels of sub-texture indirection.

    depth is a STATIC unroll count: referencing families (Scale, Mix,
    DirectionMix, Checkerboard-with-texture-arms) resolve their sub ids by
    recursing with depth-1; at depth 0 the constant-color arms stand in.
    The reference evaluates texture DAGs by pointer recursion; a static
    2-level unroll covers real scene files while keeping the XLA graph
    fixed-shape.
    """
    row = _gather_row(tex, tid)
    kind = row["kind"]
    out = _eval_leaf(tex, tid, uv, p_world, width, n_shade, face)

    fam = set(tex.families) if tex.families else set(range(12))
    if not (
        tex.has_refs
        or fam & {TEX_SCALE, TEX_MIX, TEX_DIRECTIONMIX}
    ):
        return out

    def sub_val(sub_id, const_rgb):
        if depth == 0:
            return const_rgb
        sid = jnp.clip(sub_id, 0, tex.n_textures - 1)
        val = _eval(tex, sid, uv, p_world, width, n_shade, depth - 1,
                    face)
        return jnp.where((sub_id >= 0)[..., None], val, const_rgb)

    v0 = sub_val(row["sub0"], row["rgb0"])
    v1 = sub_val(row["sub1"], row["rgb1"])
    amt = jnp.where(
        row["sub2"] >= 0,
        jnp.mean(
            sub_val(row["sub2"], row["f0"][..., None] * jnp.ones((1, 3))),
            axis=-1,
        ),
        row["f0"],
    )

    out = jnp.where((kind == TEX_SCALE)[..., None], v0 * amt[..., None], out)
    mixv = v0 * (1 - amt[..., None]) + v1 * amt[..., None]
    out = jnp.where((kind == TEX_MIX)[..., None], mixv, out)
    if n_shade is not None:
        # DirectionMix (textures.h:160): amount = max(0, dot(dir, n)).
        damt = jnp.maximum(jnp.sum(row["aux0"] * n_shade, -1), 0.0)
        dmix = v0 * damt[..., None] + v1 * (1 - damt[..., None])
        out = jnp.where((kind == TEX_DIRECTIONMIX)[..., None], dmix, out)
    # Checker with texture-valued arms: re-select with the sub values.
    u, v = _map_uv(tex, row, uv, p_world)
    par = (jnp.floor(u) + jnp.floor(v)) % 2.0
    has_sub = (row["sub0"] >= 0) | (row["sub1"] >= 0)
    chk = jnp.where((par == 0.0)[..., None], v0, v1)
    out = jnp.where(((kind == TEX_CHECKER) & has_sub)[..., None], chk, out)
    return out


def evaluate_rgb(tex: TextureBuffers, tex_id, uv, p_world, width=None,
                 n_shade=None, face=None):
    """Linear-RGB texture value per ray; tex_id -1 rows return 0 (callers
    mask). width: screen-footprint in uv units for mip selection."""
    if tex is None or tex.n_textures == 0:
        return jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)
    if width is None:
        width = jnp.zeros(uv.shape[:-1], jnp.float32)
    tid = jnp.clip(tex_id, 0, tex.n_textures - 1)
    return _eval(tex, tid, uv, p_world, width, n_shade, depth=2,
                 face=face)


def evaluate_albedo_coeffs(tex: TextureBuffers, tex_id, uv, p_world,
                           base_coeffs, width=None, n_shade=None,
                           face=None):
    """Per-ray albedo sigmoid coefficients with textures applied.

    tex_id: (N,) int32 texture id per ray (-1 = keep base); uv: (N, 2);
    p_world: (N, 3); base_coeffs: (N, 3) sigmoid coefficients.
    """
    if tex is None or tex.n_textures == 0:
        return base_coeffs
    rgb = jnp.clip(
        evaluate_rgb(tex, tex_id, uv, p_world, width, n_shade, face),
        0.0, 1.0,
    )
    coeffs = rgb2spec.fit_albedo(rgb, iters=12)
    return jnp.where((tex_id >= 0)[..., None], coeffs, base_coeffs)


def evaluate_float(tex: TextureBuffers, tex_id, uv, p_world, base_value,
                   width=None, face=None):
    """Float-texture channel (roughness etc.): mean of the RGB value."""
    if tex is None or tex.n_textures == 0:
        return base_value
    val = jnp.mean(
        evaluate_rgb(tex, tex_id, uv, p_world, width, face=face), axis=-1
    )
    return jnp.where(tex_id >= 0, val, base_value)
