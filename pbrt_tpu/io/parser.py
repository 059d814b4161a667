""".pbrt scene-description parser -> Scene + camera + render settings.

Reference analogue: the Tokenizer/ParserTarget machinery
(/root/reference/src/pbrt/parser.h:25-199) and BasicSceneBuilder's
graphics-state machine (scene.cpp:57-230). This parser covers the directive
subset needed to load real pbrt-v4 scenes of the benchmark shapes:

  transforms: Identity LookAt Translate Rotate Scale Transform ConcatTransform
  state:      AttributeBegin/End ObjectBegin/End ObjectInstance
              ReverseOrientation WorldBegin Include Import
  defs:       Integrator Sampler Film Filter Camera Accelerator Option
  scene:      Material MakeNamedMaterial NamedMaterial Texture
              Shape (trianglemesh | plymesh | sphere)
              LightSource (point | distant | infinite)
              AreaLightSource (diffuse)
              MakeNamedMedium MediumInterface (scene-level single medium)

Instancing is flattened at parse time (instances become transformed copies);
the BVH/cluster accelerator handles the resulting triangle soup. Unknown
directives/parameters warn and continue (the reference's unused-parameter
reporting, paramdict.h:97).
"""

from __future__ import annotations

import os

import numpy as np

from ..cameras.perspective import PerspectiveCamera
from ..core import transform as tfm
from ..lights.buffers import LightBuffers
from ..materials.buffers import (
    MAT_COATEDCONDUCTOR,
    MAT_COATEDDIFFUSE,
    MAT_CONDUCTOR,
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_DIFFUSETRANS,
    MAT_HAIR,
    MAT_THINDIELECTRIC,
    MaterialBuffers,
)
from ..models.path import PathIntegrator
from ..shapes.curve import build_curve_segments
from ..models.volpath import VolPathIntegrator
from ..scene import Scene
from ..shapes.geometry import GeometryBuffers


def tokenize(text: str):
    """pbrt tokens: strings, brackets, numbers/identifiers; # comments.

    Dispatches to the native C++ tokenizer (pbrt_tpu/native/tokenizer.cpp,
    the counterpart of the reference's parser.h Tokenizer) when the
    toolchain is available; this pure-Python path is the fallback and the
    behavioral specification.
    """
    from ..native import tokenize_native

    native = tokenize_native(text)
    if native is not None:
        return native
    toks = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
        elif c == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif c == '"':
            j = text.index('"', i + 1)
            toks.append(text[i : j + 1])
            i = j + 1
        elif c in "[]":
            toks.append(c)
            i += 1
        else:
            j = i
            while j < n and text[j] not in ' \t\r\n"[]#':
                j += 1
            toks.append(text[i:j])
            i = j
    return toks


class _TokenStream:
    def __init__(self, tokens):
        self.toks = tokens
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def done(self):
        return self.pos >= len(self.toks)


_DIRECTIVES = {
    "Integrator", "Sampler", "Film", "Filter", "PixelFilter", "Camera",
    "Accelerator", "Option", "LookAt", "Translate", "Rotate", "Scale",
    "Transform", "ConcatTransform", "Identity", "WorldBegin", "WorldEnd",
    "AttributeBegin", "AttributeEnd", "TransformBegin", "TransformEnd",
    "ObjectBegin", "ObjectEnd", "ObjectInstance", "ReverseOrientation",
    "Material", "MakeNamedMaterial", "NamedMaterial", "Texture", "Shape",
    "LightSource", "AreaLightSource", "MakeNamedMedium", "MediumInterface",
    "Include", "Import", "ColorSpace", "CoordinateSystem", "CoordSysTransform",
    "ConcatTransform", "Attribute", "TransformTimes", "ActiveTransform",
}


def _parse_params(ts: _TokenStream):
    """Parse `"type name" [values...]` pairs until the next directive."""
    params = {}
    while True:
        t = ts.peek()
        if t is None or not t.startswith('"'):
            break
        decl = ts.next()[1:-1].split()
        if len(decl) == 1:
            ptype, pname = "string", decl[0]
        else:
            ptype, pname = decl[0], decl[1]
        vals = []
        if ts.peek() == "[":
            ts.next()
            while ts.peek() != "]":
                vals.append(ts.next())
            ts.next()
        else:
            vals.append(ts.next())

        def conv(v):
            if v.startswith('"'):
                return v[1:-1]
            if v in ("true", "false"):
                return v == "true"
            return float(v)

        vals = [conv(v) for v in vals]
        params[pname] = (ptype, vals)
    return params


def _get(params, name, default=None):
    if name in params:
        v = params[name][1]
        return v[0] if len(v) == 1 else v
    return default


def _get_vec(params, name, default=None):
    if name in params:
        ptype, vals = params[name]
        if ptype == "texture":  # texture-typed: resolved via _tex_ref
            return default
        return np.asarray(vals, np.float64)
    return default


class PbrtParser:
    """Stateful scene builder (BasicSceneBuilder, scene.cpp:57-230)."""

    def __init__(self, base_dir="."):
        from .buffercache import BufferCache

        self.base_dir = base_dir
        self.ctm = np.eye(4)
        self.stack = []
        self.named_ctm = {}
        # Mesh-buffer dedup (BufferCache, util/buffercache.h).
        self.buffer_cache = BufferCache()
        # graphics state
        self.cur_material = 0
        self.cur_area_light = None
        self.reverse = False
        # collected scene
        self.materials = [{"kind": MAT_DIFFUSE, "albedo": (0.5, 0.5, 0.5)}]
        self.named_materials = {}
        self.tris = []
        self.tri_mat = []
        self.tri_light = []
        self.tri_face = []  # Ptex faceIndex: triangle index within its shape
        # Geometry alpha masks (cpu/primitive.h:59-63): per-triangle
        # (constant, texture-id) from the shape's "alpha" parameter.
        self.tri_alpha = []
        self.tri_alpha_tex = []
        self.cur_alpha = (1.0, -1)
        # Per-triangle per-vertex texture coordinates; identity default.
        self.tri_uv = []
        self._pending_uv = None  # (n, 3, 2) for the shape being emitted
        self.spheres = []
        self.sph_mat = []
        self.sph_light = []  # per-sphere index into sphere_lights (-1 none)
        self.sphere_lights = []  # emissive analytic spheres: c, r, rgb, ...
        self.curves = []
        self.disks = []
        self.cyls = []
        self.blps = []
        self.tex_specs = []
        self.named_tex = {}
        self.named_media = {}
        self.scene_medium = None
        # Interior-media stack (per-shape MediumInterface): homogeneous
        # named media become MediumStack entries addressed by index.
        self.media_specs = []
        self.named_media_idx = {}
        self.cur_interface = None  # (inside_idx, outside_idx) or None
        self._interface_mat_cache = {}
        self.any_interface = False
        self.area_lights = []
        self.points = []
        self.spots = []
        self.projections = []
        self.gonios = []
        self.distants = []
        self.infinite = None
        self.envmap = None
        self.textures = {}
        # camera / settings
        self.camera_type = "perspective"
        self.camera_params = {}
        self.world_to_camera = np.eye(4)
        self.resolution = (256, 256)
        self.integrator = "path"
        self.integrator_params = {}
        self.sampler_kind = "independent"
        self.spp = 16
        # objects (instancing)
        self.objects = {}
        self.cur_object = None
        self.object_base = {}
        # True instancing: recorded (name, object_to_world, o2w_end) refs;
        # prototype geometry stays unique (scene.cpp:1352-1557 analogue).
        # o2w_end differs from o2w only for animated instances
        # (ActiveTransform StartTime/EndTime; cpu/primitive.h:86-119).
        self.instances = []
        self.transform_times = (0.0, 1.0)
        # ActiveTransform state: "all" applies transform directives to both
        # keyframes; "start"/"end" to one (scene.cpp TransformSet).
        self.active_transform = "all"
        self.ctm_end = None  # end-keyframe CTM; None == same as self.ctm
        self.warnings = []

    # -- transforms ----------------------------------------------------------

    def _apply(self, m):
        # Dual-keyframe CTM (reference TransformSet, scene.cpp): transform
        # directives update the keyframes the ActiveTransform state selects.
        if self.active_transform in ("all", "start"):
            self.ctm = self.ctm @ m
        if self.ctm_end is not None and self.active_transform in (
                "all", "end"):
            self.ctm_end = self.ctm_end @ m

    def _pts(self, pts):
        h = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        return (h @ self.ctm.T)[:, :3]

    # -- main loop -----------------------------------------------------------

    def parse_file(self, path: str):
        with open(path) as f:
            text = f.read()
        self.base_dir = os.path.dirname(os.path.abspath(path))
        self.parse_string(text)
        return self

    def parse_string(self, text: str):
        ts = _TokenStream(tokenize(text))
        while not ts.done():
            d = ts.next()
            handler = getattr(self, "_d_" + d, None)
            if handler is None:
                if d in _DIRECTIVES:
                    _parse_params(ts)  # consume and ignore
                    self.warnings.append(f"ignored directive {d}")
                else:
                    self.warnings.append(f"unknown token {d}")
                continue
            handler(ts)
        return self

    # -- directive handlers --------------------------------------------------

    def _d_Integrator(self, ts):
        self.integrator = ts.next()[1:-1]
        self.integrator_params = _parse_params(ts)

    def _d_Sampler(self, ts):
        kind = ts.next()[1:-1]
        p = _parse_params(ts)
        mapping = {
            "independent": "independent", "random": "independent",
            "stratified": "stratified", "sobol": "sobol",
            "paddedsobol": "padded", "zsobol": "zsobol", "halton": "halton",
            "pmj02bn": "pmj02bn",
        }
        self.sampler_kind = mapping.get(kind, "independent")
        self.spp = int(_get(p, "pixelsamples", 16))

    def _d_Film(self, ts):
        ts.next()  # film type
        p = _parse_params(ts)
        self.resolution = (
            int(_get(p, "xresolution", 256)),
            int(_get(p, "yresolution", 256)),
        )

    def _d_Filter(self, ts):
        ts.next()
        _parse_params(ts)

    _d_PixelFilter = _d_Filter

    def _d_Accelerator(self, ts):
        ts.next()
        _parse_params(ts)

    def _d_Option(self, ts):
        _parse_params(ts)

    def _d_ColorSpace(self, ts):
        ts.next()

    def _d_Camera(self, ts):
        self.camera_type = ts.next()[1:-1]
        self.camera_params = _parse_params(ts)
        self.world_to_camera = self.ctm.copy()

    def _d_Identity(self, ts):
        self.ctm = np.eye(4)

    def _d_LookAt(self, ts):
        v = [float(ts.next()) for _ in range(9)]
        eye, look, up = v[0:3], v[3:6], v[6:9]
        c2w = np.asarray(tfm.look_at(eye, look, up).m, np.float64)
        self._apply(np.linalg.inv(c2w))  # LookAt appends world-to-camera

    def _d_Translate(self, ts):
        v = [float(ts.next()) for _ in range(3)]
        self._apply(np.asarray(tfm.translate(v).m, np.float64))

    def _d_Rotate(self, ts):
        a = float(ts.next())
        axis = [float(ts.next()) for _ in range(3)]
        self._apply(np.asarray(tfm.rotate(axis, a).m, np.float64))

    def _d_Scale(self, ts):
        v = [float(ts.next()) for _ in range(3)]
        self._apply(np.asarray(tfm.scale(v).m, np.float64))

    def _d_Transform(self, ts):
        assert ts.next() == "["
        v = [float(ts.next()) for _ in range(16)]
        assert ts.next() == "]"
        m = np.asarray(v, np.float64).reshape(4, 4).T  # column-major
        if self.active_transform in ("all", "start"):
            self.ctm = m
        if self.ctm_end is not None and self.active_transform in (
                "all", "end"):
            self.ctm_end = m.copy()

    def _d_ConcatTransform(self, ts):
        assert ts.next() == "["
        v = [float(ts.next()) for _ in range(16)]
        assert ts.next() == "]"
        self._apply(np.asarray(v, np.float64).reshape(4, 4).T)

    def _d_CoordinateSystem(self, ts):
        self.named_ctm[ts.next()[1:-1]] = self.ctm.copy()

    def _d_CoordSysTransform(self, ts):
        name = ts.next()[1:-1]
        if name in self.named_ctm:
            self.ctm = self.named_ctm[name].copy()
        elif name == "camera":
            self.ctm = np.linalg.inv(self.world_to_camera)

    def _d_WorldBegin(self, ts):
        self.ctm = np.eye(4)

    def _d_WorldEnd(self, ts):
        pass

    def _d_AttributeBegin(self, ts):
        self.stack.append(
            (self.ctm.copy(), self.cur_material, self.cur_area_light,
             self.reverse, self.cur_interface,
             None if self.ctm_end is None else self.ctm_end.copy(),
             self.active_transform)
        )

    def _d_AttributeEnd(self, ts):
        (self.ctm, self.cur_material, self.cur_area_light, self.reverse,
         self.cur_interface, self.ctm_end,
         self.active_transform) = self.stack.pop()

    _d_TransformBegin = _d_AttributeBegin
    _d_TransformEnd = _d_AttributeEnd

    def _d_ReverseOrientation(self, ts):
        self.reverse = not self.reverse

    def _d_TransformTimes(self, ts):
        """TransformTimes start end: shutter interval for animated
        transforms (scene.cpp TransformTimes)."""
        self.transform_times = (float(ts.next()), float(ts.next()))

    def _d_ActiveTransform(self, ts):
        """ActiveTransform StartTime|EndTime|All (scene.cpp:446-460):
        selects which CTM keyframe subsequent transform directives update.
        Differing keyframes on an ObjectInstance make it an animated
        instance (AnimatedPrimitive, cpu/primitive.h:86-119)."""
        which = ts.next()
        if self.ctm_end is None:
            self.ctm_end = self.ctm.copy()
        self.active_transform = {
            "StartTime": "start", "EndTime": "end", "All": "all"
        }.get(which, "all")

    def _d_Include(self, ts):
        name = ts.next()[1:-1]
        with open(os.path.join(self.base_dir, name)) as f:
            self.parse_string(f.read())

    _d_Import = _d_Include

    # -- materials -----------------------------------------------------------

    def _material_from_params(self, mtype, p):
        spec = {"kind": MAT_DIFFUSE, "albedo": (0.5, 0.5, 0.5)}
        refl = _get_vec(p, "reflectance")
        if refl is None:
            refl = _get_vec(p, "albedo")
        # Texture-typed reflectance binds the named texture by id
        # (TextureParameterDictionary::GetSpectrumTexture, paramdict.h:204).
        tex_id = self._tex_ref(p, "reflectance")
        if tex_id < 0:
            tex_id = self._tex_ref(p, "albedo")
        if tex_id >= 0:
            spec["albedo_texture"] = tex_id
        if mtype in ("diffuse", "matte"):
            spec["kind"] = MAT_DIFFUSE
            if mtype != "diffuse":
                self.warnings.append(
                    f"material {mtype} approximated as diffuse"
                )
        elif mtype == "subsurface":
            # SubsurfaceMaterial (materials.h): sigma_a/sigma_s define the
            # single-scattering albedo + mean free path driving the Burley
            # diffusion profile (materials/bssrdf.py).
            from ..materials.buffers import MAT_SUBSURFACE

            spec["kind"] = MAT_SUBSURFACE
            sa = _get_vec(p, "sigma_a")
            ssv = _get_vec(p, "sigma_s")
            spec["eta"] = float(_get(p, "eta", 1.33))
            if sa is not None or ssv is not None:
                sa = np.asarray(
                    sa if sa is not None else (0.0011, 0.0024, 0.014)
                )
                ssv = np.asarray(
                    ssv if ssv is not None else (2.55, 3.21, 3.77)
                )
                st = np.maximum(sa + ssv, 1e-6)
                spec["albedo"] = tuple(ssv / st)
                spec["mfp"] = tuple(1.0 / st)
            else:
                m_ = _get_vec(p, "mfp")
                spec["mfp"] = (
                    tuple(m_) if m_ is not None and len(np.atleast_1d(m_)) == 3
                    else ((float(m_),) * 3 if m_ is not None else (0.2,) * 3)
                )
        elif mtype in ("none", "interface", ""):
            # Material "" / "none": a pure media boundary — rays pass
            # straight through, switching media (scene.cpp material-less
            # shapes + MediumInterface).
            from ..materials.buffers import MAT_INTERFACE

            spec["kind"] = MAT_INTERFACE
        elif mtype == "diffusetransmission":
            spec["kind"] = MAT_DIFFUSETRANS
            # Reference defaults reflectance/transmittance to 0.25
            # (materials.cpp DiffuseTransmissionMaterial::Create).
            spec["albedo"] = (0.25, 0.25, 0.25)
            t = _get_vec(p, "transmittance")
            if t is not None and len(np.atleast_1d(t)) == 3:
                spec["transmittance"] = tuple(np.asarray(t, float))
        elif mtype == "retroreflective":
            # The ISET fork's RetroreflectiveBxDF (bxdfs.h:104): conductor
            # microfacet params + the wo-peaked retro lobe.
            from ..materials.buffers import MAT_RETRO

            spec["kind"] = MAT_RETRO
            spec["roughness"] = float(_get(p, "roughness", 0.05) or 0.05)
            cond = _get(p, "conductor", "Al")
            spec["conductor"] = cond
        elif mtype == "mix":
            # MixMaterial (materials.h): "string materials" names two
            # previously defined named materials; amount = P(first).
            from ..materials.buffers import MAT_MIX

            names = _get(p, "materials")
            pair = (
                [names] if isinstance(names, str) else list(names or [])
            )
            if len(pair) == 2 and all(
                nm in self.named_materials for nm in pair
            ):
                spec["kind"] = MAT_MIX
                spec["mix_m0"] = self.named_materials[pair[0]]
                spec["mix_m1"] = self.named_materials[pair[1]]
                spec["mix_amount"] = float(_get(p, "amount", 0.5))
            else:
                self.warnings.append(
                    "mix material needs two defined named materials; "
                    "diffuse fallback"
                )
        elif mtype == "measured":
            # MeasuredBxDF (bxdfs.h:1155): tabulated reflectance data.
            # RGL .bsdf files load through the exact Dupuy-Jakob evaluator
            # and bake into the renderer's half-angle table
            # (materials/rgl.py); .npy loads a prebaked
            # (N_TH, N_TD, N_PD, 3) table directly.
            from ..materials.buffers import MAT_MEASURED

            fname = _get(p, "filename")
            tab = None
            if fname:
                try:
                    path = os.path.join(self.base_dir, fname)
                    if fname.endswith(".bsdf"):
                        from ..materials.rgl import bake_rgl

                        tab = bake_rgl(path)
                    else:
                        tab = np.load(path)
                except Exception as e:
                    self.warnings.append(f"measured '{fname}': {e}")
            if tab is None:
                self.warnings.append(
                    "measured material without loadable table; gray fallback"
                )
                from ..materials.measured import N_PD, N_TD, N_TH

                tab = np.full((N_TH, N_TD, N_PD, 3), 0.5 / np.pi, np.float32)
            spec["kind"] = MAT_MEASURED
            spec["measured_table"] = tab
        elif mtype == "coateddiffuse":
            spec["kind"] = MAT_COATEDDIFFUSE
            spec["roughness"] = float(_get(p, "roughness", 0.1) or 0.1)
            # Coat lobe roughness comes from interface.roughness (as in the
            # reference CoatedDiffuseMaterial), not the base 'roughness'.
            spec["coat_roughness"] = float(
                _get(p, "interface.roughness", 0.05) or 0.05
            )
        elif mtype == "coatedconductor":
            spec["kind"] = MAT_COATEDCONDUCTOR
            spec["roughness"] = float(
                _get(p, "conductor.roughness", 0.05) or 0.05
            )
            spec["coat_roughness"] = float(
                _get(p, "interface.roughness", 0.05) or 0.05
            )
        elif mtype in ("conductor", "metal"):
            spec["kind"] = MAT_CONDUCTOR
            spec["roughness"] = float(_get(p, "roughness", 0.01) or 0.01)
        elif mtype in ("dielectric", "glass"):
            spec["kind"] = MAT_DIELECTRIC
            spec["eta"] = float(_get(p, "eta", 1.5) or 1.5)
            spec["roughness"] = float(_get(p, "roughness", 0.0) or 0.0)
        elif mtype in ("thindielectric",):
            spec["kind"] = MAT_THINDIELECTRIC
            spec["eta"] = float(_get(p, "eta", 1.5) or 1.5)
        elif mtype == "hair":
            # Reference parameter priority (materials.cpp HairMaterial::Create):
            # sigma_a > reflectance > eumelanin/pheomelanin (default eu 1.3).
            import jax.numpy as jnp

            from ..materials import hair as hair_mod

            spec["kind"] = MAT_HAIR
            spec["roughness"] = float(_get(p, "beta_m", 0.3) or 0.3)
            spec["coat_roughness"] = float(_get(p, "beta_n", 0.3) or 0.3)
            spec["eta"] = float(_get(p, "eta", 1.55) or 1.55)
            spec["hair_alpha"] = float(_get(p, "alpha", 2.0) or 2.0)
            sig = _get_vec(p, "sigma_a")
            if sig is None and refl is not None:
                sig = np.asarray(
                    hair_mod.sigma_a_from_reflectance(
                        jnp.asarray(np.asarray(refl, np.float32)),
                        spec["coat_roughness"],
                    )
                )
            if sig is None:
                ce = float(_get(p, "eumelanin", 1.3) or 1.3)
                cp = float(_get(p, "pheomelanin", 0.0) or 0.0)
                sig = np.asarray(hair_mod.sigma_a_from_concentration(ce, cp))
            if len(np.atleast_1d(sig)) == 3:
                spec["hair_sigma_a"] = tuple(np.asarray(sig, float))
            refl = None  # reflectance consumed as pigment, not albedo
        else:
            self.warnings.append(f"material {mtype} approximated as diffuse")
        if refl is not None and len(np.atleast_1d(refl)) == 3:
            spec["albedo"] = tuple(np.asarray(refl, float))
        return spec

    def _d_Material(self, ts):
        mtype = ts.next()[1:-1]
        p = _parse_params(ts)
        self.materials.append(self._material_from_params(mtype, p))
        self.cur_material = len(self.materials) - 1

    def _d_MakeNamedMaterial(self, ts):
        name = ts.next()[1:-1]
        p = _parse_params(ts)
        mtype = _get(p, "type", "diffuse")
        self.materials.append(self._material_from_params(mtype, p))
        self.named_materials[name] = len(self.materials) - 1

    def _d_NamedMaterial(self, ts):
        name = ts.next()[1:-1]
        self.cur_material = self.named_materials.get(name, 0)

    def _d_Texture(self, ts):
        """Texture "name" "type" "class" params (scene.cpp Texture directive
        -> NamedTextures; here each named texture becomes one TextureBuffers
        row and materials bind it by id)."""
        name = ts.next()[1:-1]
        ts.next()  # data type ("spectrum" | "float" — same row layout here)
        tclass = ts.next()[1:-1]
        p = _parse_params(ts)
        spec = self._texture_spec(tclass, p)
        if spec is None:
            self.warnings.append(f"texture class {tclass} unsupported; "
                                 f"'{name}' bound as 0.5 gray constant")
            spec = {"kind": "constant", "rgb0": (0.5, 0.5, 0.5)}
        self.named_tex[name] = len(self.tex_specs)
        self.tex_specs.append(spec)

    def _tex_ref(self, p, key):
        """Resolve a parameter declared as `"texture key" ["name"]` to a
        texture id, or -1 when absent / not texture-typed."""
        if key in p and p[key][0] == "texture":
            tname = p[key][1][0]
            if tname in self.named_tex:
                return self.named_tex[tname]
            self.warnings.append(f"texture '{tname}' referenced before "
                                 "definition; ignored")
        return -1

    def _texture_spec(self, tclass, p):
        """Translate one Texture directive to a TextureBuffers spec dict
        (CreateTexture dispatch, textures.cpp)."""

        def rgb(key, default):
            v = _get_vec(p, key)
            if v is None:
                return default
            v = np.atleast_1d(np.asarray(v, np.float64))
            return tuple(v) if v.size == 3 else (float(v[0]),) * 3

        spec = {
            "uscale": float(_get(p, "uscale", 1.0)),
            "vscale": float(_get(p, "vscale", 1.0)),
            "udelta": float(_get(p, "udelta", 0.0)),
            "vdelta": float(_get(p, "vdelta", 0.0)),
            "mapping": _get(p, "mapping", "uv"),
        }
        v1 = _get_vec(p, "v1")
        v2 = _get_vec(p, "v2")
        if v1 is not None:
            spec["aux0"] = tuple(v1)
        if v2 is not None:
            spec["aux1"] = tuple(v2)
        if tclass == "constant":
            spec.update(kind="constant", rgb0=rgb("value", (1.0, 1.0, 1.0)))
        elif tclass in ("checkerboard", "checker"):
            spec.update(
                kind="checker",
                rgb0=rgb("tex1", (1.0, 1.0, 1.0)),
                rgb1=rgb("tex2", (0.0, 0.0, 0.0)),
                sub0=self._tex_ref(p, "tex1"),
                sub1=self._tex_ref(p, "tex2"),
            )
        elif tclass == "scale":
            spec.update(
                kind="scale",
                rgb0=rgb("tex", (1.0, 1.0, 1.0)),
                sub0=self._tex_ref(p, "tex"),
                f0=float(_get(p, "scale", 1.0)),
                sub2=self._tex_ref(p, "scale"),
            )
        elif tclass == "mix":
            spec.update(
                kind="mix",
                rgb0=rgb("tex1", (0.0, 0.0, 0.0)),
                rgb1=rgb("tex2", (1.0, 1.0, 1.0)),
                sub0=self._tex_ref(p, "tex1"),
                sub1=self._tex_ref(p, "tex2"),
                f0=float(_get(p, "amount", 0.5)),
                sub2=self._tex_ref(p, "amount"),
            )
        elif tclass == "directionmix":
            d = _get_vec(p, "dir")
            spec.update(
                kind="directionmix",
                rgb0=rgb("tex1", (0.0, 0.0, 0.0)),
                rgb1=rgb("tex2", (1.0, 1.0, 1.0)),
                sub0=self._tex_ref(p, "tex1"),
                sub1=self._tex_ref(p, "tex2"),
                aux0=tuple(d) if d is not None else (0.0, 1.0, 0.0),
            )
        elif tclass == "bilerp":
            spec.update(
                kind="bilerp",
                rgb0=rgb("v00", (0.0, 0.0, 0.0)),
                rgb1=rgb("v01", (1.0, 1.0, 1.0)),
                rgb2=rgb("v10", (0.0, 0.0, 0.0)),
                rgb3=rgb("v11", (1.0, 1.0, 1.0)),
            )
        elif tclass == "dots":
            spec.update(
                kind="dots",
                rgb0=rgb("inside", (1.0, 1.0, 1.0)),
                rgb1=rgb("outside", (0.0, 0.0, 0.0)),
            )
        elif tclass in ("fbm", "wrinkled", "windy", "marble"):
            spec.update(kind=tclass)
            if tclass == "marble":
                spec.update(
                    rgb0=(0.08, 0.06, 0.06), rgb1=(0.9, 0.87, 0.83),
                    uscale=float(_get(p, "scale", 1.0)),
                )
        elif tclass == "imagemap":
            fname = _get(p, "filename")
            img = None
            if fname:
                path = os.path.join(self.base_dir, fname)
                try:
                    from .image import read_image_rgb

                    img = read_image_rgb(path)
                except Exception as e:  # missing/unsupported file
                    self.warnings.append(f"imagemap '{fname}': {e}")
            if img is None:
                img = np.full((2, 2, 3), 0.5, np.float32)
            sc = float(_get(p, "scale", 1.0))
            spec.update(kind="image", rgb_image=np.asarray(img) * sc)
        elif tclass == "ptex":
            fname = _get(p, "filename")
            faces = None
            if fname:
                try:
                    from .ptex import read_ptex

                    faces, _mt = read_ptex(
                        os.path.join(self.base_dir, fname)
                    )
                except Exception as e:  # missing/unsupported file
                    self.warnings.append(f"ptex '{fname}': {e}")
            if faces is None:
                faces = [np.full((2, 2, 3), 0.5, np.float32)]
            spec.update(
                kind="ptex",
                ptex_faces=faces,
                f0=float(_get(p, "scale", 1.0)),
            )
        else:
            return None
        return spec

    # -- lights --------------------------------------------------------------

    def _d_AreaLightSource(self, ts):
        ts.next()  # "diffuse"
        p = _parse_params(ts)
        L = _get_vec(p, "L")
        scale = float(_get(p, "scale", 1.0) or 1.0)
        rgb = tuple(L) if L is not None and len(L) == 3 else (1.0, 1.0, 1.0)
        self.cur_area_light = {
            "rgb": rgb,
            "scale": scale,
            "two_sided": bool(_get(p, "twosided", False)),
        }

    def _d_LightSource(self, ts):
        ltype = ts.next()[1:-1]
        p = _parse_params(ts)
        scale = float(_get(p, "scale", 1.0) or 1.0)
        if ltype == "point":
            I = _get_vec(p, "I")
            frm = _get_vec(p, "from", np.zeros(3))
            pos = self._pts(frm[None])[0]
            self.points.append(
                {"p": tuple(pos), "rgb": tuple(I) if I is not None else (1, 1, 1),
                 "scale": scale}
            )
        elif ltype == "spot":
            I = _get_vec(p, "I")
            frm = _get_vec(p, "from", np.zeros(3))
            to = _get_vec(p, "to", np.asarray([0.0, 0.0, 1.0]))
            self.spots.append(
                {"p": tuple(self._pts(frm[None])[0]),
                 "to": tuple(self._pts(to[None])[0]),
                 "rgb": tuple(I) if I is not None else (1, 1, 1),
                 "scale": scale,
                 "coneangle": float(_get(p, "coneangle", 30.0)),
                 "conedelta": float(_get(p, "conedeltaangle", 5.0))}
            )
        elif ltype == "distant":
            L = _get_vec(p, "L")
            frm = _get_vec(p, "from", np.zeros(3))
            to = _get_vec(p, "to", np.asarray([0.0, 0.0, 1.0]))
            dw = self._pts(to[None])[0] - self._pts(frm[None])[0]
            self.distants.append(
                {"dir": tuple(dw), "rgb": tuple(L) if L is not None else (1, 1, 1),
                 "scale": scale}
            )
        elif ltype == "projection":
            # ProjectionLight (lights.h:482): image projected through a
            # perspective window; CTM places/orients the light.
            I = _get_vec(p, "I")
            pos = self._pts(np.zeros((1, 3)))[0]
            to = self._pts(np.asarray([[0.0, 0.0, 1.0]]))[0]
            img = self._light_image(p)
            self.projections.append(
                {"p": tuple(pos), "to": tuple(to),
                 "fov": float(_get(p, "fov", 90.0)),
                 "rgb": tuple(I) if I is not None else (1, 1, 1),
                 "rgb_image": img, "scale": scale}
            )
        elif ltype == "goniometric":
            # GoniometricLight (lights.h:584): equal-area-octahedral
            # intensity image over direction.
            I = _get_vec(p, "I")
            frm = _get_vec(p, "from", np.zeros(3))
            pos = self._pts(frm[None])[0]
            img = self._light_image(p)
            self.gonios.append(
                {"p": tuple(pos),
                 "to": tuple(pos + np.asarray([0.0, 0.0, 1.0])),
                 "rgb": tuple(I) if I is not None else (1, 1, 1),
                 "rgb_image": img, "scale": scale}
            )
        elif ltype == "infinite":
            L = _get_vec(p, "L")
            self.infinite = {
                "rgb": tuple(L) if L is not None else (1.0, 1.0, 1.0),
                "scale": scale,
            }
            img = self._light_image(p)
            portal = _get_vec(p, "portal")
            if img is not None and portal is not None:
                # PortalImageInfiniteLight (lights.h:738): environment
                # sampled through a rectangular portal window.
                from ..lights.portal import PortalLight

                corners = self._pts(
                    np.asarray(portal, np.float64).reshape(4, 3)
                )
                self.envmap = PortalLight.build(
                    np.asarray(img) * scale, corners
                )
                self.infinite = None
            elif img is not None:
                from ..lights.envmap import EnvironmentMap

                img = np.asarray(img) * scale
                if img.shape[0] == img.shape[1]:
                    # Square images are equal-area octahedral maps — the
                    # reference's required format (lights.cpp
                    # ImageInfiniteLight "non-square" error).
                    self.envmap = EnvironmentMap.build(img)
                else:
                    # 2:1 equirectangular convenience: resample
                    # (imgtool makeequiarea).
                    self.envmap = EnvironmentMap.from_latlong(img)
                self.infinite = None
            elif portal is not None:
                from ..lights.portal import PortalLight

                corners = self._pts(
                    np.asarray(portal, np.float64).reshape(4, 3)
                )
                flat = np.ones((8, 16, 3), np.float32) * np.asarray(
                    self.infinite["rgb"], np.float32
                ) * scale
                self.envmap = PortalLight.build(flat, corners)
                self.infinite = None
        else:
            self.warnings.append(f"light {ltype} unsupported; skipped")

    def _light_image(self, p):
        fname = _get(p, "filename")
        if not fname:
            return None
        try:
            from .image import read_image_rgb

            return read_image_rgb(os.path.join(self.base_dir, fname))
        except Exception as e:
            self.warnings.append(f"light image '{fname}': {e}")
            return None

    def _d_MakeNamedMedium(self, ts):
        """MakeNamedMedium "name" "string type" ... (media.cpp Medium::Create
        dispatch for homogeneous / uniformgrid / rgbgrid)."""
        name = ts.next()[1:-1]
        p = _parse_params(ts)
        mtype = _get(p, "type", "homogeneous")
        scale = float(_get(p, "scale", 1.0))
        g = float(_get(p, "g", 0.0))
        sa = _get_vec(p, "sigma_a")
        ss = _get_vec(p, "sigma_s")
        sa = tuple(sa) if sa is not None else (1.0, 1.0, 1.0)
        ss = tuple(ss) if ss is not None else (1.0, 1.0, 1.0)
        # Bounds: p0/p1 in medium space transformed by the CTM (axis-
        # aligned subset — the general oriented transform needs the
        # medium-space ray transform tier).
        p0 = _get_vec(p, "p0")
        p1 = _get_vec(p, "p1")
        lo = np.asarray(p0 if p0 is not None else (0, 0, 0), np.float64)
        hi = np.asarray(p1 if p1 is not None else (1, 1, 1), np.float64)
        corners = self._pts(np.asarray(
            [[lo[0], lo[1], lo[2]], [hi[0], hi[1], hi[2]]], np.float64
        ))
        blo = np.minimum(corners[0], corners[1])
        bhi = np.maximum(corners[0], corners[1])
        from ..media.medium import MediumBuffers

        if mtype == "homogeneous":
            med = MediumBuffers.homogeneous(
                sa, ss, blo, bhi, g=g, scale=scale
            )
            # Homogeneous media without explicit p0/p1 (real pbrt has none
            # on homogeneous) are shape-bounded interior media, addressable
            # through per-shape MediumInterface; explicit bounds keep the
            # scene-level AABB binding (this build's legacy extension).
            if p0 is None and p1 is None:
                self.named_media_idx[name] = len(self.media_specs)
                self.media_specs.append(
                    {"sigma_a": sa, "sigma_s": ss, "g": g, "scale": scale}
                )
        elif mtype in ("uniformgrid", "grid"):
            dens = _get_vec(p, "density")
            nx = int(_get(p, "nx", 1))
            ny = int(_get(p, "ny", 1))
            nz = int(_get(p, "nz", 1))
            if dens is None:
                self.warnings.append(
                    f"medium {name}: no density grid; skipped"
                )
                return
            dgrid = np.asarray(dens, np.float32).reshape(nz, ny, nx)
            le = _get_vec(p, "Le")
            med = MediumBuffers.grid(
                dgrid, sa, ss, blo, bhi, g=g, scale=scale,
                le_rgb=tuple(le) if le is not None else None,
                le_scale=float(_get(p, "Lescale", 1.0)),
            )
        elif mtype == "cloud":
            # Procedural cloud (CloudMedium, media.h:430).
            med = MediumBuffers.cloud(
                sa, ss, blo, bhi, g=g, scale=scale,
                density=float(_get(p, "density", 1.0)),
                wispiness=float(_get(p, "wispiness", 1.0)),
                frequency=float(_get(p, "frequency", 5.0)),
            )
        elif mtype == "rgbgrid":
            nx = int(_get(p, "nx", 1))
            ny = int(_get(p, "ny", 1))
            nz = int(_get(p, "nz", 1))
            sag = _get_vec(p, "sigma_a")
            ssg = _get_vec(p, "sigma_s")
            shape = (nz, ny, nx, 3)
            sagrid = (
                np.asarray(sag, np.float32).reshape(shape)
                if sag is not None and np.asarray(sag).size == nz * ny * nx * 3
                else np.broadcast_to(np.asarray(sa, np.float32), shape)
            )
            ssgrid = (
                np.asarray(ssg, np.float32).reshape(shape)
                if ssg is not None and np.asarray(ssg).size == nz * ny * nx * 3
                else np.broadcast_to(np.asarray(ss, np.float32), shape)
            )
            med = MediumBuffers.rgbgrid(
                sagrid, ssgrid, blo, bhi, g=g, scale=scale
            )
        elif mtype == "nanovdb":
            # NanoVDBMedium (media.h:599): load the density grid from the
            # .nvdb file; world bounds come from the grid, then the CTM.
            fn = _get(p, "filename")
            if not fn:
                self.warnings.append(f"medium {name}: nanovdb needs filename")
                return
            from .nanovdb import read_nanovdb

            gname = _get(p, "gridname", "density")
            try:
                nv = read_nanovdb(os.path.join(self.base_dir, fn), gname)
            except (OSError, ValueError, KeyError) as e:
                self.warnings.append(f"medium {name}: {e}")
                return
            corners = self._pts(np.asarray(
                [nv.world_min, nv.world_max], np.float64
            ))
            blo = np.minimum(corners[0], corners[1])
            bhi = np.maximum(corners[0], corners[1])
            med = MediumBuffers.grid(
                np.asarray(nv.values, np.float32), sa, ss, blo, bhi,
                g=g, scale=scale,
                le_scale=float(_get(p, "LeScale", 1.0)),
            )
        else:
            self.warnings.append(f"medium type {mtype} unsupported; skipped")
            return
        self.named_media[name] = med

    def _d_MediumInterface(self, ts):
        """MediumInterface "inside" "outside" (graphics-state directive,
        scene.cpp MediumInterface handling).

        Homogeneous named media attach PER SHAPE: subsequent shapes in this
        attribute scope carry (inside, outside) interior-medium indices, and
        rays switch on transmission (MediumStack in the integrator). Grid /
        rgbgrid media keep the scene-level AABB binding (they are
        bounds-shaped already). "" means vacuum."""
        inside = ts.next()[1:-1]
        outside = ""
        if ts.peek() and ts.peek().startswith('"'):
            outside = ts.next()[1:-1]

        def resolve(nm):
            from ..media.medium import MED_VACUUM

            if not nm:
                return MED_VACUUM
            if nm in self.named_media_idx:
                return self.named_media_idx[nm]
            if nm in self.named_media:
                return None  # grid medium: scene-level path
            self.warnings.append(f"medium '{nm}' not defined")
            return MED_VACUUM

        in_idx = resolve(inside)
        out_idx = resolve(outside)
        if in_idx is None or out_idx is None:
            # Grid medium referenced: legacy scene-level binding.
            name = inside if in_idx is None else outside
            if self.scene_medium is not None:
                self.warnings.append(
                    "multiple scene-level MediumInterface bindings; "
                    "last one wins"
                )
            self.scene_medium = self.named_media[name]
            return
        self.cur_interface = (in_idx, out_idx)

    def _interfaced_material(self):
        """Effective material for shapes under the current MediumInterface:
        the graphics-state material cloned with (inside, outside) indices
        (per-primitive MediumInterface in the reference; cached per
        (material, interface) pair)."""
        from ..media.medium import MED_VACUUM

        iface = self.cur_interface
        if iface is None or iface == (MED_VACUUM, MED_VACUUM):
            return self.cur_material
        key = (self.cur_material, iface)
        hit = self._interface_mat_cache.get(key)
        if hit is not None:
            return hit
        mat = dict(self.materials[self.cur_material])
        mat["med_inside"] = iface[0]
        mat["med_outside"] = iface[1]
        idx = len(self.materials)
        self.materials.append(mat)
        self._interface_mat_cache[key] = idx
        self.any_interface = True
        return idx

    # -- shapes --------------------------------------------------------------

    def _tessellate_disk(self, p):
        r = float(_get(p, "radius", 1.0))
        ri = float(_get(p, "innerradius", 0.0))
        h = float(_get(p, "height", 0.0))
        seg = 64
        ang = np.linspace(0, 2 * np.pi, seg + 1)
        outer = np.stack(
            [r * np.cos(ang), r * np.sin(ang), np.full(seg + 1, h)], -1
        )
        inner = np.stack(
            [ri * np.cos(ang), ri * np.sin(ang), np.full(seg + 1, h)], -1
        )
        tris = []
        for i in range(seg):
            tris.append([inner[i], outer[i], outer[i + 1]])
            if ri > 0:
                tris.append([inner[i], outer[i + 1], inner[i + 1]])
        local = np.asarray(tris, np.float32).reshape(-1, 3)
        return self._pts(local).reshape(-1, 3, 3)

    _UV_IDENTITY = np.asarray(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32
    )

    def _emit_triangles(self, tris_world):
        n = len(tris_world)
        if n == 0:
            self._pending_uv = None
            return
        uvs = self._pending_uv
        self._pending_uv = None
        if uvs is None:
            uvs = np.broadcast_to(self._UV_IDENTITY, (n, 3, 2))
        if self.reverse:
            uvs = uvs[:, ::-1]
        light_id = -1
        if self.cur_area_light is not None:
            base = len(self.area_lights)
            for i, t in enumerate(tris_world):
                v = t.astype(np.float32)
                if self.reverse:
                    v = v[::-1].copy()
                self.area_lights.append({"verts": v, **self.cur_area_light})
                self.tris.append(v)
                self.tri_mat.append(self.cur_material)
                self.tri_light.append(base + i)
                self.tri_face.append(i)
                self.tri_alpha.append(self.cur_alpha[0])
                self.tri_alpha_tex.append(self.cur_alpha[1])
                self.tri_uv.append(np.asarray(uvs[i], np.float32))
            return
        for i, t in enumerate(tris_world):
            v = t.astype(np.float32)
            if self.reverse:
                v = v[::-1].copy()
            self.tris.append(v)
            self.tri_mat.append(self.cur_material)
            self.tri_light.append(-1)
            self.tri_face.append(i)
            self.tri_alpha.append(self.cur_alpha[0])
            self.tri_alpha_tex.append(self.cur_alpha[1])
            self.tri_uv.append(np.asarray(uvs[i], np.float32))

    def _d_Shape(self, ts):
        mat_save = self.cur_material
        self.cur_material = self._interfaced_material()
        try:
            self._shape_inner(ts)
        finally:
            self.cur_material = mat_save

    def _shape_inner(self, ts):
        stype = ts.next()[1:-1]
        p = _parse_params(ts)
        # Shape alpha mask ("float alpha" constant or "texture alpha";
        # GeometricPrimitive alpha, cpu/primitive.h:59-63).
        a_tex = self._tex_ref(p, "alpha")
        if a_tex >= 0:
            self.cur_alpha = (1.0, a_tex)
        else:
            try:
                self.cur_alpha = (float(_get(p, "alpha", 1.0)), -1)
            except (TypeError, ValueError):
                self.cur_alpha = (1.0, -1)
        if stype == "trianglemesh":
            pts = self.buffer_cache.canonical(
                _get_vec(p, "P").reshape(-1, 3)
            )
            idx = self.buffer_cache.canonical(
                np.asarray(p["indices"][1], np.int64).reshape(-1, 3)
            )
            world = self._pts(pts)
            tris = world[idx]
            uv = _get_vec(p, "uv")
            if uv is None:
                uv = _get_vec(p, "st")
            if uv is not None:
                self._pending_uv = np.asarray(
                    uv, np.float32
                ).reshape(-1, 2)[idx]
        elif stype == "plymesh":
            fn = _get(p, "filename")
            verts, faces = self.buffer_cache.read_ply(
                os.path.join(self.base_dir, fn)
            )
            world = self._pts(verts)
            tris = world[faces]
        elif stype == "sphere":
            r = float(_get(p, "radius", 1.0))
            center = self._pts(np.zeros((1, 3)))[0]
            # Uniform scale assumed for spheres (pbrt requires this too).
            sc = np.linalg.norm(self.ctm[:3, 0])
            if self.cur_area_light is not None:
                if self.reverse or self.cur_object is not None:
                    # Inward-emitting (ReverseOrientation) or instanced
                    # emissive spheres keep the icosphere tessellation
                    # fallback; the analytic light assumes an outward
                    # one-sided emitter in world space.
                    from ..scenes.meshes import icosphere

                    tris = icosphere(2, r * sc, center)
                    self._emit_triangles(tris)
                    return
                # Analytic emissive sphere: exact geometry + cone-sampled
                # NEE (DiffuseAreaLight over Sphere, shapes.cpp
                # Sphere::Sample).
                self.sph_light.append(len(self.sphere_lights))
                self.sphere_lights.append(
                    {"c": center, "r": r * sc, **self.cur_area_light}
                )
                self.spheres.append([*center, r * sc])
                self.sph_mat.append(self.cur_material)
                return
            self.spheres.append([*center, r * sc])
            self.sph_mat.append(self.cur_material)
            self.sph_light.append(-1)
            return
        elif stype == "disk" and self.cur_area_light is None:
            # Analytic disk (Disk::Intersect, shapes.h): plane solve +
            # radius window. CTM must be rigid+uniform-scale for the
            # radius (general scales fall back to tessellation below).
            r = float(_get(p, "radius", 1.0))
            ri = float(_get(p, "innerradius", 0.0))
            h = float(_get(p, "height", 0.0))
            c_w = self._pts(np.asarray([[0.0, 0.0, h]]))[0]
            e1 = self._pts(np.asarray([[1.0, 0.0, h]]))[0] - c_w
            e2 = self._pts(np.asarray([[0.0, 1.0, h]]))[0] - c_w
            s1, s2 = np.linalg.norm(e1), np.linalg.norm(e2)
            if abs(s1 - s2) < 1e-5 * max(s1, s2):
                n_w = np.cross(e1, e2)
                n_w /= max(np.linalg.norm(n_w), 1e-12)
                self.disks.append(
                    (tuple(c_w) + tuple(n_w) + (r * s1, ri * s1),
                     self.cur_material)
                )
                return
            self.warnings.append(
                "disk under anisotropic scale: tessellated"
            )
            tris = self._tessellate_disk(p)
        elif stype == "disk":
            tris = self._tessellate_disk(p)
        elif stype == "cylinder" and self.cur_area_light is None:
            # Analytic open cylinder (Cylinder::Intersect, shapes.h).
            r = float(_get(p, "radius", 1.0))
            z0 = float(_get(p, "zmin", -1.0))
            z1 = float(_get(p, "zmax", 1.0))
            zc = 0.5 * (z0 + z1)
            base_w = self._pts(np.asarray([[0.0, 0.0, zc]]))[0]
            top_w = self._pts(np.asarray([[0.0, 0.0, z1]]))[0]
            rad_w = self._pts(np.asarray([[1.0, 0.0, zc]]))[0] - base_w
            axis = top_w - base_w
            half = np.linalg.norm(axis)
            s_r = np.linalg.norm(rad_w)
            if half > 1e-12:
                axis /= half
                self.cyls.append(
                    (tuple(base_w) + tuple(axis) + (r * s_r, half),
                     self.cur_material)
                )
                return
            self.warnings.append("degenerate cylinder; skipped")
            return
        elif stype == "cylinder":
            r = float(_get(p, "radius", 1.0))
            z0 = float(_get(p, "zmin", -1.0))
            z1 = float(_get(p, "zmax", 1.0))
            seg = 64
            ang = np.linspace(0, 2 * np.pi, seg + 1)
            lo = np.stack([r * np.cos(ang), r * np.sin(ang), np.full(seg + 1, z0)], -1)
            hi = np.stack([r * np.cos(ang), r * np.sin(ang), np.full(seg + 1, z1)], -1)
            tris = []
            for i in range(seg):
                tris.append([lo[i], lo[i + 1], hi[i + 1]])
                tris.append([lo[i], hi[i + 1], hi[i]])
            local = np.asarray(tris, np.float32).reshape(-1, 3)
            world = self._pts(local).reshape(-1, 3, 3)
            tris = world
        elif stype == "bilinearmesh" and self.cur_area_light is None:
            # Analytic bilinear patches (Reshetov; shapes.h:1350).
            pts = _get_vec(p, "P").reshape(-1, 3)
            idx = _get_vec(p, "indices")
            if idx is not None:
                quads = pts[np.asarray(idx, np.int64).reshape(-1, 4)]
            else:
                quads = pts.reshape(-1, 4, 3)
            for qd in quads:
                w = self._pts(qd.astype(np.float64))
                # pbrt quad vertex order: p00, p10, p01, p11.
                self.blps.append(
                    (tuple(w[0]) + tuple(w[1]) + tuple(w[2]) + tuple(w[3]),
                     self.cur_material)
                )
            return
        elif stype == "bilinearmesh":
            # Tessellate each bilinear patch on a 4x4 grid (exact for planar
            # quads; curved patches approximated — analytic Reshetov
            # intersection is a later tier).
            pts = _get_vec(p, "P").reshape(-1, 3)
            idx = _get_vec(p, "indices")
            if idx is not None:
                # Indexed quads with shared vertices (shapes.cpp
                # BilinearPatch::CreateMesh): gather (nq, 4, 3).
                pts = pts[np.asarray(idx, np.int64).reshape(-1, 4)]
            else:
                pts = pts.reshape(-1, 4, 3)
            tris = []
            k = 4
            for quad in pts:
                p00, p10, p01, p11 = quad
                for i in range(k):
                    for j in range(k):
                        def bl(u, v):
                            return (
                                (1 - u) * (1 - v) * p00 + u * (1 - v) * p10
                                + (1 - u) * v * p01 + u * v * p11
                            )
                        a = bl(i / k, j / k)
                        bq = bl((i + 1) / k, j / k)
                        c = bl((i + 1) / k, (j + 1) / k)
                        dq = bl(i / k, (j + 1) / k)
                        tris.append([a, bq, c])
                        tris.append([a, c, dq])
            world = self._pts(np.asarray(tris, np.float32).reshape(-1, 3))
            tris = world.reshape(-1, 3, 3)
        elif stype == "loopsubdiv":
            # LoopSubdiv shape (shapes.cpp): refine then emit triangles.
            from ..shapes.subdiv import loop_subdivide

            pts = _get_vec(p, "P").reshape(-1, 3)
            idx = _get_vec(p, "indices")
            if idx is None:
                self.warnings.append("loopsubdiv needs indices; skipped")
                return
            levels = int(_get(p, "levels", _get(p, "nlevels", 3)))
            vv, ff = loop_subdivide(
                pts, np.asarray(idx, np.int64).reshape(-1, 3), levels
            )
            world = self._pts(vv.astype(np.float64))
            tris = world[ff]
        elif stype == "curve":
            # Reference: shapes.cpp CreateCurve — cubic bezier/bspline
            # control points, width/width0/width1 as FULL widths, types
            # flat/cylinder/ribbon (we treat all as round; build_curve_
            # segments flattens to linear swept-sphere segments).
            pts = _get_vec(p, "P").reshape(-1, 3)
            world = self._pts(pts)
            w = float(_get(p, "width", 1.0))
            self.curves.append(
                {
                    "cp": world.astype(np.float32),
                    "basis": _get(p, "basis", "bezier"),
                    "width0": float(_get(p, "width0", w)),
                    "width1": float(_get(p, "width1", w)),
                    "mat": self.cur_material,
                }
            )
            return
        else:
            self.warnings.append(f"shape {stype} unknown; skipped")
            return
        if self.cur_object is not None:
            self.objects[self.cur_object].append(
                (tris, self.cur_material, self.cur_area_light,
                 self.cur_alpha)
            )
        else:
            self._emit_triangles(tris)

    def _d_ObjectBegin(self, ts):
        name = ts.next()[1:-1]
        self.cur_object = name
        self.objects[name] = []
        self._d_AttributeBegin(ts)
        self._object_base_ctm = self.ctm.copy()
        self.object_base[name] = self._object_base_ctm

    def _d_ObjectEnd(self, ts):
        self._d_AttributeEnd(ts)
        self.cur_object = None

    def _d_ObjectInstance(self, ts):
        """True instancing: record (prototype, transform) — geometry stays
        unique and the sweep accelerator traverses per-instance
        (scene.cpp:1352-1557; TransformedPrimitive cpu/primitive.h:86-119).
        Emissive objects fall back to flattening: the reference errors on
        area lights under instancing (scene.cpp 'area lights not supported
        with object instancing'); flattening keeps them rendering."""
        name = ts.next()[1:-1]
        entries = self.objects.get(name, [])
        if not entries:
            return
        if any(area is not None for _, _, area, _ in entries):
            self.warnings.append(
                f"ObjectInstance '{name}': emissive object flattened "
                "(reference: area lights unsupported under instancing)"
            )
            for tris, mat, area, alpha in entries:
                base_inv = np.linalg.inv(self.object_base[name])
                local = (tris.reshape(-1, 3) @ base_inv[:3, :3].T
                         + base_inv[:3, 3])
                h = np.concatenate(
                    [local, np.ones((len(local), 1))], axis=1
                )
                world = (h @ self.ctm.T)[:, :3].reshape(-1, 3, 3)
                saved_mat = self.cur_material
                saved_light = self.cur_area_light
                self.cur_material, self.cur_area_light = mat, area
                saved_alpha, self.cur_alpha = self.cur_alpha, alpha
                self._emit_triangles(world)
                self.cur_alpha = saved_alpha
                self.cur_material, self.cur_area_light = (
                    saved_mat, saved_light)
            return
        o2w_end = self.ctm_end if self.ctm_end is not None else self.ctm
        self.instances.append(
            (name, self.ctm.copy(), o2w_end.copy())
        )

    # -- finalize ------------------------------------------------------------

    def _build_instances(self):
        """Append prototype triangles (object space, unique) to the
        triangle arrays and return (proto_ranges, proto_id, o2w, o2w_end)
        instance tables, or None when no instances were recorded."""
        if not self.instances:
            return None
        root_count = len(self.tris)
        proto_ranges = []
        name_to_pid = {}
        inst_pid, inst_o2w, inst_o2w_end = [], [], []
        if root_count:
            # Non-instanced top-level geometry = prototype 0 under one
            # identity instance.
            proto_ranges.append((0, root_count))
            inst_pid.append(0)
            inst_o2w.append(np.eye(4, dtype=np.float32))
            inst_o2w_end.append(np.eye(4, dtype=np.float32))
        for name, o2w, o2w_end in self.instances:
            if name not in name_to_pid:
                base_inv = np.linalg.inv(self.object_base[name])
                start = len(self.tris)
                for tris, mat, _area, alpha in self.objects[name]:
                    local = (tris.reshape(-1, 3) @ base_inv[:3, :3].T
                             + base_inv[:3, 3]).reshape(-1, 3, 3)
                    for i, t in enumerate(local):
                        self.tris.append(t.astype(np.float32))
                        self.tri_mat.append(mat)
                        self.tri_light.append(-1)
                        self.tri_face.append(i)
                        self.tri_alpha.append(alpha[0])
                        self.tri_alpha_tex.append(alpha[1])
                        self.tri_uv.append(self._UV_IDENTITY)
                name_to_pid[name] = len(proto_ranges)
                proto_ranges.append((start, len(self.tris) - start))
            inst_pid.append(name_to_pid[name])
            inst_o2w.append(o2w.astype(np.float32))
            inst_o2w_end.append(o2w_end.astype(np.float32))
        return (
            proto_ranges,
            np.asarray(inst_pid, np.int32),
            np.stack(inst_o2w),
            np.stack(inst_o2w_end),
        )

    def build(self):
        """Returns (scene, camera, settings dict)."""
        self.buffer_cache.report_stats()
        inst_tables = self._build_instances()
        geom = GeometryBuffers.build(
            tri_verts=np.asarray(self.tris, np.float32).reshape(-1, 3, 3),
            tri_mat=np.asarray(self.tri_mat, np.int32),
            tri_light=np.asarray(self.tri_light, np.int32),
            tri_face=np.asarray(self.tri_face, np.int32),
            tri_alpha=np.asarray(self.tri_alpha, np.float32),
            tri_alpha_tex=np.asarray(self.tri_alpha_tex, np.int32),
            tri_uv=np.asarray(self.tri_uv, np.float32).reshape(-1, 3, 2),
            spheres=np.asarray(self.spheres, np.float32).reshape(-1, 4)
            if self.spheres else None,
            sph_mat=np.asarray(self.sph_mat, np.int32)
            if self.spheres else None,
            # Sphere-light ids live after the area triangles in the global
            # light list: offset local sphere_lights indices by n_area.
            sph_light=np.asarray(
                [
                    (len(self.area_lights) + l if l >= 0 else -1)
                    for l in self.sph_light
                ],
                np.int32,
            )
            if self.spheres else None,
            **(
                dict(
                    zip(
                        ("crv", "crv_u", "crv_mat"),
                        build_curve_segments(self.curves),
                    )
                )
                if self.curves
                else {}
            ),
            disk=np.asarray([d for d, _ in self.disks], np.float32)
            if self.disks else None,
            disk_mat=np.asarray([m for _, m in self.disks], np.int32)
            if self.disks else None,
            cyl=np.asarray([c for c, _ in self.cyls], np.float32)
            if self.cyls else None,
            cyl_mat=np.asarray([m for _, m in self.cyls], np.int32)
            if self.cyls else None,
            blp=np.asarray([b for b, _ in self.blps], np.float32)
            if self.blps else None,
            blp_mat=np.asarray([m for _, m in self.blps], np.int32)
            if self.blps else None,
        )
        materials = MaterialBuffers.build(self.materials)
        lights = LightBuffers.build(
            area_tris=self.area_lights,
            sphere_lights=self.sphere_lights,
            points=self.points,
            spots=self.spots,
            projections=self.projections,
            gonios=self.gonios,
            distants=self.distants,
            infinite=self.infinite,
            envmap=self.envmap,
        )
        textures = None
        if self.tex_specs:
            from ..textures.buffers import TextureBuffers

            textures = TextureBuffers.build(self.tex_specs)
        media_stack = None
        if self.any_interface and self.media_specs:
            from ..media.medium import MediumStack

            media_stack = MediumStack.build(self.media_specs)
        scene = Scene(
            geom=geom, materials=materials, lights=lights, textures=textures,
            medium=self.scene_medium, media_stack=media_stack,
        )
        if inst_tables is not None:
            from ..accel.instances import build_animated_instances
            from ..ops.sweep import build_sweep

            proto_ranges, pid, o2w, o2w_end = inst_tables
            moving = np.abs(o2w - o2w_end).max(axis=(1, 2)) > 1e-7
            sweep = build_sweep(
                np.asarray(self.tris, np.float32).reshape(-1, 3, 3),
                proto_ranges=proto_ranges,
                instances=(pid[~moving], o2w[~moving]),
            ) if (~moving).any() else None
            anim = None
            if moving.any():
                anim = build_animated_instances(
                    np.asarray(self.tris, np.float32).reshape(-1, 3, 3),
                    proto_ranges, pid[moving], o2w[moving], o2w_end[moving],
                    times=self.transform_times,
                )
            scene = scene.replace(sweep=sweep, anim=anim)
        else:
            scene = scene.with_accel()

        c2w_np = np.linalg.inv(self.world_to_camera)
        c2w = tfm.Transform.from_matrix(c2w_np.astype(np.float32))
        fov = float(_get(self.camera_params, "fov", 90.0))
        camera = PerspectiveCamera(
            camera_to_world=c2w, resolution=self.resolution, fov_deg=fov
        )
        if self.camera_type in ("realistic", "omni"):
            lensfile = _get(self.camera_params, "lensfile")
            if lensfile:
                from ..cameras.lens import load_lens_file
                from ..cameras.realistic import RealisticCamera, \
                    load_lens_json

                try:
                    diffraction = bool(
                        _get(self.camera_params, "diffractionEnabled", False)
                    )
                    microlens = None
                    path = os.path.join(self.base_dir, lensfile)
                    if lensfile.endswith(".json"):
                        # Omni .json lens (surfaces + optional microlens).
                        lens, microlens = load_lens_json(
                            path,
                            microlens_sensor_offset_mm=float(_get(
                                self.camera_params, "microlenssensoroffset",
                                0.001,
                            )) * 1000.0,  # pbrt takes meters; we keep mm
                            sim_radius=int(_get(
                                self.camera_params,
                                "microlenssimulationradius", 0,
                            )),
                        )
                    else:
                        lens = load_lens_file(path)
                    camera = RealisticCamera.create(
                        camera_to_world=c2w, lens=lens,
                        resolution=self.resolution,
                        film_diag_mm=float(
                            _get(self.camera_params, "filmdiag", 35.0)
                        ),
                        # Pupil precompute doesn't apply with a microlens
                        # relay (OmniCamera::BoundExitPupil early-out).
                        exit_pupil=microlens is None,
                    ).replace(microlens=microlens, diffraction=diffraction)
                    if _get(self.camera_params, "aperturediameter"):
                        self.warnings.append(
                            "aperturediameter override not applied; edit "
                            "the lens file's stop row instead"
                        )
                except Exception as e:
                    self.warnings.append(
                        f"lensfile '{lensfile}': {e}; falling back to "
                        "perspective"
                    )
            else:
                self.warnings.append(
                    f"{self.camera_type} camera without lensfile; "
                    "using perspective"
                )
        elif self.camera_type != "perspective":
            self.warnings.append(
                f"camera {self.camera_type} loaded as perspective; build the "
                "specialty camera explicitly from pbrt_tpu.cameras"
            )
        integ_map = {
            "path": PathIntegrator, "simplepath": PathIntegrator,
            "volpath": VolPathIntegrator, "simplevolpath": VolPathIntegrator,
        }
        max_depth = int(_get(self.integrator_params, "maxdepth", 5))
        if self.integrator == "mlt":
            # Reference CLI knobs: integrators.cpp:3272-3290.
            from ..models.mlt import MLTIntegrator

            integrator = MLTIntegrator(
                base=PathIntegrator(max_depth=max_depth),
                n_chains=int(_get(self.integrator_params, "chains", 4096)),
                sigma=float(_get(self.integrator_params, "sigma", 0.01)),
                p_large=float(
                    _get(self.integrator_params, "largestepprobability", 0.3)
                ),
            )
        elif self.integrator == "bdpt":
            from ..models.bdpt import BDPTIntegrator

            integrator = BDPTIntegrator(max_depth=max_depth)
        elif self.integrator == "lightpath":
            from ..models.lightpath import LightPathIntegrator

            integrator = LightPathIntegrator(max_depth=max_depth)
        elif self.integrator == "function":
            # Sampler-evaluation integrator (cpu/integrators.cpp FunctionIntegrator).
            from ..models.function import FunctionIntegrator

            integrator = FunctionIntegrator(
                func=str(_get(self.integrator_params, "function", "quadratic")),
            )
        elif self.integrator == "sppm":
            from ..models.sppm import SPPMIntegrator

            integrator = SPPMIntegrator(
                max_depth=max_depth,
                initial_radius=float(
                    _get(self.integrator_params, "radius", 0.0)
                ),
            )
        else:
            integ_cls = integ_map.get(self.integrator, PathIntegrator)
            has_media = (self.scene_medium is not None
                         or media_stack is not None)
            if has_media and integ_cls is PathIntegrator:
                # Media need the null-scattering walk; pbrt errors, we
                # upgrade (render.cpp checks integrator/media compat).
                integ_cls = VolPathIntegrator
                self.warnings.append(
                    "scene has media; integrator upgraded to volpath"
                )
            integrator = integ_cls(max_depth=max_depth)
        settings = {
            "spp": self.spp,
            "sampler": self.sampler_kind,
            "integrator": integrator,
            "warnings": self.warnings,
        }
        return scene, camera, settings


def load_pbrt(path: str):
    """Parse a .pbrt file. Returns (scene, camera, settings)."""
    return PbrtParser().parse_file(path).build()


def load_pbrt_string(text: str, base_dir: str = "."):
    return PbrtParser(base_dir).parse_string(text).build()
