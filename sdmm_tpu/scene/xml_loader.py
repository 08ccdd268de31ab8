"""Mitsuba 0.6 scene-XML subset loader.

Equivalent of the reference's SceneHandler SAX loader
(reference: mitsuba/src/librender/scenehandler.cpp with ``<default>``,
``$var`` substitution and ``<include>``) so the reference test-suite scenes
(/root/reference/test-suite/scenes) load directly. Supported subset: the
plugins the test scenes use — perspective sensor, hdrfilm, independent
sampler, rectangle/cube/sphere/obj shapes, diffuse/conductor/dielectric/
roughconductor/phong/twosided BSDFs, area/constant emitters.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from ..core.spectrum import interpolated_spectrum_to_rgb
from . import shapes as shp
from .scene import (
    BSDF_BLEND,
    BSDF_CONDUCTOR,
    BSDF_DIELECTRIC,
    BSDF_DIFFUSE,
    BSDF_MASK,
    BSDF_PHONG,
    BSDF_PLASTIC,
    BSDF_ROUGHCONDUCTOR,
    BSDF_ROUGHDIELECTRIC,
    BSDF_ROUGHPLASTIC,
    BSDF_WARD,
    SceneBuilder,
)

# A few named conductor/dielectric materials (subset of the reference's
# data/ior tables, mitsuba/src/bsdfs/ior.cpp).
CONDUCTOR_IOR = {
    "Cu": ([0.200438, 0.924033, 1.102212], [3.912949, 2.447786, 2.142188]),
    "Au": ([0.143085, 0.374852, 1.442371], [3.982205, 2.385723, 1.603215]),
    "Ag": ([0.155184, 0.116677, 0.138372], [4.827917, 3.122335, 2.146190]),
    "Al": ([1.657460, 0.880369, 0.521229], [9.223869, 6.269523, 4.837001]),
    "none": ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
}
DIELECTRIC_IOR = {
    "vacuum": 1.0, "air": 1.000277, "water": 1.3330, "glass": 1.5046,
    "bk7": 1.5046, "diamond": 2.419, "polypropylene": 1.49,
}


def _subst(text: str, variables: dict) -> str:
    def repl(m):
        name = m.group(1)
        if name not in variables:
            raise KeyError(f"Undefined scene variable ${name}")
        return str(variables[name])

    return re.sub(r"\$(\w+)", repl, text)


def _parse_value(el, variables):
    return _subst(el.get("value", ""), variables)


def _parse_rgb(text: str) -> np.ndarray:
    text = text.strip()
    if text.startswith("#"):
        # HTML-style hex sRGB (reference: Properties color parsing accepts
        # '#rrggbb', e.g. test-suite/scenes/bookshelf); linearize like the
        # reference's sRGB-to-linear conversion (spectrum.h fromSRGB).
        h = text.lstrip("#")
        if len(h) == 3:
            h = "".join(c * 2 for c in h)
        srgb = np.array([int(h[i:i + 2], 16) for i in (0, 2, 4)]) / 255.0
        return np.where(
            srgb <= 0.04045, srgb / 12.92,
            ((srgb + 0.055) / 1.055) ** 2.4,
        )
    vals = [float(x) for x in re.split(r"[,\s]+", text) if x]
    if len(vals) == 1:
        vals = vals * 3
    return np.asarray(vals[:3])


def _parse_spectrum(text: str) -> np.ndarray:
    text = text.strip()
    if ":" in text:
        pairs = [p for p in re.split(r"[,\s]+", text) if p]
        wl, vv = [], []
        for p in pairs:
            a, b = p.split(":")
            wl.append(float(a))
            vv.append(float(b))
        return interpolated_spectrum_to_rgb(np.asarray(wl), np.asarray(vv))
    return _parse_rgb(text)


def _parse_transform(el, variables) -> np.ndarray:
    m = np.eye(4)
    for child in el:
        tag = child.tag
        if tag == "matrix":
            vals = [float(x) for x in _parse_value(child, variables).split()]
            m = np.asarray(vals).reshape(4, 4) @ m
        elif tag == "translate":
            t = np.eye(4)
            for i, ax in enumerate("xyz"):
                t[i, 3] = float(_subst(child.get(ax, "0"), variables))
            m = t @ m
        elif tag == "scale":
            s = np.eye(4)
            if child.get("value") is not None:
                v = float(_parse_value(child, variables))
                s[0, 0] = s[1, 1] = s[2, 2] = v
            else:
                for i, ax in enumerate("xyz"):
                    s[i, i] = float(_subst(child.get(ax, "1"), variables))
            m = s @ m
        elif tag == "rotate":
            axis = np.array(
                [float(_subst(child.get(ax, "0"), variables)) for ax in "xyz"]
            )
            axis = axis / np.linalg.norm(axis)
            ang = np.deg2rad(float(_subst(child.get("angle", "0"), variables)))
            c, s_, x, y, z = np.cos(ang), np.sin(ang), *axis
            r = np.eye(4)
            r[:3, :3] = np.array([
                [c + x * x * (1 - c), x * y * (1 - c) - z * s_, x * z * (1 - c) + y * s_],
                [y * x * (1 - c) + z * s_, c + y * y * (1 - c), y * z * (1 - c) - x * s_],
                [z * x * (1 - c) - y * s_, z * y * (1 - c) + x * s_, c + z * z * (1 - c)],
            ])
            m = r @ m
        elif tag == "lookat":
            origin = _parse_rgb(_subst(child.get("origin"), variables))
            target = _parse_rgb(_subst(child.get("target"), variables))
            up = _parse_rgb(_subst(child.get("up", "0, 1, 0"), variables))
            d = target - origin
            d = d / np.linalg.norm(d)
            left = np.cross(up / np.linalg.norm(up), d)
            left /= np.linalg.norm(left)
            new_up = np.cross(d, left)
            l = np.eye(4)
            l[:3, 0] = left
            l[:3, 1] = new_up
            l[:3, 2] = d
            l[:3, 3] = origin
            m = l @ m
    return m


def _props(el, variables) -> dict:
    """Collect typed child properties (float/integer/boolean/string/rgb/spectrum)."""
    out = {}
    for child in el:
        tag = child.tag
        name = child.get("name")
        if tag in ("float", "integer"):
            out[name] = float(_parse_value(child, variables))
        elif tag == "boolean":
            out[name] = _parse_value(child, variables).lower() == "true"
        elif tag == "string":
            out[name] = _parse_value(child, variables)
        elif tag == "rgb":
            out[name] = _parse_rgb(_parse_value(child, variables))
        elif tag == "spectrum":
            out[name] = _parse_spectrum(_parse_value(child, variables))
        elif tag == "transform":
            out[name] = _parse_transform(child, variables)
        elif tag == "animation":
            # Keyframed toWorld (reference: core/track.h AnimatedTransform):
            # list of (time, matrix), sorted by time.
            frames = sorted(
                ((float(sub.get("time", 0.0)), _parse_transform(sub, variables))
                 for sub in child if sub.tag == "transform"),
                key=lambda f: f[0],
            )
            out[name] = ("animation", frames)
    return out


class XMLLoader:
    def __init__(self, overrides: dict | None = None):
        self.variables = dict(overrides or {})
        self.overrides = dict(overrides or {})
        self.builder = SceneBuilder()
        self.base_dir = "."
        self.shapegroups: dict = {}
        # tex code -> (curvature kind, scale): shapes whose BSDF carries a
        # curvature texture bake it into vertex colors at load (_shape).
        self.curvature_notes: dict = {}

    def load(self, path: str) -> SceneBuilder:
        self.base_dir = os.path.dirname(os.path.abspath(path))
        root = ET.parse(path).getroot()
        self._scene(root, self.base_dir)
        return self.builder

    def _scene(self, root, base_dir):
        for el in root:
            tag = el.tag
            if tag == "default":
                name = el.get("name")
                if name not in self.overrides:
                    self.variables.setdefault(name, el.get("value"))
            elif tag == "include":
                fname = _subst(el.get("filename"), self.variables)
                sub = os.path.join(base_dir, fname)
                if not os.path.exists(sub) and "_integrators" in fname:
                    # The test-suite parameterizes the integrator through
                    # $integrator includes; integrators the reference never
                    # shipped a config for (ours go further) fall back to a
                    # bare <integrator type=.../> with defaults.
                    self.builder.integrator = {
                        "type": self.variables.get("integrator", "path")
                    }
                    continue
                sub_root = ET.parse(sub).getroot()
                self._scene(sub_root, os.path.dirname(sub))
            elif tag == "integrator":
                self.builder.integrator = {
                    "type": _subst(el.get("type"), self.variables),
                    **_props(el, self.variables),
                }
                p = self.builder.integrator
                self.builder.max_depth = int(p.get("maxDepth", 10))
                self.builder.rr_depth = int(p.get("rrDepth", self.builder.max_depth))
            elif tag == "sensor":
                self._sensor(el)
            elif tag == "medium":
                # Scene-level homogeneous medium (reference:
                # src/medium/homogeneous.cpp).
                p = _props(el, self.variables)
                if "sigmaT" in p:
                    sigma_t = np.asarray(p["sigmaT"]).reshape(3)
                    albedo = np.asarray(p.get("albedo", np.ones(3))).reshape(3)
                else:
                    sigma_s = np.asarray(p.get("sigmaS", np.zeros(3))).reshape(3)
                    sigma_a = np.asarray(p.get("sigmaA", np.zeros(3))).reshape(3)
                    sigma_t = sigma_s + sigma_a
                    albedo = np.where(sigma_t > 0, sigma_s / np.maximum(sigma_t, 1e-20), 0.0)
                g = 0.0
                for sub in el:
                    if sub.tag == "phase":
                        pp = _props(sub, self.variables)
                        g = float(pp.get("g", 0.0))
                self.builder.medium = {"sigma_t": sigma_t, "albedo": albedo, "g": g}
            elif tag == "bsdf":
                self._bsdf(el, top=True)
            elif tag == "shape":
                self._shape(el, base_dir)
            elif tag == "emitter":
                p = _props(el, self.variables)
                etype = el.get("type")
                if etype == "constant":
                    self.builder.env_radiance = np.asarray(
                        p.get("radiance", np.ones(3))
                    ).reshape(3)
                elif etype == "point":
                    pos = np.zeros(3)
                    for sub in el:
                        if sub.tag == "point" and sub.get("name") == "position":
                            pos = np.array([
                                float(_subst(sub.get(ax, "0"), self.variables))
                                for ax in "xyz"
                            ])
                    if "toWorld" in p:
                        pos = p["toWorld"][:3, 3]
                    intensity = np.asarray(p.get("intensity", np.ones(3))).reshape(3)
                    self.builder.add_point_light(pos, intensity)
                elif etype == "spot":
                    m = p.get("toWorld", np.eye(4))
                    pos = m[:3, 3]
                    direction = m[:3, :3] @ np.array([0.0, 0.0, 1.0])
                    intensity = np.asarray(p.get("intensity", np.ones(3))).reshape(3)
                    cutoff = float(p.get("cutoffAngle", 20.0))
                    beam = float(p.get("beamWidth", cutoff * 0.75))
                    self.builder.add_spot_light(pos, direction, intensity, cutoff, beam)
                elif etype == "directional":
                    d = None
                    for sub in el:
                        if sub.tag == "vector" and sub.get("name") == "direction":
                            d = np.array([
                                float(_subst(sub.get(ax, "0"), self.variables))
                                for ax in "xyz"
                            ])
                    if d is None:
                        m = p.get("toWorld", np.eye(4))
                        d = m[:3, :3] @ np.array([0.0, 0.0, 1.0])
                    irr = np.asarray(p.get("irradiance", np.ones(3))).reshape(3)
                    self.builder.add_directional_light(d, irr)
                elif etype == "collimated":
                    # Beam from toWorld origin along its +z axis
                    # (reference: src/emitters/collimated.cpp sampleRay).
                    m = p.get("toWorld", np.eye(4))
                    pos = m[:3, 3]
                    direction = m[:3, :3] @ np.array([0.0, 0.0, 1.0])
                    power = np.asarray(p.get("power", np.ones(3))).reshape(3)
                    self.builder.add_collimated_light(pos, direction, power)
                elif etype == "envmap":
                    scale = float(p.get("scale", 1.0))
                    img = None
                    if p.get("filename"):
                        path = os.path.join(self.base_dir, p["filename"])
                        try:
                            from ..utils.exr import read_exr

                            img = read_exr(path)[..., :3]
                        except Exception:
                            img = None
                    if img is not None:
                        self.builder.env_map = np.asarray(img, np.float32)
                        self.builder.env_radiance = np.full(3, scale)
                        if "toWorld" in p:
                            self.builder.env_to_world = p["toWorld"][:3, :3]
                    else:
                        # LFS-stub/unreadable asset → scaled constant.
                        self.builder.env_radiance = np.full(3, scale)
                elif etype in ("sky", "sun", "sunsky"):
                    # Hosek-Wilkie sky + Preetham sun baked to an envmap
                    # (scene/sunsky.py); reference:
                    # src/emitters/{sun,sky,sunsky}.cpp + sunsky/*.
                    from .sunsky import (
                        compute_sun_coordinates,
                        make_sunsky_envmap,
                        sun_coords_to_dir,
                    )

                    scale = float(p.get("scale", 1.0))
                    turb = float(p.get("turbidity", 3.0))
                    if "sunDirection" in p:
                        sd = np.asarray(
                            p["sunDirection"], dtype=np.float64
                        ).reshape(-1)[:3]
                    else:
                        zen, az = compute_sun_coordinates(
                            year=int(p.get("year", 2010)),
                            month=int(p.get("month", 7)),
                            day=int(p.get("day", 10)),
                            hour=float(p.get("hour", 15.0)),
                            minute=float(p.get("minute", 0.0)),
                            second=float(p.get("second", 0.0)),
                            timezone=float(p.get("timezone", 9.0)),
                            latitude=float(p.get("latitude", 35.6894)),
                            longitude=float(p.get("longitude", 139.6917)),
                        )
                        sd = sun_coords_to_dir(zen, az)
                    alb = np.asarray(
                        p.get("albedo", 0.15), dtype=np.float64
                    ).reshape(-1)
                    alb = alb if alb.size == 3 else np.full(3, float(alb[0]))
                    self.builder.env_map = make_sunsky_envmap(
                        sd, turbidity=turb,
                        resolution=int(p.get("resolution", 256)),
                        with_sky=etype in ("sky", "sunsky"),
                        with_sun=etype in ("sun", "sunsky"),
                        sun_scale=float(p.get("sunScale", 1.0)),
                        sky_scale=float(p.get("skyScale", 1.0)),
                        albedo=alb,
                        stretch=float(p.get("stretch", 1.0)),
                        sun_radius_scale=float(p.get("sunRadiusScale", 1.0)),
                        extend=bool(p.get("extend", False)),
                    )
                    self.builder.env_radiance = np.full(3, scale)

    def _sensor(self, el):
        p = _props(el, self.variables)
        width, height = 256, 256
        for sub in el:
            if sub.tag == "film":
                fp = _props(sub, self.variables)
                width = int(fp.get("width", 256))
                height = int(fp.get("height", 256))
                for fsub in sub:
                    if fsub.tag == "rfilter":
                        rf = _subst(fsub.get("type", "box"), self.variables)
                        # Reference rfilter plugin names (src/rfilters/).
                        self.builder.rfilter = {
                            "box": "box", "tent": "tent", "gaussian": "gaussian",
                            "mitchell": "mitchell", "catmullrom": "catmullrom",
                            "lanczos": "lanczos",
                        }.get(rf, "box")
            elif sub.tag == "sampler":
                sp = _props(sub, self.variables)
                self.builder.sample_count = int(sp.get("sampleCount", 16))
                self.builder.seed = int(sp.get("seed", 1234))
                st = _subst(sub.get("type", "independent"), self.variables)
                self.builder.sampler = {
                    "independent": "independent", "stratified": "stratified",
                    "halton": "halton", "hammersley": "halton",
                    "ldsampler": "halton", "sobol": "sobol",
                }.get(st, "independent")
        self.builder.set_sensor(
            to_world=p.get("toWorld", np.eye(4)),
            fov_deg=float(p.get("fov", 45.0)),
            width=width,
            height=height,
            fov_axis=p.get("fovAxis", "x"),
        )

    def _bsdf(self, el, top=False) -> int:
        btype = _subst(el.get("type"), self.variables)
        name = el.get("id")
        p = _props(el, self.variables)
        if btype == "twosided":
            # Reflective models are implicitly two-sided in this framework
            # (shading_frame flips); unwrap the child.
            child = next(sub for sub in el if sub.tag == "bsdf")
            idx = self._bsdf(child)
            if name is not None:
                self.builder.bsdf_ids[name] = idx
            return idx
        if btype == "bumpmap":
            # Height-texture wrapper (reference: bsdfs/bumpmap.cpp): flatten
            # onto the child row's bump columns.
            children = [sub for sub in el if sub.tag == "bsdf"]
            idx = self._bsdf(children[0]) if children else self.builder.add_bsdf(
                BSDF_DIFFUSE
            )
            tex_id = self._bsdf_texture(el)
            if tex_id >= 0:
                self.builder.bsdfs[idx]["bump"] = tex_id
                self.builder.bsdfs[idx]["bump_scale"] = float(p.get("scale", 1.0))
            if name is not None:
                self.builder.bsdf_ids[name] = idx
            return idx
        if btype == "blendbsdf":
            children = [sub for sub in el if sub.tag == "bsdf"]
            c0 = self._bsdf(children[0]) if len(children) > 0 else self.builder.add_bsdf(BSDF_DIFFUSE)
            c1 = self._bsdf(children[1]) if len(children) > 1 else c0
            return self.builder.add_bsdf(
                BSDF_BLEND, name=name, child0=c0, child1=c1,
                weight=float(p.get("weight", 0.5)),
            )
        if btype in ("coating", "roughcoating"):
            # Dielectric layer over a child (reference: bsdfs/coating.cpp,
            # roughcoating.cpp). Parent row columns: eta = IOR ratio,
            # alpha = thickness, albedo = sigmaA, specular = reflectance,
            # alpha_v = GGX roughness of the layer boundary (0 = smooth).
            from .scene import BSDF_COATING

            children = [sub for sub in el if sub.tag == "bsdf"]
            c0 = self._bsdf(children[0]) if children else self.builder.add_bsdf(
                BSDF_DIFFUSE
            )
            int_ior = p.get("intIOR", "bk7")
            ext_ior = p.get("extIOR", "air")
            int_v = DIELECTRIC_IOR.get(int_ior, 1.5046) if isinstance(
                int_ior, str) else float(int_ior)
            ext_v = DIELECTRIC_IOR.get(ext_ior, 1.000277) if isinstance(
                ext_ior, str) else float(ext_ior)
            sa = np.asarray(p.get("sigmaA", np.zeros(3)), np.float64).reshape(-1)
            sa = sa if sa.size == 3 else np.full(3, float(sa[0]))
            return self.builder.add_bsdf(
                BSDF_COATING, name=name, child0=c0,
                eta=int_v / ext_v,
                alpha=float(p.get("thickness", 1.0)),
                alpha_v=(float(p.get("alpha", 0.1))
                         if btype == "roughcoating" else 0.0),
                albedo=sa,
                specular=p.get("specularReflectance", np.ones(3)),
            )
        if btype == "normalmap":
            # Tangent-space normal texture over a child (reference:
            # bsdfs/normalmap.cpp). Stored as bump = -(tex_id+2); see
            # render/intersect.py apply_bumpmap.
            children = [sub for sub in el if sub.tag == "bsdf"]
            idx = self._bsdf(children[0]) if children else self.builder.add_bsdf(
                BSDF_DIFFUSE
            )
            tex_id = self._bsdf_texture(el, srgb=False)
            if tex_id >= 0:
                self.builder.bsdfs[idx]["bump"] = -(tex_id + 2)
            if name is not None:
                self.builder.bsdf_ids[name] = idx
            return idx
        if btype == "mixturebsdf":
            # N-ary mixture (reference: bsdfs/mixturebsdf.cpp). Two
            # components map exactly onto the blend container; with more,
            # the two largest weights are kept and renormalized (GAPS.md).
            children = [sub for sub in el if sub.tag == "bsdf"]
            weights = [float(x) for x in str(p.get("weights", "")).replace(
                ",", " ").split()] or [1.0 / max(len(children), 1)] * len(children)
            pairs = sorted(zip(weights, range(len(children))), reverse=True)[:2]
            if len(pairs) == 1:
                return self._bsdf(children[pairs[0][1]])
            (w0, i0), (w1, i1) = pairs
            c0 = self._bsdf(children[i0])
            c1 = self._bsdf(children[i1])
            return self.builder.add_bsdf(
                BSDF_BLEND, name=name, child0=c0, child1=c1,
                weight=w1 / max(w0 + w1, 1e-9),
            )
        if btype == "mask":
            children = [sub for sub in el if sub.tag == "bsdf"]
            c0 = self._bsdf(children[0]) if children else self.builder.add_bsdf(BSDF_DIFFUSE)
            op = np.asarray(p.get("opacity", np.full(3, 0.5))).reshape(-1)
            op = np.broadcast_to(op, (3,))
            return self.builder.add_bsdf(BSDF_MASK, name=name, child0=c0, albedo=op)
        kwargs = {}
        tex_id = self._bsdf_texture(el)
        if tex_id >= 0 or tex_id <= -2:  # bitmap id or -(idx+2) procedural
            kwargs["tex"] = tex_id
        if btype == "diffuse":
            code = BSDF_DIFFUSE
            kwargs["albedo"] = p.get("reflectance", np.full(3, 0.5))
        elif btype == "roughdiffuse":
            from .scene import BSDF_ROUGHDIFFUSE

            code = BSDF_ROUGHDIFFUSE
            kwargs["albedo"] = p.get("reflectance", np.full(3, 0.5))
            kwargs["alpha"] = float(p.get("alpha", 0.2))
        elif btype == "difftrans":
            from .scene import BSDF_DIFFTRANS

            code = BSDF_DIFFTRANS
            kwargs["albedo"] = p.get("transmittance", np.full(3, 0.5))
        elif btype in ("conductor", "roughconductor"):
            mat = p.get("material", "Cu")
            eta_k = CONDUCTOR_IOR.get(mat, CONDUCTOR_IOR["Cu"])
            eta_rgb = np.asarray(p.get("eta", eta_k[0]))
            k_rgb = np.asarray(p.get("k", eta_k[1]))
            code = BSDF_CONDUCTOR if btype == "conductor" else BSDF_ROUGHCONDUCTOR
            kwargs["specular"] = p.get("specularReflectance", np.ones(3))
            kwargs["eta"] = float(np.mean(eta_rgb))
            kwargs["k"] = k_rgb
            kwargs["alpha"] = float(p.get("alpha", 0.1))
        elif btype in ("dielectric", "roughdielectric", "thindielectric"):
            int_ior = p.get("intIOR", "bk7")
            ext_ior = p.get("extIOR", "air")
            int_v = DIELECTRIC_IOR.get(int_ior, None) if isinstance(int_ior, str) else float(int_ior)
            ext_v = DIELECTRIC_IOR.get(ext_ior, None) if isinstance(ext_ior, str) else float(ext_ior)
            int_v = 1.5046 if int_v is None else int_v
            ext_v = 1.000277 if ext_v is None else ext_v
            from .scene import BSDF_THINDIELECTRIC

            code = {
                "roughdielectric": BSDF_ROUGHDIELECTRIC,
                "thindielectric": BSDF_THINDIELECTRIC,
            }.get(btype, BSDF_DIELECTRIC)
            kwargs["eta"] = int_v / ext_v
            kwargs["specular"] = p.get("specularReflectance", np.ones(3))
            kwargs["albedo"] = p.get("specularTransmittance", np.ones(3))
            kwargs["alpha"] = float(p.get("alpha", 0.1))
        elif btype == "phong":
            code = BSDF_PHONG
            kwargs["albedo"] = p.get("diffuseReflectance", np.full(3, 0.5))
            kwargs["specular"] = p.get("specularReflectance", np.full(3, 0.2))
            kwargs["exponent"] = float(p.get("exponent", 30.0))
        elif btype == "ward":
            code = BSDF_WARD
            kwargs["albedo"] = p.get("diffuseReflectance", np.full(3, 0.5))
            kwargs["specular"] = p.get("specularReflectance", np.full(3, 0.2))
            kwargs["alpha"] = float(p.get("alphaU", p.get("alpha", 0.1)))
            kwargs["alpha_v"] = float(p.get("alphaV", p.get("alpha", 0.1)))
        elif btype in ("roughplastic", "plastic"):
            int_ior = p.get("intIOR", "polypropylene")
            ext_ior = p.get("extIOR", "air")
            int_v = DIELECTRIC_IOR.get(int_ior, 1.49) if isinstance(int_ior, str) else float(int_ior)
            ext_v = DIELECTRIC_IOR.get(ext_ior, 1.000277) if isinstance(ext_ior, str) else float(ext_ior)
            code = BSDF_ROUGHPLASTIC if btype == "roughplastic" else BSDF_PLASTIC
            kwargs["albedo"] = p.get("diffuseReflectance", np.full(3, 0.5))
            kwargs["specular"] = p.get("specularReflectance", np.ones(3))
            kwargs["eta"] = int_v / ext_v
            kwargs["alpha"] = float(p.get("alpha", 0.1))
        elif btype == "irawan":
            # Woven cloth (reference: bsdfs/irawan.cpp). Pattern from a
            # weave-DSL file (with $param substitution from the scene
            # properties) or the built-in plain weave.
            from ..bsdf.irawan import PLAIN_WEAVE, parse_weave
            from .scene import BSDF_IRAWAN

            fname = p.get("filename")
            if fname:
                with open(os.path.join(self.base_dir, fname)) as fh:
                    text = fh.read()
            else:
                text = PLAIN_WEAVE
            wp = parse_weave(text, dict(p))
            wp.repeat_u = float(p.get("repeatU", 1.0))
            wp.repeat_v = float(p.get("repeatV", 1.0))
            self.builder.irawan_pattern = wp
            code = BSDF_IRAWAN
        elif btype == "hk":
            # Hanrahan-Krueger slab (reference: bsdfs/hk.cpp). Accepts
            # sigmaS/sigmaA or sigmaT+albedo; nested hg phase sets g.
            from .scene import BSDF_HK

            code = BSDF_HK
            if "sigmaT" in p:
                sig_t = np.asarray(p["sigmaT"], np.float64).reshape(-1)
                sig_t = np.broadcast_to(sig_t, (3,)).astype(np.float64)
                alb = np.broadcast_to(
                    np.asarray(p.get("albedo", 0.8), np.float64).reshape(-1), (3,)
                )
                sig_s = sig_t * alb
                sig_a = sig_t - sig_s
            else:
                sig_s = np.broadcast_to(
                    np.asarray(p.get("sigmaS", 2.0), np.float64).reshape(-1), (3,)
                )
                sig_a = np.broadcast_to(
                    np.asarray(p.get("sigmaA", 0.05), np.float64).reshape(-1), (3,)
                )
            g = 0.0
            for sub in el:
                if sub.tag == "phase" and sub.get("type") == "hg":
                    pp = _props(sub, self.variables)
                    g = float(pp.get("g", 0.0))
            kwargs["albedo"] = sig_s
            kwargs["specular"] = sig_a
            kwargs["alpha"] = float(p.get("thickness", 1.0))
            kwargs["eta"] = g
        else:
            code = BSDF_DIFFUSE
            kwargs["albedo"] = p.get("reflectance", np.full(3, 0.5))
        return self.builder.add_bsdf(code, name=name, **kwargs)

    def _bsdf_texture(self, el, srgb: bool = True) -> int:
        """Load a nested <texture> (albedo channels only).

        Returns a texture id (bitmap stack index, or -(idx+2) for
        procedural textures), or -1. LFS-stub/unreadable files fall back
        to a mid-gray placeholder so scenes still load. ``srgb=False``
        skips the sRGB→linear conversion (normal maps store raw vectors).
        """
        for sub in el:
            if sub.tag == "texture":
                return self._texture(sub, srgb=srgb)
        return -1

    def _texture(self, sub, srgb: bool = True, mul: float = 1.0) -> int:
        """One <texture> element → texture id. Handles bitmap, scale
        (recursive wrapper, src/textures/scale.cpp), and the procedural
        plugins checkerboard/gridtexture/wireframe/vertexcolors/curvature
        (src/textures/*.cpp) — lowered to proc_tex rows evaluated
        branchlessly per hit (bsdf.eval_proc_texture)."""
        from .scene import (
            PROC_CHECKERBOARD, PROC_GRID, PROC_MESHATTR, PROC_WIREFRAME,
        )

        ttype = sub.get("type")
        tp = _props(sub, self.variables)

        def spec(name, default):
            v = tp.get(name, None)
            if v is None:
                return np.full(3, default)
            return np.broadcast_to(
                np.asarray(v, np.float64).reshape(-1), (3,)).copy()

        uvkw = dict(
            uscale=float(tp.get("uscale", 1.0)),
            vscale=float(tp.get("vscale", 1.0)),
            uoffset=float(tp.get("uoffset", 0.0)),
            voffset=float(tp.get("voffset", 0.0)),
        )
        if ttype == "bitmap":
            fname = tp.get("filename")
            img = None
            if fname:
                path = os.path.join(self.base_dir, fname)
                try:
                    from PIL import Image

                    img = np.asarray(
                        Image.open(path).convert("RGB"), dtype=np.float32
                    ) / 255.0
                    if srgb:
                        # sRGB → linear (approximate).
                        img = img ** 2.2
                except Exception:
                    img = None
            if img is None:
                img = np.full((4, 4, 3), 0.5, np.float32)
            return self.builder.add_texture(img * mul)
        if ttype == "scale":
            s = float(tp.get("scale", tp.get("value", 1.0)))
            for ssub in sub:
                if ssub.tag == "texture":
                    return self._texture(ssub, srgb=srgb, mul=mul * s)
            return -1
        if ttype == "checkerboard":
            return self.builder.add_proc_texture(
                PROC_CHECKERBOARD, color0=spec("color0", 0.4) * mul,
                color1=spec("color1", 0.2) * mul, **uvkw)
        if ttype == "gridtexture":
            return self.builder.add_proc_texture(
                PROC_GRID, color0=spec("color0", 0.2) * mul,
                color1=spec("color1", 0.4) * mul,
                line_width=float(tp.get("lineWidth", 0.01)), **uvkw)
        if ttype == "wireframe":
            return self.builder.add_proc_texture(
                PROC_WIREFRAME, color0=spec("edgeColor", 0.1) * mul,
                color1=spec("interiorColor", 0.5) * mul,
                line_width=float(tp.get("lineWidth", 0.0)),
                step_width=min(max(float(tp.get("stepWidth", 0.5)), 0.0),
                               1.0))
        if ttype == "vertexcolors":
            return self.builder.add_proc_texture(PROC_MESHATTR)
        if ttype == "curvature":
            code = self.builder.add_proc_texture(PROC_MESHATTR)
            self.curvature_notes[code] = (
                tp.get("curvature", "gaussian"), float(tp.get("scale", 1.0)))
            return code
        return -1

    def _shape(self, el, base_dir, collect: list | None = None):
        """Parse one <shape>. With ``collect`` set, members are gathered
        into the list instead of added to the scene (shapegroup bodies)."""
        stype = _subst(el.get("type"), self.variables)
        p = _props(el, self.variables)
        to_world = p.get("toWorld", np.eye(4))
        motion = None
        if isinstance(to_world, tuple) and to_world[0] == "animation":
            frames = to_world[1]
            m0 = frames[0][1]
            m1 = frames[-1][1]
            motion = (m0, m1)
            to_world = m0  # geometry baked at the first keyframe
        flip = bool(p.get("flipNormals", False))

        if stype == "shapegroup":
            # Reference: src/shapes/shapegroup.cpp — a named, non-rendered
            # shape container for instancing.
            members: list = []
            for sub in el:
                if sub.tag == "shape":
                    self._shape(sub, base_dir, collect=members)
            if el.get("id"):
                self.shapegroups[el.get("id")] = members
            return
        if stype == "instance":
            # Reference: src/shapes/instance.cpp — flattened at build time
            # into transformed triangle copies (see TriSoup.transformed).
            for sub in el:
                if sub.tag == "ref" and sub.get("id") in self.shapegroups:
                    for soup, b_i, e_i, m_i in self.shapegroups[sub.get("id")]:
                        self.builder.add_shape(
                            soup.transformed(to_world), b_i, e_i, interior=m_i
                        )
            return

        bsdf_idx = None
        emitter_idx = -1
        interior_med = 0
        sss_idx = -1
        for sub in el:
            if sub.tag == "subsurface" and sub.get("type") == "dipole":
                # Dipole BSSRDF (reference: src/subsurface/dipole.cpp;
                # material presets from src/medium/materials.h).
                sp = _props(sub, self.variables)
                from ..render.subsurface import lookup_material

                if "sigmaS" in sp or "sigmaA" in sp:
                    sigma_s = np.asarray(sp.get("sigmaS", np.zeros(3))).reshape(-1)
                    sigma_a = np.asarray(sp.get("sigmaA", np.zeros(3))).reshape(-1)
                    sigma_s = np.broadcast_to(sigma_s, (3,)) if sigma_s.size != 3 else sigma_s
                    sigma_a = np.broadcast_to(sigma_a, (3,)) if sigma_a.size != 3 else sigma_a
                    eta_d = 1.3
                elif "sigmaT" in sp or "albedo" in sp:
                    sigma_t = np.broadcast_to(
                        np.asarray(sp.get("sigmaT", np.ones(3))).reshape(-1), (3,)
                    )
                    alb = np.broadcast_to(
                        np.asarray(sp.get("albedo", np.full(3, 0.8))).reshape(-1), (3,)
                    )
                    sigma_s = alb * sigma_t
                    sigma_a = sigma_t - sigma_s
                    eta_d = 1.3
                else:
                    sigma_s, sigma_a, eta_d = lookup_material(
                        sp.get("material", "skin1")
                    )
                scale = float(sp.get("scale", 1.0))
                int_ior = sp.get("intIOR", eta_d)
                ext_ior = float(sp.get("extIOR", 1.0))
                try:
                    eta = float(int_ior) / max(ext_ior, 1e-6)
                except (TypeError, ValueError):
                    eta = eta_d
                sss_idx = self.builder.add_subsurface(
                    sigma_s * scale, sigma_a * scale, g=0.0, eta=eta,
                    irr_samples=int(sp.get("irrSamples", 16)),
                    sample_multiplier=float(sp.get("sampleMultiplier", 1.0)),
                    quality=float(sp.get("quality", 0.2)),
                )
                continue
            if sub.tag == "ref":
                ref_id = sub.get("id")
                if ref_id in self.builder.bsdf_ids:
                    bsdf_idx = self.builder.bsdf_ids[ref_id]
            elif sub.tag == "bsdf":
                bsdf_idx = self._bsdf(sub)
            elif sub.tag == "emitter" and sub.get("type") == "area":
                ep = _props(sub, self.variables)
                rad = np.asarray(ep.get("radiance", np.ones(3))).reshape(3)
                emitter_idx = self.builder.add_emitter(rad)
            elif sub.tag == "medium" and sub.get("name", "interior") == "interior":
                # Per-shape interior medium (reference: Shape::addChild
                # medium handling, librender/shape.cpp).
                mp = _props(sub, self.variables)
                if sub.get("type") == "heterogeneous":
                    # Grid-density medium (reference: medium/heterogeneous.cpp
                    # + volume/gridvolume.cpp).
                    scale = float(mp.get("scale", 1.0))
                    density, v_lo, v_hi = None, None, None
                    g = 0.0
                    for ch in sub:
                        if ch.tag == "volume" and ch.get("name") == "density":
                            vp = _props(ch, self.variables)
                            if vp.get("filename"):
                                from .volume import load_vol

                                try:
                                    density, v_lo, v_hi = load_vol(
                                        os.path.join(self.base_dir, vp["filename"])
                                    )
                                except Exception:
                                    density = None
                        elif ch.tag == "phase":
                            g = float(_props(ch, self.variables).get("g", 0.0))
                    if density is None:  # unreadable/LFS stub → thin fog
                        density = np.ones((2, 2, 2), np.float32)
                        v_lo, v_hi = np.zeros(3), np.ones(3)
                    alb = np.asarray(mp.get("albedo", 0.8), dtype=np.float64).reshape(-1)
                    alb = alb if alb.size == 3 else np.full(3, float(alb[0]))
                    interior_med = self.builder.add_medium(
                        np.full(3, scale), alb, g,
                        density=density, vol_lo=v_lo, vol_hi=v_hi,
                    )
                    continue
                if "sigmaT" in mp:
                    sigma_t = np.asarray(mp["sigmaT"]).reshape(3)
                    albedo = np.asarray(mp.get("albedo", np.ones(3))).reshape(3)
                else:
                    sigma_s = np.asarray(mp.get("sigmaS", np.zeros(3))).reshape(3)
                    sigma_a = np.asarray(mp.get("sigmaA", np.zeros(3))).reshape(3)
                    sigma_t = sigma_s + sigma_a
                    albedo = np.where(
                        sigma_t > 0, sigma_s / np.maximum(sigma_t, 1e-20), 0.0
                    )
                g = 0.0
                for ph in sub:
                    if ph.tag == "phase":
                        g = float(_props(ph, self.variables).get("g", 0.0))
                interior_med = self.builder.add_medium(sigma_t, albedo, g)
        if bsdf_idx is None:
            if interior_med:
                # Medium-only shape: invisible null boundary
                # (reference: shapes with media but no BSDF pass rays).
                from .scene import BSDF_NULL

                bsdf_idx = self.builder.add_bsdf(BSDF_NULL)
            else:
                bsdf_idx = self.builder.add_bsdf(BSDF_DIFFUSE, albedo=np.full(3, 0.5))

        if stype == "rectangle":
            soup = shp.make_rectangle(to_world, flip)
        elif stype == "cube":
            soup = shp.make_cube(to_world, flip)
        elif stype == "sphere":
            center = np.zeros(3)
            for sub in el:
                if sub.tag == "point" and sub.get("name") == "center":
                    center = np.array(
                        [float(_subst(sub.get(ax, "0"), self.variables)) for ax in "xyz"]
                    )
            radius = float(p.get("radius", 1.0))
            soup = shp.make_sphere(center, radius, to_world, flip_normals=flip)
        elif stype == "disk":
            soup = shp.make_disk(to_world, flip_normals=flip)
        elif stype == "cylinder":
            def _pt(name, default):
                for sub in el:
                    if sub.tag == "point" and sub.get("name") == name:
                        return np.array(
                            [float(_subst(sub.get(ax, "0"), self.variables)) for ax in "xyz"]
                        )
                return np.asarray(default, dtype=np.float64)

            soup = shp.make_cylinder(
                _pt("p0", [0, 0, 0]), _pt("p1", [0, 0, 1]),
                float(p.get("radius", 1.0)), to_world, flip_normals=flip,
            )
        elif stype == "hair":
            fname = os.path.join(base_dir, p.get("filename"))
            soup = shp.load_hair(
                fname,
                radius=float(p.get("radius", 0.025)),
                to_world=to_world,
                reduction=float(p.get("reduction", 0.0)),
                angle_threshold_deg=float(p.get("angleThreshold", 1.0)),
            )
        elif stype == "obj":
            fname = os.path.join(base_dir, p.get("filename"))
            soup = shp.load_obj(
                fname, to_world, flip, face_normals=bool(p.get("faceNormals", False))
            )
        elif stype == "serialized":
            from .serialized import load_serialized

            fname = os.path.join(base_dir, p.get("filename"))
            mesh = load_serialized(fname, int(p.get("shapeIndex", 0)))
            if bool(p.get("faceNormals", False)):
                mesh["face_normals"] = True
            soup = shp.mesh_to_soup(mesh, to_world, flip)
        elif stype == "ply":
            from .serialized import load_ply

            fname = os.path.join(base_dir, p.get("filename"))
            mesh = load_ply(fname)
            if bool(p.get("faceNormals", False)):
                mesh["face_normals"] = True
            soup = shp.mesh_to_soup(mesh, to_world, flip)
        elif stype == "heightfield":
            # Reference: mitsuba/src/shapes/heightfield.cpp — height values
            # from 'filename' or a nested bitmap texture, scaled by 'scale'.
            scale = float(p.get("scale", 1.0))
            fname = p.get("filename", "")
            if not fname:
                for sub in el:
                    if sub.tag == "texture":
                        fname = _props(sub, self.variables).get("filename", "")
                        if fname:
                            break
            if not fname:
                return  # heightfield from a nested procedural height
                # texture: unsupported corner (file-based heights only)
            data = shp.load_height_data(os.path.join(base_dir, fname), scale)
            soup = shp.make_heightfield(
                data, to_world,
                shading_normals=bool(p.get("shadingNormals", True)),
                flip_normals=flip,
            )
        else:
            return  # unsupported shape type: skip
        if self.curvature_notes:
            code = self.builder.bsdfs[bsdf_idx].get("tex", -1)
            if code in self.curvature_notes:
                ck, cs = self.curvature_notes[code]
                soup = shp.bake_curvature(soup, kind=ck, scale=cs)
        if collect is not None:
            collect.append((soup, bsdf_idx, emitter_idx, interior_med))
        else:
            self.builder.add_shape(
                soup, bsdf_idx, emitter_idx, interior=interior_med,
                motion=motion, sss=sss_idx,
            )


def load_scene(path: str, overrides: dict | None = None) -> SceneBuilder:
    return XMLLoader(overrides).load(path)
