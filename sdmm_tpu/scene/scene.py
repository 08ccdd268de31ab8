"""Scene container: host-side builder → device SoA arrays.

TPU-native equivalent of the reference's ``Scene``
(reference: mitsuba/src/librender/scene.cpp): instead of a shape list with
virtual dispatch and a kd-tree, the whole scene is lowered to flat arrays —
triangles, per-triangle BSDF/emitter ids, a BSDF parameter table, and an
emissive-triangle CDF for next-event estimation
(reference: Scene::sampleEmitterDirect, mitsuba/src/librender/scene.cpp).
``SceneData`` is a pytree of jnp arrays; static quantities (image size,
triangle count) live in ``RenderConfig``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.aabb import AABB
from ..core.spectrum import luminance
from .shapes import TriSoup

# BSDF type codes (wavefront dispatch masks; reference plugin equivalents in
# mitsuba/src/bsdfs/).
BSDF_DIFFUSE = 0
BSDF_CONDUCTOR = 1  # smooth, delta
BSDF_DIELECTRIC = 2  # smooth, delta
BSDF_ROUGHCONDUCTOR = 3
BSDF_PHONG = 4
BSDF_ROUGHPLASTIC = 5
BSDF_ROUGHDIELECTRIC = 6
BSDF_NULL = 7
BSDF_PLASTIC = 8
BSDF_WARD = 9  # anisotropic glossy (reference: bsdfs/ward.cpp)

# Procedural texture kinds (reference: src/textures/*.cpp).
PROC_CHECKERBOARD = 0
PROC_GRID = 1
PROC_MESHATTR = 2  # vertexcolors / curvature baked to vertex colors
PROC_WIREFRAME = 3
BSDF_BLEND = 10  # two-child mixture (reference: bsdfs/blendbsdf.cpp)
BSDF_MASK = 11  # opacity mask over a child (reference: bsdfs/mask.cpp)
BSDF_ROUGHDIFFUSE = 12  # Oren-Nayar (reference: bsdfs/roughdiffuse.cpp)
BSDF_DIFFTRANS = 13  # diffuse transmitter (reference: bsdfs/difftrans.cpp)
BSDF_COATING = 14  # dielectric layer over a child (reference: bsdfs/coating.cpp)
BSDF_HK = 15  # Hanrahan-Krueger single-scattering slab (reference: bsdfs/hk.cpp)
BSDF_IRAWAN = 16  # Irawan-Marschner woven cloth (reference: bsdfs/irawan.cpp)
BSDF_THINDIELECTRIC = 17  # thin slab, no refraction (reference: bsdfs/thindielectric.cpp)

DELTA_TYPES = (BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_NULL, BSDF_THINDIELECTRIC)


class SceneData(NamedTuple):
    """Device-side scene; every field is an array (jit-traceable pytree)."""

    # Triangles.
    tri_v0: jnp.ndarray  # [T, 3]
    tri_e1: jnp.ndarray  # [T, 3]
    tri_e2: jnp.ndarray  # [T, 3]
    tri_ng: jnp.ndarray  # [T, 3] geometric normal
    tri_ns: jnp.ndarray  # [T, 3, 3] per-vertex shading normals
    tri_uv: jnp.ndarray  # [T, 3, 2] texture coordinates
    tri_bsdf: jnp.ndarray  # [T] int32
    tri_emitter: jnp.ndarray  # [T] int32, -1 if not emissive
    # BSDF table.
    bsdf_type: jnp.ndarray  # [B] int32
    bsdf_albedo: jnp.ndarray  # [B, 3] diffuse reflectance
    bsdf_specular: jnp.ndarray  # [B, 3] specular reflectance / tint
    bsdf_alpha: jnp.ndarray  # [B] roughness
    bsdf_eta: jnp.ndarray  # [B] rel. IOR (int/ext)
    bsdf_k: jnp.ndarray  # [B, 3] conductor absorption
    bsdf_exponent: jnp.ndarray  # [B] phong exponent
    bsdf_tex: jnp.ndarray  # [B] int32 texture id for albedo (-1 = none)
    bsdf_alpha_v: jnp.ndarray  # [B] second roughness axis (ward)
    bsdf_bump: jnp.ndarray  # [B] int32 height-texture id (-1 = none)
    bsdf_bump_scale: jnp.ndarray  # [B]
    bsdf_child0: jnp.ndarray  # [B] int32 child BSDF id (blend/mask; -1 = none)
    bsdf_child1: jnp.ndarray  # [B] int32 second child (blend)
    bsdf_weight: jnp.ndarray  # [B] blend factor toward child1
    textures: jnp.ndarray  # [NT, R, R, 3] resampled texture stack
    # Procedural textures (reference: src/textures/{checkerboard,
    # gridtexture,wireframe,vertexcolors,curvature}.cpp). Encoded in
    # bsdf_tex as -(idx+2); rows: [kind, c0(3), c1(3), uscale, vscale,
    # uoffset, voffset, line_width, step_width]. [0, 13] = none.
    proc_tex: jnp.ndarray  # [NP, 13]
    tri_vc: jnp.ndarray  # [T, 9] per-corner mesh colors ([0, 9] = none)
    tri_eh: jnp.ndarray  # [T, 3] per-edge interior heights ([0, 3] = none)
    # Emitters.
    emitter_radiance: jnp.ndarray  # [E, 3]
    em_tri_idx: jnp.ndarray  # [M] triangle ids of emissive tris
    em_tri_cdf: jnp.ndarray  # [M] CDF over emissive tris (by power)
    em_tri_pdf: jnp.ndarray  # [M] discrete probability of each tri
    em_tri_area: jnp.ndarray  # [M]
    env_radiance: jnp.ndarray  # [3] constant environment / envmap scale
    env_map: jnp.ndarray  # [He, We, 3] equirect envmap ([1,1,3] zeros = none)
    env_to_world: jnp.ndarray  # [3, 3] envmap orientation
    # Envmap NEE importance tables (reference: src/emitters/envmap.cpp
    # builds a 2-D luminance CDF for sampleDirect). Row marginal CDF,
    # per-row conditional column CDF, and per-pixel solid-angle pdf.
    env_row_cdf: jnp.ndarray  # [He]
    env_col_cdf: jnp.ndarray  # [He, We]
    env_pdf: jnp.ndarray  # [He, We] pdf in solid angle
    env_select_prob: jnp.ndarray  # [] NEE routing prob to the envmap
    # Homogeneous medium table (reference: src/medium/homogeneous.cpp).
    # Row 0 is vacuum; further rows come from scene-level or per-shape
    # media. Rays carry a medium id; boundaries switch it (reference:
    # Shape interior/exterior medium pointers, render/shape.h).
    med_sigma_t: jnp.ndarray  # [M, 3] extinction
    med_albedo: jnp.ndarray  # [M, 3] single-scattering albedo sigma_s/sigma_t
    med_g: jnp.ndarray  # [M] Henyey-Greenstein anisotropy
    tri_medium: jnp.ndarray  # [T] int32 interior medium id (0 = vacuum)
    tri_medium_ext: jnp.ndarray  # [T] int32 exterior medium id
    ambient_med: jnp.ndarray  # [] int32 camera/ambient medium id
    # Heterogeneous media (reference: src/medium/heterogeneous.cpp +
    # src/volume/gridvolume.cpp): per-medium density-grid id (-1 =
    # homogeneous), grid bounds, and the Woodcock majorant density.
    med_vol: jnp.ndarray  # [M] int32 index into volumes (-1 = none)
    med_vol_lo: jnp.ndarray  # [M, 3]
    med_vol_inv_ext: jnp.ndarray  # [M, 3]
    med_majorant: jnp.ndarray  # [M] max density over the grid
    volumes: jnp.ndarray  # [NV, R, R, R] density grids ([1,1,1,1] = none)
    # Delta lights: point / spot / directional (reference:
    # src/emitters/{point,spot,directional}.cpp). kind: 0=point, 1=spot,
    # 2=directional (pos holds the direction TOWARD the light).
    pt_pos: jnp.ndarray  # [P, 3]
    pt_intensity: jnp.ndarray  # [P, 3] intensity (point/spot) or irradiance
    pt_kind: jnp.ndarray  # [P] int32
    pt_dir: jnp.ndarray  # [P, 3] spot axis
    pt_cutoff_cos: jnp.ndarray  # [P]
    pt_beam_cos: jnp.ndarray  # [P]
    pt_cdf: jnp.ndarray  # [P] selection CDF by power
    # Fraction of NEE samples sent to delta lights vs area lights.
    pt_select_prob: jnp.ndarray  # []
    # Sensor.
    cam_to_world: jnp.ndarray  # [4, 4]
    cam_tan_half_fov: jnp.ndarray  # [] tan(fov_x / 2)
    # Normalization domain for guiding.
    aabb_lo: jnp.ndarray  # [3]
    aabb_hi: jnp.ndarray  # [3]
    # BVH (threaded; see render/bvh.py). btri_* are leaf-ordered triangle
    # copies; btri_orig maps leaf slots back to original triangle ids.
    bvh_lo: jnp.ndarray  # [M, 3]
    bvh_hi: jnp.ndarray  # [M, 3]
    bvh_leaf_start: jnp.ndarray  # [M]
    bvh_leaf_count: jnp.ndarray  # [M]
    bvh_miss: jnp.ndarray  # [M]
    btri_v0: jnp.ndarray  # [T', 3]
    btri_e1: jnp.ndarray  # [T', 3]
    btri_e2: jnp.ndarray  # [T', 3]
    btri_orig: jnp.ndarray  # [T']
    # Pallas-kernel-native triangle layout: transposed [3, Tp] padded to the
    # kernel chunk (ops/intersect_pallas.py) — no per-call glue copies.
    ptri_v0: jnp.ndarray  # [3, Tp]
    ptri_e1: jnp.ndarray  # [3, Tp]
    ptri_e2: jnp.ndarray  # [3, Tp]
    # Irawan woven-cloth tables (reference: bsdfs/irawan.h WeavePattern).
    # One pattern per scene; rows are zeros when unused.
    iw_pattern: jnp.ndarray  # [th, tw] int32, 0-based yarn ids
    iw_yarns: jnp.ndarray  # [Y, 10] f32
    iw_kd: jnp.ndarray  # [Y, 3]
    iw_ks: jnp.ndarray  # [Y, 3]
    iw_consts: jnp.ndarray  # [12] f32
    # Rigid keyframe animation (reference: <animation name="toWorld"> on
    # shapes, core/track.h AnimatedTransform). Geometry is baked at t=0;
    # mot_m0/mot_m1 are the two keyframe matrices per animated shape and
    # tri_mot maps triangles to them (-1 = static). Consumed by the
    # motion-vector integrator (render/classic.py trace_motion).
    mot_m0: jnp.ndarray  # [Ms, 4, 4]
    mot_m1: jnp.ndarray  # [Ms, 4, 4]
    tri_mot: jnp.ndarray  # [T] int32
    # Cluster sweep (render/clas.py): Morton-ordered triangle clusters,
    # one wide component-major row per cluster.
    clas_lo: jnp.ndarray  # [C, 3]
    clas_hi: jnp.ndarray  # [C, 3]
    clas_rows: jnp.ndarray  # [C, 9*Tc]
    clas_ids: jnp.ndarray  # [C, Tc] original tri ids (-1 pad)
    clas_woop: jnp.ndarray  # [C, 12, Tc] Woop rows (ops/clas_pallas)
    clas_aabb: jnp.ndarray  # [8, Cp] padded AABB table (ops/clas_pallas)
    # Subsurface scattering (dipole BSSRDF; reference:
    # src/subsurface/dipole.cpp). The irradiance-octree query becomes a
    # preprocess bake of the dipole-convolved exitance onto triangle
    # corners (render/subsurface.py); render-time lookup is a barycentric
    # interpolation like shading normals.
    tri_sss: jnp.ndarray  # [T] int32 subsurface id (-1 = none)
    sss_eta: jnp.ndarray  # [S] relative IOR per subsurface instance
    sss_M: jnp.ndarray  # [T, 3, 3] baked per-corner exitance (rgb)


@dataclass
class RenderConfig:
    """Static render parameters (shape-determining; not traced)."""

    width: int = 256
    height: int = 256
    max_depth: int = 10
    rr_depth: int = 10
    nee: bool = True
    strict_normals: bool = True
    fov_axis: str = "x"
    # Static tuple of BSDF type codes present in the scene; shaders compile
    # only these models (wavefront specialization).
    bsdf_types: tuple = ()
    has_medium: bool = False  # compile-out flag for volumetric code
    has_hetero: bool = False  # any heterogeneous (grid-density) medium
    has_bump: bool = False  # compile-out flag for bump mapping
    has_sss: bool = False  # any dipole subsurface instance
    sss: tuple = ()  # host-side dipole bake parameter dicts
    sss_baked: bool = False  # set by render/subsurface.bake_subsurface


@dataclass
class SceneBuilder:
    soups: list[tuple[TriSoup, int, int]] = field(default_factory=list)
    shape_motion: list = field(default_factory=list)
    irawan_pattern: object = None  # WeavePattern (bsdf/irawan.py)
    bsdfs: list[dict] = field(default_factory=list)
    textures: list[np.ndarray] = field(default_factory=list)  # [R,R,3] each
    proc_textures: list[dict] = field(default_factory=list)
    texture_res: int = 256
    bsdf_ids: dict = field(default_factory=dict)
    emitters: list[np.ndarray] = field(default_factory=list)
    point_lights: list[dict] = field(default_factory=list)
    env_radiance: np.ndarray | None = None
    env_map: np.ndarray | None = None  # [He, We, 3]
    env_to_world: np.ndarray = field(default_factory=lambda: np.eye(3))
    medium: dict | None = None  # ambient {"sigma_t": [3], "albedo": [3], "g": float}
    subsurfaces: list = field(default_factory=list)  # dipole instances
    media: list = field(default_factory=list)  # per-shape medium rows
    cam_to_world: np.ndarray = field(default_factory=lambda: np.eye(4))
    fov_deg: float = 45.0
    fov_axis: str = "x"
    width: int = 256
    height: int = 256
    sample_count: int = 16
    seed: int = 1234
    sampler: str = "independent"
    rfilter: str = "box"
    max_depth: int = 10
    rr_depth: int = 10
    integrator: dict = field(default_factory=dict)

    def add_bsdf(self, btype: int, name: str | None = None, **params) -> int:
        entry = dict(
            type=btype,
            tex=int(params.get("tex", -1)),
            albedo=np.asarray(params.get("albedo", [0.5, 0.5, 0.5]), dtype=np.float64),
            specular=np.asarray(params.get("specular", [1.0, 1.0, 1.0]), dtype=np.float64),
            alpha=float(params.get("alpha", 0.1)),
            eta=float(params.get("eta", 1.5046)),
            k=np.asarray(params.get("k", [0.0, 0.0, 0.0]), dtype=np.float64),
            exponent=float(params.get("exponent", 30.0)),
            alpha_v=float(params.get("alpha_v", params.get("alpha", 0.1))),
            bump=int(params.get("bump", -1)),
            bump_scale=float(params.get("bump_scale", 1.0)),
            child0=int(params.get("child0", -1)),
            child1=int(params.get("child1", -1)),
            weight=float(params.get("weight", 0.5)),
        )
        self.bsdfs.append(entry)
        idx = len(self.bsdfs) - 1
        if name is not None:
            self.bsdf_ids[name] = idx
        return idx

    def add_texture(self, image: np.ndarray) -> int:
        """Register an RGB texture; resampled to texture_res on build."""
        img = np.asarray(image, dtype=np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        self.textures.append(img[..., :3])
        return len(self.textures) - 1

    def add_proc_texture(self, kind: int, color0=(0.4, 0.4, 0.4),
                         color1=(0.2, 0.2, 0.2), uscale: float = 1.0,
                         vscale: float = 1.0, uoffset: float = 0.0,
                         voffset: float = 0.0, line_width: float = 0.01,
                         step_width: float = 0.5) -> int:
        """Register a procedural texture; returns the encoded id -(idx+2)
        for ``bsdf_tex``. Kinds: PROC_CHECKERBOARD / PROC_GRID /
        PROC_MESHATTR (vertexcolors or baked curvature) / PROC_WIREFRAME
        (reference: src/textures/*.cpp; evaluated branchlessly per hit in
        bsdf._gather_raw instead of virtual Texture::eval calls)."""
        self.proc_textures.append(dict(
            kind=int(kind),
            color0=np.asarray(color0, np.float64).reshape(3),
            color1=np.asarray(color1, np.float64).reshape(3),
            uscale=float(uscale), vscale=float(vscale),
            uoffset=float(uoffset), voffset=float(voffset),
            line_width=float(line_width), step_width=float(step_width),
        ))
        return -(len(self.proc_textures) - 1) - 2

    def add_emitter(self, radiance: np.ndarray) -> int:
        self.emitters.append(np.asarray(radiance, dtype=np.float64))
        return len(self.emitters) - 1

    def add_point_light(self, position, intensity):
        self.point_lights.append({
            "kind": 0, "pos": np.asarray(position, dtype=np.float64),
            "intensity": np.asarray(intensity, dtype=np.float64),
            "dir": np.array([0.0, 0.0, 1.0]), "cutoff": 180.0, "beam": 180.0,
        })

    def add_spot_light(self, position, direction, intensity,
                       cutoff_deg=20.0, beam_deg=None):
        d = np.asarray(direction, dtype=np.float64)
        self.point_lights.append({
            "kind": 1, "pos": np.asarray(position, dtype=np.float64),
            "intensity": np.asarray(intensity, dtype=np.float64),
            "dir": d / np.linalg.norm(d),
            "cutoff": float(cutoff_deg),
            "beam": float(beam_deg if beam_deg is not None else cutoff_deg * 0.75),
        })

    def add_directional_light(self, direction, irradiance):
        d = np.asarray(direction, dtype=np.float64)
        self.point_lights.append({
            "kind": 2, "pos": -d / np.linalg.norm(d),  # toward the light
            "intensity": np.asarray(irradiance, dtype=np.float64),
            "dir": d / np.linalg.norm(d), "cutoff": 180.0, "beam": 180.0,
        })

    def add_collimated_light(self, origin, direction, power):
        """Collimated beam: doubly-delta (position + direction) emitter
        (reference: src/emitters/collimated.cpp). Unreachable by NEE
        (0-D response, sampleDirect pdf = 0 at collimated.cpp:126);
        contributes through light-tracing integrators (ptracer/bdpt)."""
        d = np.asarray(direction, dtype=np.float64)
        self.point_lights.append({
            "kind": 3, "pos": np.asarray(origin, dtype=np.float64),
            "intensity": np.asarray(power, dtype=np.float64),
            "dir": d / np.linalg.norm(d), "cutoff": 180.0, "beam": 180.0,
        })

    def add_medium(self, sigma_t, albedo=None, g: float = 0.0,
                   density: np.ndarray | None = None,
                   vol_lo=None, vol_hi=None) -> int:
        """Register a medium; returns its table id (≥ 1).

        ``density`` ([D, H, W] grid) makes the medium heterogeneous:
        sigma_t(x) = density(x)·sigma_t inside [vol_lo, vol_hi]
        (reference: src/medium/heterogeneous.cpp)."""
        entry = {
            "sigma_t": np.asarray(sigma_t, dtype=np.float64).reshape(3),
            "albedo": np.asarray(
                albedo if albedo is not None else np.ones(3), dtype=np.float64
            ).reshape(3),
            "g": float(g),
        }
        if density is not None:
            entry["density"] = np.asarray(density, dtype=np.float32)
            entry["vol_lo"] = np.asarray(
                vol_lo if vol_lo is not None else np.zeros(3), dtype=np.float64
            )
            entry["vol_hi"] = np.asarray(
                vol_hi if vol_hi is not None else np.ones(3), dtype=np.float64
            )
        self.media.append(entry)
        return len(self.media)  # row 0 is vacuum

    def add_subsurface(self, sigma_s, sigma_a, g=0.0, eta: float = 1.3,
                       irr_samples: int = 16,
                       sample_multiplier: float = 1.0,
                       quality: float = 0.2) -> int:
        """Register a dipole subsurface instance (reference:
        src/subsurface/dipole.cpp IsotropicDipole ctor + configure)."""
        self.subsurfaces.append({
            "sigma_s": np.asarray(sigma_s, dtype=np.float64).reshape(3),
            "sigma_a": np.asarray(sigma_a, dtype=np.float64).reshape(3),
            "g": np.broadcast_to(np.asarray(g, dtype=np.float64), (3,)).copy(),
            "eta": float(eta),
            "irr_samples": int(irr_samples),
            "sample_multiplier": float(sample_multiplier),
            "quality": float(quality),
        })
        return len(self.subsurfaces) - 1

    def add_shape(self, soup: TriSoup, bsdf: int, emitter: int = -1,
                  interior: int = 0, exterior: int = -1,
                  motion: tuple | None = None, sss: int = -1):
        """exterior = -1 uses the ambient medium at build time.
        ``motion``: (M0, M1) keyframe toWorld matrices (geometry is baked
        at M0). ``sss``: subsurface instance id from add_subsurface."""
        self.soups.append((soup, bsdf, emitter, interior, exterior, sss))
        self.shape_motion.append(motion)

    def set_sensor(self, to_world: np.ndarray, fov_deg: float, width: int, height: int,
                   fov_axis: str = "x"):
        self.cam_to_world = np.asarray(to_world, dtype=np.float64)
        self.fov_deg = float(fov_deg)
        self.width = int(width)
        self.height = int(height)
        self.fov_axis = fov_axis

    def _pt_cdf(self):
        if not self.point_lights:
            return np.zeros(0)
        power = np.asarray([luminance(l["intensity"]) for l in self.point_lights])
        power = np.maximum(power, 1e-20)
        return np.cumsum(power / power.sum())

    def _pt_select_prob(self, area_power: float):
        """Probability of routing an NEE sample to the delta-light set
        (balanced by total emitter power)."""
        if not self.point_lights:
            return 0.0
        pt_power = sum(
            4.0 * np.pi * luminance(l["intensity"]) for l in self.point_lights
        )
        if area_power <= 0.0:
            return 1.0
        return float(pt_power / (pt_power + area_power))

    def build(self, pad_tris_to: int | None = None) -> tuple[SceneData, RenderConfig]:
        # Ambient medium: scene-level fog becomes the last table row.
        ambient_id = 0
        media_rows = list(self.media)
        if self.medium is not None:
            media_rows.append({
                "sigma_t": np.asarray(self.medium.get("sigma_t", np.zeros(3))).reshape(3),
                "albedo": np.asarray(self.medium.get("albedo", np.ones(3))).reshape(3),
                "g": float(self.medium.get("g", 0.0)),
            })
            ambient_id = len(media_rows)

        all_v, all_n, all_uv, all_b, all_e, all_mi, all_me = [], [], [], [], [], [], []
        all_vc = []
        any_colors = False
        all_mot = []
        mot_mats = []  # (M0, M1) rows for animated shapes
        motion_list = list(self.shape_motion) + [None] * (
            len(self.soups) - len(self.shape_motion)
        )
        all_sss = []
        for entry, mot in zip(self.soups, motion_list):
            soup, bsdf_i, emitter_i = entry[0], entry[1], entry[2]
            interior_i = entry[3] if len(entry) > 3 else 0
            exterior_i = entry[4] if len(entry) > 4 else -1
            sss_i = entry[5] if len(entry) > 5 else -1
            if exterior_i < 0:
                exterior_i = ambient_id
            v, n, uv, vc = soup.concat()
            all_v.append(v)
            all_n.append(n)
            all_uv.append(uv)
            all_vc.append(vc)
            any_colors = any_colors or soup.has_colors
            all_b.append(np.full(len(v), bsdf_i, dtype=np.int32))
            all_e.append(np.full(len(v), emitter_i, dtype=np.int32))
            all_mi.append(np.full(len(v), interior_i, dtype=np.int32))
            all_me.append(np.full(len(v), exterior_i, dtype=np.int32))
            all_sss.append(np.full(len(v), sss_i, dtype=np.int32))
            if mot is not None:
                mot_mats.append(mot)
                all_mot.append(np.full(len(v), len(mot_mats) - 1, np.int32))
            else:
                all_mot.append(np.full(len(v), -1, np.int32))
        verts = np.concatenate(all_v) if all_v else np.zeros((0, 3, 3))
        normals = np.concatenate(all_n) if all_n else np.zeros((0, 3, 3))
        uvs = np.concatenate(all_uv) if all_uv else np.zeros((0, 3, 2))
        vcs = np.concatenate(all_vc) if all_vc else np.zeros((0, 3, 3))
        tri_bsdf = np.concatenate(all_b) if all_b else np.zeros(0, np.int32)
        tri_emitter = np.concatenate(all_e) if all_e else np.zeros(0, np.int32)
        tri_mot = np.concatenate(all_mot) if all_mot else np.zeros(0, np.int32)
        tri_medium = np.concatenate(all_mi) if all_mi else np.zeros(0, np.int32)
        tri_medium_ext = np.concatenate(all_me) if all_me else np.zeros(0, np.int32)
        tri_sss = np.concatenate(all_sss) if all_sss else np.zeros(0, np.int32)

        v0 = verts[:, 0]
        e1 = verts[:, 1] - verts[:, 0]
        e2 = verts[:, 2] - verts[:, 0]
        ng = np.cross(e1, e2)
        area2 = np.linalg.norm(ng, axis=-1)
        ng = ng / np.maximum(area2[:, None], 1e-20)

        # Emissive triangle CDF, weighted by power (area × luminance), matching
        # the reference's power-weighted emitter CDF (librender/scene.cpp).
        em_mask = tri_emitter >= 0
        em_idx = np.nonzero(em_mask)[0].astype(np.int32)
        if len(em_idx) > 0:
            areas = 0.5 * area2[em_idx]
            rad = np.array([self.emitters[tri_emitter[i]] for i in em_idx])
            power = areas * np.maximum(luminance(rad), 1e-20)
            pdf = power / power.sum()
            area_power_total = float(np.pi * power.sum())
            cdf = np.cumsum(pdf)
        else:
            areas = np.zeros(0)
            pdf = np.zeros(0)
            cdf = np.zeros(0)
            area_power_total = 0.0

        aabb = AABB.empty()
        if len(verts):
            aabb = aabb.expand(verts)

        # Pad triangle count (keeps jit shapes stable across scene edits).
        T = len(v0)
        if pad_tris_to is not None and pad_tris_to > T:
            pad = pad_tris_to - T
            v0 = np.concatenate([v0, np.zeros((pad, 3))])
            e1 = np.concatenate([e1, np.zeros((pad, 3))])
            e2 = np.concatenate([e2, np.zeros((pad, 3))])
            ng = np.concatenate([ng, np.tile([[0.0, 0.0, 1.0]], (pad, 1))])
            normals = np.concatenate([normals, np.tile(np.eye(3)[None, 2:3], (pad, 3, 1)).reshape(pad, 3, 3)])
            uvs = np.concatenate([uvs, np.zeros((pad, 3, 2))])
            vcs = np.concatenate([vcs, np.zeros((pad, 3, 3))])
            tri_bsdf = np.concatenate([tri_bsdf, np.zeros(pad, np.int32)])
            tri_emitter = np.concatenate([tri_emitter, np.full(pad, -1, np.int32)])
            tri_mot = np.concatenate([tri_mot, np.full(pad, -1, np.int32)])
            tri_medium = np.concatenate([tri_medium, np.zeros(pad, np.int32)])
            tri_medium_ext = np.concatenate(
                [tri_medium_ext, np.full(pad, ambient_id, np.int32)]
            )
            tri_sss = np.concatenate([tri_sss, np.full(pad, -1, np.int32)])

        if not self.bsdfs:
            self.add_bsdf(BSDF_DIFFUSE)
        f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
        i32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.int32)
        fov = np.deg2rad(self.fov_deg)

        # Texture stack: bilinear resample everything to a fixed resolution
        # so lookups are a single [NT, R, R, 3] gather.
        R = self.texture_res
        if self.textures:
            stack = np.zeros((len(self.textures), R, R, 3), np.float32)
            for ti, img in enumerate(self.textures):
                h_, w_ = img.shape[:2]
                yi = (np.arange(R) + 0.5) * h_ / R - 0.5
                xi = (np.arange(R) + 0.5) * w_ / R - 0.5
                y0 = np.clip(np.floor(yi).astype(int), 0, h_ - 1)
                x0 = np.clip(np.floor(xi).astype(int), 0, w_ - 1)
                stack[ti] = img[y0][:, x0]
        else:
            stack = np.zeros((1, 1, 1, 3), np.float32)

        # Envmap NEE tables: luminance x sin(theta) importance over the
        # equirect grid (reference: envmap.cpp CDF construction). The
        # solid-angle pdf of a pixel is lum * He * We / (2 pi^2 * total)
        # -- the sin(theta) of the area element cancels the row weight.
        if self.env_map is not None and self.env_map.shape[0] > 1:
            he, we = self.env_map.shape[:2]
            lum = np.maximum(luminance(self.env_map), 1e-12)
            sin_t = np.sin((np.arange(he) + 0.5) * np.pi / he)
            w2d = lum * sin_t[:, None]
            total = w2d.sum()
            row_w = w2d.sum(axis=1)
            env_row_cdf = np.cumsum(row_w) / total
            env_col_cdf = np.cumsum(w2d, axis=1) / np.maximum(
                row_w[:, None], 1e-30
            )
            env_pdf = lum * (he * we) / (2.0 * np.pi * np.pi * total)
            scale_lum = max(
                luminance(
                    self.env_radiance
                    if self.env_radiance is not None
                    else np.ones(3)
                ),
                1e-12,
            )
            # Relative power vs area + delta lights; scene bounding-sphere
            # radius sets the envmap's effective collection area.
            radius = float(
                np.linalg.norm(aabb.hi - aabb.lo) * 0.5 if len(verts) else 1.0
            )
            mean_rad = float(total / max(sin_t.sum() * we, 1e-30))
            env_power = 4.0 * np.pi ** 2 * mean_rad * scale_lum * max(radius, 1e-3) ** 2
            pt_power_total = sum(
                4.0 * np.pi * luminance(l["intensity"]) for l in self.point_lights
            )
            env_select = env_power / max(
                env_power + area_power_total + pt_power_total, 1e-30
            )
            env_select = float(np.clip(env_select, 0.1, 0.9)) if (
                area_power_total > 0 or pt_power_total > 0
            ) else 1.0
        else:
            env_row_cdf = np.ones(1)
            env_col_cdf = np.ones((1, 1))
            env_pdf = np.zeros((1, 1))
            env_select = 0.0

        # Heterogeneous-media density grids: nearest-resampled to a fixed
        # cube so lookups are one [NV, R, R, R] gather.
        RV = 64
        vol_ids = {}
        vol_list = []
        for i, m in enumerate(media_rows):
            if "density" in m:
                dgrid = m["density"]
                dd, hh, ww = dgrid.shape
                zi = np.clip(((np.arange(RV) + 0.5) * dd / RV).astype(int), 0, dd - 1)
                yi = np.clip(((np.arange(RV) + 0.5) * hh / RV).astype(int), 0, hh - 1)
                xi = np.clip(((np.arange(RV) + 0.5) * ww / RV).astype(int), 0, ww - 1)
                vol_list.append(dgrid[zi][:, yi][:, :, xi])
                vol_ids[i] = len(vol_list) - 1
        vol_stack = (
            np.stack(vol_list) if vol_list else np.zeros((1, 1, 1, 1), np.float32)
        )

        # Kernel-native transposed/padded triangle layout.
        from ..ops.intersect_pallas import TRI_CHUNK

        def ptri(arr):
            a = np.asarray(arr[: len(verts)], np.float32)
            pad_k = (-len(a)) % TRI_CHUNK
            if len(a) == 0:
                return np.zeros((3, TRI_CHUNK), np.float32)
            return np.pad(a, ((0, pad_k), (0, 0))).T

        # BVH over the real (unpadded) triangles.
        from ..render.bvh import build_bvh
        from ..render.clas import build_clusters

        clas = build_clusters(
            np.asarray(v0[: len(verts)], np.float32),
            np.asarray(e1[: len(verts)], np.float32),
            np.asarray(e2[: len(verts)], np.float32),
        )
        bvh = build_bvh(verts)
        perm = bvh["perm"]
        safe = np.maximum(perm, 0)
        sel = (perm >= 0)[:, None]
        btri_v0 = np.where(sel, v0[: len(verts)][safe] if T else np.zeros((len(perm), 3)), 0.0)
        btri_e1 = np.where(sel, e1[: len(verts)][safe] if T else np.zeros((len(perm), 3)), 0.0)
        btri_e2 = np.where(sel, e2[: len(verts)][safe] if T else np.zeros((len(perm), 3)), 0.0)
        if self.irawan_pattern is not None:
            from ..bsdf.irawan import build_tables as _iw_build

            iw = {k: np.asarray(v) for k, v in
                  _iw_build(self.irawan_pattern).items()}
        else:
            iw = {
                "pattern": np.zeros((1, 1), np.int32),
                "yarns": np.full((1, 10), 0.5, np.float32),
                "kd": np.zeros((1, 3), np.float32),
                "ks": np.zeros((1, 3), np.float32),
                "consts": np.full(12, 0.5, np.float32),
            }
        iw["pattern"] = jnp.asarray(iw["pattern"], jnp.int32)

        # Procedural texture rows + mesh-attribute tables. tri_vc / tri_eh
        # ship only when used — their shape[0] > 0 is the (static) gate
        # that widens surface_interaction's uv row to carry them.
        if self.proc_textures:
            need_wire = any(
                pt["kind"] == PROC_WIREFRAME for pt in self.proc_textures)
            rows = []
            for pi, pt in enumerate(self.proc_textures):
                lw = pt["line_width"]
                if pt["kind"] == PROC_WIREFRAME and lw <= 0.0:
                    # Auto line width = 10% of the mean edge length of the
                    # triangles actually using this texture (reference:
                    # wireframe.cpp:90-104 computes it per mesh).
                    code = -pi - 2
                    use_b = {bi for bi, b in enumerate(self.bsdfs)
                             if b.get("tex", -1) == code}
                    mask = np.isin(tri_bsdf[:T], np.asarray(sorted(use_b)))
                    if np.any(mask):
                        el = (np.linalg.norm(e1[:T][mask], axis=-1)
                              + np.linalg.norm(e2[:T][mask], axis=-1)
                              + np.linalg.norm(
                                  (e2[:T] - e1[:T])[mask], axis=-1))
                        lw = 0.1 * float(el.mean()) / 3.0
                    else:
                        lw = 0.01
                rows.append(np.concatenate([
                    [float(pt["kind"])], pt["color0"], pt["color1"],
                    [pt["uscale"], pt["vscale"], pt["uoffset"],
                     pt["voffset"], lw, pt["step_width"]],
                ]))
            proc_tex = np.stack(rows)
        else:
            need_wire = False
            proc_tex = np.zeros((0, 13))
        if need_wire and len(verts):
            area2_all = np.linalg.norm(np.cross(e1, e2), axis=-1)
            l_e1 = np.maximum(np.linalg.norm(e1, axis=-1), 1e-20)
            l_e2 = np.maximum(np.linalg.norm(e2, axis=-1), 1e-20)
            l_e12 = np.maximum(np.linalg.norm(e2 - e1, axis=-1), 1e-20)
            # h_i = 2·area / |edge opposite vertex i|; interior distance to
            # that edge's line is then bary_i · h_i (intersect.py).
            tri_eh = np.stack(
                [area2_all / l_e12, area2_all / l_e2, area2_all / l_e1],
                axis=-1)
        else:
            tri_eh = np.zeros((0, 3))
        tri_vc = vcs.reshape(-1, 9) if any_colors else np.zeros((0, 9))

        data = SceneData(
            tri_v0=f32(v0), tri_e1=f32(e1), tri_e2=f32(e2), tri_ng=f32(ng),
            tri_ns=f32(normals), tri_uv=f32(uvs),
            tri_bsdf=i32(tri_bsdf), tri_emitter=i32(tri_emitter),
            bsdf_type=i32([b["type"] for b in self.bsdfs]),
            bsdf_albedo=f32([b["albedo"] for b in self.bsdfs]),
            bsdf_specular=f32([b["specular"] for b in self.bsdfs]),
            bsdf_alpha=f32([b["alpha"] for b in self.bsdfs]),
            bsdf_eta=f32([b["eta"] for b in self.bsdfs]),
            bsdf_k=f32([b["k"] for b in self.bsdfs]),
            bsdf_exponent=f32([b["exponent"] for b in self.bsdfs]),
            bsdf_tex=i32([b.get("tex", -1) for b in self.bsdfs]),
            bsdf_alpha_v=f32([b.get("alpha_v", b["alpha"]) for b in self.bsdfs]),
            bsdf_bump=i32([b.get("bump", -1) for b in self.bsdfs]),
            bsdf_bump_scale=f32([b.get("bump_scale", 1.0) for b in self.bsdfs]),
            bsdf_child0=i32([b.get("child0", -1) for b in self.bsdfs]),
            bsdf_child1=i32([b.get("child1", -1) for b in self.bsdfs]),
            bsdf_weight=f32([b.get("weight", 0.5) for b in self.bsdfs]),
            textures=f32(stack),
            proc_tex=f32(proc_tex),
            tri_vc=f32(tri_vc),
            tri_eh=f32(tri_eh),
            emitter_radiance=f32(np.asarray(self.emitters).reshape(-1, 3))
            if self.emitters else f32(np.zeros((1, 3))),
            em_tri_idx=i32(em_idx), em_tri_cdf=f32(cdf), em_tri_pdf=f32(pdf),
            em_tri_area=f32(areas),
            env_radiance=f32(self.env_radiance if self.env_radiance is not None else np.zeros(3)),
            env_map=f32(
                self.env_map if self.env_map is not None else np.zeros((1, 1, 3))
            ),
            env_to_world=f32(self.env_to_world),
            env_row_cdf=f32(env_row_cdf),
            env_col_cdf=f32(env_col_cdf),
            env_pdf=f32(env_pdf),
            env_select_prob=f32(env_select),
            pt_pos=f32(np.asarray([l["pos"] for l in self.point_lights]).reshape(-1, 3)),
            pt_intensity=f32(
                np.asarray([l["intensity"] for l in self.point_lights]).reshape(-1, 3)
            ),
            pt_kind=i32([l["kind"] for l in self.point_lights]),
            pt_dir=f32(np.asarray([l["dir"] for l in self.point_lights]).reshape(-1, 3)),
            pt_cutoff_cos=f32([np.cos(np.deg2rad(l["cutoff"])) for l in self.point_lights]),
            pt_beam_cos=f32([np.cos(np.deg2rad(l["beam"])) for l in self.point_lights]),
            pt_cdf=f32(self._pt_cdf()),
            pt_select_prob=f32(self._pt_select_prob(area_power_total)),
            med_sigma_t=f32(
                np.concatenate([
                    np.zeros((1, 3)),
                    np.asarray([m["sigma_t"] for m in media_rows]).reshape(-1, 3),
                ])
            ),
            med_albedo=f32(
                np.concatenate([
                    np.ones((1, 3)),
                    np.asarray([m["albedo"] for m in media_rows]).reshape(-1, 3),
                ])
            ),
            med_g=f32(np.concatenate([[0.0], [m["g"] for m in media_rows]])),
            tri_medium=i32(tri_medium),
            tri_medium_ext=i32(tri_medium_ext),
            ambient_med=i32(ambient_id),
            med_vol=i32([-1] + [
                (vol_ids[i] if "density" in m else -1)
                for i, m in enumerate(media_rows)
            ]),
            med_vol_lo=f32(np.stack(
                [np.zeros(3)] + [m.get("vol_lo", np.zeros(3)) for m in media_rows]
            ) if media_rows else np.zeros((1, 3))),
            med_vol_inv_ext=f32(np.stack(
                [np.ones(3)]
                + [
                    1.0 / np.maximum(
                        m.get("vol_hi", np.ones(3)) - m.get("vol_lo", np.zeros(3)),
                        1e-12,
                    )
                    for m in media_rows
                ]
            ) if media_rows else np.ones((1, 3))),
            med_majorant=f32([0.0] + [
                float(m["density"].max()) if "density" in m else 1.0
                for m in media_rows
            ]),
            volumes=f32(vol_stack),
            cam_to_world=f32(self.cam_to_world),
            cam_tan_half_fov=f32(np.tan(0.5 * fov)),
            aabb_lo=f32(aabb.lo if len(verts) else np.zeros(3)),
            aabb_hi=f32(aabb.hi if len(verts) else np.ones(3)),
            bvh_lo=f32(bvh["lo"]), bvh_hi=f32(bvh["hi"]),
            bvh_leaf_start=i32(bvh["leaf_start"]),
            bvh_leaf_count=i32(bvh["leaf_count"]),
            bvh_miss=i32(bvh["miss"]),
            btri_v0=f32(btri_v0), btri_e1=f32(btri_e1), btri_e2=f32(btri_e2),
            btri_orig=i32(perm),
            ptri_v0=f32(ptri(v0)), ptri_e1=f32(ptri(e1)), ptri_e2=f32(ptri(e2)),
            iw_pattern=iw["pattern"], iw_yarns=f32(iw["yarns"]),
            iw_kd=f32(iw["kd"]), iw_ks=f32(iw["ks"]),
            iw_consts=f32(iw["consts"]),
            mot_m0=f32(np.stack([m[0] for m in mot_mats])
                       if mot_mats else np.eye(4)[None]),
            mot_m1=f32(np.stack([m[1] for m in mot_mats])
                       if mot_mats else np.eye(4)[None]),
            tri_mot=i32(tri_mot),
            clas_lo=f32(clas["lo"]), clas_hi=f32(clas["hi"]),
            clas_rows=f32(clas["rows"]), clas_ids=i32(clas["ids"]),
            clas_woop=f32(clas["woop"]), clas_aabb=f32(clas["aabb"]),
            tri_sss=i32(tri_sss),
            sss_eta=f32([s["eta"] for s in self.subsurfaces]
                        if self.subsurfaces else [1.0]),
            sss_M=f32(np.zeros((len(tri_sss), 3, 3))),
        )
        cfg = RenderConfig(
            width=self.width, height=self.height, max_depth=self.max_depth,
            rr_depth=self.rr_depth, fov_axis=self.fov_axis,
            bsdf_types=tuple(sorted({int(b["type"]) for b in self.bsdfs})),
            has_medium=self.medium is not None or len(self.media) > 0,
            has_hetero=any("density" in m for m in media_rows),
            has_bump=any(b.get("bump", -1) != -1 for b in self.bsdfs),
            has_sss=bool(self.subsurfaces) and bool((tri_sss >= 0).any()),
            sss=tuple(self.subsurfaces),
        )
        return data, cfg
