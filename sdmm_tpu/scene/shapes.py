"""Host-side shape → triangle-soup generation.

TPU-native replacement for the reference's shape plugins
(reference: mitsuba/src/shapes/{rectangle,cube,sphere,obj}.cpp): every shape
is lowered at load time to a flat triangle SoA that the wavefront intersector
consumes. Analytic shapes are tessellated; the unit-shape conventions match
Mitsuba 0.6 (rectangle: [-1,1]^2 in the xy-plane, +z normal; cube: [-1,1]^3;
sphere: unit radius at origin).
"""

from __future__ import annotations

import os

import numpy as np


def _transform_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ m[:3, :3].T + m[:3, 3]


def _transform_normals(m: np.ndarray, ns: np.ndarray) -> np.ndarray:
    inv_t = np.linalg.inv(m[:3, :3]).T
    out = ns @ inv_t.T
    norms = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(norms, 1e-20)


class TriSoup:
    """Accumulates triangles: vertices [T,3,3], shading normals [T,3,3],
    texture coordinates [T,3,2], optional per-corner colors [T,3,3]
    (mesh-attribute textures: vertexcolors / baked curvature —
    reference: src/textures/{vertexcolors,curvature}.cpp)."""

    def __init__(self):
        self.verts: list[np.ndarray] = []
        self.normals: list[np.ndarray] = []
        self.uvs: list[np.ndarray] = []
        self.colors: list[np.ndarray] = []
        self.has_colors = False

    def add(self, verts: np.ndarray, normals: np.ndarray | None = None,
            uvs: np.ndarray | None = None,
            colors: np.ndarray | None = None):
        verts = np.asarray(verts, dtype=np.float64).reshape(-1, 3, 3)
        if normals is None:
            e1 = verts[:, 1] - verts[:, 0]
            e2 = verts[:, 2] - verts[:, 0]
            n = np.cross(e1, e2)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            normals = np.repeat(n[:, None, :], 3, axis=1)
        if uvs is None:
            uvs = np.zeros((len(verts), 3, 2))
        if colors is None:
            colors = np.zeros((len(verts), 3, 3))
        else:
            self.has_colors = True
        self.verts.append(verts)
        self.normals.append(np.asarray(normals, dtype=np.float64).reshape(-1, 3, 3))
        self.uvs.append(np.asarray(uvs, dtype=np.float64).reshape(-1, 3, 2))
        self.colors.append(np.asarray(colors, dtype=np.float64).reshape(-1, 3, 3))

    def concat(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        if not self.verts:
            return (np.zeros((0, 3, 3)), np.zeros((0, 3, 3)),
                    np.zeros((0, 3, 2)), np.zeros((0, 3, 3)))
        return (
            np.concatenate(self.verts),
            np.concatenate(self.normals),
            np.concatenate(self.uvs),
            np.concatenate(self.colors),
        )

    def transformed(self, to_world: np.ndarray) -> "TriSoup":
        """A copy with ``to_world`` applied — used for instancing
        (reference: src/shapes/instance.cpp). Instances flatten to
        transformed triangle copies at build time: gather-friendly flat
        arrays instead of per-instance transform indirection."""
        v, n, uv, vc = self.concat()
        out = TriSoup()
        if len(v):
            out.add(
                _transform_points(to_world, v.reshape(-1, 3)).reshape(-1, 3, 3),
                _transform_normals(to_world, n.reshape(-1, 3)).reshape(-1, 3, 3),
                uv,
                vc if self.has_colors else None,
            )
        return out


def make_rectangle(to_world: np.ndarray, flip_normals: bool = False) -> TriSoup:
    corners = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=np.float64
    )
    tris = np.array([[corners[0], corners[1], corners[2]],
                     [corners[0], corners[2], corners[3]]])
    uv_c = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    uvs = np.array([[uv_c[0], uv_c[1], uv_c[2]], [uv_c[0], uv_c[2], uv_c[3]]])
    n = np.array([[0.0, 0.0, 1.0]])
    world = _transform_points(to_world, tris.reshape(-1, 3)).reshape(-1, 3, 3)
    wn = _transform_normals(to_world, n)
    if flip_normals:
        wn = -wn
        world = world[:, ::-1, :]
        uvs = uvs[:, ::-1, :]
    soup = TriSoup()
    soup.add(world, np.repeat(np.repeat(wn[None], 3, axis=1), 2, axis=0).reshape(-1, 3, 3), uvs)
    return soup


def make_cube(to_world: np.ndarray, flip_normals: bool = False) -> TriSoup:
    soup = TriSoup()
    # Six faces of [-1,1]^3, outward normals.
    faces = [
        # (axis, sign)
        (0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1),
    ]
    for axis, sign in faces:
        u_axis, v_axis = [a for a in range(3) if a != axis]
        corners = np.zeros((4, 3))
        corners[:, axis] = sign
        uv = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=np.float64)
        if sign < 0:
            uv = uv[:, ::-1]
        corners[:, u_axis] = uv[:, 0]
        corners[:, v_axis] = uv[:, 1]
        tris = np.array([[corners[0], corners[1], corners[2]],
                         [corners[0], corners[2], corners[3]]])
        world = _transform_points(to_world, tris.reshape(-1, 3)).reshape(-1, 3, 3)
        if flip_normals:
            world = world[:, ::-1, :]
        soup.add(world)
    return soup


def make_sphere(
    center: np.ndarray,
    radius: float,
    to_world: np.ndarray | None = None,
    n_theta: int = 32,
    n_phi: int = 64,
    flip_normals: bool = False,
) -> TriSoup:
    """Tessellated UV sphere with smooth shading normals."""
    theta = np.linspace(0.0, np.pi, n_theta + 1)
    phi = np.linspace(0.0, 2 * np.pi, n_phi + 1)
    t, p = np.meshgrid(theta, phi, indexing="ij")
    pts = np.stack(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], axis=-1
    )
    verts, normals = [], []
    for i in range(n_theta):
        for j in range(n_phi):
            quad = [pts[i, j], pts[i + 1, j], pts[i + 1, j + 1], pts[i, j + 1]]
            for tri in ([quad[0], quad[1], quad[2]], [quad[0], quad[2], quad[3]]):
                tri = np.asarray(tri)
                # Degenerate at poles.
                if np.linalg.norm(np.cross(tri[1] - tri[0], tri[2] - tri[0])) < 1e-12:
                    continue
                verts.append(tri)
                normals.append(tri.copy())
    verts = np.asarray(verts) * radius + np.asarray(center)
    normals = np.asarray(normals)
    if to_world is not None:
        verts = _transform_points(to_world, verts.reshape(-1, 3)).reshape(-1, 3, 3)
        normals = _transform_normals(to_world, normals.reshape(-1, 3)).reshape(-1, 3, 3)
    if flip_normals:
        normals = -normals
        verts = verts[:, ::-1, :]
    soup = TriSoup()
    soup.add(verts, normals)
    return soup


def make_disk(
    to_world: np.ndarray, n_phi: int = 64, flip_normals: bool = False
) -> TriSoup:
    """Unit disk in the z=0 plane (reference: src/shapes/disk.cpp),
    tessellated as a triangle fan with smooth +z normals."""
    phi = np.linspace(0.0, 2 * np.pi, n_phi + 1)
    rim = np.stack([np.cos(phi), np.sin(phi), np.zeros_like(phi)], axis=-1)
    verts, uvs = [], []
    center = np.zeros(3)
    for j in range(n_phi):
        tri = np.asarray([center, rim[j], rim[j + 1]])
        verts.append(tri)
        uvs.append(0.5 * (tri[:, :2] + 1.0))
    verts = np.asarray(verts)
    uvs = np.asarray(uvs)
    normals = np.broadcast_to(
        np.array([0.0, 0.0, 1.0]), verts.shape
    ).copy()
    verts_w = _transform_points(to_world, verts.reshape(-1, 3)).reshape(-1, 3, 3)
    normals_w = _transform_normals(to_world, normals.reshape(-1, 3)).reshape(-1, 3, 3)
    if flip_normals:
        normals_w = -normals_w
        verts_w = verts_w[:, ::-1, :]
        uvs = uvs[:, ::-1, :]
    soup = TriSoup()
    soup.add(verts_w, normals_w, uvs)
    return soup


def make_cylinder(
    p0: np.ndarray,
    p1: np.ndarray,
    radius: float,
    to_world: np.ndarray | None = None,
    n_phi: int = 32,
    flip_normals: bool = False,
) -> TriSoup:
    """Open cylinder from p0 to p1 (reference: src/shapes/cylinder.cpp),
    tessellated with smooth radial normals. Like the reference, the end
    caps are open."""
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    z = axis / max(length, 1e-12)
    # Orthonormal frame around the axis.
    a = np.array([1.0, 0.0, 0.0]) if abs(z[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(z, a)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    phi = np.linspace(0.0, 2 * np.pi, n_phi + 1)
    ring_n = np.outer(np.cos(phi), x) + np.outer(np.sin(phi), y)  # [n_phi+1, 3]
    lo = p0 + radius * ring_n
    hi = p1 + radius * ring_n
    verts, normals, uvs = [], [], []
    for j in range(n_phi):
        quad_v = [lo[j], hi[j], hi[j + 1], lo[j + 1]]
        quad_n = [ring_n[j], ring_n[j], ring_n[j + 1], ring_n[j + 1]]
        u0, u1 = phi[j] / (2 * np.pi), phi[j + 1] / (2 * np.pi)
        quad_uv = [[u0, 0], [u0, 1], [u1, 1], [u1, 0]]
        for idx in ([0, 1, 2], [0, 2, 3]):
            verts.append([quad_v[i] for i in idx])
            normals.append([quad_n[i] for i in idx])
            uvs.append([quad_uv[i] for i in idx])
    verts = np.asarray(verts)
    normals = np.asarray(normals)
    uvs = np.asarray(uvs, dtype=np.float64)
    if to_world is not None:
        verts = _transform_points(to_world, verts.reshape(-1, 3)).reshape(-1, 3, 3)
        normals = _transform_normals(to_world, normals.reshape(-1, 3)).reshape(-1, 3, 3)
    if flip_normals:
        normals = -normals
        verts = verts[:, ::-1, :]
        uvs = uvs[:, ::-1, :]
    soup = TriSoup()
    soup.add(verts, normals, uvs)
    return soup


def load_hair(
    filename: str,
    radius: float = 0.025,
    to_world: np.ndarray | None = None,
    n_sides: int = 4,
    reduction: float = 0.0,
    angle_threshold_deg: float = 1.0,
) -> TriSoup:
    """Hair fiber curves → cylinder tessellation.

    Parses the reference's two formats (src/shapes/hair.cpp:612-784): the
    "BINARY_HAIR" float32 stream where an inf x-coordinate marks a new
    fiber, and the whitespace text format where a blank line starts a new
    fiber. Nearly-collinear interior vertices are dropped (angleThreshold),
    and `reduction` randomly drops that fraction of fibers (with the
    radius enlarged to compensate, as the reference does).
    """
    fibers: list[np.ndarray] = []
    with open(filename, "rb") as f:
        header = f.read(11)
        if header == b"BINARY_HAIR":
            import struct

            (n_verts,) = struct.unpack("<I", f.read(4))
            data = np.frombuffer(f.read(4 * 3 * n_verts), dtype="<f4").reshape(-1, 3)
            cur: list[np.ndarray] = []
            for v in data:
                if np.isinf(v[0]):
                    if len(cur) >= 2:
                        fibers.append(np.asarray(cur))
                    cur = []
                else:
                    cur.append(v.astype(np.float64))
            if len(cur) >= 2:
                fibers.append(np.asarray(cur))
        else:
            f.seek(0)
            cur = []
            for line in f.read().decode("utf-8", "ignore").splitlines():
                parts = line.split()
                if len(parts) < 3:
                    if len(cur) >= 2:
                        fibers.append(np.asarray(cur))
                    cur = []
                    continue
                cur.append(np.array([float(x) for x in parts[:3]]))
            if len(cur) >= 2:
                fibers.append(np.asarray(cur))
    if reduction > 0:
        rng = np.random.default_rng(0)
        keep = rng.random(len(fibers)) >= reduction
        fibers = [fb for fb, k in zip(fibers, keep) if k]
        radius *= 1.0 / np.sqrt(max(1.0 - reduction, 1e-6))
    cos_thresh = np.cos(np.deg2rad(angle_threshold_deg))
    soup = TriSoup()
    for fiber in fibers:
        # Simplify: drop interior vertices where the turn is below threshold.
        pts = [fiber[0]]
        for i in range(1, len(fiber) - 1):
            d0 = fiber[i] - pts[-1]
            d1 = fiber[i + 1] - fiber[i]
            n0, n1 = np.linalg.norm(d0), np.linalg.norm(d1)
            if n0 < 1e-12:
                continue
            if n1 > 1e-12 and np.dot(d0, d1) / (n0 * n1) > cos_thresh:
                continue
            pts.append(fiber[i])
        pts.append(fiber[-1])
        for a, b in zip(pts[:-1], pts[1:]):
            if np.linalg.norm(b - a) < 1e-12:
                continue
            seg = make_cylinder(a, b, radius, n_phi=n_sides)
            soup.add(*seg.concat())
    if to_world is not None:
        soup = soup.transformed(to_world)
    return soup


def mesh_to_soup(
    mesh: dict, to_world: np.ndarray | None = None, flip_normals: bool = False,
) -> TriSoup:
    """Indexed mesh dict (positions/normals/faces) → triangle soup."""
    v = mesh["positions"]
    faces = mesh["faces"]
    vn = mesh.get("normals")
    vt = mesh.get("uv")
    vc = mesh.get("colors")
    if mesh.get("face_normals"):
        vn = None
    tri_v = v[faces]  # [F, 3, 3]
    tri_n = vn[faces] if vn is not None else None
    tri_uv = vt[faces] if vt is not None else None
    tri_c = vc[faces] if vc is not None else None
    if to_world is not None:
        tri_v = _transform_points(to_world, tri_v.reshape(-1, 3)).reshape(-1, 3, 3)
        if tri_n is not None:
            tri_n = _transform_normals(to_world, tri_n.reshape(-1, 3)).reshape(-1, 3, 3)
    # Drop degenerate triangles (zero-area).
    e1 = tri_v[:, 1] - tri_v[:, 0]
    e2 = tri_v[:, 2] - tri_v[:, 0]
    area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    keep = area2 > 1e-16
    tri_v = tri_v[keep]
    tri_n = tri_n[keep] if tri_n is not None else None
    tri_uv = tri_uv[keep] if tri_uv is not None else None
    tri_c = tri_c[keep] if tri_c is not None else None
    if flip_normals:
        tri_v = tri_v[:, ::-1, :]
        if tri_n is not None:
            tri_n = -tri_n[:, ::-1, :]
        if tri_uv is not None:
            tri_uv = tri_uv[:, ::-1, :]
        if tri_c is not None:
            tri_c = tri_c[:, ::-1, :]
    soup = TriSoup()
    if len(tri_v):
        soup.add(tri_v, tri_n, tri_uv, tri_c)
    return soup


def vertex_curvature(mesh: dict, kind: str = "gaussian") -> np.ndarray:
    """Discrete per-vertex curvature of an indexed mesh.

    Replaces the reference's per-hit second-fundamental-form curvature
    (src/textures/curvature.cpp eval → Shape::getCurvature over dndu/dndv)
    with the standard discrete operators baked per vertex at load time —
    TPU-first: the hot path then reads an interpolated vertex attribute
    instead of computing differential geometry per ray.

    kind="gaussian": angle defect K = (2π − Σ incident angles) / (A/3);
    kind="mean": cotangent Laplacian H = |Δp| / (2·A/3), signed by the
    mean normal direction.
    """
    v = np.asarray(mesh["positions"], dtype=np.float64)
    f = np.asarray(mesh["faces"], dtype=np.int64)
    nv = len(v)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    area = 0.5 * np.linalg.norm(fn, axis=-1)
    area = np.maximum(area, 1e-20)
    # Per-vertex barycentric area A/3 and mean normal.
    varea = np.zeros(nv)
    vnorm = np.zeros((nv, 3))
    for i in range(3):
        np.add.at(varea, f[:, i], area / 3.0)
        np.add.at(vnorm, f[:, i], fn)
    vnorm /= np.maximum(np.linalg.norm(vnorm, axis=-1, keepdims=True), 1e-20)

    if kind == "gaussian":
        defect = np.full(nv, 2.0 * np.pi)
        for i in range(3):
            a = v[f[:, i]]
            b = v[f[:, (i + 1) % 3]]
            c = v[f[:, (i + 2) % 3]]
            e1 = b - a
            e2 = c - a
            cosang = np.sum(e1 * e2, -1) / np.maximum(
                np.linalg.norm(e1, axis=-1) * np.linalg.norm(e2, axis=-1),
                1e-20)
            np.add.at(defect, f[:, i], -np.arccos(np.clip(cosang, -1, 1)))
        return defect / np.maximum(varea, 1e-20)

    # Mean curvature normal: Δp_i = Σ_j (cot α_ij + cot β_ij)(p_j − p_i)/2.
    lap = np.zeros((nv, 3))
    for i in range(3):
        ia, ib, ic = f[:, i], f[:, (i + 1) % 3], f[:, (i + 2) % 3]
        # Angle at c opposes edge (a, b).
        e1 = v[ia] - v[ic]
        e2 = v[ib] - v[ic]
        cot = np.sum(e1 * e2, -1) / np.maximum(
            np.linalg.norm(np.cross(e1, e2), axis=-1), 1e-20)
        w = 0.5 * cot
        np.add.at(lap, ia, w[:, None] * (v[ib] - v[ia]))
        np.add.at(lap, ib, w[:, None] * (v[ia] - v[ib]))
    h = np.linalg.norm(lap, axis=-1) / np.maximum(2.0 * varea, 1e-20)
    sign = np.where(np.sum(lap * vnorm, -1) < 0.0, 1.0, -1.0)
    return sign * h


def bake_curvature(soup: TriSoup, kind: str = "gaussian",
                   scale: float = 1.0) -> TriSoup:
    """Bake the curvature texture's color ramp into per-corner vertex
    colors (reference: src/textures/curvature.cpp eval + lookupGradient
    :74-81 — positive curvature → red, negative → blue). Works on any
    soup by welding coincident corners to recover mesh connectivity.

    Approximation note: the reference maps curvature→color at the HIT
    (using interpolated dndu/dndv); baking maps at vertices and
    interpolates colors — identical for same-sign neighborhoods since the
    ramp is piecewise linear, blending through purple instead of black at
    sign changes within a triangle.
    """
    v, n, uv, _ = soup.concat()
    if not len(v):
        return soup
    flat = v.reshape(-1, 3)
    ext = float(np.max(np.ptp(flat, axis=0))) or 1.0
    key = np.round(flat / (1e-6 * ext)).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True,
                              return_inverse=True)
    mesh = {"positions": flat[first], "faces": inv.reshape(-1, 3)}
    vals = vertex_curvature(mesh, kind)
    r = np.clip(vals * scale, 0.0, 1.0)
    b = np.clip(-vals * scale, 0.0, 1.0)
    cols = np.stack([r, np.zeros_like(r), b], axis=-1)
    out = TriSoup()
    out.add(v, n, uv, cols[inv.reshape(-1, 3)])
    return out


def check_lfs_stub(path: str) -> None:
    """Raise a clear error for git-lfs pointer stubs — the reference
    checkout stores large meshes/images via LFS and many are not
    materialized (SURVEY.md §7 'Reading LFS assets')."""
    try:
        with open(path, "rb") as f:
            head = f.read(40)
    except OSError:
        return
    if head.startswith(b"version https://git-lfs"):
        raise ValueError(
            f"{path}: git-lfs pointer stub, not the actual asset "
            "(the reference checkout lacks this LFS blob)"
        )


def load_obj(
    path: str, to_world: np.ndarray | None = None, flip_normals: bool = False,
    face_normals: bool = False,
) -> TriSoup:
    """OBJ loader (v/vn/vt/f with polygon fan triangulation).

    Replacement for the reference's obj.cpp shape plugin. Parsing runs in
    the native C++ loader (native/mesh_loader.cpp) when available — the
    reference's mesh IO is native too — with this Python implementation
    as the fallback and correctness oracle (they emit identical arrays;
    see tests/test_native.py).
    """
    from ..native import obj_load_native

    check_lfs_stub(path)
    nat = None if os.environ.get("SDMM_TPU_NO_NATIVE") else obj_load_native(path)
    if nat is not None:
        v_t, n_t, uv_t = nat
        if face_normals and len(v_t):
            e1 = v_t[:, 1] - v_t[:, 0]
            e2 = v_t[:, 2] - v_t[:, 0]
            fn = np.cross(e1, e2)
            fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
            n_t = np.repeat(fn[:, None, :], 3, axis=1)
        if to_world is not None and len(v_t):
            v_t = _transform_points(to_world, v_t.reshape(-1, 3)).reshape(-1, 3, 3)
            n_t = _transform_normals(to_world, n_t.reshape(-1, 3)).reshape(-1, 3, 3)
        if flip_normals and len(v_t):
            v_t = v_t[:, ::-1]
            n_t = -n_t[:, ::-1]
            uv_t = uv_t[:, ::-1]
        soup = TriSoup()
        if len(v_t):
            soup.add(v_t, n_t, uv_t)
        return soup

    vs: list[list[float]] = []
    vns: list[list[float]] = []
    vts: list[list[float]] = []
    faces: list[list[tuple[int, int, int]]] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                vs.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                vns.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                vts.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    parts = tok.split("/")
                    vi = int(parts[0])
                    ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
                    idx.append((vi, ti, ni))
                faces.append(idx)
    v = np.asarray(vs, dtype=np.float64)
    vn = np.asarray(vns, dtype=np.float64) if vns else None
    vt = np.asarray(vts, dtype=np.float64) if vts else None

    def res(i, n):
        return i - 1 if i > 0 else n + i

    tri_v, tri_n, tri_t = [], [], []
    for face in faces:
        for k in range(1, len(face) - 1):
            ids = [face[0], face[k], face[k + 1]]
            pv = np.array([v[res(i, len(v))] for i, _, _ in ids])
            tri_v.append(pv)
            if vn is not None and not face_normals and all(ni != 0 for _, _, ni in ids):
                tri_n.append(np.array([vn[res(ni, len(vn))] for _, _, ni in ids]))
            else:
                tri_n.append(None)
            if vt is not None and all(ti != 0 for _, ti, _ in ids):
                tri_t.append(np.array([vt[res(ti, len(vt))] for _, ti, _ in ids]))
            else:
                tri_t.append(None)
    soup = TriSoup()
    for pv, pn, pt in zip(tri_v, tri_n, tri_t):
        if to_world is not None:
            pv = _transform_points(to_world, pv)
            if pn is not None:
                pn = _transform_normals(to_world, pn)
        if flip_normals:
            pv = pv[::-1]
            if pn is not None:
                pn = -pn[::-1]
            if pt is not None:
                pt = pt[::-1]
        soup.add(pv[None], None if pn is None else pn[None],
                 None if pt is None else pt[None])
    return soup


def _round_pow2_plus_1(n: int) -> int:
    """Smallest 2^k + 1 >= n (reference rounds W-1/H-1 to powers of two,
    heightfield.cpp:512-513)."""
    n = max(n, 2)
    k = n - 1
    if k & (k - 1) == 0:
        return n
    return (1 << (k - 1).bit_length()) + 1


def load_height_data(path: str, scale: float = 1.0) -> np.ndarray:
    """Image file -> luminance height grid [H, W] (ITU-R 709 weights, as
    Bitmap::ELuminance; reference: heightfield.cpp:517-530)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "exr":
        from ..utils.exr import read_exr

        img = np.asarray(read_exr(path), dtype=np.float64)
    else:
        from PIL import Image

        img = np.asarray(Image.open(path), dtype=np.float64)
        if img.dtype.kind in "ui" or img.max() > 1.5:
            img = img / 255.0
    if img.ndim == 3:
        c = img.shape[-1]
        if c >= 3:
            img = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
                   + 0.072169 * img[..., 2])
        else:
            img = img[..., 0]
    return img * scale


def _resample_bilinear(data: np.ndarray, w: int, h: int) -> np.ndarray:
    """Clamped bilinear resample to (h, w). The reference uses its
    reconstruction filter (heightfield.cpp:522); bilinear is an adequate
    stand-in for height data."""
    h0, w0 = data.shape
    if (h0, w0) == (h, w):
        return data
    ys = np.linspace(0, h0 - 1, h)
    xs = np.linspace(0, w0 - 1, w)
    y0 = np.clip(np.floor(ys).astype(int), 0, h0 - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w0 - 1)
    y1 = np.minimum(y0 + 1, h0 - 1)
    x1 = np.minimum(x0 + 1, w0 - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    d00 = data[np.ix_(y0, x0)]
    d01 = data[np.ix_(y0, x1)]
    d10 = data[np.ix_(y1, x0)]
    d11 = data[np.ix_(y1, x1)]
    return (d00 * (1 - fy) * (1 - fx) + d01 * (1 - fy) * fx
            + d10 * fy * (1 - fx) + d11 * fy * fx)


def make_heightfield(
    data: np.ndarray,
    to_world: np.ndarray | None = None,
    shading_normals: bool = True,
    flip_normals: bool = False,
) -> TriSoup:
    """Height field -> triangle soup, the TPU-native reading of the
    reference's bilinear-patch min-max-mipmap shape
    (mitsuba/src/shapes/heightfield.cpp).

    The reference traverses a min-max mipmap per ray on the CPU; our
    compute path is a flat SoA triangle sweep/BVH on device, so the grid
    is tessellated at load time instead (2 triangles per cell). Object
    space matches the reference exactly: the (W, H) grid is resampled so
    W-1 and H-1 are powers of two (heightfield.cpp:510-513), placed on
    [-1,1]^2 in xy with z = height (translate(-1,-1,0) . scale(2/(W-1),
    2/(H-1), 1), heightfield.cpp:531-533); uv = grid/(W-1, H-1)
    (fillIntersectionRecord, :384).
    """
    data = np.asarray(data, dtype=np.float64)
    h0, w0 = data.shape
    w = _round_pow2_plus_1(w0)
    h = _round_pow2_plus_1(h0)
    data = _resample_bilinear(data, w, h)

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    obj = np.stack(
        [xs * (2.0 / (w - 1)) - 1.0, ys * (2.0 / (h - 1)) - 1.0, data],
        axis=-1,
    ).reshape(-1, 3)
    uv = np.stack([xs / (w - 1), ys / (h - 1)], axis=-1).reshape(-1, 2)

    # Per-vertex normals of z = f(x, y) in object space: (-df/dx, -df/dy, 1).
    # np.gradient uses central differences inside / one-sided at the border,
    # matching the reference's averaged patch normals to first order.
    dz_dy, dz_dx = np.gradient(data, 2.0 / (h - 1), 2.0 / (w - 1))
    vn = np.stack(
        [-dz_dx, -dz_dy, np.ones_like(data)], axis=-1
    ).reshape(-1, 3)
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-20)

    i = (ys[:-1, :-1] * w + xs[:-1, :-1]).reshape(-1)
    v00, v10, v01, v11 = i, i + 1, i + w, i + w + 1
    faces = np.concatenate(
        [np.stack([v00, v10, v11], axis=-1),
         np.stack([v00, v11, v01], axis=-1)], axis=0
    )
    mesh = {"positions": obj, "faces": faces, "uv": uv}
    if shading_normals:
        mesh["normals"] = vn
    else:
        mesh["face_normals"] = True
    return mesh_to_soup(mesh, to_world, flip_normals)
