"""Embree tutorial XML scene loader.

Parses the scene format consumed by the reference's SceneGraph XML loader
(tutorials/common/scenegraph/xml_loader.cpp) — the format of every scene in
/root/reference/tests/primitives/*.xml and tutorials/models/*.xml — into an
embree_tpu Scene plus camera/light metadata. Only behavior is mirrored, not
code: this is a ~200-line ElementTree walk instead of a 2k-line DOM stack.

Supported elements: PerspectiveCamera, TriangleMesh, QuadMesh, GridMesh,
SubdivisionMesh, Curves (all 5 bases x flat/round/normal_oriented),
LineSegments, Points (sphere/disc/oriented), Transform/Group/Instance
(static affine), animated_positions (2-step motion), obj/hair legacy tags.
Materials are parsed to a Kd color (the viewer's default shader need);
lights are collected for the pathtracer.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from ..geometry import (CurveGeometry, GridGeometry, LineSegmentsGeometry,
                        PointGeometry, QuadGeometry, SubdivisionGeometry,
                        TriangleGeometry)


def _floats(text):
    if not text:
        return np.zeros(0, np.float32)
    return np.array(text.replace("+inf", "inf").split(), dtype=np.float32)


def _nums(node):
    if node is None or node.text is None:
        return np.zeros(0, np.float32)
    return _floats(node.text)


def _ints(node):
    return _nums(node).astype(np.int32)


def _buffer(elem, tag, comps):
    """Read <tag> (static) or <animated_tag> (2 time steps).
    Returns (n, comps), (2, n, comps), or None if absent."""
    anim = elem.find("animated_" + tag)
    if anim is not None:
        steps = [c for c in anim if c.tag in (tag, tag + "2")]
        arrs = [_nums(c).reshape(-1, comps) for c in steps[:2]]
        if len(arrs) == 1:
            arrs.append(arrs[0])
        return np.stack(arrs)
    node = elem.find(tag)
    if node is None:
        return None
    return _nums(node).reshape(-1, comps)


def _positions(elem, comps):
    return _buffer(elem, "positions", comps)


def _apply_xfm(xfm, pts, w=1.0):
    """Apply a (3,4) affine to (..., 3) points (w=1) or vectors (w=0)."""
    return pts @ xfm[:, :3].T + w * xfm[:, 3]


def _xfm_positions(xfm, pos, radius_col=False):
    if xfm is None:
        return pos
    scale = np.abs(np.linalg.det(xfm[:, :3])) ** (1.0 / 3.0)
    if radius_col:
        xyz = _apply_xfm(xfm, pos[..., :3])
        return np.concatenate([xyz, pos[..., 3:] * scale], axis=-1)
    return _apply_xfm(xfm, pos)


def _furball(elem, xfm):
    """Procedural fur ball (xml_loader.cpp:1312 loadFurBall): a triangle
    sphere + N hairs placed with the loader's manual LCG (seed 1234) —
    reproduced exactly so the models-tier goldens compare pixel-for-pixel."""
    p = lambda name, dv: float(elem.get(name, dv))
    r = p("radius", 10.0)
    slices = int(p("slices", 60))
    slabs = int(p("slabs", 60))
    nhairs = int(p("nhairs", 30000))
    # NOTE: int() truncation on the defaults mirrors the reference's
    # (accidental) int cast of parm_float for hairwidth/hairlength
    hairwidth = int(p("hairwidth", 0)) if elem.get("hairwidth") else r / 100.0
    hairlength = int(p("hairlength", 0)) if elem.get("hairlength") else r / 10.0
    ht = elem.get("hairtype", "bezier_round")
    basis, kind = (("linear", "flat") if ht == "linear_flat" else
                   ("linear", "round") if ht == "linear_round" else
                   tuple(ht.rsplit("_", 1)))
    kind = {"flat": "flat", "round": "round",
            "normaloriented": "oriented"}[kind]
    basis = {"catmulrom": "catmull_rom", "bezier": "bezier",
             "bspline": "bspline", "hermite": "hermite",
             "linear": "linear"}[basis]

    # --- sphere mesh ---
    nv = slices * (slabs - 1) + 2
    data = np.zeros((nv, 3), np.float32)
    phi = np.pi / slabs * (np.arange(1, slabs)[:, None])
    theta = 2.0 * np.pi / slices * np.arange(slices)[None, :]
    data[: slices * (slabs - 1)] = np.stack(
        [r * np.sin(phi) * np.cos(theta),
         (r * np.cos(phi)) * np.ones_like(theta),
         r * np.sin(phi) * np.sin(theta)], -1).reshape(-1, 3)
    top, bot = nv - 2, nv - 1
    data[top] = (0, r, 0)
    data[bot] = (0, -r, 0)
    tris = []
    sl = np.arange(slices)
    sl1 = (sl + 1) % slices
    tris.append(np.stack([np.full(slices, top), sl, sl1], -1))
    for slab in range(slabs - 2):
        a, b = slab * slices, (slab + 1) * slices
        tris.append(np.stack([a + sl, b + sl, b + sl1], -1))
        tris.append(np.stack([a + sl, b + sl1, a + sl1], -1))
    tris.append(np.stack([np.full(slices, bot), bot - slices - 1 + sl,
                          bot - slices - 1 + sl1], -1))
    tri_idx = np.concatenate(tris).astype(np.int32)
    geoms = [TriangleGeometry(_xfm_positions(xfm, data), tri_idx)]

    # --- hairs: manual LCG (glibc-like constants), exact bit sequence ---
    a_, c_, m_ = np.uint64(1103515245), np.uint64(12345), np.uint64(1 << 31)
    state = np.uint64(1234)
    n_draw = 2 + nhairs * 3 + (nhairs if basis == "bspline" else 0)
    seq = np.empty(max(n_draw, 8), np.float64)
    for i in range(seq.shape[0]):
        state = (a_ * state + c_) % m_
        seq[i] = float(state) / float(m_)
    k = 0

    def draw(n):
        nonlocal k
        v = seq[k:k + n]
        k += n
        return v

    t0 = 2.0 * np.pi * draw(1)[0]
    p0 = np.arccos(1 - 2 * draw(1)[0])
    last = np.array([np.sin(p0) * np.cos(t0), np.cos(p0),
                     np.sin(p0) * np.sin(t0)], np.float32)
    is_hermite = basis == "hermite"
    npts = 2 if is_hermite else 4
    pos = np.zeros((nhairs * npts, 4), np.float32)
    nrm = np.zeros((nhairs * npts, 3), np.float32)
    tans = np.zeros((nhairs * npts, 4), np.float32)
    for i in range(nhairs):
        th = 2.0 * np.pi * draw(1)[0]
        ph = np.arccos(1 - 2 * draw(1)[0])
        d = np.array([np.sin(ph) * np.cos(th), np.cos(ph),
                      np.sin(ph) * np.sin(th)], np.float32)
        pp = np.cross(d, last)
        pp = pp / max(np.linalg.norm(pp), 1e-20)
        last = pp
        start = d * r * (1.0 - 0.01 * hairlength)
        mid = d * r * (1.0 + 0.03 * hairlength)
        mid2 = d * r * (1.0 + 0.07 * hairlength)
        stop = d * r * (1.0 + 0.07 * hairlength
                        + 0.03 * hairlength * draw(1)[0])
        if basis == "bezier":
            stop = stop + pp * r * 0.051 * hairlength
        elif basis == "linear":
            mid = mid + pp * r * 0.001 * hairlength
            mid2 = mid2 + pp * r * 0.021 * hairlength
            stop = stop + pp * r * 0.051 * hairlength
        elif basis == "bspline":
            mid2 = mid2 + pp * r * 0.021 * hairlength
            stop = d * r * (1.0 + 0.07 * hairlength
                            + 0.13 * hairlength * draw(1)[0])
            stop = stop + pp * r * 0.081 * hairlength
        if is_hermite:
            pos[i * 2] = (*start, hairwidth)
            pos[i * 2 + 1] = (*stop, 0.0)
            td = d / np.linalg.norm(d)
            tm = pp / max(np.linalg.norm(pp), 1e-20)
            tans[i * 2] = (*td, 0.2)
            tans[i * 2 + 1] = (*tm, 0.8)
            n0 = np.cross(d, pp)
            nrm[i * 2] = nrm[i * 2 + 1] = n0 / max(np.linalg.norm(n0), 1e-20)
        else:
            pos[i * 4 + 0] = (*start, hairwidth)
            pos[i * 4 + 1] = (*mid, hairwidth)
            pos[i * 4 + 2] = (mid[0], mid2[1], mid2[2], hairwidth * 0.5)
            pos[i * 4 + 3] = (*stop, 0.0)
            if kind == "oriented":
                for j, (va, vb) in enumerate(((d, pp), (start - mid, pp),
                                              (mid - mid2, pp),
                                              (mid2 - stop, pp))):
                    n0 = np.cross(va, vb)
                    nrm[i * 4 + j] = n0 / max(np.linalg.norm(n0), 1e-20)
    if basis in ("bspline", "catmull_rom"):
        # tip-width tweak (xml_loader.cpp:1526)
        pos[1::4, 3] = 0.5 * hairwidth
        pos[2::4, 3] = 0.01 * hairwidth
        pos[3::4, 3] = 0.0
    # (fix_bspline_end_points only rewrites NaN control points — no-op here,
    # xml_loader.cpp:1166-1179)
    pos = _xfm_positions(xfm, pos, radius_col=True)
    if basis == "linear":
        idx = (np.arange(nhairs)[:, None] * 4
               + np.arange(3)[None, :]).reshape(-1).astype(np.int32)
        geoms.append(LineSegmentsGeometry(
            pos, idx, kind="round" if kind == "round" else "flat"))
    else:
        idx = (np.arange(nhairs) * npts).astype(np.int32)
        nr = nrm if kind == "oriented" else None
        if nr is not None and xfm is not None:
            nr = _apply_xfm(xfm, nr, w=0.0)
        geoms.append(CurveGeometry(
            pos, idx, basis=basis, kind=kind,
            tangents=tans if is_hermite else None, normals=nr))
    return geoms


class XMLScene:
    """Parsed scene: geometries + camera + lights + material colors."""

    def __init__(self):
        self.geometries = []        # list of embree_tpu geometry objects
        self.kd = []                # per-geometry Kd color (default shader)
        self.camera = None          # dict(from_, to, up, fov) or None
        self.cameras = {}           # name -> camera dict (--camera NAME)
        self.lights = []            # list of (type, params) tuples


def _parse_material_kd(elem):
    mat = elem.find("material")
    if mat is not None:
        for f3 in mat.iter("float3"):
            if f3.get("name") == "Kd":
                return _nums(f3)[:3]
    return np.array([0.5, 0.5, 0.5], np.float32)


def _rot_axis(axis, deg):
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    t = np.deg2rad(deg)
    c, s_, C = np.cos(t), np.sin(t), 1 - np.cos(t)
    x, y, z = a
    R = np.array([[c + x*x*C, x*y*C - z*s_, x*z*C + y*s_],
                  [y*x*C + z*s_, c + y*y*C, y*z*C - x*s_],
                  [z*x*C - y*s_, z*y*C + x*s_, c + z*z*C]])
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = R
    return out


def _parse_affine(node):
    """<AffineSpace>: 12/16 floats, or the attribute forms translate=/
    scale=/rotate_x|y|z=/axis+angle (xml_loader.cpp:374-399)."""
    for k in ("translate", "scale"):
        if node.get(k):
            v = _floats(node.get(k))
            out = np.zeros((3, 4), np.float32)
            if k == "translate":
                out[:, :3] = np.eye(3)
                out[:, 3] = v[:3]
            else:
                out[:, :3] = np.diag(v[:3] if v.size >= 3
                                     else np.repeat(v[0], 3))
            return out
    for ax, vec in (("rotate_x", (1, 0, 0)), ("rotate_y", (0, 1, 0)),
                    ("rotate_z", (0, 0, 1))):
        if node.get(ax):
            return _rot_axis(vec, float(node.get(ax)))
    if node.get("angle") and node.get("axis"):
        out = _rot_axis(_floats(node.get("axis")), float(node.get("angle")))
        if node.get("point"):
            p = _floats(node.get("point"))[:3]
            out[:, 3] = p - out[:, :3] @ p
        return out
    v = _nums(node)
    if v.size == 16:
        v = v.reshape(4, 4)[:3]
    else:
        v = v.reshape(3, 4)
    return v.astype(np.float32)


def _compose(a, b):
    if a is None:
        return b
    if b is None:
        return a
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = a[:, :3] @ b[:, :3]
    out[:, 3] = a[:, :3] @ b[:, 3] + a[:, 3]
    return out


def _add_geometry(out: XMLScene, elem, xfm):
    tag = elem.tag
    kd = _parse_material_kd(elem)

    if tag == "TriangleMesh" or tag == "Mesh":
        pos = _xfm_positions(xfm, _positions(elem, 3))
        idx = _ints(elem.find("triangles")).reshape(-1, 3)
        out.geometries.append(TriangleGeometry(pos, idx))
    elif tag == "QuadMesh":
        pos = _xfm_positions(xfm, _positions(elem, 3))
        idx = _ints(elem.find("indices")).reshape(-1, 4)
        out.geometries.append(QuadGeometry(pos, idx))
    elif tag == "GridMesh":
        pos = _xfm_positions(xfm, _positions(elem, 3))
        grids = _ints(elem.find("grids")).reshape(-1, 4)
        out.geometries.append(GridGeometry(pos, grids))
    elif tag == "SubdivisionMesh":
        pos = _xfm_positions(xfm, _positions(elem, 3))
        idx = _ints(elem.find("position_indices"))
        faces = _ints(elem.find("faces"))
        creases = {}
        ec = _ints(elem.find("edge_creases")).reshape(-1, 2)
        ew = _nums(elem.find("edge_crease_weights"))
        for (a, b), w in zip(ec, ew):
            creases[tuple(sorted((int(a), int(b))))] = float(w)
        vcreases = {}
        vc = elem.find("vertex_creases")
        if vc is not None:
            vids = _ints(vc)
            vws = _nums(elem.find("vertex_crease_weights"))
            for vid, w in zip(vids, vws):
                if w > 0:
                    vcreases[int(vid)] = float(w)
        # level 5 approximates the reference's adaptive tessellation of the
        # limit surface closely enough for golden-image parity
        out.geometries.append(SubdivisionGeometry(
            pos, faces, idx, levels=5, creases=creases or None,
            vertex_creases=vcreases or None))
    elif tag in ("Curves", "BezierCurves", "BSplineCurves", "BSplineHair",
                 "BezierHair", "Hair"):
        # per-tag defaults mirror loadNode's RTC type choices
        # (xml_loader.cpp:1850-1870): *Curves = round, *Hair = flat
        basis = elem.get("basis", "bezier")
        ctype = elem.get("type", "flat")
        if tag in ("BezierHair", "Hair"):
            basis, ctype = "bezier", "flat"
        elif tag == "BezierCurves":
            basis, ctype = "bezier", "round"
        elif tag == "BSplineHair":
            basis, ctype = "bspline", "flat"
        elif tag == "BSplineCurves":
            basis, ctype = "bspline", "round"
        pos = _xfm_positions(xfm, _positions(elem, 4), radius_col=True)
        idx = _ints(elem.find("indices"))
        if basis == "bspline":
            # NaN end control points trigger the b-spline edge rule
            # (xml_loader.cpp:1166 fix_bspline_end_points)
            pos = np.array(pos, np.float32)
            flat_steps = pos if pos.ndim == 3 else pos[None]
            for st in flat_steps:
                for i0 in idx:
                    v = st[i0:i0 + 4]
                    if np.isnan(v[0]).any():
                        v[0] = 2.0 * v[1] - v[2]
                    if np.isnan(v[3]).any():
                        v[3] = 2.0 * v[2] - v[1]
            pos = flat_steps if pos.ndim == 3 else flat_steps[0]
        if basis == "linear":
            out.geometries.append(LineSegmentsGeometry(
                pos, idx, kind="round" if ctype == "round" else "flat"))
        else:
            tan = _buffer(elem, "tangents", 4)
            nrm = _buffer(elem, "normals", 3)
            if nrm is not None and xfm is not None:
                nrm = _apply_xfm(xfm, nrm, w=0.0)
            kind = {"flat": "flat", "ribbon": "flat", "round": "round",
                    "surface": "round", "normal_oriented": "oriented"}[ctype]
            rate = int(float(elem.get("tessellation_rate", 4)))
            out.geometries.append(CurveGeometry(
                pos, idx, basis=basis, kind=kind, tangents=tan, normals=nrm,
                tessellation_rate=rate))
    elif tag == "FurBall":
        for g in _furball(elem, xfm):
            out.geometries.append(g)
            out.kd.append(kd)
        return True
    elif tag in ("LineSegments", "RoundLineSegments", "ConeSegments"):
        pos = _xfm_positions(xfm, _positions(elem, 4), radius_col=True)
        idx = _ints(elem.find("indices"))
        kind = "round" if tag != "LineSegments" else "flat"
        out.geometries.append(LineSegmentsGeometry(pos, idx, kind=kind))
    elif tag == "Points":
        ptype = elem.get("type", "sphere")
        pos = _xfm_positions(xfm, _positions(elem, 4), radius_col=True)
        nrm = _buffer(elem, "normals", 3)
        if nrm is not None and xfm is not None:
            nrm = _apply_xfm(xfm, nrm, w=0.0)
        kind = {"sphere": "sphere", "disc": "disc",
                "oriented": "oriented_disc",
                "oriented_disc": "oriented_disc"}[ptype]
        out.geometries.append(PointGeometry(pos, kind=kind, normals=nrm))
    else:
        return False
    out.kd.append(kd)
    return True


def _walk(out: XMLScene, elem, xfm):
    tag = elem.tag
    if tag == "PerspectiveCamera":
        cam = dict(
            from_=_floats(elem.get("from")), to=_floats(elem.get("to")),
            up=_floats(elem.get("up")), fov=float(elem.get("fov", 90)))
        if out.camera is None:
            out.camera = cam
        name = elem.get("name") or elem.get("id")
        if name:
            out.cameras[name] = cam
        return
    if tag in ("AmbientLight", "PointLight", "DirectionalLight", "DistantLight",
               "SpotLight", "QuadLight", "TriangleLight"):
        params = {c.tag: _nums(c) for c in elem}
        out.lights.append((tag, params))
        return
    if tag == "Transform":
        sub = None
        children = []
        for c in elem:
            if c.tag in ("AffineSpace",):
                sub = _parse_affine(c)
            else:
                children.append(c)
        new_xfm = _compose(xfm, sub)
        for c in children:
            _walk(out, c, new_xfm)
        return
    if tag in ("Group", "scene", "Instance", "Flatten"):
        for c in elem:
            _walk(out, c, xfm)
        return
    if _add_geometry(out, elem, xfm):
        return
    # unknown containers: recurse (covers extras like TimeRange wrappers)
    for c in elem:
        _walk(out, c, xfm)


def load_xml(path) -> XMLScene:
    root = ET.parse(path).getroot()
    out = XMLScene()
    _walk(out, root, None)
    return out


def to_scene(xs: XMLScene, **scene_kwargs):
    """Build an embree_tpu.Scene from a parsed XMLScene."""
    from ..scene import Scene
    s = Scene(**scene_kwargs)
    for g in xs.geometries:
        s.attach(g)
    return s
