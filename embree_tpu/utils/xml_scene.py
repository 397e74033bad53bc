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


class XMLScene:
    """Parsed scene: geometries + camera + lights + material colors."""

    def __init__(self):
        self.geometries = []        # list of embree_tpu geometry objects
        self.kd = []                # per-geometry Kd color (default shader)
        self.camera = None          # dict(from_, to, up, fov) or None
        self.lights = []            # list of (type, params) tuples


def _parse_material_kd(elem):
    mat = elem.find("material")
    if mat is not None:
        for f3 in mat.iter("float3"):
            if f3.get("name") == "Kd":
                return _nums(f3)[:3]
    return np.array([0.5, 0.5, 0.5], np.float32)


def _parse_affine(node):
    """<AffineSpace> 12 floats (row-major 3x4, xml_parser AffineSpace)."""
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
    elif tag == "Curves" or tag in ("BezierCurves", "BSplineHair", "BezierHair",
                                    "Hair"):
        basis = elem.get("basis", "bezier")
        ctype = elem.get("type", "flat")
        if tag in ("BezierHair", "Hair"):
            basis, ctype = "bezier", "flat"
        if tag == "BSplineHair":
            basis, ctype = "bspline", "flat"
        pos = _xfm_positions(xfm, _positions(elem, 4), radius_col=True)
        idx = _ints(elem.find("indices"))
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
            out.geometries.append(CurveGeometry(
                pos, idx, basis=basis, kind=kind, tangents=tan, normals=nrm))
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
        out.camera = dict(
            from_=_floats(elem.get("from")), to=_floats(elem.get("to")),
            up=_floats(elem.get("up")), fov=float(elem.get("fov", 90)))
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


def to_scene(xs: XMLScene):
    """Build an embree_tpu.Scene from a parsed XMLScene."""
    from ..scene import Scene
    s = Scene()
    for g in xs.geometries:
        s.attach(g)
    return s
