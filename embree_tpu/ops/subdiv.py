"""Catmull-Clark subdivision (host-side, numpy).

Behavior parity with the reference subdivision kernel (kernels/subdiv/:
catmullclark_ring.h vertex/edge/face rules, scene_subdiv_mesh.cpp half-edge
build; RTC_SUBDIVISION_MODE boundary handling rtcore_geometry.h:56-63).

TPU-first divergence (SURVEY.md §7 hard-part 6): the reference evaluates
patches lazily per-ray through a tessellation cache; here meshes are uniformly
subdivided ahead-of-time at commit into quads (feature-adaptive evaluation and
displacement callbacks operate on the refined mesh). Crease weights follow the
blended sharp/smooth rule: a crease of weight w >= 1 uses the sharp rule for
one more level then decrements (the DeRose fractional-sharpness scheme).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def _face_list(face_counts, indices):
    faces = []
    off = 0
    for c in face_counts:
        faces.append(list(indices[off:off + c]))
        off += c
    return faces


def catmull_clark(vertices: np.ndarray, face_counts: np.ndarray,
                  indices: np.ndarray, levels: int = 2,
                  creases: Optional[Dict[Tuple[int, int], float]] = None,
                  boundary_interpolation: bool = True):
    """Uniformly subdivide `levels` times.

    Args:
      vertices: (n, 3) float32.
      face_counts: (F,) verts per face (arbitrary valence).
      indices: flat vertex indices (sum(face_counts),).
      creases: optional {(v0, v1) sorted tuple: weight} edge crease map.
      boundary_interpolation: smooth boundary rule (True) vs corners pinned.
    Returns:
      (verts, quad_indices (Q, 4) int32, base_face (Q,) int32): the all-quad
      refined mesh + the base-face id each quad came from.
    """
    V = np.asarray(vertices, np.float64)
    faces = _face_list(np.asarray(face_counts, np.int64),
                       np.asarray(indices, np.int64))
    base = list(range(len(faces)))
    crease = dict(creases or {})

    for _ in range(max(levels, 0)):
        V, faces, base, crease = _subdivide_once(V, faces, base, crease,
                                                 boundary_interpolation)

    # after >=1 level everything is quads; with levels=0 fan-split non-quads
    quads = []
    qbase = []
    for f, b in zip(faces, base):
        if len(f) == 4:
            quads.append(f)
            qbase.append(b)
        elif len(f) == 3:
            quads.append([f[0], f[1], f[2], f[2]])
            qbase.append(b)
        else:
            for k in range(1, len(f) - 1):
                quads.append([f[0], f[k], f[k + 1], f[k + 1]])
                qbase.append(b)
    return (V.astype(np.float32), np.asarray(quads, np.int32),
            np.asarray(qbase, np.int32))


def _subdivide_once(V, faces, base, crease, smooth_boundary):
    nv = V.shape[0]
    # --- adjacency ---
    edge_faces: Dict[Tuple[int, int], List[int]] = {}
    for fi, f in enumerate(faces):
        n = len(f)
        for k in range(n):
            e = tuple(sorted((f[k], f[(k + 1) % n])))
            edge_faces.setdefault(e, []).append(fi)

    # --- face points ---
    fp = np.array([V[f].mean(axis=0) for f in faces])
    fp_idx = {fi: nv + fi for fi in range(len(faces))}

    # --- edge points ---
    ep_idx: Dict[Tuple[int, int], int] = {}
    ep_list = []
    next_id = nv + len(faces)
    for e, efs in edge_faces.items():
        mid = 0.5 * (V[e[0]] + V[e[1]])
        w = crease.get(e, 0.0)
        if len(efs) == 2 and w < 1.0:
            smooth = 0.25 * (V[e[0]] + V[e[1]] + fp[efs[0]] + fp[efs[1]])
            pt = (1 - w) * smooth + w * mid
        else:
            pt = mid  # boundary or sharp crease
        ep_idx[e] = next_id
        ep_list.append(pt)
        next_id += 1

    # --- vertex points ---
    # classify: collect incident edges + faces per vertex
    vert_edges: Dict[int, List[Tuple[int, int]]] = {}
    vert_faces: Dict[int, List[int]] = {}
    for e, efs in edge_faces.items():
        for v in e:
            vert_edges.setdefault(v, []).append(e)
        for fi in efs:
            pass
    for fi, f in enumerate(faces):
        for v in f:
            vert_faces.setdefault(v, []).append(fi)

    VP = V.copy()
    for v in range(nv):
        edges = vert_edges.get(v, [])
        fcs = vert_faces.get(v, [])
        if not edges:
            continue
        boundary_edges = [e for e in edges if len(edge_faces[e]) == 1]
        sharp_edges = [e for e in edges
                       if crease.get(e, 0.0) >= 1.0 or len(edge_faces[e]) == 1]
        if len(sharp_edges) >= 3:
            continue  # corner: pinned
        if len(sharp_edges) == 2:
            # crease/boundary vertex rule: (n0 + 6v + n1) / 8
            if not smooth_boundary and boundary_edges:
                continue
            o = [e[0] if e[1] == v else e[1] for e in sharp_edges]
            VP[v] = (V[o[0]] + 6.0 * V[v] + V[o[1]]) / 8.0
            continue
        n = len(fcs)
        if n == 0 or len(edges) != n:
            continue  # non-manifold-ish: leave in place
        Q = fp[fcs].mean(axis=0)
        R = np.array([0.5 * (V[e[0]] + V[e[1]]) for e in edges]).mean(axis=0)
        VP[v] = (Q + 2.0 * R + (n - 3.0) * V[v]) / n

    newV = np.concatenate([VP, fp, np.asarray(ep_list)], axis=0)

    # --- new faces: one quad per (face, corner) ---
    new_faces = []
    new_base = []
    for fi, f in enumerate(faces):
        n = len(f)
        for k in range(n):
            v = f[k]
            e_prev = tuple(sorted((f[(k - 1) % n], v)))
            e_next = tuple(sorted((v, f[(k + 1) % n])))
            new_faces.append([v, ep_idx[e_next], fp_idx[fi], ep_idx[e_prev]])
            new_base.append(base[fi])

    # --- propagate creases (decremented sharpness) ---
    new_crease: Dict[Tuple[int, int], float] = {}
    for e, w in crease.items():
        if w <= 0:
            continue
        ei = ep_idx.get(e)
        if ei is None:
            continue
        for v in e:
            ne = tuple(sorted((v, ei)))
            new_crease[ne] = max(w - 1.0, 0.0)
    return newV, new_faces, new_base, new_crease
