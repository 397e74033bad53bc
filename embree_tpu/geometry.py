"""Geometry types — the RTC_GEOMETRY_TYPE_* palette as host-side dataclasses.

Role parity with the reference's concrete geometry classes
(kernels/common/scene_triangle_mesh.h, scene_quad_mesh.h, scene_points.h,
scene_line_segments.h, scene_curves.h, scene_user_geometry.h,
scene_instance.cpp, scene_instance_array.cpp). Each type stores its buffers
(optionally two motion-blur time steps, rtcSetGeometryTimeStepCount analog),
a ray mask, an optional intersection filter, and enable/disable state.

Vertex buffers with a leading time axis (2, n, ...) declare 2-timestep linear
motion blur; traversal lerps by ray.time (RTCRayN time, rtcore_ray.h).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from .ops import curve as curve_ops

# primitive kind tags in the merged typed prim table
KIND_TRIANGLE = 0
KIND_QUAD = 1
KIND_SPHERE = 2
KIND_DISC = 3
KIND_ORIENTED_DISC = 4
KIND_ROUND_LINE = 5
KIND_FLAT_LINE = 6
KIND_USER = 7
KIND_CURVE_FLAT = 8    # cubic curve, ribbon intersector (native)
KIND_CURVE_ROUND = 9   # cubic curve, swept-circle Newton intersector (native)
KIND_CURVE_ORIENTED = 10  # normal-oriented ruled-surface intersector (native)

FilterFn = Callable  # (org, dir, t, u, v, ng, prim_id, geom_id) -> bool mask


def _split_timesteps(arr, name):
    """Accept (n, C) static or (2, n, C) 2-step motion buffers.

    All per-timestep buffers are 2-D, so a 3-D array unambiguously means a
    leading time axis (which must have length 2)."""
    a = np.asarray(arr, np.float32)
    if a.ndim == 3:
        assert a.shape[0] == 2, f"{name}: motion buffers need exactly 2 time steps"
        return a[0], a[1], True
    return a, a, False


@dataclasses.dataclass
class GeometryBase:
    mask: int = dataclasses.field(default=0xFFFFFFFF, init=False)
    enabled: bool = dataclasses.field(default=True, init=False)
    filter: Optional[FilterFn] = dataclasses.field(default=None, init=False)


@dataclasses.dataclass
class TriangleGeometry:
    """RTC_GEOMETRY_TYPE_TRIANGLE."""
    vertices: object             # (n_verts, 3) or (2, n_verts, 3) for motion
    indices: object              # (n_tris, 3) int
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        return np.asarray(self.indices).shape[0]


@dataclasses.dataclass
class QuadGeometry:
    """RTC_GEOMETRY_TYPE_QUAD."""
    vertices: object
    indices: object              # (n_quads, 4) int
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        return np.asarray(self.indices).shape[0]


@dataclasses.dataclass
class PointGeometry:
    """RTC_GEOMETRY_TYPE_{SPHERE,DISC,ORIENTED_DISC}_POINT."""
    points: object               # (n, 4) xyz+radius, or (2, n, 4)
    kind: str = "sphere"         # sphere | disc | oriented_disc
    normals: Optional[object] = None   # (n, 3) for oriented discs
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        a = np.asarray(self.points)
        return a.shape[1] if a.ndim == 3 else a.shape[0]


@dataclasses.dataclass
class LineSegmentsGeometry:
    """RTC_GEOMETRY_TYPE_{ROUND,FLAT,CONE}_LINEAR_CURVE line segments."""
    vertices: object             # (n_verts, 4) xyz+radius, or (2, n_verts, 4)
    indices: object              # (n_segs,) int: segment i = verts[idx[i]], verts[idx[i]+1]
    kind: str = "round"          # round | flat
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        return np.asarray(self.indices).shape[0]


@dataclasses.dataclass
class CurveGeometry:
    """RTC_GEOMETRY_TYPE_*_{BEZIER,BSPLINE,HERMITE,CATMULL_ROM}_CURVE.

    algorithm="native" (default) uses the reference's per-curve intersectors
    as jittable leaf tests: ribbon for flat curves
    (curve_intersector_ribbon.h) and the swept-circle Jacobian Newton solve
    for round curves (curve_intersector_sweep.h). algorithm="tessellate" is
    the opt-in ahead-of-time lowering into line-segment prims (ops/curve.py).
    tessellation_rate mirrors rtcSetGeometryTessellationRate (reference
    default 4, scene_curves.cpp:27) — segment count for ribbons and the
    tessellate fallback.
    """
    vertices: object             # (n_cp, 4) xyz+radius (hermite: positions)
    indices: object              # (n_curves,) int first-control-point index
    basis: str = curve_ops.BASIS_BEZIER
    kind: str = "round"          # round | flat | oriented
    tangents: Optional[object] = None  # (n_cp, 4) hermite tangents
    normals: Optional[object] = None   # (n_cp, 3) oriented-curve normals
    tessellation_rate: int = 8
    algorithm: str = "native"    # native | tessellate
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        n = np.asarray(self.indices).shape[0]
        if self.algorithm == "native" and self.basis != curve_ops.BASIS_LINEAR:
            return n
        return n * self.tessellation_rate


@dataclasses.dataclass
class UserGeometry:
    """RTC_GEOMETRY_TYPE_USER: user-supplied bounds + jittable intersect.

    The reference's RTCIntersectFunctionN callback (object_intersector.h)
    becomes a statically-composed jittable function:
      intersect_fn(local_prim_id, org, dir, tnear, tfar) -> (hit, t, u, v, ng)
    evaluated per candidate prim inside traversal.
    """
    bounds_lower: object         # (n, 3)
    bounds_upper: object         # (n, 3)
    intersect_fn: Callable = None
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        return np.asarray(self.bounds_lower).shape[0]


@dataclasses.dataclass
class InstanceGeometry:
    """RTC_GEOMETRY_TYPE_INSTANCE: a scene instanced under a transform.

    TPU-first divergence (documented): at commit, instanced geometry is
    flattened into the top scene's merged primitive table in world space (hit
    records still report the instanced scene's geomID + this instance's
    instID, matching instance_intersector.cpp semantics). Real two-level
    TLAS/BLAS traversal with shared BLAS memory arrives with the wavefront
    engine; flattening trades memory for dense single-level traversal.
    """
    scene: object                # embree_tpu.Scene (uncommitted or committed)
    transform: object            # (3, 4) affine, or (2, 3, 4) for motion blur
    mask: int = 0xFFFFFFFF
    enabled: bool = True

    @property
    def num_prims(self):
        return 0  # resolved at commit


@dataclasses.dataclass
class InstanceArrayGeometry:
    """RTC_GEOMETRY_TYPE_INSTANCE_ARRAY: one scene, N transforms
    (scene_instance_array.cpp). Flattened like InstanceGeometry."""
    scene: object
    transforms: object           # (N, 3, 4)
    mask: int = 0xFFFFFFFF
    enabled: bool = True

    @property
    def num_prims(self):
        return 0


@dataclasses.dataclass
class GridGeometry:
    """RTC_GEOMETRY_TYPE_GRID (rtcore_geometry.h:390 RTCGrid): regular grids
    of vertices, triangulated at commit. prim id = grid index; u/v span the
    whole grid (grid_soa parameterization analog)."""
    vertices: object             # (n_verts, 3) or (2, n_verts, 3)
    grids: object                # (n_grids, 4) int: startVert, stride, width, height
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        g = np.asarray(self.grids)
        return int(((g[:, 2] - 1) * (g[:, 3] - 1)).sum())


@dataclasses.dataclass
class SubdivisionGeometry:
    """RTC_GEOMETRY_TYPE_SUBDIVISION: Catmull-Clark surface.

    Uniformly subdivided `levels` times at commit (ops/subdiv.py; the
    ahead-of-time analog of the reference's cached feature-adaptive
    tessellation). Creases: {(v0,v1): weight}; boundary_interpolation mirrors
    RTC_SUBDIVISION_MODE smooth-boundary vs pin-corners."""
    vertices: object             # (n_verts, 3)
    face_counts: object          # (F,) verts per face
    indices: object              # flat indices
    levels: int = 2
    creases: Optional[dict] = None
    boundary_interpolation: bool = True
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None

    @property
    def num_prims(self):
        F = np.asarray(self.face_counts)
        per = np.where(F == 4, 4 ** (self.levels - 1) if self.levels else 1,
                       F * 4 ** max(self.levels - 1, 0))
        return int(per.sum())
