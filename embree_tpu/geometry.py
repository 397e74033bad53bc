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
KIND_CURVE_DISTANCE = 11  # min-distance hair fallback (native)

FilterFn = Callable  # (org, dir, t, u, v, ng, prim_id, geom_id) -> bool mask


MAX_TIME_STEPS = 129   # reference RTC_MAX_TIME_STEP_COUNT (rtcore_common.h:54)


def _sample_steps(arr, t, time_range=(0.0, 1.0)):
    """Evaluate an (S, n, C) piecewise-linear motion buffer at global time
    t (host numpy; the itime/ftime split of the reference's
    Geometry::timeSegment, kernels/common/default.h:223 getTimeSegment).
    The buffer's knots span time_range (rtcSetGeometryTimeRange,
    rtcore_geometry.h:151); outside the range the boundary segment is
    linearly EXTRAPOLATED — itime is clamped but ftime is not, exactly the
    reference clamp(floor(.),0,S-2) + unclamped fraction. 2-D (static)
    buffers pass through."""
    a = np.asarray(arr, np.float32)
    if a.ndim == 2:
        return a
    S = a.shape[0]
    r0, r1 = float(time_range[0]), float(time_range[1])
    x = (float(t) - r0) / (r1 - r0) * (S - 1)
    k = min(max(int(np.floor(x)), 0), S - 2)
    w = np.float32(x - k)
    if w == 0.0:
        return a[k]
    return ((1.0 - w) * a[k] + w * a[k + 1]).astype(np.float32)


def _split_timesteps(arr, name, window=(0.0, 1.0), time_range=(0.0, 1.0)):
    """Accept (n, C) static or (S, n, C) S-step motion buffers (S in
    [2, 129], rtcSetGeometryTimeStepCount analog) and return the motion
    endpoints of the given time window, sampled piecewise-linearly.

    All per-timestep buffers are 2-D, so a 3-D array unambiguously means a
    leading time axis. Multi-step (S > 2) buffers are exact because the
    scene merger splits prims at every interior knot time first (time-sliced
    replication — the MSMBlur time-split analog), so each window lies
    within one linear segment. A sub-[0,1] time_range shifts the knot grid
    (and extrapolates beyond it); window endpoints sampled with
    extrapolation keep per-window linearity exact because the boundary
    segments extend linearly to ±inf."""
    a = np.asarray(arr, np.float32)
    if a.ndim == 3:
        S = a.shape[0]
        assert 2 <= S <= MAX_TIME_STEPS, \
            f"{name}: motion buffers need 2..{MAX_TIME_STEPS} time steps"
        return (_sample_steps(a, window[0], time_range),
                _sample_steps(a, window[1], time_range), True)
    return a, a, False


def motion_knots(arrays, window, time_range=(0.0, 1.0)):
    """Interior knot times of S-step motion buffers falling strictly inside
    the window — the prim replication boundaries for time slicing. Knot k
    of an S-step buffer sits at global time
    time_range[0] + (time_range[1]-time_range[0]) * k/(S-1)
    (Geometry::timeStep, kernels/common/geometry.h:341)."""
    ks = set()
    r0, r1 = float(time_range[0]), float(time_range[1])
    for a in arrays:
        if a is None:
            continue
        a = np.asarray(a)
        if a.ndim == 3 and a.shape[0] > 2:
            S = a.shape[0]
            for k in range(1, S - 1):
                t = r0 + (r1 - r0) * k / (S - 1)
                if window[0] < t < window[1]:
                    ks.add(t)
    return sorted(ks)


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
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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
    normal_derivatives: Optional[object] = None  # (n_cp, 3) hermite
    #   oriented-curve normal derivatives (RTC_BUFFER_TYPE_NORMAL_DERIVATIVE)
    tessellation_rate: int = 4   # reference default, scene_curves.cpp
    algorithm: str = "native"    # native | tessellate
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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

    transform: (3,4) affine; (S,3,4) S-step motion (linear matrix lerp per
    segment); or a sequence of core.math.QuaternionDecomposition for
    quaternion motion blur (rtcSetGeometryTransformQuaternion analog) —
    resampled onto a refined knot grid at commit, see
    instance_transform_steps.
    """
    scene: object                # embree_tpu.Scene (uncommitted or committed)
    transform: object            # see class docstring
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    # rtcSetGeometryTimeRange on the instance: transform knots span
    # [start, end]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

    @property
    def num_prims(self):
        return 0  # resolved at commit


QUAT_RESAMPLE = 8   # sub-knots per quaternion motion segment


def instance_transform_steps(g):
    """Resolve an instance's transform spec to a (3,4) static affine or an
    (S,3,4) knot stack of affines.

    Quaternion decompositions (motion_derivative.h role) are slerp-evaluated
    at QUAT_RESAMPLE sub-knots per segment and linearly interpolated in
    between — a piecewise-linear approximation of the exact rotational
    motion with O(1/QUAT_RESAMPLE^2) bound error, which then rides the
    same time-sliced replication machinery as multi-step vertex motion."""
    tr = g.transform
    if isinstance(tr, (list, tuple)) and len(tr) and hasattr(tr[0], "quat"):
        from .core.math import qd_interpolate
        L = len(tr)
        if L == 1:
            return np.asarray(tr[0].to_affine(), np.float32)
        q = QUAT_RESAMPLE
        while (L - 1) * q + 1 > MAX_TIME_STEPS and q > 1:
            q //= 2
        mats = []
        for seg in range(L - 1):
            for j in range(q):
                t = j / q
                mats.append(np.asarray(
                    qd_interpolate(tr[seg], tr[seg + 1], t).to_affine(),
                    np.float32))
        mats.append(np.asarray(tr[-1].to_affine(), np.float32))
        return np.stack(mats, axis=0)
    a = np.asarray(tr, np.float32)
    assert a.ndim in (2, 3), "transform must be (3,4) or (S,3,4)"
    if a.ndim == 3:
        assert 2 <= a.shape[0] <= MAX_TIME_STEPS
    return a


@dataclasses.dataclass
class InstanceArrayGeometry:
    """RTC_GEOMETRY_TYPE_INSTANCE_ARRAY: one scene, N transforms
    (scene_instance_array.cpp). Flattened like InstanceGeometry."""
    scene: object
    transforms: object           # (N, 3, 4)
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    time_range: tuple = (0.0, 1.0)

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
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

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
    vertices: object             # (n_verts, 3) or (S, n_verts, 3) motion
    face_counts: object          # (F,) verts per face
    indices: object              # flat indices
    levels: int = 2
    creases: Optional[dict] = None
    vertex_creases: Optional[dict] = None  # {vertex: weight}, inf = corner
    boundary_interpolation: bool = True
    # RTC_BUFFER_TYPE_HOLE: base faces removed from rendering (they still
    # shape their neighbors' subdivision, scene_subdiv_mesh.h holes)
    holes: Optional[object] = None         # (H,) int base-face indices
    # vertex-attribute texcoords with their own topology
    # (RTC_BUFFER_TYPE_VERTEX_ATTRIBUTE slot + texcoord_indices)
    texcoords: Optional[object] = None     # (Nt, 2)
    texcoord_indices: Optional[object] = None  # flat, parallel to indices
    texcoord_mode: Optional[str] = None    # attribute RTC_SUBDIVISION_MODE
    position_mode: Optional[str] = None    # position RTC_SUBDIVISION_MODE
    mask: int = 0xFFFFFFFF
    enabled: bool = True
    filter: Optional[FilterFn] = None
    # rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span
    # [start, end] instead of [0,1]; extrapolated linearly outside
    time_range: tuple = (0.0, 1.0)

    @property
    def num_prims(self):
        F = np.asarray(self.face_counts)
        per = np.where(F == 4, 4 ** (self.levels - 1) if self.levels else 1,
                       F * 4 ** max(self.levels - 1, 0))
        return int(per.sum())
