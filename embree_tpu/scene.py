"""Scene: geometry container + commit (BVH build) + intersect/occluded queries.

Role parity with the reference runtime core (kernels/common/scene.{h,cpp}:
Scene::commit_internal scene.cpp:939, build_cpu_accels :762; query dispatch
kernels/common/rtcore.cpp:599 rtcIntersect1) — redesigned functional:

- A ``Scene`` is a host-side container of geometries (the mutable API object).
- ``Scene.commit()`` lowers everything into a ``CommittedScene`` — a pytree of
  device arrays (merged typed primitive table + BVH) that is the "Traversable":
  it can be passed straight into jit/pjit functions, donated, sharded, or
  checkpointed (the array-native analog of RTCTraversable, rtcore_scene.h:102).
- ``intersect``/``occluded`` are pure jittable functions over (CommittedScene,
  RayBatch).

The reference keeps one accel per geometry type and loops AccelN over them per
ray (acceln.cpp:44). We instead merge all primitives of all geometries into ONE
kind-tagged primitive table under ONE BVH — a deliberate divergence that keeps
traversal a single dense kernel (SURVEY.md §A.2 note). Static facts about the
scene (which kinds exist, motion blur, filters, user callbacks) ride in the
pytree aux data, so jit specializes per scene shape — the XLA analog of
RTCFeatureFlags specialization constants (SURVEY.md §5.6).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import ray as ray_mod
from .core.ray import INVALID_ID, HitBatch, RayBatch, make_miss_hits
from .ops import curve as curve_ops
from .ops import line as line_ops
from .ops import point as point_ops
from .ops import quad as quad_ops
from .ops import triangle as tri_ops
from .accel.bvh import BVH
from .accel.sah import build_sah
from .accel.collapse import collapse
from .accel.pack import PackedScene, pack
from .accel.refit import refit_bvh
from .accel import traverse as trav_mod
from .accel import traverse_pallas as trav_pallas
from .geometry import (
    KIND_CURVE_FLAT, KIND_CURVE_ORIENTED, KIND_CURVE_ROUND, KIND_DISC,
    KIND_FLAT_LINE,
    KIND_CURVE_DISTANCE, KIND_ORIENTED_DISC, KIND_QUAD, KIND_ROUND_LINE,
    KIND_SPHERE, KIND_TRIANGLE, KIND_USER,
    CurveGeometry, GridGeometry, InstanceArrayGeometry, InstanceGeometry,
    LineSegmentsGeometry, PointGeometry, QuadGeometry, SubdivisionGeometry,
    TriangleGeometry, UserGeometry, _sample_steps, _split_timesteps,
    instance_transform_steps, motion_knots)

# Static leaf block size for scene BVHs (TriangleM M=4 analog, triangle.h:14).
LEAF_SIZE = 8

# kinds eligible for the strand-aligned leaf-OBB hair tier (accel/obb.py;
# the reference routes these through BVHBuilderHair, bvh_builder_hair.h:19)
_HAIR_KINDS = {KIND_ROUND_LINE, KIND_FLAT_LINE, KIND_CURVE_FLAT,
               KIND_CURVE_ROUND, KIND_CURVE_ORIENTED, KIND_CURVE_DISTANCE}

PALLAS_INTERPRET = False  # set True in CPU tests to run the kernel interpreted


class BuildQuality:
    """RTCBuildQuality analog (rtcore_common.h)."""
    LOW = 0      # Morton/LBVH
    MEDIUM = 1   # binned SAH
    HIGH = 2     # SAH + spatial splits (later milestone)
    REFIT = 3    # refit existing topology


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CommittedScene:
    """Device-resident traversable: merged typed primitive table + BVH."""
    bvh: BVH
    # per-prim tags
    prim_kind: jnp.ndarray    # (T,) int32
    prim_geom: jnp.ndarray    # (T,) uint32 (geometry id; child-scene id for instanced)
    prim_local: jnp.ndarray   # (T,) uint32 (prim id within its geometry)
    prim_inst: jnp.ndarray    # (T, 2) uint32 instance id stack (INVALID_ID = none)
    prim_data: jnp.ndarray    # (T,) int32 index into the kind table
    prim_mask: jnp.ndarray    # (T,) uint32
    prim_filter: jnp.ndarray  # (T,) int32 filter slot (-1 = none)
    # triangles (two time steps; _b == step 1, equal to step 0 when static)
    tri_v0: jnp.ndarray; tri_v1: jnp.ndarray; tri_v2: jnp.ndarray
    tri_v0b: jnp.ndarray; tri_v1b: jnp.ndarray; tri_v2b: jnp.ndarray
    # quads (Tq, 4, 3); uvm = per-quad uv remap [off_u, off_v, scale_u,
    # scale_v] mapping quad-local uv into geometry uv (grids: whole-grid span)
    quad_v: jnp.ndarray; quad_vb: jnp.ndarray; quad_uvm: jnp.ndarray
    # points
    pnt_c: jnp.ndarray; pnt_r: jnp.ndarray; pnt_n: jnp.ndarray
    pnt_cb: jnp.ndarray; pnt_rb: jnp.ndarray; pnt_nb: jnp.ndarray
    # line segments (round + flat share the table; curves tessellate here)
    line_p0: jnp.ndarray; line_r0: jnp.ndarray
    line_p1: jnp.ndarray; line_r1: jnp.ndarray
    line_u0: jnp.ndarray; line_u1: jnp.ndarray
    line_fl: jnp.ndarray   # flags: bit0 = has-left-neighbor (no begin cap)
    # neighbor far endpoints for interior-hit suppression (rL/rR<0 = absent);
    # *b = motion step B (cones must follow the lerped joints, else moving
    # round lines wrongly reject interior hits at t>0)
    line_pL: jnp.ndarray; line_rL: jnp.ndarray
    line_pR: jnp.ndarray; line_rR: jnp.ndarray
    line_p0b: jnp.ndarray; line_r0b: jnp.ndarray
    line_p1b: jnp.ndarray; line_r1b: jnp.ndarray
    line_pLb: jnp.ndarray; line_rLb: jnp.ndarray
    line_pRb: jnp.ndarray; line_rRb: jnp.ndarray
    # native cubic curves: Bezier control points xyz+r, (Tc, 4, 4);
    # normal splines (Tc, 4, 3) for oriented curves
    curve_cp: jnp.ndarray; curve_cpb: jnp.ndarray
    curve_n: jnp.ndarray; curve_nb: jnp.ndarray
    # user geometry bounds
    user_lo: jnp.ndarray; user_up: jnp.ndarray
    packed: Optional[PackedScene]
    # per-prim time windows (time-sliced multi-step motion; [0,1] = whole)
    prim_t0: jnp.ndarray = None   # (T,) float32
    prim_t1: jnp.ndarray = None   # (T,) float32
    # per-curve-prim ribbon rate (rtcSetGeometryTessellationRate is per
    # GEOMETRY; mixed-rate scenes must not collapse to one rate — the
    # faceting IS the reference's rendered shape, hair0.xml rates 4 vs 16)
    curve_prate: jnp.ndarray = None   # (Tc,) int32
    # strand-aligned leaf OBBs (hair tier, accel/obb.py — the bvh_node_obb.h
    # role at leaf granularity; zero-size arrays = tier off for this scene)
    leaf_obb_rot: jnp.ndarray = None  # (n_prims, 3, 3)
    leaf_obb_lo: jnp.ndarray = None   # (n_prims, 3)
    leaf_obb_up: jnp.ndarray = None   # (n_prims, 3)
    # --- static aux (jit specialization) ---
    kinds_present: Tuple[int, ...] = dataclasses.field(default=(), metadata={"static": True})
    has_motion: bool = dataclasses.field(default=False, metadata={"static": True})
    # any prim carries a sub-[0,1] window (multi-step / quaternion motion)
    has_windows: bool = dataclasses.field(default=False, metadata={"static": True})
    filters: Tuple = dataclasses.field(default=(), metadata={"static": True})
    user_fns: Tuple = dataclasses.field(default=(), metadata={"static": True})
    # RTC_SCENE_FLAG_ROBUST analog: widened slab tests + Plücker leaf tests
    robust: bool = dataclasses.field(default=False, metadata={"static": True})
    # min-width feature (EMBREE_MIN_WIDTH, context.h enlargeRadiusToMinWidth):
    # round-prim radii r are enlarged at query time to
    # clamp(min_width_factor * dist(center, ray org), r, max_radius_scale*r);
    # commit dilates bounds by max_radius_scale so the BVH stays conservative
    min_width_factor: float = dataclasses.field(default=0.0, metadata={"static": True})
    max_radius_scale: float = dataclasses.field(default=1.0, metadata={"static": True})
    # ribbon sub-segment count (rtcSetGeometryTessellationRate; max over
    # curve geometries — static jit arg for the flat-curve intersector)
    curve_rate: int = dataclasses.field(default=4, metadata={"static": True})
    # distinct per-geometry rates present (static: one ribbon evaluation per
    # rate, merged by curve_prate)
    curve_rates_present: Tuple[int, ...] = dataclasses.field(
        default=(), metadata={"static": True})
    # RTC_SCENE_FLAG_COMPACT analog: unpacked kind tables dropped, hits are
    # served from the packed kernel attributes (point_query/collide and
    # differentiable re-intersection are unavailable on compact scenes)
    compact: bool = dataclasses.field(default=False, metadata={"static": True})

    _ARRAY_FIELDS = None   # filled below
    _STATIC_FIELDS = None  # filled below

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._ARRAY_FIELDS)
        aux = tuple(getattr(self, f) for f in self._STATIC_FIELDS)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for f, c in zip(cls._ARRAY_FIELDS, children):
            object.__setattr__(obj, f, c)
        for f, v in zip(cls._STATIC_FIELDS, aux):
            object.__setattr__(obj, f, v)
        return obj

    @property
    def num_prims(self):
        return self.prim_kind.shape[0]


CommittedScene._ARRAY_FIELDS = tuple(
    f.name for f in dataclasses.fields(CommittedScene)
    if not f.metadata.get("static"))
CommittedScene._STATIC_FIELDS = tuple(
    f.name for f in dataclasses.fields(CommittedScene)
    if f.metadata.get("static"))


class CommitCancelled(RuntimeError):
    """Raised when a progress monitor vetoes an in-flight commit
    (rtcSetSceneProgressMonitorFunction returning false, RTC_ERROR_CANCELLED
    semantics: the scene object stays valid and re-committable)."""


class Scene:
    """Mutable geometry container; commit() produces a CommittedScene."""

    def __init__(self, quality: int = BuildQuality.MEDIUM,
                 robust: bool = False, threads: int = 0,
                 min_width_factor: float = 0.0,
                 max_radius_scale: float = 1.0,
                 compact: bool = False,
                 max_spatial_split_replications: float = 1.2):
        self.quality = quality
        # threads= config knob: native-builder OpenMP team size (0 = all)
        self.threads = threads
        # RTC_SCENE_FLAG_COMPACT analog (state.h compact accel variants):
        # pure-triangle packable scenes drop the unpacked kind tables and
        # serve hits from the packed kernel attributes alone
        self.compact = compact
        # HIGH-quality spatial-split replication budget (state.h:117)
        self.max_spatial_split_replications = max_spatial_split_replications
        # min-width (rtcSetGeometryMaxRadiusScale + minWidthDistanceFactor)
        self.min_width_factor = min_width_factor
        self.max_radius_scale = max_radius_scale
        self.robust = robust          # RTC_SCENE_FLAG_ROBUST analog
        self._geoms: Dict[int, object] = {}
        self._next_id = 0
        self.committed: Optional[CommittedScene] = None
        self._progress_fn: Optional[Callable] = None

    def set_progress_monitor(self, fn: Optional[Callable]):
        """rtcSetSceneProgressMonitorFunction analog: fn(fraction) -> bool;
        returning False cancels the commit (CommitCancelled is raised at the
        next milestone; the build so far is discarded)."""
        self._progress_fn = fn

    def _progress(self, frac: float):
        if self._progress_fn is not None and not self._progress_fn(frac):
            raise CommitCancelled(f"commit cancelled at {frac:.0%}")

    def attach(self, geom) -> int:
        """rtcAttachGeometry analog; returns the geometry id."""
        gid = self._next_id
        self._geoms[gid] = geom
        self._next_id += 1
        return gid

    def detach(self, geom_id: int):
        del self._geoms[geom_id]

    def get(self, geom_id: int):
        return self._geoms[geom_id]

    # ------------------------------------------------------------------
    def commit(self, two_level: bool = None):
        """Merge geometries, build + pack the BVH (rtcCommitScene analog).

        Runs on host (numpy + CPU jax backend) — eager dispatch to a remote
        TPU is orders of magnitude slower per op; only the finished
        traversable is transferred to the default device.

        two_level: True commits through the TLAS/BLAS path
        (bvh_builder_twolevel.h role: child scenes share one BLAS each,
        transform updates never rebuild BLASes); None (auto) picks it when
        the scene holds >= TWO_LEVEL_AUTO instances. Returns a
        TwoLevelScene on that path (intersect/occluded accept both).
        """
        if two_level is None:
            from .geometry import InstanceArrayGeometry, InstanceGeometry
            n_inst = sum(
                (np.asarray(g.transforms).shape[0]
                 if isinstance(g, InstanceArrayGeometry) else 1)
                for g in self._geoms.values()
                if isinstance(g, (InstanceGeometry, InstanceArrayGeometry))
                and getattr(g, "enabled", True))
            two_level = n_inst >= TWO_LEVEL_AUTO
        if two_level:
            from .tlas import TwoLevelScene, build_two_level, update_transforms
            prev = self.committed
            if (isinstance(prev, TwoLevelScene)
                    and self.quality == BuildQuality.REFIT):
                try:
                    self.committed = update_transforms(prev, self)
                    return self.committed
                except AssertionError:
                    pass          # topology changed: full rebuild below
            self.committed = build_two_level(self)
            return self.committed
        self._progress(0.0)
        m = _Merger()
        for gid, g in sorted(self._geoms.items()):
            if not getattr(g, "enabled", True):
                continue
            m.add(g, gid, inst_stack=(), inst_mask=0xFFFFFFFF, xf=None)
        if m.total() == 0:
            raise ValueError("commit() on empty scene")
        self._progress(0.25)
        m.progress = self._progress
        m.threads = getattr(self, "threads", 0)
        m.min_width_factor = getattr(self, "min_width_factor", 0.0)
        m.max_radius_scale = getattr(self, "max_radius_scale", 1.0)
        m.compact = getattr(self, "compact", False)
        m.max_ssr = getattr(self, "max_spatial_split_replications", 1.2)

        if (self.quality == BuildQuality.REFIT and self.committed is not None
                and m.total() == self.committed.num_prims):
            # dynamic update: keep topology, refresh bounds bottom-up
            # (bvh_refit.h / RTC_BUILD_QUALITY_REFIT semantics)
            self.committed = m.finalize(self.quality,
                                        refit_from=self.committed,
                                        n_wide=self._n_wide,
                                        robust=self.robust)
        else:
            self.committed = m.finalize(
                BuildQuality.MEDIUM if self.quality == BuildQuality.REFIT
                else self.quality, robust=self.robust)
            self._n_wide = m.last_n_wide
        return self.committed


# =====================================================================
# merging
# =====================================================================

_INV = int(INVALID_ID)

# auto two-level threshold: flattening replicates child prims per instance,
# so many instances explode the merged table; the TLAS path shares BLASes
# (bvh_builder_twolevel.h role). 16 instances ~ where sharing wins.
TWO_LEVEL_AUTO = 16


class _Merger:
    def __init__(self):
        self.rows = []          # per-prim (kind, geom, local, inst0, inst1, data_idx, mask)
        self.tri = {k: [] for k in ("v0", "v1", "v2", "v0b", "v1b", "v2b")}
        self.quad = {k: [] for k in ("v", "vb", "uvm")}
        self.pnt = {k: [] for k in ("c", "r", "n", "cb", "rb", "nb")}
        self.line = {k: [] for k in ("p0", "r0", "p1", "r1", "u0", "u1",
                                     "fl", "pL", "rL", "pR", "rR",
                                     "p0b", "r0b", "p1b", "r1b",
                                     "pLb", "rLb", "pRb", "rRb")}
        self.curve = {k: [] for k in ("cp", "cpb", "n", "nb", "rate")}
        self.user = {k: [] for k in ("lo", "up")}
        self.counts = {"tri": 0, "quad": 0, "pnt": 0, "line": 0, "user": 0,
                       "curve": 0}
        self.filters = []
        self.user_fns = []
        self.has_motion = False
        # time-sliced multi-step motion (MSMBlur analog): prims of S-step
        # geometry are replicated once per linear time segment, each copy
        # carrying its [t0,t1] validity window and that segment's endpoint
        # buffers (tight per-segment bounds fall out of the pair tables)
        self.prim_t01 = []      # per-emit (n, 2) windows
        self._window = (0.0, 1.0)
        self.fat_round_joints = False   # see the round-line packable gate
        self._trange = (0.0, 1.0)   # time_range of the geometry being added
        self._fidx = -1         # filter slot of the geometry being added
        self.curve_rate = 4     # max tessellation_rate over native curves

    def total(self):
        return sum(r.shape[0] for r in self.rows) if self.rows else 0

    def _emit(self, kind, gid, n, data_start, inst_stack, mask):
        inst0 = inst_stack[0] if len(inst_stack) > 0 else _INV
        inst1 = inst_stack[1] if len(inst_stack) > 1 else _INV
        rows = np.empty((n, 8), np.int64)
        rows[:, 0] = kind
        rows[:, 1] = gid
        rows[:, 2] = np.arange(n)
        rows[:, 3] = inst0
        rows[:, 4] = inst1
        rows[:, 5] = data_start + np.arange(n)
        rows[:, 6] = mask
        rows[:, 7] = self._fidx        # filter slot (-1 = none)
        self.rows.append(rows)
        self.prim_t01.append(
            np.tile(np.asarray(self._window, np.float32), (n, 1)))

    @staticmethod
    def _xf_points(xf, pts):
        if xf is None:
            return pts
        return pts @ np.asarray(xf)[:3, :3].T + np.asarray(xf)[:3, 3]

    @staticmethod
    def _xf_scale(xf):
        """Uniform scale factor of the transform (radius scaling for round
        prims; exact only for similarity transforms — documented limitation
        of instance flattening for non-triangle primitives)."""
        if xf is None:
            return 1.0
        return float(abs(np.linalg.det(np.asarray(xf)[:3, :3]))) ** (1.0 / 3.0)

    def _steps(self, arr, name):
        """Window-endpoint motion pair of a (possibly multi-step) buffer,
        honoring the geometry's time_range (set per add() call)."""
        return _split_timesteps(arr, name, self._window, self._trange)

    def _segmented(self, knots, fn):
        """Run fn once per sub-window of the current window split at the
        given interior knot times (the time-slice replication driver)."""
        outer = self._window
        ts = [outer[0]] + list(knots) + [outer[1]]
        for t0, t1 in zip(ts[:-1], ts[1:]):
            self._window = (t0, t1)
            fn()
        self._window = outer

    def add(self, g, gid, inst_stack, inst_mask, xf, xfb=None):
        """Add geometry g (with optional instancing transforms xf / xfb for
        the current time window's endpoints)."""
        # sub-[0,1] time ranges make the geometry EXIST only within the
        # range ("appear and disappear during the camera shutter",
        # doc/src/api/rtcSetGeometryTimeRange.md) — clip the current window
        # to the range; an empty intersection drops the geometry entirely
        tr = tuple(getattr(g, "time_range", (0.0, 1.0)))
        cw = (max(self._window[0], tr[0]), min(self._window[1], tr[1]))
        if cw[0] > cw[1]:
            return
        if cw != self._window:
            outer = self._window
            self._window = cw
            try:
                self.add(g, gid, inst_stack, inst_mask, xf, xfb)
            finally:
                self._window = outer
            return

        if isinstance(g, InstanceGeometry):
            # split at the union of the instance transform's knots AND every
            # descendant buffer/nested-transform knot, so each sub-window is
            # knot-free for ALL sampled quantities: transforms sampled at
            # sub-window endpoints then compose exactly with child buffers
            # sampled at the same endpoints (a 3-step tent triangle under a
            # 2-step transform intersects at exact positions — ADVICE r2)
            knots = self._subtree_knots(g)
            if knots:
                self._segmented(knots, lambda: self.add(
                    g, gid, inst_stack, inst_mask, xf, xfb))
                return
            xfs = instance_transform_steps(g)
            tr = getattr(g, "time_range", (0.0, 1.0))
            xf0 = _sample_steps(xfs, self._window[0], tr)
            xf1 = _sample_steps(xfs, self._window[1], tr)
            self._add_instance_xf(g.scene, gid, inst_stack, g.mask, xf0, xf1)
            return
        if isinstance(g, InstanceArrayGeometry):
            tfs = np.asarray(g.transforms, np.float32)
            for k in range(tfs.shape[0]):
                self._add_instance_xf(g.scene, gid, inst_stack, g.mask,
                                      tfs[k], tfs[k])
            return

        # multi-step (S > 2) motion geometry: replicate per linear segment
        self._trange = tuple(getattr(g, "time_range", (0.0, 1.0)))
        knots = motion_knots(
            [getattr(g, a, None)
             for a in ("vertices", "points", "normals", "tangents")],
            self._window, self._trange)
        if knots:
            self._segmented(knots, lambda: self.add(
                g, gid, inst_stack, inst_mask, xf, xfb))
            return

        mask = getattr(g, "mask", 0xFFFFFFFF) & inst_mask
        # filters are deduped by CALLABLE identity and matched to prims by
        # a per-prim slot index (rows col 7), so instanced sub-scenes that
        # share a local gid but carry different filters stay distinct
        # (ADVICE r2: gid-keyed dedup silently dropped the second filter)
        self._fidx = -1
        if g.filter is not None:
            for fi, (fg, ff) in enumerate(self.filters):
                if ff is g.filter:
                    self._fidx = fi
                    break
            else:
                self.filters.append((gid, g.filter))
                self._fidx = len(self.filters) - 1
        if xfb is None:
            xfb = xf
        xf_motion = xf is not None and xfb is not None and not np.array_equal(xf, xfb)

        if isinstance(g, TriangleGeometry):
            va, vb, motion = self._steps(g.vertices, "vertices")
            idx = np.asarray(g.indices, np.int32)
            t0 = self._xf_points(xf, va[idx])       # (n, 3, 3)
            t1 = self._xf_points(xfb, vb[idx])
            self.has_motion |= motion or xf_motion
            n = idx.shape[0]
            self._emit(KIND_TRIANGLE, gid, n, self.counts["tri"], inst_stack, mask)
            self.counts["tri"] += n
            for key, arr in (("v0", t0[:, 0]), ("v1", t0[:, 1]), ("v2", t0[:, 2]),
                             ("v0b", t1[:, 0]), ("v1b", t1[:, 1]), ("v2b", t1[:, 2])):
                self.tri[key].append(np.asarray(arr, np.float32))

        elif isinstance(g, QuadGeometry):
            va, vb, motion = self._steps(g.vertices, "vertices")
            idx = np.asarray(g.indices, np.int32)
            q0 = self._xf_points(xf, va[idx])
            q1 = self._xf_points(xfb, vb[idx])
            self.has_motion |= motion or xf_motion
            n = idx.shape[0]
            self._emit(KIND_QUAD, gid, n, self.counts["quad"], inst_stack, mask)
            self.counts["quad"] += n
            self.quad["v"].append(np.asarray(q0, np.float32))
            self.quad["vb"].append(np.asarray(q1, np.float32))
            self.quad["uvm"].append(_uvm_identity(n))

        elif isinstance(g, PointGeometry):
            pa, pb, motion = self._steps(g.points, "points")
            self.has_motion |= motion or xf_motion
            s = self._xf_scale(xf)
            c0 = self._xf_points(xf, pa[:, :3]); r0 = pa[:, 3] * s
            c1 = self._xf_points(xfb, pb[:, :3]); r1 = pb[:, 3] * s
            n = pa.shape[0]
            kind = {"sphere": KIND_SPHERE, "disc": KIND_DISC,
                    "oriented_disc": KIND_ORIENTED_DISC}[g.kind]
            if g.normals is not None:
                nrm, nrmb, nmotion = self._steps(g.normals, "normals")
                self.has_motion |= nmotion
            else:
                nrm = nrmb = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
            if xf is not None:
                inv = np.linalg.inv(np.asarray(xf)[:3, :3]).astype(np.float32)
                nrm = nrm @ inv
                nrmb = nrmb @ inv
            self._emit(kind, gid, n, self.counts["pnt"], inst_stack, mask)
            self.counts["pnt"] += n
            self.pnt["c"].append(np.asarray(c0, np.float32))
            self.pnt["r"].append(np.asarray(r0, np.float32))
            self.pnt["n"].append(np.asarray(nrm, np.float32))
            self.pnt["cb"].append(np.asarray(c1, np.float32))
            self.pnt["rb"].append(np.asarray(r1, np.float32))
            self.pnt["nb"].append(np.asarray(nrmb, np.float32))

        elif isinstance(g, LineSegmentsGeometry):
            va, vb_, motion = self._steps(g.vertices, "vertices")
            self.has_motion |= motion or xf_motion
            idx = np.asarray(g.indices, np.int32)
            s = self._xf_scale(xf)
            kind = KIND_ROUND_LINE if g.kind == "round" else KIND_FLAT_LINE
            n = idx.shape[0]
            u = np.zeros(n, np.float32)
            # interior connection caps belong to the previous segment's end
            # sphere (roundline_intersector.h isBeginPoint): a begin sphere
            # exists only where no segment ends at our start vertex
            has_left = np.isin(idx - 1, idx)
            # neighbor far endpoints (roundline vL/vR: the left segment's
            # start vertex and the right segment's end vertex); rL/rR < 0
            # marks absent. Used for interior-hit suppression at fat joints
            has_right = np.isin(idx + 1, idx)
            iL = np.clip(idx - 1, 0, va.shape[0] - 1)
            iR = np.clip(idx + 2, 0, va.shape[0] - 1)
            if kind == KIND_ROUND_LINE and n > 0:
                # FAT JOINTS (joint radius comparable to segment length)
                # need the reference's neighbor-cone interior-hit clipping
                # (roundline_intersector.h:562 isInsideCappedCone); the
                # packed kernel's record has no neighbor fields, so such
                # scenes ride the exact jnp engine. Thin chains (hair) pass
                # the test and stay on the kernel.
                seg_len = np.linalg.norm(va[idx + 1, :3] - va[idx, :3],
                                         axis=-1)
                rj = np.maximum(va[idx, 3], va[idx + 1, 3]) * np.maximum(s, 1e-30)
                joint = has_left | has_right
                self.fat_round_joints |= bool(
                    (joint & (rj > 0.5 * seg_len)).any())
            self._emit(kind, gid, n, self.counts["line"], inst_stack, mask)
            self.counts["line"] += n
            for (key, arr) in (
                    ("p0", self._xf_points(xf, va[idx, :3])),
                    ("r0", va[idx, 3] * s),
                    ("p1", self._xf_points(xf, va[idx + 1, :3])),
                    ("r1", va[idx + 1, 3] * s),
                    ("u0", u), ("u1", u + 1.0),
                    ("fl", has_left.astype(np.float32)),
                    ("pL", self._xf_points(xf, va[iL, :3])),
                    ("rL", np.where(has_left, va[iL, 3] * s, -1.0)),
                    ("pR", self._xf_points(xf, va[iR, :3])),
                    ("rR", np.where(has_right, va[iR, 3] * s, -1.0)),
                    ("p0b", self._xf_points(xfb, vb_[idx, :3])),
                    ("r0b", vb_[idx, 3] * s),
                    ("p1b", self._xf_points(xfb, vb_[idx + 1, :3])),
                    ("r1b", vb_[idx + 1, 3] * s),
                    ("pLb", self._xf_points(xfb, vb_[iL, :3])),
                    ("rLb", np.where(has_left, vb_[iL, 3] * s, -1.0)),
                    ("pRb", self._xf_points(xfb, vb_[iR, :3])),
                    ("rRb", np.where(has_right, vb_[iR, 3] * s, -1.0))):
                self.line[key].append(np.asarray(arr, np.float32))

        elif isinstance(g, CurveGeometry):
            cps, cpsb, motion = self._steps(g.vertices, "vertices")
            self.has_motion |= motion or xf_motion
            idx = np.asarray(g.indices, np.int32)
            if g.basis == curve_ops.BASIS_HERMITE:
                tan, tanb, tmotion = self._steps(g.tangents, "tangents")
                self.has_motion |= tmotion
                cp = np.stack([cps[idx], tan[idx], cps[idx + 1], tan[idx + 1]], axis=1)
                cpb = np.stack([cpsb[idx], tanb[idx], cpsb[idx + 1], tanb[idx + 1]], axis=1)
            else:
                gather = idx[:, None] + np.arange(4)[None, :]
                cp = cps[gather]
                cpb = cpsb[gather]

            if (g.algorithm in ("native", "distance")
                    and g.basis != curve_ops.BASIS_LINEAR):
                # native per-curve intersectors: store world-space Bezier CPs;
                # one prim per curve (reference CurveNi role, curveNi.h)
                s = self._xf_scale(xf)
                bez = np.array(curve_ops.to_bezier(g.basis, jnp.asarray(cp)))
                bezb = np.array(curve_ops.to_bezier(g.basis, jnp.asarray(cpb)))
                # hermite tangents are offsets: transform w=0? tangent rows of
                # hermite were already converted into positions by to_bezier,
                # so ALL bezier cp rows are points — transform uniformly
                for arr, x in ((bez, xf), (bezb, xfb)):
                    arr[..., :3] = self._xf_points(x, arr[..., :3])
                    arr[..., 3] *= s
                n = cp.shape[0]
                if g.algorithm == "distance":
                    kind = KIND_CURVE_DISTANCE
                elif g.kind == "oriented":
                    kind = KIND_CURVE_ORIENTED
                elif g.kind == "round":
                    kind = KIND_CURVE_ROUND
                else:
                    kind = KIND_CURVE_FLAT
                # normal spline for oriented curves (all-zero when unused;
                # reference normal buffer, scene_curves.h oriented types)
                if g.normals is not None:
                    nr, nrb, nmotion = self._steps(g.normals, "normals")
                    self.has_motion |= nmotion

                    if g.basis == curve_ops.BASIS_HERMITE:
                        # hermite normal spline: (n0, dn0, n1, dn1) — the
                        # RTC_BUFFER_TYPE_NORMAL_DERIVATIVE buffer
                        # (scene_curves.h dnormals); zero derivatives when
                        # the buffer is absent
                        if g.normal_derivatives is not None:
                            dn, dnb, _ = self._steps(
                                g.normal_derivatives, "normal_derivatives")
                            d0, d0b = dn[idx], dnb[idx]
                            d1, d1b = dn[idx + 1], dnb[idx + 1]
                        else:
                            d0 = d0b = d1 = d1b = np.zeros_like(nr[idx])
                        ncp = np.stack([nr[idx], d0, nr[idx + 1], d1], axis=1)
                        ncpb = np.stack([nrb[idx], d0b, nrb[idx + 1], d1b],
                                        axis=1)
                    else:
                        ncp, ncpb = nr[gather], nrb[gather]
                    nbez = np.array(curve_ops.to_bezier(g.basis, jnp.asarray(ncp)))
                    nbezb = np.array(curve_ops.to_bezier(g.basis, jnp.asarray(ncpb)))
                    if xf is not None:
                        inv = np.linalg.inv(np.asarray(xf)[:3, :3]).astype(np.float32)
                        nbez = nbez @ inv
                        nbezb = nbezb @ inv
                else:
                    nbez = nbezb = np.zeros((n, 4, 3), np.float32)
                self._emit(kind, gid, n, self.counts["curve"], inst_stack, mask)
                self.counts["curve"] += n
                rate_g = int(getattr(g, "tessellation_rate", 4))
                self.curve_rate = max(self.curve_rate, rate_g)
                self.curve["rate"].append(np.full(n, rate_g, np.float32))
                self.curve["cp"].append(bez.astype(np.float32))
                self.curve["cpb"].append(bezb.astype(np.float32))
                self.curve["n"].append(nbez.astype(np.float32))
                self.curve["nb"].append(nbezb.astype(np.float32))
                return

            rate = g.tessellation_rate
            p0, r0, p1, r1, u0, u1 = map(np.asarray, curve_ops.tessellate_segments(
                g.basis, jnp.asarray(cp), rate))
            p0b, r0b, p1b, r1b, _, _ = map(np.asarray, curve_ops.tessellate_segments(
                g.basis, jnp.asarray(cpb), rate))
            s = self._xf_scale(xf)
            kind = KIND_ROUND_LINE if g.kind == "round" else KIND_FLAT_LINE
            n = p0.shape[0]
            jj0 = np.arange(n)
            if kind == KIND_ROUND_LINE and n > 0:
                seg_len = np.linalg.norm(p1 - p0, axis=-1)
                rj = np.maximum(r0, r1) * np.maximum(s, 1e-30)
                joint = ((jj0 % rate) != 0) | ((jj0 % rate) != rate - 1)
                self.fat_round_joints |= bool(
                    (joint & (rj > 0.5 * seg_len)).any())
            self._emit(kind, gid, n, self.counts["line"], inst_stack, mask)
            # local prim id = source curve index (sub-segments share it);
            # u in [0,1] spans the whole curve (reference curve u semantics)
            self.rows[-1][:, 2] = np.repeat(np.arange(idx.shape[0]), rate)
            self.counts["line"] += n
            jj = np.arange(n)
            hasLc = (jj % rate) != 0
            hasRc = (jj % rate) != rate - 1
            pLc = np.roll(p0, 1, axis=0)
            rLc = np.where(hasLc, np.roll(r0, 1) * s, -1.0)
            pRc = np.roll(p1, -1, axis=0)
            rRc = np.where(hasRc, np.roll(r1, -1) * s, -1.0)
            pLcb = np.roll(p0b, 1, axis=0)
            rLcb = np.where(hasLc, np.roll(r0b, 1) * s, -1.0)
            pRcb = np.roll(p1b, -1, axis=0)
            rRcb = np.where(hasRc, np.roll(r1b, -1) * s, -1.0)
            for (key, arr) in (
                    ("p0", self._xf_points(xf, p0)), ("r0", r0 * s),
                    ("p1", self._xf_points(xf, p1)), ("r1", r1 * s),
                    ("u0", u0), ("u1", u1),
                    ("fl", ((np.arange(n) % rate) != 0).astype(np.float32)),
                    ("pL", self._xf_points(xf, pLc)), ("rL", rLc),
                    ("pR", self._xf_points(xf, pRc)), ("rR", rRc),
                    ("p0b", self._xf_points(xfb, p0b)), ("r0b", r0b * s),
                    ("p1b", self._xf_points(xfb, p1b)), ("r1b", r1b * s),
                    ("pLb", self._xf_points(xfb, pLcb)), ("rLb", rLcb),
                    ("pRb", self._xf_points(xfb, pRcb)), ("rRb", rRcb)):
                self.line[key].append(np.asarray(arr, np.float32))

        elif isinstance(g, GridGeometry):
            va, vb, motion = self._steps(g.vertices, "vertices")
            self.has_motion |= motion or xf_motion
            grids = np.asarray(g.grids, np.int64)
            q_idx = []
            local = []
            uvms = []
            for gi, (sv, stride, w, h) in enumerate(grids):
                ys, xs = np.meshgrid(np.arange(h - 1), np.arange(w - 1),
                                     indexing="ij")
                a = sv + ys * stride + xs
                q = np.stack([a, a + 1, a + 1 + stride, a + stride],
                             axis=-1).reshape(-1, 4)
                q_idx.append(q)
                local.append(np.full(q.shape[0], gi, np.int64))
                # grid-global uv: u=(cellx+lu)/(resX-1), v=(celly+lv)/(resY-1)
                # (subgrid_intersector_moeller.h:19 interpolateUV)
                ix = 1.0 / max(w - 1, 1)
                iy = 1.0 / max(h - 1, 1)
                m = np.zeros((q.shape[0], 6), np.float32)
                m[:, 0] = xs.reshape(-1) * ix
                m[:, 1] = ys.reshape(-1) * iy
                m[:, 2] = ix
                m[:, 5] = iy
                uvms.append(m)
            idx = np.concatenate(q_idx)
            q0 = self._xf_points(xf, va[idx])
            q1 = self._xf_points(xfb, vb[idx])
            n = idx.shape[0]
            self._emit(KIND_QUAD, gid, n, self.counts["quad"], inst_stack, mask)
            self.rows[-1][:, 2] = np.concatenate(local)  # prim id = grid index
            self.counts["quad"] += n
            self.quad["v"].append(np.asarray(q0, np.float32))
            self.quad["vb"].append(np.asarray(q1, np.float32))
            self.quad["uvm"].append(np.concatenate(uvms))

        elif isinstance(g, SubdivisionGeometry):
            from .ops.subdiv import catmull_clark
            fcs_in = np.asarray(g.face_counts, np.int64)
            idx_in = np.asarray(g.indices, np.int64)
            face_map = np.arange(fcs_in.shape[0], dtype=np.int64)
            holes0 = getattr(g, "holes", None)
            if holes0 is not None and len(np.atleast_1d(holes0)):
                # RTC_BUFFER_TYPE_HOLE faces are removed BEFORE refinement:
                # their edges become boundaries and shape the neighbors'
                # subdivision (scene_subdiv_mesh holes semantics)
                hset = np.isin(face_map, np.atleast_1d(
                    np.asarray(holes0, np.int64)))
                starts = np.concatenate([[0], np.cumsum(fcs_in)[:-1]])
                keep_idx = np.concatenate(
                    [idx_in[s0:s0 + c]
                     for s0, c, h in zip(starts, fcs_in, hset) if not h])                     if (~hset).any() else np.zeros(0, np.int64)
                face_map = face_map[~hset]
                fcs_in = fcs_in[~hset]
                idx_in = keep_idx
            verts, quads, qbase, quvm = catmull_clark(
                np.asarray(g.vertices, np.float32), fcs_in, idx_in,
                levels=g.levels, creases=g.creases,
                vertex_creases=getattr(g, "vertex_creases", None),
                boundary_interpolation=g.boundary_interpolation,
                boundary_mode=getattr(g, "position_mode", None))
            qbase = face_map[qbase]         # back to ORIGINAL face ids
            # motion steps subdivide independently (CC is linear in the
            # cage for fixed topology, so per-step refine + lerp is exact)
            va, vb, motion = (
                _split_timesteps(verts, "subdiv", self._window, self._trange)
                if verts.ndim == 3 else (verts, verts, False))
            self.has_motion |= motion or xf_motion
            holes = np.zeros(0, np.int64)
            if getattr(g, "position_mode", None) == "no_boundary":
                # RTC_SUBDIVISION_MODE_NO_BOUNDARY: patches touching a
                # boundary edge have no limit surface — drop those base
                # faces (rtcore_geometry.h:57)
                fcs_ = np.asarray(g.face_counts, np.int64)
                idx_ = np.asarray(g.indices, np.int64)
                ecnt = {}
                off = 0
                fedges = []
                for fc in fcs_:
                    f = idx_[off:off + fc]
                    off += fc
                    es = [tuple(sorted((int(f[k]), int(f[(k + 1) % fc]))))
                          for k in range(fc)]
                    fedges.append(es)
                    for e in es:
                        ecnt[e] = ecnt.get(e, 0) + 1
                bfaces = [fi for fi, es in enumerate(fedges)
                          if any(ecnt[e] == 1 for e in es)]
                holes = np.union1d(holes, np.asarray(bfaces, np.int64))
            if holes.size:
                keep = ~np.isin(qbase, holes)
                quads, qbase = quads[keep], qbase[keep]
                quvm = np.asarray(quvm, np.float32)[keep]
            q0 = self._xf_points(xf, va[quads])
            q1 = self._xf_points(xfb, vb[quads])
            n = quads.shape[0]
            self._emit(KIND_QUAD, gid, n, self.counts["quad"], inst_stack, mask)
            self.rows[-1][:, 2] = qbase  # prim id = base face (patch) index
            self.counts["quad"] += n
            self.quad["v"].append(np.asarray(q0, np.float32))
            self.quad["vb"].append(np.asarray(q1, np.float32))
            self.quad["uvm"].append(np.asarray(quvm, np.float32))

        elif isinstance(g, UserGeometry):
            lo = np.asarray(g.bounds_lower, np.float32)
            up = np.asarray(g.bounds_upper, np.float32)
            assert xf is None, "instanced user geometry is not supported yet"
            n = lo.shape[0]
            self.user_fns.append((gid, g.intersect_fn))
            self._emit(KIND_USER, gid, n, self.counts["user"], inst_stack, mask)
            self.counts["user"] += n
            self.user["lo"].append(lo)
            self.user["up"].append(up)

        else:
            raise TypeError(f"unsupported geometry type {type(g)}")

    def _subtree_knots(self, g):
        """Union of interior motion-knot times over an instance subtree:
        the instance's own transform steps plus every descendant geometry
        buffer and nested instance transform. Sub-windows split at this
        union are linear in every sampled quantity (the MSMBlur time-split
        correctness requirement, bvh_builder_msmblur.h:456)."""
        pairs = []   # (array, its geometry's time_range)

        def walk_geom(cg):
            tr = tuple(getattr(cg, "time_range", (0.0, 1.0)))
            if isinstance(cg, InstanceGeometry):
                xfs = instance_transform_steps(cg)
                pairs.append((xfs if xfs.ndim == 3 else None, tr))
                walk_scene(cg.scene)
            elif isinstance(cg, InstanceArrayGeometry):
                walk_scene(cg.scene)
            else:
                for a in ("vertices", "points", "normals", "tangents"):
                    pairs.append((getattr(cg, a, None), tr))

        def walk_scene(s):
            for _, cg in sorted(s._geoms.items()):
                if getattr(cg, "enabled", True):
                    walk_geom(cg)

        walk_geom(g)
        ks = set()
        for a, tr in pairs:
            ks.update(motion_knots([a], self._window, tr))
        return sorted(ks)

    def _add_instance_xf(self, child_scene, gid, inst_stack, mask, xf0, xf1):
        assert len(inst_stack) < 2, "max 2 instancing levels (MAX_INSTANCE_LEVELS)"
        for cgid, cg in sorted(child_scene._geoms.items()):
            if not getattr(cg, "enabled", True):
                continue
            if isinstance(cg, InstanceGeometry):
                # nested transforms sampled at the current window endpoints
                # (knot splitting happened at the outer level)
                sub = instance_transform_steps(cg)
                ctr = getattr(cg, "time_range", (0.0, 1.0))
                s0 = _sample_steps(sub, self._window[0], ctr)
                s1 = _sample_steps(sub, self._window[1], ctr)
                self._add_instance_xf(cg.scene, cgid, inst_stack + (gid,),
                                      mask & cg.mask,
                                      _compose_affine(xf0, s0),
                                      _compose_affine(xf1, s1))
            elif isinstance(cg, InstanceArrayGeometry):
                tfs = np.asarray(cg.transforms, np.float32)
                for k in range(tfs.shape[0]):
                    self._add_instance_xf(cg.scene, cgid, inst_stack + (gid,),
                                          mask & cg.mask,
                                          _compose_affine(xf0, tfs[k]),
                                          _compose_affine(xf1, tfs[k]))
            else:
                self.add(cg, cgid, inst_stack + (gid,), mask, xf0, xf1)

    # ------------------------------------------------------------------
    def finalize(self, quality, refit_from: "CommittedScene" = None,
                 n_wide: int = None, robust: bool = False) -> CommittedScene:
        rows = np.concatenate(self.rows, axis=0)
        T = rows.shape[0]

        def cat(lst, shape_tail):
            if lst:
                return np.concatenate(
                    [np.asarray(a, np.float32).reshape((-1,) + shape_tail)
                     for a in lst], axis=0)
            return np.zeros((0,) + shape_tail, np.float32)

        tri = {k: cat(v, (3,)) for k, v in self.tri.items()}
        quad = {k: cat(v, (6,) if k == "uvm" else (4, 3))
                for k, v in self.quad.items()}
        pnt_c = cat(self.pnt["c"], (3,)); pnt_cb = cat(self.pnt["cb"], (3,))
        pnt_r = cat(self.pnt["r"], ()); pnt_rb = cat(self.pnt["rb"], ())
        pnt_n = cat(self.pnt["n"], (3,)); pnt_nb = cat(self.pnt["nb"], (3,))
        line = {k: cat(v, (3,) if k.startswith("p") else ())
                for k, v in self.line.items()}
        curve_cp = cat(self.curve["cp"], (4, 4))
        curve_cpb = cat(self.curve["cpb"], (4, 4))
        curve_n = cat(self.curve["n"], (4, 3))
        curve_nb = cat(self.curve["nb"], (4, 3))
        curve_prate = cat(self.curve["rate"], ()).astype(np.int32)
        curve_rates = tuple(sorted(set(
            int(x) for x in np.unique(curve_prate)))) or (4,)
        user_lo = cat(self.user["lo"], (3,)); user_up = cat(self.user["up"], (3,))

        # per-prim bounds: union over both time steps (conservative MB bounds,
        # the LBBox analog — exact MB4D time-split nodes are future work)
        lo = np.empty((T, 3), np.float32)
        up = np.empty((T, 3), np.float32)
        kind = rows[:, 0]
        data = rows[:, 5].astype(np.int64)
        # min-width: BVH bounds must cover the largest possible enlarged
        # radius (max_radius_scale * r) since the actual enlargement is
        # ray-origin dependent (context.h enlargeRadiusToMinWidth)
        mrs = np.float32(getattr(self, "max_radius_scale", 1.0))

        for k in np.unique(kind):
            sel = kind == k
            d = data[sel]
            if k == KIND_TRIANGLE:
                pts = [tri["v0"][d], tri["v1"][d], tri["v2"][d],
                       tri["v0b"][d], tri["v1b"][d], tri["v2b"][d]]
                a = np.minimum.reduce(pts); b = np.maximum.reduce(pts)
            elif k == KIND_QUAD:
                allv = np.concatenate([quad["v"][d], quad["vb"][d]], axis=1)
                a = allv.min(1); b = allv.max(1)
            elif k in (KIND_SPHERE, KIND_DISC, KIND_ORIENTED_DISC):
                a = np.minimum(pnt_c[d] - mrs * pnt_r[d][:, None],
                               pnt_cb[d] - mrs * pnt_rb[d][:, None])
                b = np.maximum(pnt_c[d] + mrs * pnt_r[d][:, None],
                               pnt_cb[d] + mrs * pnt_rb[d][:, None])
            elif k in (KIND_ROUND_LINE, KIND_FLAT_LINE):
                a = np.minimum.reduce(
                    [line["p0"][d] - mrs * line["r0"][d][:, None],
                     line["p1"][d] - mrs * line["r1"][d][:, None],
                     line["p0b"][d] - mrs * line["r0b"][d][:, None],
                     line["p1b"][d] - mrs * line["r1b"][d][:, None]])
                b = np.maximum.reduce(
                    [line["p0"][d] + mrs * line["r0"][d][:, None],
                     line["p1"][d] + mrs * line["r1"][d][:, None],
                     line["p0b"][d] + mrs * line["r0b"][d][:, None],
                     line["p1b"][d] + mrs * line["r1b"][d][:, None]])
            elif k in (KIND_CURVE_FLAT, KIND_CURVE_ROUND,
                       KIND_CURVE_ORIENTED, KIND_CURVE_DISTANCE):
                # Bezier convex hull dilated by the max control radius
                # (conservative vs the reference's accurateBounds)
                cpx = np.concatenate([curve_cp[d], curve_cpb[d]], axis=1)
                rmax = mrs * cpx[..., 3].max(axis=1)[:, None]
                a = cpx[..., :3].min(axis=1) - rmax
                b = cpx[..., :3].max(axis=1) + rmax
            elif k == KIND_USER:
                a = user_lo[d]; b = user_up[d]
            lo[sel] = a
            up[sel] = b

        # sanitize invalid primitive bounds (NaN/Inf/huge) so they cannot
        # poison morton codes or node bounds — such prims become zero-volume
        # boxes at the origin and can never produce hits (primrefgen's
        # invalid-prim filtering analog, GarbageGeometryTest parity)
        bad = (~np.isfinite(lo).all(axis=1) | ~np.isfinite(up).all(axis=1)
               | (np.abs(lo) > 1e18).any(axis=1) | (np.abs(up) > 1e18).any(axis=1))
        if bad.any():
            lo[bad] = 0.0
            up[bad] = 0.0

        getattr(self, "progress", lambda f: None)(0.5)
        kinds_present = tuple(sorted(int(x) for x in np.unique(kind)))

        windows = np.concatenate(self.prim_t01, axis=0).astype(np.float32)
        has_windows = bool((windows[:, 0] != 0.0).any()
                           or (windows[:, 1] != 1.0).any())
        if has_windows:
            # windowed prims are time-varying by construction (degenerate
            # all-equal steps still ride the motion path: lerp is a no-op)
            self.has_motion = True

        # packed fast-path eligibility: every kind encodable into the 9-field
        # leaf records, no filter/user callbacks (those force the composable
        # jnp engine). Quads expand to two triangle slots -> halved leaf size.
        # Time-sliced multi-step scenes add per-slot [t0,t1] window chunks.
        mwf = float(getattr(self, "min_width_factor", 0.0))
        packable = (set(kinds_present) <= _PACKED_KINDS
                    and not self.filters and not self.user_fns
                    and mwf == 0.0
                    # the kernel's ribbon runs ONE static CURVE_RATE;
                    # mixed-rate flat-curve scenes ride the jnp engine
                    and (KIND_CURVE_FLAT not in kinds_present
                         or len(curve_rates) <= 1)
                    # fat-jointed round lines need neighbor-cone clipping
                    # the packed record lacks
                    and not getattr(self, "fat_round_joints", False))
        leaf_size = LEAF_SIZE // (2 if (packable and KIND_QUAD in kinds_present)
                                  else 1)

        # ---------------- build (or refit) on host CPU backend ----------------
        cpu = jax.local_devices(backend="cpu")[0]
        # HIGH quality: spatial pre-splitting with a replication budget —
        # the reference's spatial-split tier (primrefgen_presplit.h:231,
        # max_spatial_split_replications state.h:117). Exact triangle
        # clipping for static triangles; conservative AABB halving otherwise.
        ref_ids = None
        if quality == BuildQuality.HIGH and refit_from is None and T >= 8:
            from .accel.presplit import presplit
            tri_sel = ((kind == KIND_TRIANGLE) if not self.has_motion
                       else np.zeros(T, bool))
            tv = np.zeros((T, 3, 3), np.float32)
            tsel = kind == KIND_TRIANGLE
            d = data[tsel]
            tv[tsel, 0] = tri["v0"][d]
            tv[tsel, 1] = tri["v1"][d]
            tv[tsel, 2] = tri["v2"][d]
            lo, up, ref_ids = presplit(
                lo, up, np.arange(T, dtype=np.int32), tri_sel,
                tv[:, 0], tv[:, 1], tv[:, 2],
                budget_factor=getattr(self, "max_ssr", 1.2))
            if ref_ids.shape[0] == T:
                ref_ids = None          # nothing split

        with jax.default_device(cpu):
            lo_d = jax.device_put(lo, cpu)
            up_d = jax.device_put(up, cpu)
            if refit_from is not None:
                bvh8 = jax.jit(refit_bvh)(
                    jax.device_put(refit_from.bvh, cpu), lo_d, up_d)
                self.last_n_wide = n_wide
            elif _native_build_enabled(T):
                # native C++ builder fast path (embree_tpu/native): the host
                # runtime analog of the reference's native builder stack
                from .native import build_bvh8_native
                nl, nu, nc, order, cnt = build_bvh8_native(
                    lo, up, leaf_size=leaf_size,
                    threads=getattr(self, "threads", 0))
                bvh8 = BVH(node_lower=jax.device_put(nl, cpu),
                           node_upper=jax.device_put(nu, cpu),
                           node_child=jax.device_put(nc, cpu),
                           prim_order=jax.device_put(order, cpu))
                n_wide = cnt
                self.last_n_wide = n_wide
            else:
                top_levels = 0 if quality == BuildQuality.LOW else 16
                bvh2 = jax.jit(partial(build_sah, leaf_size=leaf_size,
                                       max_top_levels=top_levels))(lo_d, up_d)
                bvh8, n_wide_arr = jax.jit(partial(collapse, width=8))(bvh2)
                n_wide = int(n_wide_arr)
                self.last_n_wide = n_wide

            if ref_ids is not None:
                # remap replicated refs back to merged prim ids (duplicated
                # leaf entries test the same prim twice — harmless)
                bvh8 = BVH(node_lower=bvh8.node_lower,
                           node_upper=bvh8.node_upper,
                           node_child=bvh8.node_child,
                           prim_order=jnp.asarray(ref_ids)[bvh8.prim_order])

            getattr(self, "progress", lambda f: None)(0.8)
            packed = None
            if packable:
                packed = _build_packed(
                    bvh8, n_wide, rows, kinds_present,
                    bool(self.has_motion), tri, quad,
                    pnt_c, pnt_r, pnt_n, pnt_cb, pnt_rb, pnt_nb, line,
                    windows if has_windows else None,
                    curve_cp=curve_cp.reshape(-1, 4, 4),
                    curve_cpb=curve_cpb.reshape(-1, 4, 4),
                    curve_rate=int(self.curve_rate))

        # compact mode: the packed table alone serves pure-triangle hits
        # (kernel-emitted u/v/Ng), so the unpacked duplicates are dropped —
        # scene_stats then shows only one resident copy (VERDICT r3 #10)
        compact = bool(getattr(self, "compact", False) and packed is not None
                       and packed.tri_attrs)
        if compact:
            z3 = np.zeros((0, 3), np.float32)
            tri = {k: z3 for k in tri}

        # ---------------- hair tier: strand-aligned leaf OBBs ----------------
        # Pure curve/line scenes get per-leaf oriented bounds tested at push
        # time (accel/obb.py; bvh_builder_hair.h:19 role). Presplit scenes
        # are excluded (replicated refs share leaf slots).
        import os as _os
        hair_elig = np.isin(kind, list(_HAIR_KINDS))
        hair_obb = (hair_elig.mean() >= 0.5 if T else False) \
            and ref_ids is None and T >= 8 \
            and _os.environ.get("EMBREE_TPU_HAIR_OBB", "1") != "0"
        if hair_obb:
            from .accel.obb import leaf_obbs
            pts = np.zeros((T, 8, 3), np.float32)
            paxis = np.zeros((T, 3), np.float32)
            prmax = np.zeros((T,), np.float32)
            for k in np.unique(kind):
                if k not in _HAIR_KINDS:
                    continue
                sel = kind == k
                d = data[sel]
                if k in (KIND_ROUND_LINE, KIND_FLAT_LINE):
                    p = np.stack([line["p0"][d], line["p1"][d],
                                  line["p0b"][d], line["p1b"][d]], axis=1)
                    pts[sel] = np.concatenate([p, p], axis=1)
                    paxis[sel] = line["p1"][d] - line["p0"][d]
                    prmax[sel] = mrs * np.maximum.reduce(
                        [line["r0"][d], line["r1"][d],
                         line["r0b"][d], line["r1b"][d]])
                else:
                    cc = curve_cp[d]
                    cb = curve_cpb[d]
                    pts[sel] = np.concatenate([cc[..., :3], cb[..., :3]], 1)
                    paxis[sel] = cc[:, 3, :3] - cc[:, 0, :3]
                    prmax[sel] = mrs * np.maximum(
                        cc[..., 3].max(1), cb[..., 3].max(1))
            obb_rot, obb_lo, obb_up = leaf_obbs(
                np.asarray(bvh8.node_child), np.asarray(bvh8.prim_order),
                pts, paxis, prmax, eligible=hair_elig)
        else:
            obb_rot = np.zeros((0, 3, 3), np.float32)
            obb_lo = np.zeros((0, 3), np.float32)
            obb_up = np.zeros((0, 3), np.float32)

        cs = CommittedScene(
            bvh=bvh8,
            prim_kind=rows[:, 0].astype(np.int32),
            prim_geom=rows[:, 1].astype(np.uint32),
            prim_local=rows[:, 2].astype(np.uint32),
            prim_inst=rows[:, 3:5].astype(np.uint32),
            prim_data=rows[:, 5].astype(np.int32),
            prim_mask=rows[:, 6].astype(np.uint32),
            prim_filter=rows[:, 7].astype(np.int32),
            tri_v0=tri["v0"], tri_v1=tri["v1"], tri_v2=tri["v2"],
            tri_v0b=tri["v0b"], tri_v1b=tri["v1b"], tri_v2b=tri["v2b"],
            quad_v=quad["v"], quad_vb=quad["vb"], quad_uvm=quad["uvm"],
            pnt_c=pnt_c, pnt_r=pnt_r, pnt_n=pnt_n, pnt_cb=pnt_cb,
            pnt_rb=pnt_rb, pnt_nb=pnt_nb,
            line_p0=line["p0"], line_r0=line["r0"],
            line_p1=line["p1"], line_r1=line["r1"],
            line_u0=line["u0"], line_u1=line["u1"],
            line_fl=line["fl"],
            line_pL=line["pL"], line_rL=line["rL"],
            line_pR=line["pR"], line_rR=line["rR"],
            line_p0b=line["p0b"], line_r0b=line["r0b"],
            line_p1b=line["p1b"], line_r1b=line["r1b"],
            line_pLb=line["pLb"], line_rLb=line["rLb"],
            line_pRb=line["pRb"], line_rRb=line["rRb"],
            curve_cp=curve_cp.reshape(-1, 4, 4), curve_cpb=curve_cpb.reshape(-1, 4, 4),
            curve_n=curve_n.reshape(-1, 4, 3), curve_nb=curve_nb.reshape(-1, 4, 3),
            user_lo=user_lo, user_up=user_up,
            packed=packed,
            prim_t0=windows[:, 0], prim_t1=windows[:, 1],
            curve_prate=curve_prate,
            leaf_obb_rot=obb_rot, leaf_obb_lo=obb_lo, leaf_obb_up=obb_up,
            kinds_present=kinds_present,
            has_motion=bool(self.has_motion),
            curve_rate=int(self.curve_rate),
            curve_rates_present=curve_rates,
            has_windows=has_windows,
            filters=tuple(self.filters),
            user_fns=tuple(self.user_fns),
            robust=robust,
            min_width_factor=mwf,
            max_radius_scale=float(mrs),
            compact=compact,
        )
        getattr(self, "progress", lambda f: None)(1.0)
        # local_devices: under multi-process jax.distributed, devices()[0]
        # may belong to another process (non-addressable)
        default = jax.local_devices()[0]
        arrays = jax.device_put(
            tuple(getattr(cs, f) for f in CommittedScene._ARRAY_FIELDS), default)
        return CommittedScene.tree_unflatten(
            tuple(getattr(cs, f) for f in CommittedScene._STATIC_FIELDS), arrays)


_PACKED_KINDS = {KIND_TRIANGLE, KIND_QUAD, KIND_SPHERE, KIND_DISC,
                 KIND_ORIENTED_DISC, KIND_ROUND_LINE, KIND_FLAT_LINE,
                 KIND_CURVE_FLAT}
# round curves in-kernel: the r5 PER-SEGMENT Newton polish (every
# cone-segment candidate polished, nearest confirmed root wins) improved
# on the r4 top-2 polish in unit tests, but curve0 still measures 1066
# wrong px through the kernel vs 1.4 through the 32-seed jnp sweep
# (budget 55) — the cone candidate generation itself misses roots the
# sweep finds (endcap/clip regions), not just their ordering. Staying
# opt-in; hair scenes keep the jnp engine.
import os as _os_pk
if _os_pk.environ.get("EMBREE_TPU_KERNEL_ROUND", "0") == "1":
    _PACKED_KINDS.add(KIND_CURVE_ROUND)
# native curve kinds widen the per-slot record to 16 fields (4 Bezier CPs
# x xyz+r — the CurveNv role, curveNv.h); all other kinds fit 9
_CURVE_PACKED = {KIND_CURVE_FLAT, KIND_CURVE_ROUND}


def _build_packed(bvh8, n_wide, rows, kinds_present, has_motion, tri, quad,
                  pnt_c, pnt_r, pnt_n, pnt_cb, pnt_rb, pnt_nb, line,
                  windows=None, curve_cp=None, curve_cpb=None,
                  curve_rate=4):
    """Encode the merged primitive table into per-slot generic-field records
    and pack them (accel/pack.py docstring for the layout). Runs on host
    numpy. Records are 9 fields wide, or 16 when native curve kinds are
    present (4 Bezier control points x xyz+radius per slot)."""
    T = rows.shape[0]
    kind = rows[:, 0]
    data = rows[:, 5].astype(np.int64)
    factor = 2 if KIND_QUAD in kinds_present else 1
    nf = 16 if (set(kinds_present) & _CURVE_PACKED) else 9
    S = T * factor
    fa = np.zeros((S, nf), np.float32)
    fb = np.zeros((S, nf), np.float32)
    skind = np.zeros(S, np.int32)
    smask = np.zeros(S, np.uint32)
    spid = np.full(S, -1, np.int32)
    base = np.arange(T, dtype=np.int64) * factor

    def put(sel, off, cols_a, cols_b, tag):
        idx = base[sel] + off
        arr_a = np.concatenate(cols_a, axis=-1)
        arr_b = np.concatenate(cols_b, axis=-1)
        fa[idx, :arr_a.shape[1]] = arr_a
        fb[idx, :arr_b.shape[1]] = arr_b
        skind[idx] = tag
        smask[idx] = rows[sel, 6].astype(np.uint32)
        spid[idx] = np.nonzero(sel)[0]

    def pad(n, k):
        return np.zeros((n, k), np.float32)

    for k in kinds_present:
        sel = kind == k
        d = data[sel]
        n = d.shape[0]
        if k == KIND_TRIANGLE:
            put(sel, 0, (tri["v0"][d], tri["v1"][d] - tri["v0"][d],
                         tri["v2"][d] - tri["v0"][d]),
                (tri["v0b"][d], tri["v1b"][d] - tri["v0b"][d],
                 tri["v2b"][d] - tri["v0b"][d]), KIND_TRIANGLE)
        elif k == KIND_QUAD:
            qa, qb = quad["v"][d], quad["vb"][d]        # (n, 4, 3)
            put(sel, 0, (qa[:, 0], qa[:, 1] - qa[:, 0], qa[:, 3] - qa[:, 0]),
                (qb[:, 0], qb[:, 1] - qb[:, 0], qb[:, 3] - qb[:, 0]),
                KIND_TRIANGLE)
            put(sel, 1, (qa[:, 2], qa[:, 3] - qa[:, 2], qa[:, 1] - qa[:, 2]),
                (qb[:, 2], qb[:, 3] - qb[:, 2], qb[:, 1] - qb[:, 2]),
                KIND_TRIANGLE)
        elif k in (KIND_SPHERE, KIND_DISC):
            put(sel, 0, (pnt_c[d], pnt_r[d][:, None], pad(n, 5)),
                (pnt_cb[d], pnt_rb[d][:, None], pad(n, 5)), k)
        elif k == KIND_ORIENTED_DISC:
            put(sel, 0, (pnt_c[d], pnt_r[d][:, None], pnt_n[d], pad(n, 2)),
                (pnt_cb[d], pnt_rb[d][:, None], pnt_nb[d], pad(n, 2)), k)
        elif k in (KIND_ROUND_LINE, KIND_FLAT_LINE):
            flc = line["fl"][d][:, None]
            put(sel, 0, (line["p0"][d], line["r0"][d][:, None],
                         line["p1"][d], line["r1"][d][:, None], flc),
                (line["p0b"][d], line["r0b"][d][:, None],
                 line["p1b"][d], line["r1b"][d][:, None], flc), k)
        elif k in (KIND_CURVE_FLAT, KIND_CURVE_ROUND):
            # 16 fields: Bezier CP j at 4j..4j+3 = (x, y, z, r)
            put(sel, 0, (curve_cp[d].reshape(-1, 16),),
                (curve_cpb[d].reshape(-1, 16),), k)

    classes = tuple(sorted({int(t) for t in np.unique(skind[spid >= 0])}))
    has_kinds = classes != (KIND_TRIANGLE,)
    has_mask = bool(np.any(rows[:, 6] != 0xFFFFFFFF))
    slot_t01 = None
    if windows is not None:
        # per-slot [t0,t1]: every expansion slot inherits its prim's window
        slot_t01 = np.zeros((S, 2), np.float32)
        slot_t01[:, 1] = 1.0
        slot_t01[np.repeat(base, factor) + np.tile(np.arange(factor), T)] = \
            np.repeat(windows, factor, axis=0)
    return pack(bvh8, n_wide, fa, fb, skind, smask, spid,
                slot_factor=factor, has_mask=has_mask, has_motion=has_motion,
                has_kinds=has_kinds, kind_classes=classes, slot_t01=slot_t01,
                curve_rate=curve_rate)


def _native_build_enabled(n_prims: int) -> bool:
    import os
    flag = os.environ.get("EMBREE_TPU_NATIVE_BUILD", "auto")
    if flag in ("0", "off", "false"):
        return False
    try:
        from .native import native_available
    except Exception:
        return False
    if flag in ("1", "on", "true"):
        return native_available()
    # auto: native wins decisively above ~50k prims (15x at 200k)
    return n_prims >= 50000 and native_available()


def _uvm_identity(n):
    """Identity affine uv frame [ou, ov, m2, m3, m4, m5] with
    u_base = ou + u*m2 + v*m4, v_base = ov + u*m3 + v*m5."""
    m = np.zeros((n, 6), np.float32)
    m[:, 2] = 1.0
    m[:, 5] = 1.0
    return m


def _compose_affine(a, b):
    """3x4 affine composition on numpy: (a . b)(x) = a(b(x))."""
    out = np.zeros((3, 4), np.float32)
    out[:3, :3] = a[:3, :3] @ b[:3, :3]
    out[:3, 3] = a[:3, :3] @ b[:3, 3] + a[:3, 3]
    return out


# =====================================================================
# query functions (pure, jittable) — rtcIntersect* / rtcOccluded* analogs
# =====================================================================

def _kind_test(scene: CommittedScene, k: int, didx, org, dir, time, tnear, tfar):
    """Closed-form intersect for prims of kind k (full hit info)."""
    def minw(c, r):
        # enlargeRadiusToMinWidth (context.h:65-74): radii grow with distance
        # from the ray origin so thin prims stay >= min_width pixels wide
        if scene.min_width_factor <= 0.0:
            return r
        o = org.reshape(org.shape[:-1] + (1,) * (c.ndim - org.ndim) + (3,))
        d = jnp.sqrt(jnp.maximum(jnp.sum((c - o) ** 2, -1), 0.0))
        return jnp.clip(scene.min_width_factor * d, r,
                        scene.max_radius_scale * r)

    def lerp(a, b):
        if not scene.has_motion:
            return a
        # broadcast time over a's non-ray dims; didx may be scalar (the
        # brute-force per-prim scan) or per-ray — a's leading ray dims
        # mirror didx's rank
        w = time.reshape(time.shape + (1,) * (a.ndim - jnp.ndim(didx)))
        return a * (1 - w) + b * w

    if k == KIND_TRIANGLE:
        i = jnp.clip(didx, 0, max(scene.tri_v0.shape[0] - 1, 0))
        # robust scenes use the watertight Plücker test (the reference's
        # robust accel variants, scene.cpp:156-196 mode selection)
        fn = (tri_ops.intersect_pluecker if scene.robust
              else tri_ops.intersect_moeller)
        return fn(
            org, dir, lerp(scene.tri_v0[i], scene.tri_v0b[i]),
            lerp(scene.tri_v1[i], scene.tri_v1b[i]),
            lerp(scene.tri_v2[i], scene.tri_v2b[i]), tnear, tfar)
    if k == KIND_QUAD:
        i = jnp.clip(didx, 0, max(scene.quad_v.shape[0] - 1, 0))
        q = lerp(scene.quad_v[i], scene.quad_vb[i])
        hit, t, u, v, ng = quad_ops.intersect_quad(
            org, dir, q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :],
            tnear, tfar)
        m = scene.quad_uvm[i]
        # affine frame: u_base = m0 + u*m2 + v*m4 (see subdiv.py)
        ug = m[..., 0] + u * m[..., 2] + v * m[..., 4]
        vg = m[..., 1] + u * m[..., 3] + v * m[..., 5]
        return hit, t, ug, vg, ng
    if k in (KIND_SPHERE, KIND_DISC, KIND_ORIENTED_DISC):
        i = jnp.clip(didx, 0, max(scene.pnt_c.shape[0] - 1, 0))
        c = lerp(scene.pnt_c[i], scene.pnt_cb[i])
        r = minw(c, lerp(scene.pnt_r[i], scene.pnt_rb[i]))
        if k == KIND_SPHERE:
            return point_ops.intersect_sphere(org, dir, c, r, tnear, tfar)
        if k == KIND_DISC:
            return point_ops.intersect_disc(org, dir, c, r, tnear, tfar)
        return point_ops.intersect_oriented_disc(
            org, dir, c, r, lerp(scene.pnt_n[i], scene.pnt_nb[i]),
            tnear, tfar)
    if k in (KIND_ROUND_LINE, KIND_FLAT_LINE):
        i = jnp.clip(didx, 0, max(scene.line_p0.shape[0] - 1, 0))
        p0 = lerp(scene.line_p0[i], scene.line_p0b[i])
        p1 = lerp(scene.line_p1[i], scene.line_p1b[i])
        r0 = minw(p0, lerp(scene.line_r0[i], scene.line_r0b[i]))
        r1 = minw(p1, lerp(scene.line_r1[i], scene.line_r1b[i]))
        if k == KIND_ROUND_LINE:
            pL = lerp(scene.line_pL[i], scene.line_pLb[i])
            pR = lerp(scene.line_pR[i], scene.line_pRb[i])
            rL = lerp(scene.line_rL[i], scene.line_rLb[i])
            rR = lerp(scene.line_rR[i], scene.line_rRb[i])
            if scene.min_width_factor > 0.0:
                rL = jnp.where(rL >= 0, minw(pL, rL), rL)
                rR = jnp.where(rR >= 0, minw(pR, rR), rR)
            hit, t, s, v, ng = line_ops.intersect_round_line(
                org, dir, p0, r0, p1, r1, tnear, tfar,
                begin_cap=scene.line_fl[i] < 0.5,
                neighbors=(pL, rL, pR, rR))
        else:
            hit, t, s, v, ng = line_ops.intersect_flat_line(
                org, dir, p0, r0, p1, r1, tnear, tfar)
        # map sub-segment param into curve-global u
        u = scene.line_u0[i] * (1 - s) + scene.line_u1[i] * s
        return hit, t, u, v, ng
    if k in (KIND_CURVE_FLAT, KIND_CURVE_ROUND, KIND_CURVE_ORIENTED,
             KIND_CURVE_DISTANCE):
        i = jnp.clip(didx, 0, max(scene.curve_cp.shape[0] - 1, 0))
        cp = lerp(scene.curve_cp[i], scene.curve_cpb[i])
        if scene.min_width_factor > 0.0:
            cp = jnp.concatenate(
                [cp[..., :3], minw(cp[..., :3], cp[..., 3])[..., None]], -1)
        if k == KIND_CURVE_DISTANCE:
            return curve_ops.intersect_distance(org, dir, cp, tnear, tfar)
        if k == KIND_CURVE_FLAT:
            # one ribbon evaluation per DISTINCT geometry rate, merged by
            # each prim's own rate — the faceting of a low-rate geometry is
            # part of the rendered shape (rtcSetGeometryTessellationRate)
            rates = tuple(scene.curve_rates_present) or (scene.curve_rate,)
            out = None
            pr = scene.curve_prate[i]
            for r in rates:
                hr = curve_ops.intersect_ribbon(org, dir, cp, tnear, tfar,
                                                n_seg=int(r))
                if out is None:
                    out = list(hr)
                else:
                    sel = pr == r
                    out = [jnp.where(sel[..., None] if a.ndim > sel.ndim
                                     else sel, a, b)
                           for a, b in zip(hr, out)]
            return tuple(out)
        if k == KIND_CURVE_ORIENTED:
            ncp = lerp(scene.curve_n[i], scene.curve_nb[i])
            return curve_ops.intersect_oriented(org, dir, cp, ncp, tnear, tfar)
        return curve_ops.intersect_sweep(org, dir, cp, tnear, tfar)
    if k == KIND_USER:
        hit = jnp.zeros(tnear.shape, bool)
        t = jnp.full_like(tnear, jnp.inf)
        u = jnp.zeros_like(tnear); v = jnp.zeros_like(tnear)
        ng = jnp.zeros(tnear.shape + (3,), jnp.float32)
        for gid, fn in scene.user_fns:
            h2, t2, u2, v2, ng2 = fn(didx, org, dir, tnear, tfar)
            use = h2 & (t2 < t)
            hit = hit | h2
            u = jnp.where(use, u2, u)
            v = jnp.where(use, v2, v)
            ng = jnp.where(use[..., None], ng2, ng)
            t = jnp.where(use, t2, t)
        return hit, t, u, v, ng
    raise ValueError(f"unknown prim kind {k}")


def _run_filter(fn, context, org, dir, t, u, v, ng, prim_local, geom):
    """Invoke a geometry filter in either calling convention.

    Legacy (8 args): fn(org, dir, t, u, v, ng, prim_id, geom_id) -> keep.
    Full (9 args, filter.h:15 parity): fn(context, org, dir, t, u, v, ng,
    prim_id, geom_id) -> (keep, updates) where context is "intersect" or
    "occluded" (the rtcIntersect/rtcOccluded filter split) and updates is
    None or a dict that may override the reported hit's "u"/"v"/"ng"
    (reference filters may modify the hit; modifying t is not supported —
    it would reorder traversal)."""
    import inspect
    try:
        nargs = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        nargs = 8
    if nargs >= 9:
        keep, updates = fn(context, org, dir, t, u, v, ng, prim_local, geom)
        return keep, updates
    return fn(org, dir, t, u, v, ng, prim_local, geom), None


def _apply_filters(scene, accept, prim, org, dir, t, u, v, ng,
                   context="intersect"):
    """Run geometry intersection filters (filter.h:15 analog): a filter may
    reject a hit, letting traversal continue past it."""
    if not scene.filters:
        return accept
    geom = scene.prim_geom[prim]
    fslot = scene.prim_filter[prim]
    for fi, (gid, fn) in enumerate(scene.filters):
        applies = fslot == fi
        keep, _ = _run_filter(fn, context, org, dir, t, u, v, ng,
                              scene.prim_local[prim], geom)
        accept = jnp.where(applies, accept & keep, accept)
    return accept


def _apply_filter_updates(scene, prim, org, dir, t, u, v, ng):
    """Re-run full-convention filters on the accepted hit and fold in their
    hit modifications (the reference's filter-may-modify-hit semantics)."""
    if not scene.filters:
        return u, v, ng
    geom = scene.prim_geom[prim]
    fslot = scene.prim_filter[prim]
    for fi, (gid, fn) in enumerate(scene.filters):
        keep, updates = _run_filter(fn, "intersect", org, dir, t, u, v, ng,
                                    scene.prim_local[prim], geom)
        if not updates:
            continue
        sel = fslot == fi
        if "u" in updates:
            u = jnp.where(sel, updates["u"], u)
        if "v" in updates:
            v = jnp.where(sel, updates["v"], v)
        if "ng" in updates:
            ng = jnp.where(sel[..., None], updates["ng"], ng)
    return u, v, ng


def _local_time(scene: CommittedScene, prim, time):
    """Map global ray time into a time-sliced prim's window-local [0,1]
    lerp weight, plus the window membership mask (MSMBlur itime analog)."""
    if not scene.has_windows:
        return time, True
    t0 = scene.prim_t0[prim]
    t1 = scene.prim_t1[prim]
    tl = jnp.clip((time - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    return tl, (time >= t0) & (time <= t1)


def _make_prim_test(scene: CommittedScene, rays: RayBatch,
                    context: str = "intersect"):
    def prim_test(prim, valid, org, dir, tnear, tfar):
        kind = scene.prim_kind[prim]
        didx = scene.prim_data[prim]
        tloc, in_win = _local_time(scene, prim, rays.time)
        hit = jnp.zeros(tnear.shape, bool)
        t = jnp.full_like(tnear, jnp.inf)
        u = jnp.zeros_like(tnear); v = jnp.zeros_like(tnear)
        ng = jnp.zeros(tnear.shape + (3,), jnp.float32)
        for k in scene.kinds_present:
            h, tk, uk, vk, ngk = _kind_test(scene, k, didx, org, dir,
                                            tloc, tnear, tfar)
            sel = (kind == k)
            hit = jnp.where(sel, h, hit)
            t = jnp.where(sel, tk, t)
            u = jnp.where(sel, uk, u)
            v = jnp.where(sel, vk, v)
            ng = jnp.where(sel[..., None], ngk, ng)
        hit = hit & in_win & ((rays.mask & scene.prim_mask[prim]) != 0)
        hit = _apply_filters(scene, hit, prim, org, dir, t, u, v, ng,
                             context=context)
        return hit, t
    return prim_test


def _use_pallas(scene: CommittedScene, backend: Optional[str]) -> bool:
    if backend == "jnp":
        return False
    if backend == "pallas":
        return True
    # auto: compiled Pallas kernel on TPU only, and only for scenes the
    # packed table supports (tri/quad/point/line kinds incl. 2-step motion
    # and masks; filters and user callbacks force the composable jnp engine).
    # Compact scenes have no unpacked tables, so the packed path is the
    # only one able to serve them (interpreted on CPU).
    if scene.packed is None:
        return False
    if getattr(scene, "compact", False):
        return True
    return jax.devices()[0].platform != "cpu"


def _traverse_select(scene: CommittedScene, flat: RayBatch, occlusion: bool,
                     backend: Optional[str]):
    """Run traversal, return best_prim (merged-table index, -1 = miss)."""
    if _use_pallas(scene, backend):
        _, best = trav_pallas.traverse_packed(
            scene.packed, flat.org, flat.dir, flat.tnear, flat.tfar,
            flat.mask.astype(jnp.int32), occlusion=occlusion,
            interpret=PALLAS_INTERPRET
            or jax.devices()[0].platform == "cpu", robust=scene.robust,
            time=flat.time)
        return best
    result = trav_mod.traverse(
        scene.bvh,
        _make_prim_test(scene, flat,
                        context="occluded" if occlusion else "intersect"),
        flat.org, flat.dir, flat.tnear, flat.tfar,
        occlusion=occlusion, max_leaf_size=LEAF_SIZE, robust=scene.robust,
        leaf_obb=_scene_leaf_obb(scene))
    return result.best_prim


def _scene_leaf_obb(scene: CommittedScene):
    """Hair-tier OBB tables for traverse(), or None when the tier is off
    (zero-size tables; the shape is static under jit)."""
    rot = getattr(scene, "leaf_obb_rot", None)
    if rot is None or rot.shape[0] == 0:
        return None
    return (scene.leaf_obb_rot, scene.leaf_obb_lo, scene.leaf_obb_up)


def intersect(scene: CommittedScene, rays: RayBatch,
              backend: Optional[str] = None,
              differentiable: bool = True) -> HitBatch:
    """Closest-hit query. Returns a HitBatch with the same leading shape as rays.

    Differentiable w.r.t. scene geometry and ray org/dir: the traversal loop
    only *selects* the winning primitive (structure treated as constant — the
    correct semantics for interior hits, SURVEY.md §7 hard-part 5); t/u/v/Ng
    are then recomputed differentiably by re-intersecting that primitive.

    differentiable=False skips the differentiable re-intersection: on
    pure-triangle Pallas scenes the kernel emits exact t/u/v/Ng directly
    (~2x faster end-to-end; gradients through the returned hit are zero).
    The reference rtcIntersect1 has no gradient path at all, so this is the
    apples-to-apples configuration for benchmarks.
    """
    if not isinstance(scene, CommittedScene):   # TwoLevelScene duck-dispatch
        from .tlas import intersect_two_level
        return intersect_two_level(scene, rays)
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)) if shape else 1)

    sg_scene = jax.lax.stop_gradient(scene)
    sg_flat = jax.lax.stop_gradient(flat)

    fast = (not differentiable) or getattr(sg_scene, "compact", False)
    if fast and _use_pallas(sg_scene, backend):
        res = trav_pallas.traverse_packed(
            sg_scene.packed, sg_flat.org, sg_flat.dir, sg_flat.tnear,
            sg_flat.tfar, sg_flat.mask.astype(jnp.int32), occlusion=False,
            interpret=PALLAS_INTERPRET
            or jax.devices()[0].platform == "cpu", robust=sg_scene.robust,
            time=sg_flat.time, want_attrs=True,
            id_tables=(sg_scene.prim_local, sg_scene.prim_geom)
            + tuple(sg_scene.prim_inst[:, j]
                    for j in range(sg_scene.prim_inst.shape[1])))
        if len(res) == 3 and res[2] is not None:
            t_k, best, attrs = res
            found = best >= 0
            inf = jnp.full_like(t_k, jnp.inf)
            inst = jnp.stack(attrs["ids"][2:], axis=-1)
            hit = HitBatch(
                t=jnp.where(found, t_k, inf),
                u=jnp.where(found, attrs["u"], 0.0),
                v=jnp.where(found, attrs["v"], 0.0),
                ng=jnp.where(found[..., None], attrs["ng"], 0.0),
                prim_id=jnp.where(found, attrs["ids"][0],
                                  INVALID_ID).astype(jnp.uint32),
                geom_id=jnp.where(found, attrs["ids"][1],
                                  INVALID_ID).astype(jnp.uint32),
                inst_id=jnp.where(found[..., None], inst,
                                  INVALID_ID).astype(jnp.uint32),
            )
            return jax.tree.map(
                lambda a: a.reshape(shape + a.shape[1:]), hit)
        best = res[1]
    else:
        best = _traverse_select(sg_scene, sg_flat, occlusion=False,
                                backend=backend)

    hits = _reconstruct_hits(scene, flat, best)
    return jax.tree.map(lambda a: a.reshape(shape + a.shape[1:]), hits)


def occluded(scene: CommittedScene, rays: RayBatch,
             backend: Optional[str] = None) -> jnp.ndarray:
    """Any-hit query. Returns bool array (reference encodes tfar=-inf, ray.h:196)."""
    if not isinstance(scene, CommittedScene):   # TwoLevelScene duck-dispatch
        from .tlas import occluded_two_level
        return occluded_two_level(scene, rays)
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)) if shape else 1)
    best = _traverse_select(scene, flat, occlusion=True, backend=backend)
    return (best >= 0).reshape(shape)


def _reconstruct_hits(scene: CommittedScene, rays: RayBatch, best_prim) -> HitBatch:
    """Re-intersect the winning primitive per ray to recover t, u, v, Ng, ids.

    This pass carries the gradient: d(hit)/d(geometry, org, dir) flows through
    the closed-form solves, while the discrete selection is constant.
    """
    found = best_prim >= 0
    prim = jnp.maximum(best_prim, 0)
    kind = scene.prim_kind[prim]
    didx = scene.prim_data[prim]
    tloc, _ = _local_time(scene, prim, rays.time)

    t = jnp.full_like(rays.tnear, jnp.inf)
    u = jnp.zeros_like(rays.tnear); v = jnp.zeros_like(rays.tnear)
    ng = jnp.zeros(rays.tnear.shape + (3,), jnp.float32)
    # near bound: the ray's tnear minus an fp-wobble margin — NOT -inf:
    # multi-root prims (spheres, round curves) would otherwise report the
    # behind-origin root when the ray starts inside them. tfar stays wide
    # (the nearest root >= tnear is unique for the fixed winning prim).
    wide_near = rays.tnear - 1e-4 * jnp.abs(rays.tnear) - 1e-5
    wide_far = jnp.full_like(rays.tfar, jnp.inf)
    for k in scene.kinds_present:
        _, tk, uk, vk, ngk = _kind_test(scene, k, didx, rays.org, rays.dir,
                                        tloc, wide_near, wide_far)
        sel = (kind == k)
        t = jnp.where(sel, tk, t)
        u = jnp.where(sel, uk, u)
        v = jnp.where(sel, vk, v)
        ng = jnp.where(sel[..., None], ngk, ng)

    # filters may modify the reported hit (filter.h semantics)
    u, v, ng = _apply_filter_updates(scene, prim, rays.org, rays.dir,
                                     t, u, v, ng)

    miss = make_miss_hits(rays.shape)
    hit = HitBatch(
        t=t, u=u, v=v, ng=ng,
        prim_id=scene.prim_local[prim],
        geom_id=scene.prim_geom[prim],
        inst_id=scene.prim_inst[prim],
    )
    return ray_mod.select_hits(found, hit, miss)


def intersect_brute(scene: CommittedScene, rays: RayBatch) -> HitBatch:
    """Ground-truth O(R*T) intersector for testing (no BVH)."""
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)))
    T = scene.num_prims
    prim_test = _make_prim_test(scene, flat)

    def scan_prim(carry, prim):
        t_far, best = carry
        hit, t = prim_test(prim, jnp.ones(t_far.shape, bool),
                           flat.org, flat.dir, flat.tnear, t_far)
        # ascending scan + strict improvement = lowest prim id wins exact
        # ties (matches the BVH engine's deterministic tie-break)
        better = hit & ((t < t_far) | (best < 0))
        t_far = jnp.where(better, t, t_far)
        best = jnp.where(better, prim, best)
        return (t_far, best), None

    (t_out, best), _ = jax.lax.scan(
        scan_prim, (flat.tfar, jnp.full(flat.shape, -1, jnp.int32)),
        jnp.arange(T, dtype=jnp.int32))
    hits = _reconstruct_hits(scene, flat, best)
    return jax.tree.map(lambda a: a.reshape(shape + a.shape[1:]), hits)
