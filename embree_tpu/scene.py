"""Scene: geometry container + commit (BVH build) + intersect/occluded queries.

Role parity with the reference runtime core (kernels/common/scene.{h,cpp}:
Scene::commit_internal scene.cpp:939, build_cpu_accels :762; geometry types
kernels/common/scene_triangle_mesh.h etc.; query dispatch kernels/common/rtcore.cpp:599
rtcIntersect1) — redesigned functional:

- A ``Scene`` is a host-side container of geometries (the mutable API object).
- ``Scene.commit()`` lowers everything into a ``CommittedScene`` — a pytree of
  device arrays (merged primitive SoA + BVH) that is the "Traversable": it can be
  passed straight into jit/pjit functions, donated, sharded, or checkpointed
  (the array-native analog of RTCTraversable, rtcore_scene.h:102).
- ``intersect``/``occluded`` are pure jittable functions over (CommittedScene,
  RayBatch).

The reference keeps one accel per geometry type and loops AccelN over them per ray
(acceln.cpp:44). We instead merge all primitives of all geometries into ONE typed
primitive table under ONE BVH with type-tagged prims — a deliberate divergence that
keeps traversal a single dense kernel (SURVEY.md §A.2 note).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core import ray as ray_mod
from .core.math import rcp_safe
from .core.ray import INVALID_ID, HitBatch, RayBatch, make_miss_hits
from .ops import triangle as tri_ops
from .accel.bvh import BVH
from .accel.lbvh import build_lbvh
from .accel.sah import build_sah
from .accel.collapse import collapse
from .accel.pack import PackedScene, pack
from .accel import traverse as trav_mod
from .accel import traverse_pallas as trav_pallas

# Static leaf block size for scene BVHs (TriangleM M=4 analog, triangle.h:14).
LEAF_SIZE = 4


class BuildQuality:
    """RTCBuildQuality analog (rtcore_common.h)."""
    LOW = 0      # Morton/LBVH
    MEDIUM = 1   # binned SAH
    HIGH = 2     # SAH + spatial splits (later milestone)
    REFIT = 3    # refit existing topology


@dataclasses.dataclass
class TriangleGeometry:
    """RTC_GEOMETRY_TYPE_TRIANGLE analog (scene_triangle_mesh.h)."""
    vertices: jnp.ndarray  # (n_verts, 3) float32
    indices: jnp.ndarray   # (n_tris, 3) int32
    mask: int = 0xFFFFFFFF
    enabled: bool = True

    @property
    def num_prims(self):
        return self.indices.shape[0]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CommittedScene:
    """Device-resident traversable: merged primitive SoA + BVH (+ packed
    record table for the Pallas kernel)."""
    bvh: BVH
    tri_v0: jnp.ndarray        # (T, 3) float32
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    prim_geom_id: jnp.ndarray  # (T,) uint32
    prim_local_id: jnp.ndarray # (T,) uint32
    geom_mask: jnp.ndarray     # (n_geoms,) uint32
    packed: Optional[PackedScene] = None

    def tree_flatten(self):
        return ((self.bvh, self.tri_v0, self.tri_v1, self.tri_v2,
                 self.prim_geom_id, self.prim_local_id, self.geom_mask,
                 self.packed), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_prims(self):
        return self.tri_v0.shape[0]


class Scene:
    """Mutable geometry container; commit() produces a CommittedScene."""

    def __init__(self, quality: int = BuildQuality.MEDIUM):
        self.quality = quality
        self._geoms: Dict[int, TriangleGeometry] = {}
        self._next_id = 0
        self.committed: Optional[CommittedScene] = None

    def attach(self, geom: TriangleGeometry) -> int:
        """rtcAttachGeometry analog; returns the geometry id."""
        gid = self._next_id
        self._geoms[gid] = geom
        self._next_id += 1
        return gid

    def detach(self, geom_id: int):
        del self._geoms[geom_id]

    def get(self, geom_id: int) -> TriangleGeometry:
        return self._geoms[geom_id]

    def commit(self) -> CommittedScene:
        """Merge geometries and build the BVH (rtcCommitScene analog).

        Geometry merge + build run on host (numpy / CPU jax backend) — eager
        dispatch to a remote TPU is orders of magnitude slower per op; only the
        finished traversable is transferred (see device transfer below)."""
        v0s, v1s, v2s, gids, pids = [], [], [], [], []
        n_geoms = max(self._next_id, 1)
        geom_mask = np.full(n_geoms, 0xFFFFFFFF, np.uint32)
        for gid, g in sorted(self._geoms.items()):
            geom_mask[gid] = np.uint32(g.mask)
            if not g.enabled or g.num_prims == 0:
                continue
            tri = np.asarray(g.vertices, np.float32)[np.asarray(g.indices, np.int32)]
            v0s.append(tri[:, 0]); v1s.append(tri[:, 1]); v2s.append(tri[:, 2])
            n = g.num_prims
            gids.append(np.full(n, gid, np.uint32))
            pids.append(np.arange(n, dtype=np.uint32))

        if not v0s:
            raise ValueError("commit() on empty scene")

        tri_v0 = np.concatenate(v0s)
        tri_v1 = np.concatenate(v1s)
        tri_v2 = np.concatenate(v2s)
        prim_geom_id = np.concatenate(gids)
        prim_local_id = np.concatenate(pids)

        # Build on the host CPU backend (fast compiles, cheap eager dispatch),
        # then transfer the finished traversable to the default device — the
        # analog of the reference building on CPU and uploading RTAS for GPU
        # (rthwif_embree_builder.cpp).
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            tri_v0c = jax.device_put(tri_v0, cpu)
            tri_v1c = jax.device_put(tri_v1, cpu)
            tri_v2c = jax.device_put(tri_v2, cpu)
            prim_geom_id = jax.device_put(prim_geom_id, cpu)
            prim_local_id = jax.device_put(prim_local_id, cpu)
            lo = jnp.minimum(jnp.minimum(tri_v0c, tri_v1c), tri_v2c)
            up = jnp.maximum(jnp.maximum(tri_v0c, tri_v1c), tri_v2c)
            # quality tiering mirrors the reference accel selection
            # (scene.cpp:152-274): LOW -> morton-only, MEDIUM/HIGH -> SAH top.
            top_levels = 0 if self.quality == BuildQuality.LOW else 16
            bvh2 = jax.jit(partial(build_sah, leaf_size=LEAF_SIZE,
                                   max_top_levels=top_levels))(lo, up)
            bvh8, n_wide = jax.jit(partial(collapse, width=8))(bvh2)
            geom_mask_arr = jnp.asarray(geom_mask)
            mask_per_prim = geom_mask_arr[prim_geom_id.astype(jnp.int32)]
            packed = pack(bvh8, int(n_wide), tri_v0c, tri_v1c, tri_v2c,
                          mask_per_prim)

        default = jax.devices()[0]
        (bvh8, geom_mask_arr, packed, tri_v0, tri_v1, tri_v2,
         prim_geom_id, prim_local_id) = jax.device_put(
            (bvh8, geom_mask_arr, packed, tri_v0c, tri_v1c, tri_v2c,
             prim_geom_id, prim_local_id), default)

        self.committed = CommittedScene(
            bvh=bvh8, tri_v0=tri_v0, tri_v1=tri_v1, tri_v2=tri_v2,
            prim_geom_id=prim_geom_id, prim_local_id=prim_local_id,
            geom_mask=geom_mask_arr, packed=packed)
        return self.committed


# ---------------------------------------------------------------------------
# Query functions (pure, jittable) — rtcIntersect* / rtcOccluded* analogs
# ---------------------------------------------------------------------------

def _make_prim_test(scene: CommittedScene, ray_mask):
    def prim_test(prim, valid, org, dir, tnear, tfar):
        v0 = scene.tri_v0[prim]
        v1 = scene.tri_v1[prim]
        v2 = scene.tri_v2[prim]
        hit, t, _, _, _ = tri_ops.intersect_moeller(org, dir, v0, v1, v2, tnear, tfar)
        # ray mask test (filter.h epilog analog; RayMasksTest parity)
        gmask = scene.geom_mask[scene.prim_geom_id[prim].astype(jnp.int32)]
        hit = hit & ((ray_mask & gmask) != 0)
        return hit, t
    return prim_test


def _use_pallas(scene: CommittedScene, backend: Optional[str]) -> bool:
    if backend == "jnp":
        return False
    if backend == "pallas":
        return True
    # auto: the Pallas kernel runs compiled on TPU only (tests opt in to
    # interpret mode explicitly via backend="pallas" + PALLAS_INTERPRET)
    return scene.packed is not None and jax.devices()[0].platform != "cpu"


PALLAS_INTERPRET = False  # set True in CPU tests to run the kernel interpreted


def _traverse_select(scene: CommittedScene, flat: RayBatch, occlusion: bool,
                     backend: Optional[str]):
    """Run traversal, return best_prim (global prim index, -1 = miss)."""
    if _use_pallas(scene, backend):
        _, best = trav_pallas.traverse_packed(
            scene.packed, flat.org, flat.dir, flat.tnear, flat.tfar,
            flat.mask.astype(jnp.int32), occlusion=occlusion,
            interpret=PALLAS_INTERPRET)
        return best
    result = trav_mod.traverse(
        scene.bvh, _make_prim_test(scene, flat.mask),
        flat.org, flat.dir, flat.tnear, flat.tfar,
        occlusion=occlusion, max_leaf_size=LEAF_SIZE)
    return result.best_prim


def intersect(scene: CommittedScene, rays: RayBatch,
              backend: Optional[str] = None) -> HitBatch:
    """Closest-hit query. Returns a HitBatch with the same leading shape as rays.

    Differentiable w.r.t. scene vertices and ray org/dir: the traversal loop only
    *selects* the winning primitive (structure treated as constant — the correct
    semantics for interior hits, SURVEY.md §7 hard-part 5); t/u/v/Ng are then
    recomputed differentiably by re-intersecting that primitive.
    """
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)) if shape else 1)

    # Traversal is pure discrete selection — block gradients through it.
    sg_scene = jax.lax.stop_gradient(scene)
    sg_flat = jax.lax.stop_gradient(flat)
    best = _traverse_select(sg_scene, sg_flat, occlusion=False, backend=backend)

    hits = _reconstruct_hits(scene, flat, best)
    return jax.tree.map(lambda a: a.reshape(shape + a.shape[1:]), hits)


def occluded(scene: CommittedScene, rays: RayBatch,
             backend: Optional[str] = None) -> jnp.ndarray:
    """Any-hit query. Returns bool array (reference encodes as tfar=-inf, ray.h:196)."""
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)) if shape else 1)
    best = _traverse_select(scene, flat, occlusion=True, backend=backend)
    return (best >= 0).reshape(shape)


def _reconstruct_hits(scene: CommittedScene, rays: RayBatch, best_prim) -> HitBatch:
    """Re-intersect the winning primitive per ray to recover t, u, v, Ng, ids.

    This pass carries the gradient: d(hit)/d(vertices, org, dir) flows through the
    closed-form Möller solve, while the discrete selection (best_prim) is constant.
    """
    found = best_prim >= 0
    prim = jnp.maximum(best_prim, 0)
    v0 = scene.tri_v0[prim]
    v1 = scene.tri_v1[prim]
    v2 = scene.tri_v2[prim]
    _, t, u, v, ng = tri_ops.intersect_moeller(
        rays.org, rays.dir, v0, v1, v2,
        jnp.full_like(rays.tnear, -jnp.inf), jnp.full_like(rays.tfar, jnp.inf))

    miss = make_miss_hits(rays.shape)
    hit = HitBatch(
        t=t,
        u=u, v=v, ng=ng,
        prim_id=scene.prim_local_id[prim],
        geom_id=scene.prim_geom_id[prim],
        inst_id=miss.inst_id,
    )
    return ray_mod.select_hits(found, hit, miss)


def intersect_brute(scene: CommittedScene, rays: RayBatch) -> HitBatch:
    """Ground-truth O(R*T) intersector for testing (no BVH)."""
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)))
    T = scene.num_prims

    def scan_tri(carry, prim):
        t_far, best = carry
        v0, v1, v2, gmask, prim_idx = prim
        hit, t, _, _, _ = tri_ops.intersect_moeller(
            flat.org, flat.dir, v0, v1, v2, flat.tnear, t_far)
        hit = hit & ((flat.mask & gmask) != 0)
        t_far = jnp.where(hit, t, t_far)
        idx = jnp.where(hit, prim_idx, best)
        return (t_far, idx), None

    prims = (scene.tri_v0, scene.tri_v1, scene.tri_v2,
             scene.geom_mask[scene.prim_geom_id.astype(jnp.int32)],
             jnp.arange(T, dtype=jnp.int32))
    (t_out, best), _ = jax.lax.scan(scan_tri, (flat.tfar, jnp.full(flat.shape, -1, jnp.int32)), prims)
    hits = _reconstruct_hits(scene, flat, best)
    return jax.tree.map(lambda a: a.reshape(shape + a.shape[1:]), hits)
