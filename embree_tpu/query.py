"""High-level queries beyond ray casting: point queries, collision, stats.

API parity: rtcPointQuery (rtcore_scene.h point query API), rtcCollide
(rtcore_scene.h:346), BVH statistics (kernels/bvh/bvh_statistics.{h,cpp},
printed at verbose>=2 — here returned as a dict for observability, SURVEY.md
§5.1/§5.5).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .accel.bvh import INVALID_NODE, decode_leaf, is_leaf, sah_cost
from .accel.collide import CollisionResult, collide
from .accel.point_query import PointQueryResult, point_query
from .geometry import KIND_TRIANGLE
from .scene import CommittedScene


def point_query_scene(scene, points, radius) -> PointQueryResult:
    """Closest point on scene triangles within radius (rtcPointQuery analog).

    Instancing: the flattening commit stores instanced triangles in WORLD
    space, so queries over a CommittedScene cover instanced geometry with no
    transform stack at all (the role of the reference's instance push/pop,
    point_query.h + bvh_intersector1.cpp:211, is filled by the merged
    world-space table). TwoLevelScene queries run per-BLAS in object space
    with the similarity-scaled radius — the reference's documented
    similarity-transform constraint (rtcore_common.h RTCPointQuery docs) —
    and results map back through the instance transform."""
    if not isinstance(scene, CommittedScene):     # TwoLevelScene
        return _point_query_two_level(scene, points, radius)
    prim_is_tri = scene.prim_kind == KIND_TRIANGLE
    didx = jnp.clip(scene.prim_data, 0, max(scene.tri_v0.shape[0] - 1, 0))
    # map merged prim -> triangle verts (non-tris are masked out inside)
    return point_query(scene.bvh,
                       scene.tri_v0[didx], scene.tri_v1[didx], scene.tri_v2[didx],
                       prim_is_tri, jnp.asarray(points, jnp.float32), radius)


def _point_query_two_level(tl, points, radius) -> PointQueryResult:
    """Closest point through the TLAS: every instance is queried in object
    space (the per-ray transform stack of the reference becomes a batched
    per-instance pass; BLAS sharing keeps it one query per distinct child
    per instance)."""
    points = jnp.asarray(points, jnp.float32)
    Q = points.shape[0]
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (Q,))
    best = PointQueryResult(dist=jnp.full((Q,), jnp.inf),
                            point=jnp.zeros((Q, 3)),
                            prim=jnp.full((Q,), -1, jnp.int32))
    best_d = radius
    l2w0 = tl.inst_l2w[:, 0]                      # t=0 transforms
    for i in range(tl.num_instances):
        child = tl.children[tl.inst_child[i]]
        w2l = tl.inst_w2l[i]
        l2w = l2w0[i]
        # similarity scale: query radius in object space
        s = jnp.abs(jnp.linalg.det(l2w[:, :3])) ** (1.0 / 3.0)
        op = jnp.einsum("qj,ij->qi", points, w2l[:, :3],
                        precision="highest") + w2l[:, 3]
        r = _point_query_child(child, op, best_d / jnp.maximum(s, 1e-20))
        wp = jnp.einsum("qj,ij->qi", r.point, l2w[:, :3],
                        precision="highest") + l2w[:, 3]
        wd = jnp.linalg.norm(wp - points, axis=-1)
        better = (r.prim >= 0) & (wd < best_d)
        best = PointQueryResult(
            dist=jnp.where(better, wd, best.dist),
            point=jnp.where(better[:, None], wp, best.point),
            prim=jnp.where(better, r.prim, best.prim))
        best_d = jnp.where(better, wd, best_d)
    return best


def _point_query_child(scene: CommittedScene, points, radius):
    prim_is_tri = scene.prim_kind == KIND_TRIANGLE
    didx = jnp.clip(scene.prim_data, 0, max(scene.tri_v0.shape[0] - 1, 0))
    return point_query(scene.bvh, scene.tri_v0[didx], scene.tri_v1[didx],
                       scene.tri_v2[didx], prim_is_tri, points, radius)


def collide_scenes(scene_a: CommittedScene, scene_b: CommittedScene) -> CollisionResult:
    """All intersecting triangle pairs between two committed scenes
    (rtcCollide analog; the collide cloth-sim tutorial workload)."""
    da = jnp.clip(scene_a.prim_data, 0, max(scene_a.tri_v0.shape[0] - 1, 0))
    db = jnp.clip(scene_b.prim_data, 0, max(scene_b.tri_v0.shape[0] - 1, 0))
    a0 = scene_a.tri_v0[da]; a1 = scene_a.tri_v1[da]; a2 = scene_a.tri_v2[da]
    a_lo = jnp.minimum(jnp.minimum(a0, a1), a2)
    a_up = jnp.maximum(jnp.maximum(a0, a1), a2)
    return collide(scene_b.bvh,
                   scene_b.tri_v0[db], scene_b.tri_v1[db], scene_b.tri_v2[db],
                   a_lo, a_up, a0, a1, a2)


def scene_stats(scene: CommittedScene) -> Dict:
    """BVH + memory statistics (bvh_statistics / Scene::printStatistics
    analogs; pure reductions over the flat arrays)."""
    bvh = scene.bvh
    child = np.asarray(bvh.node_child)
    leaf_mask = np.asarray(is_leaf(bvh.node_child))
    valid = child != int(INVALID_NODE)
    _, counts = decode_leaf(bvh.node_child)
    counts = np.asarray(counts)

    n_internal_refs = int((valid & ~leaf_mask).sum())
    n_leaf_refs = int(leaf_mask.sum())
    prims_in_leaves = int(counts[leaf_mask].sum())
    mem = {}
    total = 0
    for f in scene._ARRAY_FIELDS:
        v = getattr(scene, f)
        if v is None:
            continue
        nb = sum(int(x.nbytes) for x in jax.tree.leaves(v))
        mem[f] = nb
        total += nb

    kinds, kc = np.unique(np.asarray(scene.prim_kind), return_counts=True)
    return {
        "num_prims": int(scene.num_prims),
        "prims_by_kind": {int(k): int(c) for k, c in zip(kinds, kc)},
        "bvh_nodes": int(child.shape[0]),
        "bvh_width": int(child.shape[1]),
        "internal_child_refs": n_internal_refs,
        "leaf_refs": n_leaf_refs,
        "prims_in_leaves": prims_in_leaves,
        "avg_leaf_size": prims_in_leaves / max(n_leaf_refs, 1),
        "sah_cost": float(sah_cost(bvh)),
        "memory_bytes": total,
        "memory_by_field": mem,
        "packed_tiles": None if scene.packed is None else int(scene.packed.n_tiles),
    }
