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


def point_query_scene(scene: CommittedScene, points, radius) -> PointQueryResult:
    """Closest point on scene triangles within radius (rtcPointQuery analog)."""
    prim_is_tri = scene.prim_kind == KIND_TRIANGLE
    didx = jnp.clip(scene.prim_data, 0, max(scene.tri_v0.shape[0] - 1, 0))
    # map merged prim -> triangle verts (non-tris are masked out inside)
    return point_query(scene.bvh,
                       scene.tri_v0[didx], scene.tri_v1[didx], scene.tri_v2[didx],
                       prim_is_tri, jnp.asarray(points, jnp.float32), radius)


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
