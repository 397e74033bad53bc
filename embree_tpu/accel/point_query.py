"""Point queries: closest point / within-radius over the BVH.

Behavior parity with the reference point-query path (rtcPointQuery,
kernels/common/point_query.h + traversal in bvh_intersector1.cpp:211 with
AABB distance tests in node_intersector1.h; ClosestPointTest verify.cpp:3970):
branch-and-bound BVH descent ordered by node distance, shrinking the query
radius as closer primitives are found. Triangle closest-point uses the
standard region decomposition (closestPointTriangle, closest_point tutorial).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import dot
from .bvh import BVH, INVALID_NODE

STACK_DEPTH = 64


def closest_point_triangle(p, a, b, c):
    """Closest point on triangle abc to p (Ericson, Real-Time Collision
    Detection §5.1.5 — same algorithm as the reference's closest_point
    tutorial, tutorials/closest_point/closest_point_device.cpp)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    bp = p - b
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    cp = p - c
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    denom_uv = jnp.where(jnp.abs(va + vb + vc) > 1e-30, va + vb + vc, 1.0)
    v_in = vb / denom_uv
    w_in = vc / denom_uv
    p_in = a + v_in[..., None] * ab + w_in[..., None] * ac

    v_ab = jnp.clip(jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 / jnp.where(
        jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1.0), 0.0), 0.0, 1.0)
    p_ab = a + v_ab[..., None] * ab
    w_ac = jnp.clip(jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 / jnp.where(
        jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1.0), 0.0), 0.0, 1.0)
    p_ac = a + w_ac[..., None] * ac
    d43 = d4 - d3
    d56 = d5 - d6
    w_bc = jnp.clip(d43 / jnp.where(jnp.abs(d43 + d56) > 1e-30, d43 + d56, 1.0),
                    0.0, 1.0)
    p_bc = b + w_bc[..., None] * (c - b)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = ~in_a & ~in_b & ~in_c & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = ~in_a & ~in_b & ~in_c & ~on_ab & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_a & ~in_b & ~in_c & ~on_ab & ~on_ac
             & (va <= 0) & (d43 >= 0) & (d56 >= 0))

    out = p_in
    out = jnp.where(on_bc[..., None], p_bc, out)
    out = jnp.where(on_ac[..., None], p_ac, out)
    out = jnp.where(on_ab[..., None], p_ab, out)
    out = jnp.where(in_c[..., None], c, out)
    out = jnp.where(in_b[..., None], b, out)
    out = jnp.where(in_a[..., None], a, out)
    return out


def _aabb_dist2(lo, up, p):
    d = jnp.maximum(jnp.maximum(lo - p[..., None, :], p[..., None, :] - up), 0.0)
    return jnp.sum(d * d, axis=-1)


class PointQueryResult(NamedTuple):
    dist: jnp.ndarray    # (Q,) distance to closest prim (inf if none in radius)
    point: jnp.ndarray   # (Q, 3) closest point
    prim: jnp.ndarray    # (Q,) merged prim index, -1 if none


def point_query(bvh: BVH, tri_v0, tri_v1, tri_v2, prim_is_tri,
                points, radius) -> PointQueryResult:
    """Closest triangle point within radius for each query point.

    Non-triangle prims are skipped (reference point queries support triangles
    via the user callback; we provide the triangle fast path natively).
    """
    Q = points.shape[0]
    W = bvh.width
    qidx = jnp.arange(Q)
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (Q,))

    state = dict(
        active=jnp.ones(Q, bool),
        cur=jnp.zeros(Q, jnp.int32),
        sp=jnp.zeros(Q, jnp.int32),
        stack=jnp.zeros((Q, STACK_DEPTH), jnp.int32),
        best_d2=radius * radius,
        best_p=jnp.zeros((Q, 3), jnp.float32),
        best_prim=jnp.full(Q, -1, jnp.int32),
    )

    def cond(s):
        return jnp.any(s["active"])

    def body(s):
        active, cur, sp = s["active"], s["cur"], s["sp"]
        is_node = active & (cur >= 0)
        is_leaf = active & (cur < 0) & (cur != INVALID_NODE)

        node = jnp.where(is_node, cur, 0)
        child = bvh.node_child[node]
        d2 = _aabb_dist2(bvh.node_lower[node], bvh.node_upper[node], points)
        hit = (d2 <= s["best_d2"][:, None]) & (child != INVALID_NODE) & is_node[:, None]
        dist = jnp.where(hit, d2, jnp.inf)
        order = jnp.argsort(dist, axis=-1)
        child_sorted = jnp.take_along_axis(child, order, axis=-1)
        hit_sorted = jnp.take_along_axis(hit, order, axis=-1)
        num_hits = jnp.sum(hit, axis=-1)

        new_stack, new_sp = s["stack"], sp
        for k in range(W - 1, 0, -1):
            push = is_node & hit_sorted[:, k] & (new_sp < STACK_DEPTH)
            slot = jnp.where(push, new_sp, 0)
            val = jnp.where(push, child_sorted[:, k], new_stack[qidx, slot])
            new_stack = new_stack.at[qidx, slot].set(val)
            new_sp = jnp.where(push, new_sp + 1, new_sp)
        node_next = jnp.where(num_hits > 0, child_sorted[:, 0], INVALID_NODE)

        # leaf: test up to 15 prims (the ref-encoding count mask; scene
        # leaves hold LEAF_SIZE=8 — the old range(4) loop silently skipped
        # slots 4..7, returning a non-nearest point)
        packed = jnp.where(is_leaf, -(cur + 1), 0)
        start = packed >> 4
        count = packed & 0xF
        best_d2, best_p, best_prim = s["best_d2"], s["best_p"], s["best_prim"]
        n_prims = bvh.prim_order.shape[0]
        for k in range(15):
            valid = is_leaf & (k < count)
            slot = jnp.clip(start + k, 0, n_prims - 1)
            prim = bvh.prim_order[slot]
            tri_ok = valid & prim_is_tri[prim]
            i = jnp.clip(prim, 0, tri_v0.shape[0] - 1)
            cp = closest_point_triangle(points, tri_v0[i], tri_v1[i], tri_v2[i])
            dd = jnp.sum((points - cp) ** 2, axis=-1)
            better = tri_ok & (dd < best_d2)
            best_d2 = jnp.where(better, dd, best_d2)
            best_p = jnp.where(better[:, None], cp, best_p)
            best_prim = jnp.where(better, prim, best_prim)

        need_pop = is_leaf | (is_node & (num_hits == 0))
        has = new_sp > 0
        top = new_stack[qidx, jnp.maximum(new_sp - 1, 0)]
        cur = jnp.where(need_pop, jnp.where(has, top, INVALID_NODE),
                        jnp.where(is_node, node_next, cur))
        sp = jnp.where(need_pop & has, new_sp - 1, new_sp)
        active = jnp.where(need_pop, active & has, active)

        return dict(active=active, cur=cur, sp=sp, stack=new_stack,
                    best_d2=best_d2, best_p=best_p, best_prim=best_prim)

    out = jax.lax.while_loop(cond, body, state)
    return PointQueryResult(dist=jnp.sqrt(out["best_d2"]),
                            point=out["best_p"], prim=out["best_prim"])
