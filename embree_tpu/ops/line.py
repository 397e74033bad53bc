"""Line segment intersectors: round (tangent cone-sphere) and flat (ribbon).

Behavior parity with the reference line intersectors:
- round: kernels/geometry/roundline_intersector.h — the segment surface is
  the cone TANGENT to the end spheres p0/r0, p1/r1 (not the naive
  interpolated-radius cone), union the end spheres; hit u = clip-plane
  parameter, Ng_cone = g*h - dP*y (roundline_intersector.h:420-470).
  Per-segment sphere union reproduces the reference's neighbor-clipped CSG
  for rays starting outside the tube (the clipping only removes interior
  hits, which are never the closest exterior hit).
- flat: kernels/geometry/line_intersector.h — 2D closest-approach in ray
  space, Ng = segment tangent v1-v0 (line_intersector.h:80-88). Expressed
  here with perpendicular-projection dot products, which is algebraically
  the reference's ray-space (x,y) computation without materializing the
  frame.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import dot

SELF_INTERSECTION_AVOIDANCE = 2.0   # CMakeLists.txt:212 default


def intersect_round_line(org, dir, p0, r0, p1, r1, tnear, tfar,
                         begin_cap=True, neighbors=None):
    """Ray vs tangent cone-sphere segment. Returns (hit, t, u, v, ng).

    begin_cap: whether the begin sphere (p0/r0) is part of this segment's
    surface. The reference's CSG gives interior connection caps to the
    PREVIOUS segment's end sphere and only chain-start segments own a begin
    sphere (roundline_intersector.h:577-580 isBeginPoint).

    neighbors: optional (pL, rL, pR, rR) — the far endpoints of the left
    and right neighbor segments (rL/rR < 0 marks absent). Candidate hits
    whose points lie inside a neighbor's capped cone are interior to the
    union and rejected (roundline_intersector.h:562-568
    isInsideCappedCone), which makes fat overlapping joints exact."""
    dOdO = dot(dir, dir)
    rcp_dOdO = 1.0 / jnp.maximum(dOdO, 1e-30)
    # recenter the ray near the segment (roundline_intersector.h:545-549)
    center = 0.5 * (p0 + p1)
    dt = dot(center - org, dir) * rcp_dOdO
    o = org + dt[..., None] * dir

    dP = p1 - p0
    dPdP = dot(dP, dP)
    dr = r1 - r0
    r0dr = r0 * dr
    g = dPdP - dr * dr

    O = o - p0
    OdP = dot(O, dP)
    dOdP = dot(dir, dP)
    yp = OdP + r0dr

    # --- tangent cone (roundline_intersector.h:308-345) ---
    OO = dot(O, O)
    OdO = dot(dir, O)
    A = g * dOdO - dOdP * dOdP
    B = 2.0 * (g * OdO - dOdP * yp)
    C = g * OO - OdP * OdP - r0 * r0 * dPdP - 2.0 * r0dr * OdP
    D = B * B - 4.0 * A * C
    cone_ok = (D >= 0.0) & (g > 0.0) & (jnp.abs(A) > 1e-18)
    Q = jnp.sqrt(jnp.maximum(D, 0.0))
    rcp2A = 1.0 / jnp.where(cone_ok, 2.0 * A, 1.0)
    tcf = (-B - Q) * rcp2A
    tcb = (-B + Q) * rcp2A
    ycf = yp + tcf * dOdP
    ycb = yp + tcb * dOdP
    eps = 1.19209290e-07
    cf_ok = cone_ok & (ycf > -eps) & (ycf <= g)
    cb_ok = cone_ok & (ycb > -eps) & (ycb <= g)

    # --- end spheres (begin sphere always on: standalone segments) ---
    def sphere(c, r):
        O1 = o - c
        O1dO = dot(O1, dir)
        h2 = O1dO * O1dO - dOdO * (dot(O1, O1) - r * r)
        ok = h2 >= 0.0
        rt = jnp.sqrt(jnp.maximum(h2, 0.0))
        tf_ = (-O1dO - rt) * rcp_dOdO
        tb_ = (-O1dO + rt) * rcp_dOdO
        return ok, tf_, tb_

    s0_ok, ts0f, ts0b = sphere(p0, r0)
    s1_ok, ts1f, ts1b = sphere(p1, r1)
    s0_ok = s0_ok & begin_cap
    # sphere hits inside the cone's y-range belong to the cone surface
    s0f_ok = s0_ok & (yp + ts0f * dOdP < 0.0)
    s0b_ok = s0_ok & (yp + ts0b * dOdP < 0.0)
    # The y > g clip applies EVEN for degenerate cones (g <= 0, one sphere
    # swallowing the cone): the reference keeps the segment valid
    # ('validCone | g <= 0', roundline_intersector.h:557) but
    # intersectEndSphere still clips by y > g — for a SHRINKING degenerate
    # (rls_9: thin tip behind a fat joint) this removes tip-sphere hits
    # buried inside the fat begin sphere. For growing degenerates the clip
    # is vacuous (min sphere-1 y = g + r1*(dr - |dP|) > g when dr > |dP|).
    s1f_ok = s1_ok & (yp + ts1f * dOdP > g)
    s1b_ok = s1_ok & (yp + ts1b * dOdP > g)

    def inside_capped_cone(t_loc, c0, cN, rr0, rrN, hasN):
        """roundline_intersector.h isInsideCappedCone: is the hit point
        strictly inside the capped cone c0->cN (a neighbor segment)?"""
        p = o + t_loc[..., None] * dir
        dPn = cN - c0
        dPnPn = dot(dPn, dPn)
        drn = rrN - rr0
        gn = dPnPn - drn * drn
        p0p = p - c0
        y = dot(p0p, dPn)
        cap0 = -rr0 * drn + eps
        cap1 = dPnPn - rrN * drn
        return (hasN & (y > cap0) & (y < cap1)
                & (dot(p0p, p0p) * gn - y * y
                   < dPnPn * rr0 * rr0 + 2.0 * rr0 * drn * y))

    if neighbors is not None:
        pL, rL, pR, rR = neighbors
        hasL = rL >= 0.0
        hasR = rR >= 0.0

        def not_interior(t_loc):
            # cone hits inside a neighbor's capped cone are interior
            # (roundline_intersector.h:566-568)
            return ~(inside_capped_cone(t_loc, p0, pL, r0, rL, hasL)
                     | inside_capped_cone(t_loc, p1, pR, r1, rR, hasR))

        def sph1_plane_ok(t_loc):
            # end-sphere hits are clipped only by the RIGHT neighbor cone's
            # starting plane (isClippedByPlane, roundline_intersector.h:130:
            # y > cap0 with the neighbor cone p1->pR) — NOT the full
            # capped-cone test
            p = o + t_loc[..., None] * dir
            dPn = pR - p1
            drn = rR - r1
            y = dot(p - p1, dPn)
            return ~(hasR & (y > -r1 * drn + eps))
    else:
        def not_interior(t_loc):
            return jnp.ones_like(t_loc, bool)

        def sph1_plane_ok(t_loc):
            return jnp.ones_like(t_loc, bool)

    cf_ok = cf_ok & not_interior(tcf)
    cb_ok = cb_ok & not_interior(tcb)
    s1f_ok = s1f_ok & sph1_plane_ok(ts1f)
    s1b_ok = s1b_ok & sph1_plane_ok(ts1b)

    # CSG interval union (roundline_intersector.h:584-600): the segment's
    # surface interval is [min(front roots), max(back roots)]; only those
    # two boundaries are real union surface points. A nearest-root pick
    # would report back roots interior to the union for rays STARTING
    # INSIDE the tube (rls_9: camera inside the fat joint sphere saw cone
    # B's slant through the sphere instead of the sphere's exit).
    INF = jnp.inf
    t_lower = jnp.full_like(tcf, INF)
    for tc, okc in ((tcf, cf_ok), (ts0f, s0f_ok), (ts1f, s1f_ok)):
        t_lower = jnp.where(okc, jnp.minimum(t_lower, tc), t_lower)
    t_upper = jnp.full_like(tcf, -INF)
    for tc, okc in ((tcb, cb_ok), (ts0b, s0b_ok), (ts1b, s1b_ok)):
        t_upper = jnp.where(okc, jnp.maximum(t_upper, tc), t_upper)

    ok_lower = (t_lower < INF) & (tnear <= dt + t_lower) \
        & (dt + t_lower <= tfar)
    ok_upper = (t_upper > -INF) & (tnear <= dt + t_upper) \
        & (dt + t_upper <= tfar)
    hit = ok_lower | ok_upper
    t_loc = jnp.where(ok_lower, t_lower, t_upper)
    t_best = jnp.where(hit, dt + t_loc, INF)

    cone_first = (t_loc == tcf) | (t_loc == tcb)
    sph0_first = (t_loc == ts0f) | (t_loc == ts0b)
    y_at = yp + t_loc * dOdP
    h = O + t_loc[..., None] * dir
    ng_cone = g[..., None] * h - dP * y_at[..., None]
    ng_s0 = h                      # o + t*d - p0
    ng_s1 = (o - p1) + t_loc[..., None] * dir
    ng = jnp.where(cone_first[..., None], ng_cone,
                   jnp.where(sph0_first[..., None], ng_s0, ng_s1))
    u = jnp.where(cone_first, jnp.clip(y_at / jnp.maximum(g, 1e-30), 0.0, 1.0),
                  jnp.where(sph0_first, 0.0, 1.0))
    return hit, jnp.where(hit, t_best, INF), u, jnp.zeros_like(u), ng


def intersect_flat_line(org, dir, p0, r0, p1, r1, tnear, tfar):
    """Ray-facing flat segment (line_intersector.h): closest approach in the
    plane perpendicular to the ray; Ng = segment tangent."""
    dOdO = jnp.maximum(dot(dir, dir), 1e-30)
    inv_dOdO = 1.0 / dOdO
    v = p1 - p0
    w = p0 - org
    # perpendicular (ray-space 2D) projections via dots
    wv = dot(w, v) - dot(w, dir) * dot(v, dir) * inv_dOdO
    vv = dot(v, v) - dot(v, dir) * dot(v, dir) * inv_dOdO
    ok = vv > 1e-20
    u = jnp.clip(jnp.where(ok, -wv / jnp.where(ok, vv, 1.0), 0.0), 0.0, 1.0)
    m = w + u[..., None] * v                 # hit candidate rel. origin
    md = dot(m, dir)
    t = md * inv_dOdO
    d2 = dot(m, m) - md * md * inv_dOdO      # squared perpendicular distance
    r = r0 + u * (r1 - r0)
    hit = (d2 <= r * r) & (t >= tnear) & (t <= tfar)
    # self-intersection avoidance (line_intersector.h:77)
    hit &= t > SELF_INTERSECTION_AVOIDANCE * r * jax.lax.rsqrt(dOdO)
    # ignore degenerate segments (line_intersector.h:82-84)
    hit &= (v != 0.0).any(-1)
    ng = jnp.broadcast_to(v, m.shape)
    return hit, jnp.where(hit, t, jnp.inf), u, jnp.zeros_like(u), ng


def line_bounds(p0, r0, p1, r1):
    lo = jnp.minimum(p0 - r0[..., None], p1 - r1[..., None])
    up = jnp.maximum(p0 + r0[..., None], p1 + r1[..., None])
    return lo, up
