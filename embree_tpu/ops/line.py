"""Line segment intersectors: round (cone + sphere caps) and flat (ribbon).

Behavior parity with the reference line intersectors:
- round: kernels/geometry/roundline_intersector.h — varying-radius cone
  between the endpoints with spherical caps (capsule when r0 == r1)
- flat: kernels/geometry/line_intersector.h — ray-facing ribbon: hit when the
  ray passes within the interpolated radius of the segment

Segments are (p0, r0) -> (p1, r1); the curve parameter u in [0,1] runs along
the segment (v = 0, matching RTC_GEOMETRY_TYPE_*_CURVE linear u/v semantics).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import dot
from .point import intersect_sphere


def intersect_round_line(org, dir, p0, r0, p1, r1, tnear, tfar):
    """Ray vs varying-radius cone segment with spherical end caps."""
    A = p1 - p0
    aa = jnp.maximum(dot(A, A), 1e-20)
    dr = r1 - r0
    k = dr * dr / aa
    u_vec = org - p0
    p = dot(u_vec, A)
    q = dot(dir, A)

    A2 = dot(dir, dir) - (q * q / aa) * (1 + k)
    A1 = 2.0 * (dot(u_vec, dir) - (p * q / aa) * (1 + k) - r0 * dr * q / aa)
    A0 = dot(u_vec, u_vec) - (p * p / aa) * (1 + k) - r0 * r0 - 2 * r0 * dr * p / aa

    disc = A1 * A1 - 4 * A2 * A0
    ok = (disc >= 0) & (jnp.abs(A2) > 1e-20)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2 = 1.0 / jnp.where(ok, 2 * A2, 1.0)
    tc0 = (-A1 - sq) * inv2
    tc1 = (-A1 + sq) * inv2

    def cone_accept(t):
        s = (p + t * q) / aa
        return ok & (t >= tnear) & (t <= tfar) & (s >= 0.0) & (s <= 1.0), s

    c0_hit, s0 = cone_accept(tc0)
    c1_hit, s1 = cone_accept(tc1)
    cone_hit = c0_hit | c1_hit
    t_cone = jnp.where(c0_hit, tc0, tc1)
    s_cone = jnp.where(c0_hit, s0, s1)

    # spherical caps
    cap0_hit, t_cap0, _, _, ng_cap0 = intersect_sphere(org, dir, p0, r0, tnear, tfar)
    cap1_hit, t_cap1, _, _, ng_cap1 = intersect_sphere(org, dir, p1, r1, tnear, tfar)

    # choose nearest among candidates
    INF = jnp.inf
    t_c = jnp.where(cone_hit, t_cone, INF)
    t_a = jnp.where(cap0_hit, t_cap0, INF)
    t_b = jnp.where(cap1_hit, t_cap1, INF)
    t = jnp.minimum(jnp.minimum(t_c, t_a), t_b)
    hit = cone_hit | cap0_hit | cap1_hit

    # cone normal: radial component minus axial slope
    x = org + dir * t_cone[..., None]
    axis_pt = p0 + s_cone[..., None] * A
    radial = x - axis_pt
    ng_cone = radial * jnp.sqrt(aa)[..., None] - A * dr[..., None]

    use_cone = hit & (t == t_c)
    use_a = hit & ~use_cone & (t == t_a)
    ng = jnp.where(use_cone[..., None], ng_cone,
                   jnp.where(use_a[..., None], ng_cap0, ng_cap1))
    u = jnp.where(use_cone, s_cone, jnp.where(use_a, 0.0, 1.0))
    return hit, jnp.where(hit, t, INF), jnp.clip(u, 0.0, 1.0), jnp.zeros_like(u), ng


def intersect_flat_line(org, dir, p0, r0, p1, r1, tnear, tfar):
    """Ray-facing ribbon: closest-approach test between the ray and segment."""
    A = p1 - p0
    w = p0 - org
    # solve min over (t_ray, s) of |org + t d - (p0 + s A)|^2
    a = dot(dir, dir)
    b = dot(dir, A)
    c = dot(A, A)
    d_ = dot(dir, w)
    e = dot(A, w)
    denom = a * c - b * b
    ok = jnp.abs(denom) > 1e-20
    s = jnp.clip(jnp.where(ok, (b * d_ - a * e) / jnp.where(ok, denom, 1.0), 0.0),
                 0.0, 1.0)
    t = (d_ + s * b) / jnp.maximum(a, 1e-30)
    x = org + dir * t[..., None]
    axis_pt = p0 + s[..., None] * A
    dist2 = dot(x - axis_pt, x - axis_pt)
    r = r0 + s * (r1 - r0)
    hit = (t >= tnear) & (t <= tfar) & (dist2 <= r * r)
    ng = -dir
    return hit, jnp.where(hit, t, jnp.inf), s, jnp.zeros_like(s), ng


def line_bounds(p0, r0, p1, r1):
    lo = jnp.minimum(p0 - r0[..., None], p1 - r1[..., None])
    up = jnp.maximum(p0 + r0[..., None], p1 + r1[..., None])
    return lo, up
