"""Point primitive intersectors: sphere, disc, oriented disc.

Behavior parity with the reference point intersectors
(kernels/geometry/sphere_intersector.h, disc_intersector.h):
RTC_GEOMETRY_TYPE_SPHERE_POINT / DISC_POINT / ORIENTED_DISC_POINT.
Points are (center, radius); discs face the ray (or a fixed normal).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import dot


def intersect_sphere(org, dir, center, radius, tnear, tfar):
    """Ray/sphere: returns (hit, t, u, v, ng); nearest root in [tnear,tfar],
    falling back to the far root (entering from inside), like the reference
    which reports both potential hits (sphere_intersector.h)."""
    oc = org - center
    a = dot(dir, dir)
    b = 2.0 * dot(oc, dir)
    c = dot(oc, oc) - radius * radius
    disc = b * b - 4 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / jnp.maximum(2 * a, 1e-30)
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    t0_valid = ok & (t0 >= tnear) & (t0 <= tfar)
    t1_valid = ok & (t1 >= tnear) & (t1 <= tfar)
    t = jnp.where(t0_valid, t0, t1)
    hit = t0_valid | t1_valid
    p = org + dir * t[..., None]
    ng = p - center
    return hit, t, jnp.zeros_like(t), jnp.zeros_like(t), ng


def intersect_disc(org, dir, center, radius, tnear, tfar):
    """Ray-facing disc (RTC_GEOMETRY_TYPE_DISC_POINT): plane through the
    center perpendicular to the ray direction (disc_intersector.h)."""
    d2 = dot(dir, dir)
    t = dot(center - org, dir) / jnp.maximum(d2, 1e-30)
    p = org + dir * t[..., None]
    r2 = dot(p - center, p - center)
    hit = (t >= tnear) & (t <= tfar) & (r2 <= radius * radius)
    ng = -dir
    return hit, t, jnp.zeros_like(t), jnp.zeros_like(t), ng


def intersect_oriented_disc(org, dir, center, radius, normal, tnear, tfar):
    """Disc with explicit normal (RTC_GEOMETRY_TYPE_ORIENTED_DISC_POINT)."""
    den = dot(dir, normal)
    ok = jnp.abs(den) > 1e-12
    t = dot(center - org, normal) / jnp.where(ok, den, 1.0)
    p = org + dir * t[..., None]
    r2 = dot(p - center, p - center)
    hit = ok & (t >= tnear) & (t <= tfar) & (r2 <= radius * radius)
    return hit, t, jnp.zeros_like(t), jnp.zeros_like(t), jnp.broadcast_to(normal, p.shape)


def point_bounds(centers, radii):
    r = radii[..., None]
    return centers - r, centers + r
