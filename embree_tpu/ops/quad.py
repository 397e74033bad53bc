"""Quad intersection: pair-of-triangles with unified u/v parameterization.

Behavior parity with the reference quad intersectors
(kernels/geometry/quad_intersector_moeller.h): a quad (v0,v1,v2,v3) is two
triangles (v0,v1,v3) and (v2,v3,v1); hits on the second triangle map to
u' = 1-u, v' = 1-v so the quad has a single [0,1]^2 parameterization.
"""
from __future__ import annotations

import jax.numpy as jnp

from .triangle import intersect_moeller


def intersect_quad(org, dir, v0, v1, v2, v3, tnear, tfar):
    """Returns (hit, t, u, v, ng) for the bilinear quad as two triangles."""
    h0, t0, u0, vv0, ng0 = intersect_moeller(org, dir, v0, v1, v3, tnear, tfar)
    h1, t1, u1, vv1, ng1 = intersect_moeller(org, dir, v2, v3, v1, tnear, tfar)
    # map second-triangle params into quad space
    u1m = 1.0 - u1
    v1m = 1.0 - vv1
    # prefer the closer valid hit
    pick1 = h1 & (~h0 | (t1 < t0))
    hit = h0 | h1
    t = jnp.where(pick1, t1, t0)
    u = jnp.where(pick1, u1m, u0)
    v = jnp.where(pick1, v1m, vv0)
    ng = jnp.where(pick1[..., None], ng1, ng0)
    return hit, t, u, v, ng


def quad_bounds(vertices, indices):
    q = vertices[indices]  # (n, 4, 3)
    return jnp.min(q, axis=1), jnp.max(q, axis=1)
