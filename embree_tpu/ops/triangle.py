"""Triangle intersection kernels.

Behavior parity with the reference intersectors:
- Möller-Trumbore with precomputed edges (kernels/geometry/triangle_intersector_moeller.h:9-16)
- Plücker-style watertight test (kernels/geometry/triangle_intersector_pluecker.h:11-17)

Both are written as batched, branch-free array ops: inputs broadcast over arbitrary
leading dims, outputs are (hit_mask, t, u, v, ng). Differentiable by construction —
JAX autodiff through the closed-form solve provides dt/dverts etc. (the capability
Embree lacks; SURVEY.md §2.8 P9).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import cross, dot


def intersect_moeller(org, dir, v0, v1, v2, tnear, tfar, eps=0.0):
    """Möller-Trumbore ray/triangle test, branch-free over any batch shape.

    Args:
      org, dir: (..., 3) ray origin and direction.
      v0, v1, v2: (..., 3) triangle vertices (broadcast against rays).
      tnear, tfar: (...,) valid t interval.
    Returns:
      (hit, t, u, v, ng): boolean mask and hit params; ng is the *unnormalized*
      geometric normal e1 x e2 oriented as in the reference (Ng = cross(e2, e1)
      convention per triangle_intersector_moeller.h UVIdentity epilog — we return
      cross(e1, e2) like rtcore convention for counterclockwise orientation).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    ng = cross(e1, e2)

    pvec = cross(dir, e2)
    det = dot(e1, pvec)
    # No backface culling by default (reference default: EMBREE_BACKFACE_CULLING off).
    inv_det = jnp.where(jnp.abs(det) > 1e-24, 1.0 / det, 0.0)
    tvec = org - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(dir, qvec) * inv_det
    t = dot(e2, qvec) * inv_det

    hit = (
        (jnp.abs(det) > 1e-24)
        & (u >= -eps)
        & (v >= -eps)
        & (u + v <= 1.0 + eps)
        & (t >= tnear)
        & (t <= tfar)
    )
    return hit, t, u, v, ng


def intersect_pluecker(org, dir, v0, v1, v2, tnear, tfar):
    """Watertight Plücker-style test: edge-consistent signed volumes.

    Mirrors the reference's robust path (triangle_intersector_pluecker.h): compute
    scaled signed volumes U,V,W against the three edges; accept when all share a
    sign (within 0 tolerance). Shared edges between adjacent triangles evaluate the
    same edge expression, giving watertightness along edges.
    """
    o = org
    d = dir
    a = v0 - o
    b = v1 - o
    c = v2 - o

    # Edge plane normals (Plücker side products)
    U = dot(cross(c, b), d)
    V = dot(cross(a, c), d)
    W = dot(cross(b, a), d)

    eps = 0.0
    minUVW = jnp.minimum(jnp.minimum(U, V), W)
    maxUVW = jnp.maximum(jnp.maximum(U, V), W)
    valid_side = (minUVW >= -eps) | (maxUVW <= eps)

    ng = cross(v1 - v0, v2 - v0)
    den = dot(ng, d)
    T = dot(ng, a)
    inv_den = jnp.where(jnp.abs(den) > 1e-30, 1.0 / den, 0.0)
    t = T * inv_den

    # U/V/W are (negated) signed volumes against edges (v1,v2)/(v2,v0)/(v0,v1),
    # i.e. proportional to the barycentric weights of v0/v1/v2 respectively.
    # Convention p = (1-u-v)*v0 + u*v1 + v*v2 (same as Möller): u <- V, v <- W.
    uvw = U + V + W
    inv_uvw = jnp.where(jnp.abs(uvw) > 1e-30, 1.0 / uvw, 0.0)
    u = jnp.clip(V * inv_uvw, 0.0, 1.0)
    v = jnp.clip(W * inv_uvw, 0.0, 1.0)

    hit = valid_side & (jnp.abs(den) > 1e-30) & (t >= tnear) & (t <= tfar)
    return hit, t, u, v, ng


def interpolate_attribute(attr_v0, attr_v1, attr_v2, u, v):
    """Barycentric vertex-attribute interpolation (rtcInterpolate analog)."""
    w = (1.0 - u - v)[..., None]
    return w * attr_v0 + u[..., None] * attr_v1 + v[..., None] * attr_v2


def triangle_bounds(vertices, indices):
    """Per-triangle AABBs: (lower, upper) each (n_tris, 3)."""
    tri = vertices[indices]  # (n, 3, 3)
    return jnp.min(tri, axis=1), jnp.max(tri, axis=1)
