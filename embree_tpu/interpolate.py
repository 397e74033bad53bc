"""Vertex-attribute interpolation — the rtcInterpolate analog.

Role parity with rtcInterpolate0/1 (include/embree4/rtcore_geometry.h:283-302,
InterpolateTrianglesTest/Subdiv/Grid/Hair verify.cpp:2042-2461): given a hit
(prim_id, u, v) on a geometry and a per-vertex attribute buffer, evaluate the
attribute at the hit. Pure jittable functions — the buffer rides in as an
array instead of a registered RTC_BUFFER_TYPE_VERTEX_ATTRIBUTE slot.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .geometry import (CurveGeometry, GridGeometry, LineSegmentsGeometry,
                       QuadGeometry, SubdivisionGeometry, TriangleGeometry)
from .ops import curve as curve_ops


def interpolate(geometry, prim_id, u, v, buffer):
    """Evaluate a per-vertex attribute at hit (prim_id, u, v).

    Args:
      geometry: the (host-side) geometry object the hit belongs to.
      prim_id: (...,) int — hit prim ids (hit.prim_id for this geometry).
      u, v: (...,) float hit parameters.
      buffer: (n_verts, K) attribute buffer (K channels).
    Returns: (..., K) interpolated attribute.
    """
    buffer = jnp.asarray(buffer)
    prim_id = jnp.asarray(prim_id)

    if isinstance(geometry, TriangleGeometry):
        idx = jnp.asarray(np.asarray(geometry.indices, np.int32))[prim_id]
        w = (1.0 - u - v)[..., None]
        return (w * buffer[idx[..., 0]] + u[..., None] * buffer[idx[..., 1]]
                + v[..., None] * buffer[idx[..., 2]])

    if isinstance(geometry, QuadGeometry):
        idx = jnp.asarray(np.asarray(geometry.indices, np.int32))[prim_id]
        a0 = buffer[idx[..., 0]]
        a1 = buffer[idx[..., 1]]
        a2 = buffer[idx[..., 2]]
        a3 = buffer[idx[..., 3]]
        uu, vv = u[..., None], v[..., None]
        return ((1 - uu) * (1 - vv) * a0 + uu * (1 - vv) * a1
                + uu * vv * a2 + (1 - uu) * vv * a3)

    if isinstance(geometry, LineSegmentsGeometry):
        idx = jnp.asarray(np.asarray(geometry.indices, np.int32))[prim_id]
        return ((1.0 - u)[..., None] * buffer[idx]
                + u[..., None] * buffer[idx + 1])

    if isinstance(geometry, CurveGeometry):
        idx = jnp.asarray(np.asarray(geometry.indices, np.int32))[prim_id]
        if geometry.basis == curve_ops.BASIS_HERMITE:
            cp = jnp.stack([buffer[idx], jnp.zeros_like(buffer[idx]),
                            buffer[idx + 1], jnp.zeros_like(buffer[idx])],
                           axis=-2)
        else:
            gather = idx[..., None] + jnp.arange(4)
            cp = buffer[gather]
        return curve_ops.eval_curve(geometry.basis, cp, u)

    if isinstance(geometry, GridGeometry):
        # u/v span the whole grid (grid-id prim semantics, scene.py)
        g = jnp.asarray(np.asarray(geometry.grids, np.int32))[prim_id]
        start, stride, w_, h_ = (g[..., 0], g[..., 1], g[..., 2], g[..., 3])
        fx = u * (w_ - 1).astype(u.dtype)
        fy = v * (h_ - 1).astype(v.dtype)
        x0 = jnp.clip(fx.astype(jnp.int32), 0, w_ - 2)
        y0 = jnp.clip(fy.astype(jnp.int32), 0, h_ - 2)
        ax, ay = fx - x0, fy - y0
        base = start + y0 * stride + x0
        a0 = buffer[base]
        a1 = buffer[base + 1]
        a2 = buffer[base + stride]
        a3 = buffer[base + stride + 1]
        axx, ayy = ax[..., None], ay[..., None]
        return ((1 - axx) * (1 - ayy) * a0 + axx * (1 - ayy) * a1
                + (1 - axx) * ayy * a2 + axx * ayy * a3)

    if isinstance(geometry, SubdivisionGeometry):
        # base-face prim ids with bilinear limit approximation over the face
        # corners (feature-adaptive limit evaluation is future work)
        fc = np.asarray(geometry.face_counts, np.int64)
        offs = np.concatenate([[0], np.cumsum(fc)])[:-1]
        idx_flat = jnp.asarray(np.asarray(geometry.indices, np.int32))
        o = jnp.asarray(offs, jnp.int32)[prim_id]
        a0 = buffer[idx_flat[o]]
        a1 = buffer[idx_flat[o + 1]]
        a2 = buffer[idx_flat[o + 2]]
        a3 = buffer[idx_flat[o + 3]]
        uu, vv = u[..., None], v[..., None]
        return ((1 - uu) * (1 - vv) * a0 + uu * (1 - vv) * a1
                + uu * vv * a2 + (1 - uu) * vv * a3)

    raise TypeError(f"interpolate: unsupported geometry {type(geometry)}")
