"""Cubic curve bases + tessellation.

Behavior parity with the reference curve bases (kernels/subdiv/bezier_curve.h,
bspline_curve.h, hermite_curve.h, catmullrom_curve.h): evaluation of position
(xyz + radius in w) and derivative for the four cubic bases, plus linear.

TPU-first divergence (documented; SURVEY.md §7 hard-part 6 rationale): instead
of the reference's per-ray iterative sweep/ribbon intersectors
(curve_intersector_sweep.h Newton iteration), curves are tessellated
ahead-of-time into line-segment primitives (round -> cone segments, flat ->
ray-facing ribbons, ops/line.py) at a controllable rate — the analog of the
reference's numBezierSubdivisions (curve_intersector_ribbon.h) but resolved at
commit time so traversal stays branch-free. The curve parameter u is carried
per sub-segment and recovered exactly at hit time.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BASIS_LINEAR = "linear"
BASIS_BEZIER = "bezier"
BASIS_BSPLINE = "bspline"
BASIS_HERMITE = "hermite"
BASIS_CATMULL_ROM = "catmull_rom"


def _bezier_weights(t):
    s = 1.0 - t
    return jnp.stack([s * s * s, 3 * s * s * t, 3 * s * t * t, t * t * t], -1)


def _bspline_weights(t):
    t2, t3 = t * t, t * t * t
    return jnp.stack([
        (1 - 3 * t + 3 * t2 - t3) / 6.0,
        (4 - 6 * t2 + 3 * t3) / 6.0,
        (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0,
        t3 / 6.0,
    ], -1)


def _catmull_rom_weights(t):
    t2, t3 = t * t, t * t * t
    return jnp.stack([
        0.5 * (-t + 2 * t2 - t3),
        0.5 * (2 - 5 * t2 + 3 * t3),
        0.5 * (t + 4 * t2 - 3 * t3),
        0.5 * (-t2 + t3),
    ], -1)


def _hermite_weights(t):
    """Hermite control data is (p0, m0, p1, m1)."""
    t2, t3 = t * t, t * t * t
    return jnp.stack([
        2 * t3 - 3 * t2 + 1,
        t3 - 2 * t2 + t,
        -2 * t3 + 3 * t2,
        t3 - t2,
    ], -1)


_WEIGHTS = {
    BASIS_BEZIER: _bezier_weights,
    BASIS_BSPLINE: _bspline_weights,
    BASIS_CATMULL_ROM: _catmull_rom_weights,
    BASIS_HERMITE: _hermite_weights,
}


def eval_curve(basis: str, cp, t):
    """Evaluate a cubic curve at parameter t.

    Args:
      cp: (..., 4, C) control data (xyz+radius rows for 4 control points;
          for hermite: p0, m0, p1, m1).
      t: (...,) parameter in [0,1].
    Returns: (..., C) position (+radius).
    """
    if basis == BASIS_LINEAR:
        return cp[..., 0, :] * (1 - t)[..., None] + cp[..., 1, :] * t[..., None]
    w = _WEIGHTS[basis](t)                          # (..., 4)
    return jnp.einsum("...k,...kc->...c", w, cp)


def eval_curve_derivative(basis: str, cp, t, eps=1e-4):
    """Tangent via central differences (adequate for tessellation normals)."""
    f0 = eval_curve(basis, cp, jnp.clip(t - eps, 0.0, 1.0))
    f1 = eval_curve(basis, cp, jnp.clip(t + eps, 0.0, 1.0))
    return (f1 - f0) / (2 * eps)


def tessellate_segments(basis: str, cp, n_sub: int):
    """Tessellate each cubic curve into n_sub linear (p,r) sub-segments.

    Args:
      cp: (n_curves, 4, 4) control points (x,y,z,radius).
    Returns:
      p0, r0, p1, r1: (n_curves * n_sub, ...) endpoints with radii,
      u0, u1: curve-parameter range per sub-segment.
    """
    ts = jnp.linspace(0.0, 1.0, n_sub + 1)
    pts = eval_curve(basis, cp[:, None, :, :], jnp.broadcast_to(ts, (cp.shape[0], n_sub + 1)))
    p = pts[..., :3]                                 # (n, n_sub+1, 3)
    r = jnp.maximum(pts[..., 3], 0.0)
    p0 = p[:, :-1].reshape(-1, 3)
    p1 = p[:, 1:].reshape(-1, 3)
    r0 = r[:, :-1].reshape(-1)
    r1 = r[:, 1:].reshape(-1)
    u0 = jnp.broadcast_to(ts[:-1], (cp.shape[0], n_sub)).reshape(-1)
    u1 = jnp.broadcast_to(ts[1:], (cp.shape[0], n_sub)).reshape(-1)
    return p0, r0, p1, r1, u0, u1
