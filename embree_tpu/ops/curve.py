"""Cubic curve bases + tessellation.

Behavior parity with the reference curve bases (kernels/subdiv/bezier_curve.h,
bspline_curve.h, hermite_curve.h, catmullrom_curve.h): evaluation of position
(xyz + radius in w) and derivative for the four cubic bases, plus linear.

Native intersectors for all four reference curve algorithms (SURVEY.md §A.3):
ribbon (flat), swept-circle Jacobian-Newton (round), normal-oriented ruled
patch, plus the ahead-of-time tessellation lowering as an opt-in
(CurveGeometry.algorithm="tessellate"). All cubic bases convert exactly to
Bezier before intersection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rsqrt(x):
    """Full-precision 1/sqrt: jax.lax.rsqrt lowers to an approximate TPU
    instruction (~2^-12 rel error) that defeats the ulp-scale convergence
    tests of the Newton solvers; 1/sqrt stays correctly rounded."""
    return 1.0 / jnp.sqrt(x)

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
    return jnp.einsum("...k,...kc->...c", w, cp, precision="highest")


def eval_curve_derivative(basis: str, cp, t, eps=1e-4):
    """Tangent via central differences (adequate for tessellation normals)."""
    f0 = eval_curve(basis, cp, jnp.clip(t - eps, 0.0, 1.0))
    f1 = eval_curve(basis, cp, jnp.clip(t + eps, 0.0, 1.0))
    return (f1 - f0) / (2 * eps)


# =====================================================================
# Native curve intersectors (the reference's 4 curve algorithms,
# SURVEY.md §A.3). All cubic bases convert EXACTLY to Bezier control
# points (linear maps), so the intersectors below only handle Bezier.
# =====================================================================

_TO_BEZIER = {
    BASIS_BEZIER: np.eye(4, dtype=np.float32),
    # uniform cubic B-spline -> Bezier of the same span
    BASIS_BSPLINE: np.array([[1, 4, 1, 0], [0, 4, 2, 0],
                             [0, 2, 4, 0], [0, 1, 4, 1]], np.float32) / 6.0,
    # Catmull-Rom (p0..p3 with curve from p1 to p2)
    BASIS_CATMULL_ROM: np.array(
        [[0, 6, 0, 0], [-1, 6, 1, 0], [0, 1, 6, -1], [0, 0, 6, 0]],
        np.float32) / 6.0,
    # Hermite (p0, m0, p1, m1)
    BASIS_HERMITE: np.array([[3, 0, 0, 0], [3, 1, 0, 0],
                             [0, 0, 3, -1], [0, 0, 3, 0]], np.float32) / 3.0,
}


def to_bezier(basis: str, cp):
    """Convert (..., 4, C) control data of any cubic basis to Bezier CPs."""
    m = jnp.asarray(_TO_BEZIER[basis])
    return jnp.einsum("ij,...jc->...ic", m, cp, precision="highest")


def eval_bezier(cp, u):
    """Evaluate Bezier (..., 4, C) at u (...,) -> (..., C)."""
    return jnp.einsum("...k,...kc->...c", _bezier_weights(u), cp, precision="highest")


def eval_bezier_du(cp, u):
    """Exact derivative: 3 * sum (b[i+1]-b[i]) * B2_i(u)."""
    d = 3.0 * (cp[..., 1:, :] - cp[..., :-1, :])      # (..., 3, C)
    s = 1.0 - u
    w = jnp.stack([s * s, 2 * s * u, u * u], -1)
    return jnp.einsum("...k,...kc->...c", w, d, precision="highest")


def eval_bezier_ddu(cp, u):
    """Second derivative: 6 * sum (b[i+2]-2b[i+1]+b[i]) * B1_i(u)."""
    d = 6.0 * (cp[..., 2:, :] - 2 * cp[..., 1:-1, :] + cp[..., :-2, :])
    w = jnp.stack([1.0 - u, u], -1)
    return jnp.einsum("...k,...kc->...c", w, d, precision="highest")


def _ray_frame(dir):
    """The reference's curve ray space (curve_intersector_precalculations.h:
    depth_scale = rsqrt(|d|^2); rows = frame(normalize(d)) with the z row
    scaled by depth_scale). Returns (vx, vy, vz_scaled, depth_scale)."""
    d2 = jnp.sum(dir * dir, -1, keepdims=True)
    ds = _rsqrt(jnp.maximum(d2, 1e-36))
    n = dir * ds
    nx, ny, nz = n[..., 0:1], n[..., 1:2], n[..., 2:3]
    zero = jnp.zeros_like(nx)
    dx0 = jnp.concatenate([zero, nz, -ny], -1)
    dx1 = jnp.concatenate([-nz, zero, nx], -1)
    pick = jnp.sum(dx0 * dx0, -1, keepdims=True) > jnp.sum(dx1 * dx1, -1,
                                                           keepdims=True)
    dx = jnp.where(pick, dx0, dx1)
    dx = dx / jnp.sqrt(jnp.maximum(jnp.sum(dx * dx, -1, keepdims=True), 1e-36))
    dy = jnp.cross(n, dx)
    dy = dy / jnp.sqrt(jnp.maximum(jnp.sum(dy * dy, -1, keepdims=True), 1e-36))
    return dx, dy, n * ds, ds[..., 0]


SELF_INTERSECTION_AVOIDANCE = 2.0   # EMBREE_CURVE_SELF_INTERSECTION_... default


def intersect_distance(org, dir, cp, tnear, tfar, n_seg: int = 8):
    """Distance (hair fallback) curve intersector — behavior parity with
    curve_intersector_distance.h:86-180: tessellate the RAY-SPACE curve into
    n_seg linear segments, closest 2D approach per segment, hit when the
    squared distance is within the interpolated radius; t = p.z*depth_scale,
    v = 0, u = (i+u_local)/N, Ng = curve tangent, with the
    self-intersection-avoidance rejection t > 2*r*depth_scale.

    cp: (..., 4, 4) world-space Bezier xyz+r.
    """
    dx, dy, dzs, ds = _ray_frame(dir)
    rel = cp[..., :3] - org[..., None, :]
    px = jnp.sum(rel * dx[..., None, :], -1)
    py = jnp.sum(rel * dy[..., None, :], -1)
    pz = jnp.sum(rel * dzs[..., None, :], -1)
    cp2 = jnp.stack([px, py, pz, cp[..., 3]], -1)      # ray-space xyz+r

    ts = np.linspace(0.0, 1.0, n_seg + 1, dtype=np.float32)
    uk = jnp.broadcast_to(jnp.asarray(ts), cp.shape[:-2] + (n_seg + 1,))
    pk = eval_bezier(cp2[..., None, :, :], uk)         # (..., n_seg+1, 4)
    p0 = pk[..., :-1, :]
    p1 = pk[..., 1:, :]

    v = p1 - p0
    w = -p0
    d0 = w[..., 0] * v[..., 0] + w[..., 1] * v[..., 1]
    d1 = v[..., 0] * v[..., 0] + v[..., 1] * v[..., 1]
    u = jnp.clip(d0 / jnp.where(jnp.abs(d1) > 1e-30, d1, 1.0), 0.0, 1.0)
    p = p0 + u[..., None] * v
    t = p[..., 2] * ds[..., None]
    d2 = p[..., 0] ** 2 + p[..., 1] ** 2
    r = p[..., 3]
    ok = ((d2 <= r * r) & (tnear[..., None] <= t) & (t <= tfar[..., None])
          & (t > SELF_INTERSECTION_AVOIDANCE * r * ds[..., None]))

    u_full = (jnp.asarray(np.arange(n_seg, dtype=np.float32)) + u) / n_seg
    tbig = jnp.where(ok, t, jnp.inf)
    best = jnp.argmin(tbig, axis=-1)
    hit = jnp.take_along_axis(ok, best[..., None], -1)[..., 0]
    t_o = jnp.take_along_axis(t, best[..., None], -1)[..., 0]
    u_o = jnp.take_along_axis(u_full, best[..., None], -1)[..., 0]
    ng = eval_bezier_du(cp, u_o)[..., :3]
    return hit, t_o, u_o, jnp.zeros_like(u_o), ng


def intersect_ribbon(org, dir, cp, tnear, tfar, n_seg: int = 4):
    """Flat-curve ribbon intersector — behavior parity with the reference
    (curve_intersector_ribbon.h:73-177): transform Bezier CPs into ray space,
    split into n_seg ruled quads between the +-r offset curves, intersect each
    with UV-aware backface-culling quad tests, report u along the curve,
    v across [-1,1], Ng = 3D curve tangent (RibbonHit::Ng = eval_du).

    Args: org/dir (..., 3); cp (..., 4, 4) world-space Bezier xyz+r;
    tnear/tfar (...,). n_seg mirrors geom->tessellationRate (default 4).
    Returns (hit, t, u, v, ng)."""
    vx, vy, vz, ds = _ray_frame(dir)
    rel = cp[..., :3] - org[..., None, :]
    c2 = jnp.stack([jnp.sum(rel * vx[..., None, :], -1),
                    jnp.sum(rel * vy[..., None, :], -1),
                    jnp.sum(rel * vz[..., None, :], -1)], -1)
    c2 = jnp.concatenate([c2, cp[..., 3:4]], -1)      # (..., 4, 4) ray space
    eps = 4.0 * 1.19209290e-07 * jnp.max(jnp.abs(c2), axis=(-1, -2))

    ts = np.linspace(0.0, 1.0, n_seg + 1, dtype=np.float32)
    u_knots = jnp.asarray(ts)
    # evaluate endpoints + derivatives at all knots: (..., n_seg+1, 4)
    pk = eval_bezier(c2[..., None, :, :],
                     jnp.broadcast_to(u_knots, c2.shape[:-2] + (n_seg + 1,)))
    dk = eval_bezier_du(c2[..., None, :, :],
                        jnp.broadcast_to(u_knots, c2.shape[:-2] + (n_seg + 1,)))
    small = jnp.max(jnp.abs(dk[..., :3]), -1) < eps[..., None]
    seg_d = pk[..., 1:, :] - pk[..., :-1, :]          # (..., n_seg, 4)
    d0 = jnp.where(small[..., :-1, None], seg_d[..., :3], dk[..., :-1, :3])
    d1 = jnp.where(small[..., 1:, None], seg_d[..., :3], dk[..., 1:, :3])
    p0, p1 = pk[..., :-1, :], pk[..., 1:, :]          # (..., n_seg, 4)

    # cylinder culling vs the 2D origin (ribbon.h:66-71)
    num = seg_d[..., 0] * p0[..., 1] - seg_d[..., 1] * p0[..., 0]
    den2 = jnp.sum(seg_d[..., :2] ** 2, -1)
    rmax = jnp.maximum(p0[..., 3], p1[..., 3])
    valid = num * num <= rmax * rmax * den2

    def offs(p, dpdt):
        n = jnp.stack([dpdt[..., 1], -dpdt[..., 0],
                       jnp.zeros_like(dpdt[..., 0])], -1)
        nn = n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-36))
        return (p[..., :3] + p[..., 3:4] * nn, p[..., :3] - p[..., 3:4] * nn)

    lp0, up0 = offs(p0, d0)
    lp1, up1 = offs(p1, d1)

    # quad (lp0, lp1, up1, up0) vs ray (O=0, D=+z), backface-culling variant
    # (quad_intersector.h:15-74); cross(a,b).z == 2D determinant
    va, vb, vc, vd = lp0, lp1, up1, up0
    edb = vb - vd
    WW = vd[..., 0] * edb[..., 1] - vd[..., 1] * edb[..., 0]
    sel = (WW <= 0.0)[..., None]
    v0 = jnp.where(sel, va, vc)
    v1 = jnp.where(sel, vb, vd)
    v2 = jnp.where(sel, vd, vb)
    e0 = v2 - v0
    e1 = v0 - v1
    U = v0[..., 0] * e0[..., 1] - v0[..., 1] * e0[..., 0]
    V = v1[..., 0] * e1[..., 1] - v1[..., 1] * e1[..., 0]
    valid &= jnp.maximum(U, V) <= 0.0
    ng2 = jnp.cross(e1, e0)
    den = ng2[..., 2]
    rcp_den = jnp.where(den != 0.0, 1.0 / jnp.where(den == 0, 1.0, den), 0.0)
    t = rcp_den * jnp.sum(v0 * ng2, -1)
    valid &= (tnear[..., None] <= t) & (t <= tfar[..., None]) & (den != 0.0)
    uq = U * rcp_den
    vq = V * rcp_den
    uq = jnp.where(sel[..., 0], uq, 1.0 - uq)
    vq = jnp.where(sel[..., 0], vq, 1.0 - vq)
    # self-intersection avoidance (ribbon.h:117-120)
    r_at = p0[..., 3] * (1 - uq) + p1[..., 3] * uq
    valid &= t > SELF_INTERSECTION_AVOIDANCE * r_at * ds[..., None]

    u_full = (jnp.asarray(np.arange(n_seg, dtype=np.float32)) + uq) / n_seg
    vv = 2.0 * vq - 1.0

    tbig = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(tbig, axis=-1)
    hit = jnp.take_along_axis(valid, best[..., None], -1)[..., 0]
    t_o = jnp.take_along_axis(t, best[..., None], -1)[..., 0]
    u_o = jnp.take_along_axis(u_full, best[..., None], -1)[..., 0]
    v_o = jnp.take_along_axis(vv, best[..., None], -1)[..., 0]
    ng = eval_bezier_du(cp, u_o)[..., :3]             # world tangent = Ng
    return hit, t_o, u_o, v_o, ng


def intersect_sweep(org, dir, cp, tnear, tfar, n_seg: int = 16,
                    n_iter: int = 5):
    """Round-curve swept-circle intersector — the reference's Jacobian Newton
    solve (curve_intersector_sweep.h:59-141 intersect_bezier_iterative_jacobian)
    with TPU-first seeding: instead of the recursive cylinder-culling
    subdivision (hostile to SIMD lockstep), every ray runs n_seg uniform
    Newton seeds in parallel and keeps the nearest converged root. The
    converged equations (f = dot(R,T) = 0, g = |R| sin - r(u) = 0) and the
    reported hit (t, u, Ng = cross(V,U)) are identical.

    Returns (hit, t, u, v(=0), ng)."""
    d2 = jnp.sum(dir * dir, -1)
    # recenter the ray near the curve for fp32 robustness (the dt shift)
    center = jnp.mean(cp[..., :3], axis=-2)
    dt = jnp.sum((center - org) * dir, -1) / jnp.maximum(d2, 1e-36)
    org_c = org + dt[..., None] * dir
    rel = jnp.concatenate([cp[..., :3] - org_c[..., None, :], cp[..., 3:]], -1)

    box_max = jnp.max(jnp.abs(rel), axis=(-1, -2))
    P_err = 16.0 * 1.19209290e-07 * box_max
    len_dir = jnp.sqrt(jnp.maximum(d2, 1e-36))

    useed = (jnp.asarray(np.arange(n_seg, dtype=np.float32)) + 0.5) / n_seg
    u = jnp.broadcast_to(useed, org.shape[:-1] + (n_seg,))
    # t seed: closest approach of the (recentered) ray to P(u_seed), pulled
    # BACK toward the entry root by the expected half-chord — seeding exactly
    # at the perpendicular foot is the minimum of g(t), where Newton stalls
    # (the reference avoids this by seeding from outer-cylinder hit intervals,
    # sweep.h:226-233; the bias reproduces that entry-side seed)
    Pu = eval_bezier(rel[..., None, :, :], u)
    t = (jnp.sum(Pu[..., :3] * dir[..., None, :], -1)
         / jnp.maximum(d2[..., None], 1e-36))
    Q0 = t[..., None] * dir[..., None, :]
    R0 = Q0 - Pu[..., :3]
    perp2 = jnp.sum(R0 * R0, -1)
    r0 = Pu[..., 3]
    half_chord = jnp.sqrt(jnp.maximum(r0 * r0 - perp2, 0.25 * r0 * r0))
    hc = half_chord / jnp.sqrt(jnp.maximum(d2[..., None], 1e-36))
    # TWO seed banks: entry-side (t - hc) and exit-side (t + hc). A ray
    # whose origin lies INSIDE the fat curve (closeup cameras) has its
    # entry root behind tnear — only the exit-side seed converges to the
    # valid root (the reference's interval recursion finds both naturally)
    u = jnp.concatenate([u, u], axis=-1)
    t = jnp.concatenate([t - hc, t + hc], axis=-1)

    dirn = dir[..., None, :]

    def body(i, state):
        u, t, done, hit_t, hit_u, hit_f = state
        Q = t[..., None] * dirn
        P4 = eval_bezier(rel[..., None, :, :], u)
        dP4 = eval_bezier_du(rel[..., None, :, :], u)
        ddP4 = eval_bezier_ddu(rel[..., None, :, :], u)
        P, r = P4[..., :3], P4[..., 3]
        dPdu, drdu = dP4[..., :3], dP4[..., 3]
        ddPdu = ddP4[..., :3]

        R = Q - P
        len_R = jnp.sqrt(jnp.maximum(jnp.sum(R * R, -1), 0.0))
        Q_err = 16.0 * 1.19209290e-07 * len_dir[..., None] * t
        R_err = jnp.maximum(Q_err, P_err[..., None])

        dPdu2 = jnp.sum(dPdu * dPdu, -1)
        rcp_len = _rsqrt(jnp.maximum(dPdu2, 1e-36))
        T = dPdu * rcp_len[..., None]
        dTdu = (ddPdu * dPdu2[..., None]
                - dPdu * jnp.sum(dPdu * ddPdu, -1)[..., None]) \
            * (rcp_len ** 3)[..., None]
        cos_err = P_err[..., None] * rcp_len

        f = jnp.sum(R * T, -1)
        f_err = len_R * P_err[..., None] + R_err + cos_err * (1.0 + len_R)
        dfdu = jnp.sum(-dPdu * T, -1) + jnp.sum(R * dTdu, -1)
        dfdt = jnp.sum(dirn * T, -1)

        K = jnp.maximum(jnp.sum(R * R, -1) - f * f, 0.0)
        dKdu = jnp.sum(R * -dPdu, -1) - f * dfdu
        dKdt = jnp.sum(R * dirn, -1) - f * dfdt
        rsK = _rsqrt(jnp.maximum(K, 1e-36))

        g = jnp.sqrt(K) - r
        g_err = R_err + f_err + 16.0 * 1.19209290e-07 * box_max[..., None]
        dgdu = dKdu * rsK - drdu
        dgdt = dKdt * rsK

        det = dfdu * dgdt - dfdt * dgdu
        rdet = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
        du = (dgdt * f - dfdt * g) * rdet
        dtt = (-dgdu * f + dfdu * g) * rdet

        conv = (jnp.abs(f) < f_err) & (jnp.abs(g) < g_err) & ~done
        tw = t + dt[..., None]
        ok = conv & (tnear[..., None] <= tw) & (tw <= tfar[..., None]) \
            & (u >= 0.0) & (u <= 1.0)
        # record first accepted root per seed
        hit_t = jnp.where(ok, tw, hit_t)
        hit_u = jnp.where(ok, u, hit_u)
        hit_f = hit_f | ok
        done = done | conv
        u = jnp.where(done, u, u - du)
        t = jnp.where(done, t, t - dtt)
        return u, t, done, hit_t, hit_u, hit_f

    init = (u, t, jnp.zeros(u.shape, bool), jnp.full(u.shape, jnp.inf),
            jnp.zeros_like(u), jnp.zeros(u.shape, bool))
    state = init
    for i in range(n_iter + 1):      # +1: accept roots found on the last step
        state = body(i, state)
    _, _, _, hit_t, hit_u, hit_f = state

    tbig = jnp.where(hit_f, hit_t, jnp.inf)
    best = jnp.argmin(tbig, axis=-1)
    hit = jnp.take_along_axis(hit_f, best[..., None], -1)[..., 0]
    t_o = jnp.take_along_axis(hit_t, best[..., None], -1)[..., 0]
    u_o = jnp.take_along_axis(hit_u, best[..., None], -1)[..., 0]

    # Ng at the root (sweep.h:133-137): R=norm(Q-P); U=r'*R+dPdu; V=cross(dPdu,R)
    P4 = eval_bezier(cp, u_o)
    dP4 = eval_bezier_du(cp, u_o)
    Q = org + t_o[..., None] * dir
    Rn = Q - P4[..., :3]
    Rn = Rn / jnp.sqrt(jnp.maximum(jnp.sum(Rn * Rn, -1, keepdims=True), 1e-36))
    Uv = dP4[..., 3:4] * Rn + dP4[..., :3]
    Vv = jnp.cross(dP4[..., :3], Rn)
    ng = jnp.cross(Vv, Uv)
    return hit, t_o, u_o, jnp.zeros_like(u_o), ng


def intersect_oriented(org, dir, cp, ncp, tnear, tfar, n_seg: int = 64):
    """Normal-oriented curve intersector — the ruled surface
    l(u,v) = p(u) + (1-2v)*r(u)*normalize(cross(n(u), dp(u)))
    (curve_intersector_oriented.h:82-118 fromCenterAndNormalCurve), resolved
    TPU-first as n_seg ruled quads intersected in world space instead of the
    reference's recursive interval bezier clipping (hostile to lockstep
    SIMD). Hit: u along curve, v in [0,1] from the L (+binormal) edge,
    Ng = cross(dPdu, dPdv) — matching BezierCurveHit semantics.

    cp: (..., 4, 4) Bezier xyz+r; ncp: (..., 4, 3) Bezier normal spline.
    """
    # --- reconstruct the reference's edge curves L/R: a cubic Hermite fit of
    # the offset curves p(t) -/+ r(t)*normalize(cross(n(t), dp(t))) from the
    # ENDPOINT values and derivatives (linear_bezier_patch.h
    # fromCenterAndNormalCurve) — the intersected surface is exactly this
    # reconstruction, not the pointwise offset. ---
    def at(u):
        u = jnp.full(cp.shape[:-2], u, jnp.float32)
        p = eval_bezier(cp, u)
        dp = eval_bezier_du(cp, u)
        n = eval_bezier(ncp, u)
        dn = eval_bezier_du(ncp, u)
        bt = jnp.cross(n, dp[..., :3])
        dbt = jnp.cross(dn, dp[..., :3])     # ddp assumed 0 (reference note)
        bt2 = jnp.sum(bt * bt, -1, keepdims=True)
        rl = _rsqrt(jnp.maximum(bt2, 1e-36))
        k = bt * rl
        dk = (dbt * bt2 - bt * jnp.sum(bt * dbt, -1, keepdims=True)) * rl ** 3
        w, dw = p[..., 3:4], dp[..., 3:4]
        l = p[..., :3] - w * k
        dl = dp[..., :3] - (dw * k + w * dk)
        r = p[..., :3] + w * k
        dr = dp[..., :3] + (dw * k + w * dk)
        return l, dl, r, dr

    l0, dl0, r0, dr0 = at(0.0)
    l1, dl1, r1, dr1 = at(1.0)
    third = 1.0 / 3.0
    Lcp = jnp.stack([l0, l0 + third * dl0, l1 - third * dl1, l1], axis=-2)
    Rcp = jnp.stack([r0, r0 + third * dr0, r1 - third * dr1, r1], axis=-2)

    ts = np.linspace(0.0, 1.0, n_seg + 1, dtype=np.float32)
    uk = jnp.broadcast_to(jnp.asarray(ts), cp.shape[:-2] + (n_seg + 1,))
    lpk = eval_bezier(Lcp[..., None, :, :], uk)        # v=0 edge (L)
    upk = eval_bezier(Rcp[..., None, :, :], uk)        # v=1 edge (R)

    lp0, lp1 = lpk[..., :-1, :], lpk[..., 1:, :]
    up0, up1 = upk[..., :-1, :], upk[..., 1:, :]

    O = org[..., None, :]
    D = dir[..., None, :]

    def quad_test(va, vb, vc, vd):
        """General-position backface-culled quad test
        (quad_intersector.h:15-74) with O at the origin."""
        edb = vb - vd
        WW = jnp.sum(jnp.cross(vd, edb) * D, -1)
        sel = (WW <= 0.0)[..., None]
        v0 = jnp.where(sel, va, vc)
        v1 = jnp.where(sel, vb, vd)
        v2 = jnp.where(sel, vd, vb)
        e0 = v2 - v0
        e1 = v0 - v1
        U = jnp.sum(jnp.cross(v0, e0) * D, -1)
        V = jnp.sum(jnp.cross(v1, e1) * D, -1)
        ok = jnp.maximum(U, V) <= 0.0
        ngq = jnp.cross(e1, e0)
        den = jnp.sum(ngq * D, -1)
        rcp_den = jnp.where(den != 0.0,
                            1.0 / jnp.where(den == 0, 1.0, den), 0.0)
        tq = rcp_den * jnp.sum(v0 * ngq, -1)
        ok &= (tnear[..., None] <= tq) & (tq <= tfar[..., None]) & (den != 0.0)
        uq = U * rcp_den
        vq = V * rcp_den
        uq = jnp.where(sel[..., 0], uq, 1.0 - uq)
        vq = jnp.where(sel[..., 0], vq, 1.0 - vq)
        return ok, tq, uq, vq

    # double-sided (curve_intersector_oriented.h accepts any root): test the
    # quad with both windings; at most one side accepts per ray
    ok_f, t_f, u_f, v_f = quad_test(lp0 - O, lp1 - O, up1 - O, up0 - O)
    ok_b, t_b, u_b, v_b = quad_test(up0 - O, up1 - O, lp1 - O, lp0 - O)
    valid = ok_f | ok_b
    t = jnp.where(ok_f, t_f, t_b)
    uq = jnp.where(ok_f, u_f, u_b)
    vq = jnp.where(ok_f, v_f, 1.0 - v_b)   # back winding flips v

    u_full = (jnp.asarray(np.arange(n_seg, dtype=np.float32)) + uq) / n_seg
    tbig = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(tbig, axis=-1)
    hit = jnp.take_along_axis(valid, best[..., None], -1)[..., 0]
    t_o = jnp.take_along_axis(t, best[..., None], -1)[..., 0]
    u_o = jnp.take_along_axis(u_full, best[..., None], -1)[..., 0]
    v_o = jnp.take_along_axis(vq, best[..., None], -1)[..., 0]

    # --- Newton polish on the exact ruled patch (the reference's endgame,
    # curve_intersector_oriented.h:144 solve_newton_raphson_loop with
    # eps = 8 ulp of the projected-curve extent, :34): the chords above only
    # LOCATE roots; fixed-count Newton iterations on
    # f(u,v) = [e1,e2] . (P(u,v) - O) converge to the exact surface. Seeded
    # from (a) the best chord hit and (b) the closest-approach segment (which
    # recovers silhouette hits the chord test misses). ---
    dd = jnp.sum(dir * dir, -1, keepdims=True)
    dnrm = dir * _rsqrt(jnp.maximum(dd, 1e-30))
    ax = jnp.where(jnp.abs(dnrm[..., 0:1]) < 0.9,
                   jnp.asarray([1.0, 0.0, 0.0]),
                   jnp.asarray([0.0, 1.0, 0.0]))
    e1 = jnp.cross(dnrm, ax)
    e1 = e1 * _rsqrt(jnp.maximum(jnp.sum(e1 * e1, -1, keepdims=True),
                                        1e-30))
    e2 = jnp.cross(dnrm, e1)

    # projected extent -> absolute on-surface tolerance
    pc = jnp.concatenate([Lcp, Rcp], axis=-2) - org[..., None, :]
    ext = jnp.maximum(
        jnp.max(jnp.abs(jnp.sum(pc * e1[..., None, :], -1)), -1),
        jnp.max(jnp.abs(jnp.sum(pc * e2[..., None, :], -1)), -1))
    eps = 32.0 * 1.1920929e-07 * jnp.maximum(ext, 1e-20)

    # seed (b): closest-approach segment midline
    mid = 0.5 * (lp0 + lp1 + up0 + up1) - O          # (..., n_seg, 3)
    d2 = (jnp.sum(mid * e1[..., None, :], -1) ** 2
          + jnp.sum(mid * e2[..., None, :], -1) ** 2)
    kb = jnp.argmin(d2, axis=-1)
    u_b = (kb.astype(jnp.float32) + 0.5) / n_seg

    def newton(u, v):
        f1 = f2 = jnp.zeros_like(u)
        for _ in range(8):
            L = eval_bezier(Lcp, u)
            Rr = eval_bezier(Rcp, u)
            P = (1.0 - v[..., None]) * L + v[..., None] * Rr - org
            f1 = jnp.sum(P * e1, -1)
            f2 = jnp.sum(P * e2, -1)
            du_ = (1.0 - v[..., None]) * eval_bezier_du(Lcp, u) \
                + v[..., None] * eval_bezier_du(Rcp, u)
            dv_ = Rr - L
            a = jnp.sum(du_ * e1, -1); b = jnp.sum(dv_ * e1, -1)
            c = jnp.sum(du_ * e2, -1); d_ = jnp.sum(dv_ * e2, -1)
            det = a * d_ - b * c
            inv = jnp.where(jnp.abs(det) > 1e-30,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
            u = u - (d_ * f1 - b * f2) * inv
            v = v - (-c * f1 + a * f2) * inv
        L = eval_bezier(Lcp, u)
        Rr = eval_bezier(Rcp, u)
        P = (1.0 - v[..., None]) * L + v[..., None] * Rr
        f1 = jnp.sum((P - org) * e1, -1)
        f2 = jnp.sum((P - org) * e2, -1)
        tn = jnp.sum((P - org) * dir, -1) / dd[..., 0]
        okn = ((jnp.maximum(jnp.abs(f1), jnp.abs(f2)) < eps)
               & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0))
        okn = okn & (tn >= tnear) & (tn <= tfar)
        return okn, tn, u, v

    ok_a, t_a, u_a, v_a = newton(u_o, v_o)
    ok_b2, t_b2, u_b2, v_b2 = newton(u_b, jnp.full_like(u_b, 0.5))
    # nearest converged Newton root; chord hit only as fallback
    use_b = ok_b2 & (~ok_a | (t_b2 < t_a))
    okn = ok_a | ok_b2
    t_n = jnp.where(use_b, t_b2, t_a)
    u_n = jnp.where(use_b, u_b2, u_a)
    v_n = jnp.where(use_b, v_b2, v_a)
    hit = hit | okn
    t_o = jnp.where(okn, t_n, t_o)
    u_o = jnp.where(okn, u_n, u_o)
    v_o = jnp.where(okn, v_n, v_o)

    # Ng = cross(dPdu, dPdv) on the reconstructed surface
    # P(u,v) = (1-v) L(u) + v R(u)
    dL = eval_bezier_du(Lcp, u_o)
    dR = eval_bezier_du(Rcp, u_o)
    dPdu = (1.0 - v_o[..., None]) * dL + v_o[..., None] * dR
    dPdv = eval_bezier(Rcp, u_o) - eval_bezier(Lcp, u_o)
    ng = jnp.cross(dPdu, dPdv)
    return hit, t_o, u_o, v_o, ng


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
