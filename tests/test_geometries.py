"""Geometry-type coverage: quads, points, lines, curves, user geometry,
instancing, filters, motion blur.

Parity targets: verify.cpp QuadHitTest (:2549), InstancingTest (:2839),
InstanceArray (:2944), IntersectionFilterTest (:2762), RayMasksTest (:2626),
plus closed-form checks for points/lines/curves and 2-step motion blur.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et


def commit(*geoms, quality=None):
    s = et.Scene() if quality is None else et.Scene(quality=quality)
    gids = [s.attach(g) for g in geoms]
    return s.commit(), gids


def shoot(cs, org, dir, **kw):
    rays = et.make_rays(jnp.asarray(org, jnp.float32), jnp.asarray(dir, jnp.float32), **kw)
    return jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)


# ---------------------------------------------------------------- quads
def test_quad_hit_uv():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    cs, _ = commit(et.QuadGeometry(verts, np.array([[0, 1, 2, 3]], np.int32)))
    h = shoot(cs, [[0.25, 0.25, 1], [0.75, 0.75, 1], [1.5, 0.5, 1]],
              [[0, 0, -1]] * 3)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, True, False])
    # quad u/v: u along v0->v1, v along v0->v3
    np.testing.assert_allclose(float(h.u[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(h.v[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(h.u[1]), 0.75, atol=1e-5)
    np.testing.assert_allclose(float(h.v[1]), 0.75, atol=1e-5)


# ---------------------------------------------------------------- points
def test_sphere_point():
    pts = np.array([[0, 0, 0, 0.5], [3, 0, 0, 0.25]], np.float32)
    cs, _ = commit(et.PointGeometry(pts, kind="sphere"))
    h = shoot(cs, [[0, 0, 5], [3, 0, 5], [1.5, 0, 5]], [[0, 0, -1]] * 3)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, True, False])
    np.testing.assert_allclose(float(h.t[0]), 4.5, atol=1e-4)
    np.testing.assert_allclose(float(h.t[1]), 4.75, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(h.prim_id[:2]), [0, 1])


def test_disc_point():
    pts = np.array([[0, 0, 0, 0.5]], np.float32)
    cs, _ = commit(et.PointGeometry(pts, kind="disc"))
    h = shoot(cs, [[0.3, 0, 5], [0.8, 0, 5]], [[0, 0, -1]] * 2)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, False])


def test_oriented_disc_point():
    pts = np.array([[0, 0, 0, 0.5]], np.float32)
    nrm = np.array([[0, 0, 1]], np.float32)
    cs, _ = commit(et.PointGeometry(pts, kind="oriented_disc", normals=nrm))
    h = shoot(cs, [[0.2, 0, 5]], [[0, 0, -1]])
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 5.0, atol=1e-4)


# ---------------------------------------------------------------- lines
def test_round_line_capsule():
    verts = np.array([[0, 0, 0, 0.2], [1, 0, 0, 0.2]], np.float32)
    cs, _ = commit(et.LineSegmentsGeometry(verts, np.array([0], np.int32), kind="round"))
    h = shoot(cs, [[0.5, 0, 5], [0.5, 0.5, 5], [-0.19, 0, 5]], [[0, 0, -1]] * 3)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, False, True])
    np.testing.assert_allclose(float(h.t[0]), 4.8, atol=1e-3)
    assert 0.4 < float(h.u[0]) < 0.6


def test_flat_line_ribbon():
    verts = np.array([[0, 0, 0, 0.2], [1, 0, 0, 0.2]], np.float32)
    cs, _ = commit(et.LineSegmentsGeometry(verts, np.array([0], np.int32), kind="flat"))
    h = shoot(cs, [[0.5, 0.1, 5], [0.5, 0.3, 5]], [[0, 0, -1]] * 2)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, False])
    # flat lines hit at the axis depth (ray-facing ribbon)
    np.testing.assert_allclose(float(h.t[0]), 5.0, atol=1e-3)


# ---------------------------------------------------------------- curves
def test_bezier_curve_round():
    # straight-line bezier along x: must behave like a capsule chain
    cp = np.array([[0, 0, 0, 0.1], [1 / 3, 0, 0, 0.1],
                   [2 / 3, 0, 0, 0.1], [1, 0, 0, 0.1]], np.float32)
    cs, _ = commit(et.CurveGeometry(cp, np.array([0], np.int32),
                                    basis="bezier", kind="round",
                                    tessellation_rate=4))
    h = shoot(cs, [[0.5, 0, 5], [0.25, 0, 5], [0.5, 0.5, 5]], [[0, 0, -1]] * 3)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, True, False])
    np.testing.assert_allclose(float(h.t[0]), 4.9, atol=1e-2)
    # curve-global u at the hit
    assert 0.4 < float(h.u[0]) < 0.6
    assert 0.15 < float(h.u[1]) < 0.35
    np.testing.assert_array_equal(np.asarray(h.prim_id[:2]), [0, 0])


def test_bspline_curve_matches_eval():
    from embree_tpu.ops.curve import eval_curve
    rng = np.random.default_rng(0)
    cp = np.concatenate([rng.uniform(-1, 1, (4, 3)),
                         np.full((4, 1), 0.05)], axis=1).astype(np.float32)
    cs, _ = commit(et.CurveGeometry(cp, np.array([0], np.int32),
                                    basis="bspline", kind="round",
                                    tessellation_rate=16))
    # shoot at the curve midpoint from a direction perpendicular-ish
    mid = np.asarray(eval_curve("bspline", jnp.asarray(cp), jnp.asarray(0.5)))
    org = mid[:3] + np.array([0, 0, 3], np.float32)
    h = shoot(cs, [org], [[0, 0, -1]])
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 3.0 - 0.05, atol=0.02)


# ---------------------------------------------------------------- user geometry
def test_user_geometry_plane():
    def plane_isect(local_id, org, dir, tnear, tfar):
        # infinite z=0 plane clipped to the unit square, per prim
        t = -org[..., 2] / jnp.where(jnp.abs(dir[..., 2]) > 1e-12, dir[..., 2], 1.0)
        p = org + dir * t[..., None]
        inside = (p[..., 0] >= 0) & (p[..., 0] <= 1) & (p[..., 1] >= 0) & (p[..., 1] <= 1)
        hit = inside & (t >= tnear) & (t <= tfar)
        ng = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p.shape)
        return hit, t, p[..., 0], p[..., 1], ng

    g = et.UserGeometry(
        bounds_lower=np.array([[0, 0, -0.01]], np.float32),
        bounds_upper=np.array([[1, 1, 0.01]], np.float32),
        intersect_fn=plane_isect)
    cs, _ = commit(g)
    h = shoot(cs, [[0.5, 0.5, 2], [2, 2, 2]], [[0, 0, -1]] * 2)
    np.testing.assert_array_equal(np.asarray(h.valid), [True, False])
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(h.u[0]), 0.5, atol=1e-5)


# ---------------------------------------------------------------- filters
def test_intersection_filter_rejects():
    """Filter rejecting the nearest surface exposes the one behind it
    (IntersectionFilterTest semantics)."""
    v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    i = np.array([[0, 1, 2]], np.int32)
    front = et.TriangleGeometry(v, i)
    back = et.TriangleGeometry(v + np.array([0, 0, -1], np.float32), i)

    def reject_front(org, dir, t, u, v_, ng, prim_id, geom_id):
        return t > 0.75  # rejects hits closer than 0.75

    front.filter = reject_front
    cs, (g0, g1) = commit(front, back)
    h = shoot(cs, [[0, 0, 0.5], [0, 0, 2.0]], [[0, 0, -1]] * 2)
    # ray 0: front hit at t=0.5 is filtered away -> back plane at t=1.5
    assert bool(h.valid[0]) and int(h.geom_id[0]) == g1
    np.testing.assert_allclose(float(h.t[0]), 1.5, atol=1e-5)
    # ray 1: front hit at t=2.0 passes the filter
    assert int(h.geom_id[1]) == g0


# ---------------------------------------------------------------- instancing
def _tri_scene():
    s = et.Scene()
    s.attach(et.TriangleGeometry(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    return s


def test_instancing_two_translated():
    child = _tri_scene()
    xf1 = np.hstack([np.eye(3), [[0], [0], [0]]]).astype(np.float32)
    xf2 = np.hstack([np.eye(3), [[3], [0], [0]]]).astype(np.float32)
    top = et.Scene()
    i0 = top.attach(et.InstanceGeometry(child, xf1))
    i1 = top.attach(et.InstanceGeometry(child, xf2))
    cs = top.commit()
    h = shoot(cs, [[0.2, 0.2, 1], [3.2, 0.2, 1]], [[0, 0, -1]] * 2)
    assert np.asarray(h.valid).all()
    np.testing.assert_array_equal(np.asarray(h.inst_id[:, 0]), [i0, i1])
    np.testing.assert_array_equal(np.asarray(h.geom_id), [0, 0])  # child gid


def test_instance_array():
    child = _tri_scene()
    tfs = np.stack([np.hstack([np.eye(3), [[2 * k], [0], [0]]]) for k in range(3)]
                   ).astype(np.float32)
    top = et.Scene()
    ia = top.attach(et.InstanceArrayGeometry(child, tfs))
    cs = top.commit()
    h = shoot(cs, [[0.2, 0.2, 1], [2.2, 0.2, 1], [4.2, 0.2, 1]], [[0, 0, -1]] * 3)
    assert np.asarray(h.valid).all()
    np.testing.assert_array_equal(np.asarray(h.inst_id[:, 0]), [ia] * 3)


def test_multi_level_instancing():
    inner = _tri_scene()
    mid = et.Scene()
    im = mid.attach(et.InstanceGeometry(
        inner, np.hstack([np.eye(3), [[0], [0], [0]]]).astype(np.float32)))
    top = et.Scene()
    it = top.attach(et.InstanceGeometry(
        mid, np.hstack([np.eye(3), [[5], [0], [0]]]).astype(np.float32)))
    cs = top.commit()
    h = shoot(cs, [[5.2, 0.2, 1]], [[0, 0, -1]])
    assert bool(h.valid[0])
    np.testing.assert_array_equal(np.asarray(h.inst_id[0]), [it, im])


def test_instance_rotation_normals():
    """World-space Ng of a rotated instance matches the rotated normal."""
    child = _tri_scene()  # normal +z
    ang = np.pi / 2
    R = np.array([[1, 0, 0], [0, np.cos(ang), -np.sin(ang)],
                  [0, np.sin(ang), np.cos(ang)]], np.float32)  # rot about x: z->y
    xf = np.hstack([R, [[0], [0], [0]]]).astype(np.float32)
    top = et.Scene()
    top.attach(et.InstanceGeometry(child, xf))
    cs = top.commit()
    h = shoot(cs, [[0.2, 1.0, 0.2]], [[0, -1, 0]])
    assert bool(h.valid[0])
    ng = np.asarray(h.ng[0]); ng = ng / np.linalg.norm(ng)
    np.testing.assert_allclose(np.abs(ng), [0, 1, 0], atol=1e-5)


# ---------------------------------------------------------------- motion blur
def test_motion_blur_triangle():
    """2-step linear MB: hit position follows ray.time (LBBox lerp analog)."""
    v0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    v1 = v0 + np.array([2, 0, 0], np.float32)
    verts = np.stack([v0, v1])           # (2, n, 3)
    cs, _ = commit(et.TriangleGeometry(verts, np.array([[0, 1, 2]], np.int32)))

    org = np.array([[0.2, 0.2, 1], [2.2, 0.2, 1]], np.float32)
    d = np.array([[0, 0, -1]] * 2, np.float32)
    h_t0 = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(
        cs, et.make_rays(org, d, time=0.0))
    h_t1 = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(
        cs, et.make_rays(org, d, time=1.0))
    np.testing.assert_array_equal(np.asarray(h_t0.valid), [True, False])
    np.testing.assert_array_equal(np.asarray(h_t1.valid), [False, True])
    # mid-time: triangle shifted by 1
    h_mid = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(
        cs, et.make_rays(np.array([[1.2, 0.2, 1]], np.float32),
                         np.array([[0, 0, -1]], np.float32), time=0.5))
    assert bool(h_mid.valid[0])


def test_motion_blur_instance():
    """Instance transform motion: (2,3,4) transform lerps with ray.time."""
    child = _tri_scene()
    xf0 = np.hstack([np.eye(3), [[0], [0], [0]]]).astype(np.float32)
    xf1 = np.hstack([np.eye(3), [[2], [0], [0]]]).astype(np.float32)
    top = et.Scene()
    top.attach(et.InstanceGeometry(child, np.stack([xf0, xf1])))
    cs = top.commit()
    h = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(
        cs, et.make_rays(np.array([[1.2, 0.2, 1]], np.float32),
                         np.array([[0, 0, -1]], np.float32), time=0.5))
    assert bool(h.valid[0])


# ---------------------------------------------------------------- mixed scene
def test_mixed_kind_scene_brute_equivalence():
    rng = np.random.default_rng(5)
    tri_v = rng.uniform(-3, 3, (30, 3)).astype(np.float32)
    geoms = [
        et.TriangleGeometry(tri_v, rng.integers(0, 30, (20, 3)).astype(np.int32)),
        et.PointGeometry(np.concatenate(
            [rng.uniform(-3, 3, (10, 3)), rng.uniform(0.1, 0.4, (10, 1))],
            axis=1).astype(np.float32), kind="sphere"),
        et.LineSegmentsGeometry(np.concatenate(
            [rng.uniform(-3, 3, (12, 3)), rng.uniform(0.05, 0.2, (12, 1))],
            axis=1).astype(np.float32),
            np.arange(0, 10, 2).astype(np.int32), kind="round"),
    ]
    cs, _ = commit(*geoms)
    org = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    h_bvh = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    h_ref = jax.jit(et.intersect_brute)(cs, rays)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_ref.valid))
    m = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h_bvh.t)[m], np.asarray(h_ref.t)[m],
                               rtol=1e-4)


def test_filter_full_convention_modifies_hit():
    """Full-convention filters get the intersect/occluded context and may
    modify the reported hit's u/v/Ng (filter.h may-modify semantics)."""
    import jax.numpy as jnp
    v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    i = np.array([[0, 1, 2]], np.int32)
    tri = et.TriangleGeometry(v, i)
    contexts = []

    def flip_normal(context, org, dir, t, u, v_, ng, prim_id, geom_id):
        contexts.append(context)              # trace-time record
        keep = jnp.ones(t.shape, bool)        # accept everything...
        if context == "occluded":
            keep = t > 10.0                   # ...but never occlude
        return keep, {"ng": -ng, "u": u * 0 + 0.25}

    tri.filter = flip_normal
    cs, _ = commit(tri)
    h = shoot(cs, [[0, -0.2, 2.0]], [[0, 0, -1]])
    assert bool(h.valid[0])
    # the unmodified geometric normal points +z (CCW triangle in the z=0
    # plane); the filter flips it
    assert float(h.ng[0, 2]) < 0.0
    np.testing.assert_allclose(float(h.u[0]), 0.25, atol=1e-6)
    assert "intersect" in contexts
    # occluded context: filter rejects everything -> not occluded
    import embree_tpu.scene as sc
    r = et.make_rays(jnp.asarray([[0., -0.2, 2.0]]), jnp.asarray([[0., 0., -1.]]))
    assert not bool(sc.occluded(cs, r)[0])
    assert "occluded" in contexts


def test_filters_distinct_per_subscene_gid():
    """Two instanced sub-scenes whose child geometries share gid 0 but have
    DIFFERENT filters must each apply their own filter (ADVICE r2: gid-keyed
    dedup silently dropped the second)."""
    tri = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)

    def reject_all(org, dir, t, u, v, ng, prim, geom):
        return jnp.zeros_like(t, bool)

    def accept_all(org, dir, t, u, v, ng, prim, geom):
        return jnp.ones_like(t, bool)

    child_a = et.Scene()
    ga = et.TriangleGeometry(tri, idx)
    ga.filter = reject_all
    child_a.attach(ga)                      # gid 0 in sub-scene A
    child_b = et.Scene()
    gb = et.TriangleGeometry(tri + np.array([0, 0, -2], np.float32), idx)
    gb.filter = accept_all
    child_b.attach(gb)                      # gid 0 in sub-scene B
    s = et.Scene()
    s.attach(et.InstanceGeometry(child_a, np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)))
    s.attach(et.InstanceGeometry(child_b, np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)))
    cs = s.commit(two_level=False)
    rays = et.make_rays(jnp.array([[0.0, 0.0, 5.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    h = jax.jit(et.intersect)(cs, rays)
    # front triangle (z=0, sub-scene A) is filtered out; the ray must hit
    # the back triangle (z=-2, sub-scene B) instead
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 7.0, atol=1e-5)


def test_distance_curve_intersector():
    """Distance hair-fallback algorithm (curve_intersector_distance.h:86):
    hits within the tube radius, u along the curve, self-intersection
    avoidance near the origin of grazing rays."""
    cp = np.array([[[0, 0, 0, 0.2], [1, 0.5, 0, 0.2],
                    [2, -0.5, 0, 0.2], [3, 0, 0, 0.2]]], np.float32)
    s = et.Scene()
    s.attach(et.CurveGeometry(cp.reshape(-1, 4), np.array([0], np.int32),
                              basis="bezier", kind="flat",
                              algorithm="distance"))
    cs = s.commit()
    org = jnp.array([[1.5, 0.0, 5.0], [1.5, 3.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]] * 2)
    h = jax.jit(et.intersect)(cs, et.make_rays(org, d))
    assert bool(h.valid[0]) and not bool(h.valid[1])
    assert 4.7 < float(h.t[0]) < 5.1
    assert 0.3 < float(h.u[0]) < 0.7


def test_min_width_radius_enlargement():
    """EMBREE_MIN_WIDTH analog (context.h enlargeRadiusToMinWidth): radii
    grow with distance as clamp(factor*d, r, scale*r); bounds stay
    conservative so far prims remain hittable."""
    pts = np.array([[0, 0, 0, 0.01]], np.float32)
    s = et.Scene(min_width_factor=0.05, max_radius_scale=8.0)
    s.attach(et.PointGeometry(pts, kind="sphere"))
    cs = s.commit()
    # from distance 3: r' = min(0.05*3, 8*0.01) = 0.08 -> a ray offset by
    # 0.05 (miss at r=0.01) must now hit
    rays = et.make_rays(jnp.array([[0.05, 0.0, 3.0]]),
                        jnp.array([[0.0, 0.0, -1.0]]))
    h = jax.jit(et.intersect)(cs, rays)
    assert bool(h.valid[0])
    # without min-width the same ray misses
    s2 = et.Scene()
    s2.attach(et.PointGeometry(pts, kind="sphere"))
    h2 = jax.jit(et.intersect)(s2.commit(), rays)
    assert not bool(h2.valid[0])


def test_sweep_ray_origin_inside_curve():
    """A ray starting INSIDE a fat round curve must hit the exit surface
    (closeup-camera case; the entry root is behind tnear)."""
    cp = np.array([[0, 0, -2, 0.5], [0, 0, -0.7, 0.5],
                   [0, 0, 0.7, 0.5], [0, 0, 2, 0.5]], np.float32)
    s = et.Scene()
    s.attach(et.CurveGeometry(cp, np.array([0], np.int32),
                              basis="bezier", kind="round"))
    cs = s.commit()
    # origin on the curve axis, inside the tube; exit at distance ~0.5
    rays = et.make_rays(jnp.array([[0.0, 0.0, 0.0]]),
                        jnp.array([[0.0, 1.0, 0.0]]))
    h = jax.jit(et.intersect)(cs, rays)
    assert bool(h.valid[0])
    assert 0.3 < float(h.t[0]) < 0.7


def test_round_line_inside_fat_joint_exit():
    """rls_9 regression (CSG interval union + degenerate-cone end-sphere
    clip): a ray STARTING INSIDE a fat joint sphere must exit through the
    union boundary (the joint sphere's far side), not through a thin
    neighboring cone's slant buried inside the sphere
    (roundline_intersector.h:584-600 interval union, :557 g<=0 clip)."""
    verts = np.array([[0, 1, 0, 1.0], [0, 2, 0, 1.0], [0, 2.8, 0, 0.1]],
                     np.float32)
    cs, _ = commit(et.LineSegmentsGeometry(
        verts, np.array([0, 1], np.int32), kind="round"))
    # near-axis ray from inside the first fat sphere, pointing up
    h = shoot(cs, [[0.05, 0.5, 0.0]], [[0, 1, 0]])
    assert bool(h.valid[0])
    # union exit: the fat joint sphere (0,2,0,r=1) far side at
    # y = 2 + sqrt(1 - 0.05^2) ~= 2.99875 -> t = y - 0.5
    np.testing.assert_allclose(float(h.t[0]), 2.49875, atol=1e-3)
    # outward normal points along the ray (exit hit)
    ng = np.asarray(h.ng[0], np.float64)
    ng /= np.linalg.norm(ng)
    assert ng[1] > 0.99
