"""Runnable feature demos — one function per reference tutorial family
(SURVEY.md §2.7: intersection_filter, user_geometry, closest_point, collide,
instanced_geometry, motion_blur_geometry, interpolation; each mirrors the
corresponding tutorials/<name>/ demo's behavior on a minimal scene).

Run: python examples/feature_demos.py   (CPU-friendly; each demo prints a
one-line result and asserts its expected outcome).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses           # noqa: E402
import numpy as np           # noqa: E402
import jax.numpy as jnp      # noqa: E402

import embree_tpu as et      # noqa: E402


def demo_intersection_filter():
    """tutorials/intersection_filter: a filter callback rejects hits on the
    front plate, so rays pass through to the back plate."""
    v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    i = np.array([[0, 1, 2]], np.int32)

    def reject_front(org, dir, t, u, v_, ng, prim_id, geom_id):
        return t > 5.0          # accept only the far plate

    s = et.Scene()
    s.attach(et.TriangleGeometry(v, i, filter=reject_front))          # near
    s.attach(et.TriangleGeometry(v + np.array([0, 0, -8], np.float32), i))
    cs = s.commit()
    h = jax.jit(et.intersect)(cs, et.make_rays(
        jnp.array([[0.0, 0.0, 4.0]]), jnp.array([[0.0, 0.0, -1.0]])))
    assert bool(h.valid[0]) and abs(float(h.t[0]) - 12.0) < 1e-4
    print(f"intersection_filter: front plate filtered, hit t={float(h.t[0])}")


def demo_user_geometry():
    """tutorials/user_geometry: jittable bounds + intersect callback
    implementing an analytic sphere."""
    center = jnp.array([0.0, 0.0, 0.0])

    def sphere_isect(local_id, org, dir, tnear, tfar):
        oc = org - center
        b = 2.0 * jnp.sum(oc * dir, -1)
        c = jnp.sum(oc * oc, -1) - 1.0
        disc = b * b - 4.0 * jnp.sum(dir * dir, -1) * c
        t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) \
            / (2.0 * jnp.sum(dir * dir, -1))
        hit = (disc >= 0) & (t >= tnear) & (t <= tfar)
        p = org + t[..., None] * dir
        return hit, t, jnp.zeros_like(t), jnp.zeros_like(t), p - center

    s = et.Scene()
    s.attach(et.UserGeometry(np.array([[-1, -1, -1]], np.float32),
                             np.array([[1, 1, 1]], np.float32),
                             intersect_fn=sphere_isect))
    cs = s.commit()
    h = jax.jit(et.intersect)(cs, et.make_rays(
        jnp.array([[0.0, 0.0, 3.0]]), jnp.array([[0.0, 0.0, -1.0]])))
    assert bool(h.valid[0]) and abs(float(h.t[0]) - 2.0) < 1e-5
    print(f"user_geometry: analytic sphere hit t={float(h.t[0])}")


def demo_closest_point():
    """tutorials/closest_point: rtcPointQuery analog."""
    from embree_tpu.query import point_query_scene
    v = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
    s = et.Scene()
    s.attach(et.TriangleGeometry(v, np.array([[0, 1, 2]], np.int32)))
    cs = s.commit()
    q = jnp.array([[0.5, 0.5, 3.0]])
    res = jax.jit(point_query_scene)(cs, q, jnp.array([10.0]))
    d = float(res.dist[0])
    assert abs(d - 3.0) < 1e-5
    print(f"closest_point: dist={d} prim={int(res.prim[0])}")


def demo_collide():
    """tutorials/collide: BVH-vs-BVH triangle collision detection."""
    from embree_tpu.query import collide_scenes
    v1 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    s1 = et.Scene(); s1.attach(et.TriangleGeometry(v1, np.array([[0, 1, 2]], np.int32)))
    v2 = v1 + np.array([0.2, 0.2, 0.0], np.float32)   # overlapping, coplanar offset
    v2[2, 2] += 0.5   # tilt so the triangles genuinely cross
    v2[0, 2] -= 0.5
    s2 = et.Scene(); s2.attach(et.TriangleGeometry(v2, np.array([[0, 1, 2]], np.int32)))
    res = collide_scenes(s1.commit(), s2.commit())
    n = int(np.asarray(res.count))
    assert n >= 1
    print(f"collide: {n} intersecting pair(s)")


def demo_instancing():
    """tutorials/instanced_geometry: one BLAS, many transforms; hits carry
    the instance id stack."""
    base = et.Scene()
    base.attach(et.TriangleGeometry(
        np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    top = et.Scene()
    for k in range(4):
        xf = np.zeros((3, 4), np.float32)
        xf[:, :3] = np.eye(3)
        xf[0, 3] = 3.0 * k
        top.attach(et.InstanceGeometry(base, xf))
    cs = top.commit()
    h = jax.jit(et.intersect)(cs, et.make_rays(
        jnp.array([[6.0, 0.0, 5.0]]), jnp.array([[0.0, 0.0, -1.0]])))
    assert bool(h.valid[0]) and int(h.inst_id[0, 0]) == 2
    print(f"instancing: hit instance {int(h.inst_id[0, 0])} at x=6")


def demo_motion_blur_time_range():
    """tutorials/motion_blur_geometry + rtcSetGeometryTimeRange: the
    geometry exists only within its sub-[0,1] time range."""
    verts = np.stack([
        np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32),
        np.array([[-1, -1, 4], [1, -1, 4], [0, 1, 4]], np.float32)])
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, np.array([[0, 1, 2]], np.int32),
                                 time_range=(0.25, 0.75)))
    cs = s.commit()
    times = jnp.array([0.0, 0.5, 1.0])
    h = jax.jit(et.intersect)(cs, et.make_rays(
        jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (3, 1)),
        jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1)), time=times))
    assert [bool(x) for x in h.valid] == [False, True, False]
    print(f"motion_blur_time_range: visible only at t=0.5 (t={float(h.t[1])})")


def demo_interpolation():
    """tutorials/interpolation: rtcInterpolate over vertex attributes."""
    from embree_tpu.interpolate import interpolate
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    g = et.TriangleGeometry(v, np.array([[0, 1, 2]], np.int32))
    attr = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], np.float32)
    out = interpolate(g, jnp.array([0]), jnp.array([0.25]), jnp.array([0.5]),
                      attr)
    np.testing.assert_allclose(np.asarray(out[0]), [0.25, 0.25], atol=1e-6)
    print(f"interpolation: attr at (u=0.25,v=0.5) = {np.asarray(out[0])}")


def demo_gradients():
    """Differentiable rendering (no reference analog): d(depth)/d(vertex)."""
    v = jnp.array([[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    s = et.Scene()
    s.attach(et.TriangleGeometry(v, np.array([[0, 1, 2]], np.int32)))
    cs = s.commit()
    rays = et.make_rays(jnp.array([[0.0, 0.0, 5.0]]),
                        jnp.array([[0.0, 0.0, -1.0]]))

    def depth(dz):
        shift = jnp.array([0.0, 0.0, 1.0]) * dz
        s2 = dataclasses.replace(
            cs, tri_v0=cs.tri_v0 + shift, tri_v1=cs.tri_v1 + shift,
            tri_v2=cs.tri_v2 + shift, tri_v0b=cs.tri_v0b + shift,
            tri_v1b=cs.tri_v1b + shift, tri_v2b=cs.tri_v2b + shift)
        return jnp.sum(et.intersect(s2, rays).t)

    g = float(jax.grad(depth)(0.0))
    assert abs(g + 1.0) < 1e-4
    print(f"gradients: d(depth)/d(vertex_z) = {g} (exact -1)")


def demo_grid_geometry():
    """tutorials/grid_geometry: a regular height-field grid (RTCGrid
    12-byte prims); hits report grid-global uv."""
    w, h = 9, 7
    gx, gy = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    verts = np.stack([gx, gy, 0.1 * np.sin(3 * gx) * np.cos(3 * gy)],
                     -1).reshape(-1, 3).astype(np.float32)
    s = et.Scene()
    s.attach(et.GridGeometry(verts, np.array([[0, w, w, h]], np.int32)))
    cs = s.commit()
    h0 = jax.jit(et.intersect)(cs, et.make_rays(
        jnp.array([[0.25, 0.25, 2.0]]), jnp.array([[0.0, 0.0, -1.0]])))
    u, v = float(h0.u[0]), float(h0.v[0])
    assert bool(h0.valid[0]) and abs(u - 0.625) < 0.1 and abs(v - 0.625) < 0.1
    print(f"grid_geometry: hit grid at uv=({u:.3f},{v:.3f})")


def demo_subdivision_geometry():
    """tutorials/subdivision_geometry: a Catmull-Clark cube shrinks toward
    its smooth limit surface; an edge crease keeps one edge sharp."""
    v = np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                  [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32)
    faces = np.full(6, 4, np.int32)
    idx = np.array([0, 1, 2, 3, 4, 7, 6, 5, 0, 4, 5, 1,
                    1, 5, 6, 2, 2, 6, 7, 3, 3, 7, 4, 0], np.int32)
    rays = et.make_rays(jnp.array([[0.0, 0.0, 4.0]]),
                        jnp.array([[0.0, 0.0, -1.0]]))
    s = et.Scene()
    s.attach(et.SubdivisionGeometry(v, faces, idx, levels=3))
    t_smooth = float(jax.jit(et.intersect)(s.commit(), rays).t[0])
    s2 = et.Scene()
    s2.attach(et.SubdivisionGeometry(
        v, faces, idx, levels=3,
        creases={(0, 1): 10.0, (4, 5): 10.0, (0, 4): 10.0, (1, 5): 10.0}))
    t_crease = float(jax.jit(et.intersect)(s2.commit(), rays).t[0])
    # smooth limit surface sits INSIDE the cage (center t > 3); creasing the
    # bottom face's edges pulls the limit surface back toward the cage
    assert 3.05 < t_smooth < 3.4 and 3.0 < t_crease < t_smooth - 0.01
    print(f"subdivision_geometry: smooth center t={t_smooth:.3f} (cage 3.0)"
          f" -> {t_crease:.3f} with bottom-face creases")


def demo_curve_geometry():
    """tutorials/curve_geometry + hair_geometry: flat (ribbon) vs round
    (swept-tube) Bezier curves — the round tube is hit from any side."""
    cp = np.array([[0, -1, 0, 0.2], [0, -0.3, 0, 0.2],
                   [0, 0.3, 0, 0.2], [0, 1, 0, 0.2]], np.float32)
    org = jnp.array([[2.0, 0.0, 0.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    hits = {}
    for kind in ("flat", "round"):
        s = et.Scene()
        s.attach(et.CurveGeometry(cp, np.array([0], np.int32),
                                  basis="bezier", kind=kind))
        hits[kind] = jax.jit(et.intersect)(s.commit(), et.make_rays(org, d))
    assert bool(hits["round"].valid[0])
    t = float(hits["round"].t[0])
    assert abs(t - 1.8) < 0.05          # tube surface at x = 0.2
    print(f"curve_geometry: round tube hit t={t:.3f} (expect 1.8); "
          f"flat ribbon edge-on hit={bool(hits['flat'].valid[0])}")


def demo_quaternion_motion_blur():
    """tutorials/quaternion_motion_blur: an instance rotating 90deg via
    quaternion slerp — rays at t=0 and t=1 see it at different angles."""
    from embree_tpu.core.math import QuaternionDecomposition
    inner = et.Scene()
    inner.attach(et.TriangleGeometry(
        np.array([[2, -1, -0.01], [2, 1, -0.01], [2, 0, 0.01]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    eye34 = jnp.eye(3, 4)
    zero3 = jnp.zeros(3)
    q0 = QuaternionDecomposition(eye34, jnp.array([1.0, 0.0, 0.0, 0.0]),
                                 zero3)            # identity
    a = np.pi / 2
    q1 = QuaternionDecomposition(
        eye34, jnp.array([np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)]),
        zero3)                                     # 90deg about z
    s = et.Scene()
    s.attach(et.InstanceGeometry(inner, [q0, q1]))
    cs = s.commit()
    org = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 5.0]])
    d = jnp.concatenate([jnp.array([[2.0, 0.0, 0.0]]),
                         jnp.array([[0.0, 2.0, 0.0]])]) - org
    rays = et.make_rays(org, d / jnp.linalg.norm(d, axis=-1, keepdims=True),
                        time=jnp.array([0.0, 1.0]))
    h = jax.jit(et.intersect)(cs, rays)
    # t=0: triangle at +x (first ray hits); t=1: rotated to +y (second hits)
    assert bool(h.valid[0]) and bool(h.valid[1])
    print("quaternion_motion_blur: hit at +x (t=0) and +y (t=1) "
          "through slerp-resampled transforms")


def demo_instance_array():
    """tutorials/instance_array_geometry: ONE scene, N transforms sharing
    the BLAS (scene_instance_array.cpp) — a row of spheres from one proto."""
    proto = et.Scene()
    th = np.linspace(0, np.pi, 9)
    ph = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    t, p = np.meshgrid(th, ph, indexing="ij")
    sv = 0.3 * np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                         np.cos(t)], -1).reshape(-1, 3).astype(np.float32)
    si = []
    for i in range(8):
        for j in range(12):
            a = i * 12 + j
            b = i * 12 + (j + 1) % 12
            si += [[a, b, a + 12], [b, b + 12, a + 12]]
    proto.attach(et.TriangleGeometry(sv, np.asarray(si, np.int32)))
    xf = np.tile(np.eye(3, 4, dtype=np.float32), (5, 1, 1))
    xf[:, 0, 3] = np.arange(5, dtype=np.float32) * 2.0    # x = 0,2,4,6,8
    s = et.Scene()
    s.attach(et.InstanceArrayGeometry(proto, xf))
    cs = s.commit()
    org = jnp.stack([jnp.array([2.0 * k, 0.0, 5.0]) for k in range(5)])
    rays = et.make_rays(org, jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1)))
    h = jax.jit(et.intersect)(cs, rays)
    t = np.asarray(h.t)
    inst = np.asarray(h.inst_id)[:, 0]
    # every ray hits ITS translated copy at the same local depth; instID is
    # the array geometry's id (the element index is the reference's
    # instPrimID, instance_array_intersector.cpp)
    assert bool(np.asarray(h.valid).all())
    assert np.allclose(t, t[0], atol=1e-4) and (inst == inst[0]).all()
    print(f"instance_array: 5 copies of one BLAS each hit at t={t[0]:.2f}")


if __name__ == "__main__":
    demo_intersection_filter()
    demo_user_geometry()
    demo_closest_point()
    demo_collide()
    demo_instancing()
    demo_motion_blur_time_range()
    demo_interpolation()
    demo_gradients()
    demo_grid_geometry()
    demo_subdivision_geometry()
    demo_curve_geometry()
    demo_quaternion_motion_blur()
    demo_instance_array()
    print("all feature demos OK")
