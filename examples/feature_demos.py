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


if __name__ == "__main__":
    demo_intersection_filter()
    demo_user_geometry()
    demo_closest_point()
    demo_collide()
    demo_instancing()
    demo_motion_blur_time_range()
    demo_interpolation()
    demo_gradients()
    print("all feature demos OK")
