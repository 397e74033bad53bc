"""Two-level TLAS/BLAS instancing (VERDICT task 4).

Hits must match the flattening path exactly on similarity transforms; BLAS
memory must be shared across instances; transform updates must not rebuild
BLASes; non-uniform scales must be exact for round prims (where flattening
is documented-approximate).
"""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.tlas import (build_two_level, intersect_two_level,
                             update_transforms)
from test_bvh import make_sphere_mesh, random_rays
from embree_tpu.scene import Scene, intersect


def _child():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    return s


def _xf(tx, ty, tz, s=1.0):
    m = np.zeros((3, 4), np.float32)
    m[0, 0] = m[1, 1] = m[2, 2] = s
    m[:, 3] = (tx, ty, tz)
    return m


def test_two_level_matches_flattened():
    child = _child()
    xfs = [_xf(-2.5, 0, 0), _xf(2.5, 0, 0, s=0.5), _xf(0, 2.5, 0, s=1.5)]
    top_f = et.Scene()
    top_t = et.Scene()
    for x in xfs:
        top_f.attach(et.InstanceGeometry(child, x))
        top_t.attach(et.InstanceGeometry(child, x))
    cs_flat = top_f.commit()
    tl = build_two_level(top_t)
    assert tl.n_children == 1 and tl.num_instances == 3

    rays = random_rays(jax.random.PRNGKey(11), 512)
    h_f = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs_flat, rays)
    h_t = jax.jit(intersect_two_level)(tl, rays)
    np.testing.assert_array_equal(np.asarray(h_t.valid), np.asarray(h_f.valid))
    m = np.asarray(h_f.valid)
    np.testing.assert_allclose(np.asarray(h_t.t)[m], np.asarray(h_f.t)[m],
                               rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(h_t.prim_id)[m],
                                  np.asarray(h_f.prim_id)[m])
    np.testing.assert_array_equal(np.asarray(h_t.inst_id)[m, 0],
                                  np.asarray(h_f.inst_id)[m, 0])


def test_blas_shared_memory():
    """N instances of one child cost O(BLAS + N), not O(N * prims)."""
    child = _child()
    top = et.Scene()
    N = 64
    rng = np.random.default_rng(0)
    for k in range(N):
        top.attach(et.InstanceGeometry(child, _xf(*rng.uniform(-20, 20, 3))))
    tl = build_two_level(top)
    assert tl.n_children == 1
    assert tl.num_instances == N
    # the single BLAS holds the sphere's prims once
    assert tl.children[0].num_prims == child._geoms[0].num_prims


def test_transform_update_keeps_blas():
    child = _child()
    top = et.Scene()
    gid = top.attach(et.InstanceGeometry(child, _xf(-2, 0, 0)))
    tl = build_two_level(top)
    blas0 = tl.children[0]
    top.get(gid).transform = _xf(5, 0, 0)
    tl2 = update_transforms(tl, top)
    assert tl2.children[0] is blas0          # BLAS untouched
    rays = et.make_rays(jnp.array([[5.0, 0, 5.0]]), jnp.array([[0.0, 0, -1.0]]))
    h = jax.jit(intersect_two_level)(tl2, rays)
    assert bool(h.valid[0])


def test_non_uniform_scale_round_prims_exact():
    """A sphere point prim under non-uniform instance scale: the two-level
    path traces in object space (exact); flattening approximates radii."""
    child = et.Scene()
    child.attach(et.PointGeometry(np.array([[0, 0, 0, 1.0]], np.float32),
                                  kind="sphere"))
    xf = np.array([[4.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]], np.float32)
    top = et.Scene()
    top.attach(et.InstanceGeometry(child, xf))
    tl = build_two_level(top)
    # ray along x must hit the stretched ellipsoid at |x| = 4
    r1 = et.make_rays(jnp.array([[10.0, 0, 0]]), jnp.array([[-1.0, 0, 0]]))
    h1 = jax.jit(intersect_two_level)(tl, r1)
    assert bool(h1.valid[0]) and abs(float(h1.t[0]) - 6.0) < 1e-3
    # ray along y hits at |y| = 1
    r2 = et.make_rays(jnp.array([[3.9, 10.0, 0]]), jnp.array([[0.0, -1.0, 0]]))
    h2 = jax.jit(intersect_two_level)(tl, r2)
    assert bool(h2.valid[0])


def test_overflow_waves_exact_beyond_C():
    """>C overlapping instances along one ray: the wave loop must keep
    exactness (the round-2 discarded-overflow hole)."""
    child = Scene()
    child.attach(et.TriangleGeometry(
        np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    s = Scene()
    for k in range(20):         # stacked along z, all overlapping the ray
        xf = np.hstack([np.eye(3), [[0], [0], [-float(k)]]]).astype(np.float32)
        s.attach(et.InstanceGeometry(child, xf))
    tl = build_two_level(s)
    rays = et.make_rays(
        jnp.array([[0.1, 0.0, 0.5], [0.1, 0.0, -25.0]]),
        jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]))
    h = jax.jit(intersect_two_level)(tl, rays)
    np.testing.assert_allclose(np.asarray(h.t), [0.5, 6.0], atol=1e-5)


def test_motion_instance_transforms():
    """2-step instance transforms sample at ray time on the TLAS path
    (round 2 used xfs[0] only, silently dropping the motion)."""
    child = Scene()
    child.attach(et.TriangleGeometry(
        np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    s = Scene()
    xfm = np.zeros((2, 3, 4), np.float32)
    xfm[:, :3, :3] = np.eye(3)
    xfm[0, 2, 3] = 5.0
    xfm[1, 2, 3] = 7.0
    s.attach(et.InstanceGeometry(child, xfm))
    tl = build_two_level(s)
    rays = et.make_rays(jnp.array([[0.1, 0.0, 10.0]] * 3),
                        jnp.array([[0.0, 0.0, -1.0]] * 3),
                        time=jnp.array([0.0, 0.5, 1.0]))
    h = jax.jit(intersect_two_level)(tl, rays)
    np.testing.assert_allclose(np.asarray(h.t), [5.0, 4.0, 3.0], atol=1e-5)


def test_commit_auto_two_level_matches_flattening():
    """Scene.commit auto-selects the TLAS path above TWO_LEVEL_AUTO
    instances; hits must match the flattened commit exactly."""
    rng = np.random.default_rng(3)
    child = Scene()
    child.attach(et.TriangleGeometry(
        rng.uniform(-0.4, 0.4, (12, 3)).astype(np.float32),
        np.arange(12, dtype=np.int32).reshape(-1, 3)))
    s = Scene()
    for k in range(24):
        xf = np.hstack([np.eye(3),
                        rng.uniform(-3, 3, (3, 1))]).astype(np.float32)
        s.attach(et.InstanceGeometry(child, xf))
    cs_tl = s.commit()                    # auto: 24 >= 16 -> two-level
    from embree_tpu.tlas import TwoLevelScene
    assert isinstance(cs_tl, TwoLevelScene)
    cs_flat = s.commit(two_level=False)
    org = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(d))
    h1 = jax.jit(intersect)(cs_tl, rays)
    h2 = jax.jit(intersect)(cs_flat, rays)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    np.testing.assert_allclose(np.asarray(h1.t)[np.asarray(h1.valid)],
                               np.asarray(h2.t)[np.asarray(h2.valid)],
                               rtol=1e-5, atol=1e-5)


def test_point_query_instanced():
    """Closest point through instanced scenes matches brute force — both on
    the flattening path (world-space merged table) and the TLAS path
    (per-BLAS object-space query with the similarity-scaled radius), the
    round-2 'no instance transform stack' gap."""
    from embree_tpu.query import point_query_scene
    rng = np.random.default_rng(11)
    tri = rng.uniform(-0.5, 0.5, (8, 3, 3)).astype(np.float32)
    child = Scene()
    child.attach(et.TriangleGeometry(tri.reshape(-1, 3),
                                     np.arange(24, dtype=np.int32).reshape(-1, 3)))
    s = Scene()
    offs = []
    for k in range(5):
        off = rng.uniform(-3, 3, 3).astype(np.float32)
        xf = np.hstack([np.eye(3, dtype=np.float32) * 0.7, off[:, None]])
        s.attach(et.InstanceGeometry(child, xf.astype(np.float32)))
        offs.append(xf)
    q = rng.uniform(-3, 3, (32, 3)).astype(np.float32)

    # brute force over all world-space triangles
    from embree_tpu.accel.point_query import closest_point_triangle
    world = np.concatenate([tri * 0.7 + o[:, 3] for o in offs])  # (40,3,3)
    bd = np.full(32, np.inf)
    for t in world:
        cp = np.asarray(closest_point_triangle(
            jnp.asarray(q), jnp.asarray(np.tile(t[0], (32, 1))),
            jnp.asarray(np.tile(t[1], (32, 1))),
            jnp.asarray(np.tile(t[2], (32, 1)))))
        bd = np.minimum(bd, np.linalg.norm(q - cp, axis=-1))

    r_flat = point_query_scene(s.commit(two_level=False), q, 10.0)
    np.testing.assert_allclose(np.asarray(r_flat.dist), bd, atol=1e-5)
    r_tl = point_query_scene(build_two_level(s), q, 10.0)
    np.testing.assert_allclose(np.asarray(r_tl.dist), bd, atol=1e-5)
