"""LBVH build + traversal correctness: BVH results must equal brute force.

Mirrors the reference's regression strategy (verify.cpp IntensiveRegressionTest
:5298): randomized scenes, compare accelerated vs ground-truth intersection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.accel.bvh import INVALID_NODE, decode_leaf, is_leaf
from embree_tpu.accel.lbvh import build_lbvh


def make_sphere_mesh(n_theta=16, n_phi=24, radius=1.0, center=(0., 0., 0.)):
    """Procedural triangulated sphere (SceneGraph::createTriangleSphere analog,
    tutorials/common/scenegraph/geometry_creation.cpp)."""
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in th:
        for p in ph:
            verts.append([
                center[0] + radius * np.sin(t) * np.cos(p),
                center[1] + radius * np.sin(t) * np.sin(p),
                center[2] + radius * np.cos(t)])
    verts = np.asarray(verts, np.float32)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            idx.append([a, b, d])
            idx.append([a, d, c])
    return verts, np.asarray(idx, np.int32)


def random_rays(key, n, spread=3.0):
    k1, k2 = jax.random.split(key)
    org = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    dir = jax.random.normal(k2, (n, 3))
    return et.make_rays(org, dir)


def test_lbvh_structure_valid():
    key = jax.random.PRNGKey(7)
    n = 300
    c = jax.random.uniform(key, (n, 3), minval=-5, maxval=5)
    lo, up = c - 0.1, c + 0.1
    bvh = build_lbvh(lo, up)

    child = np.asarray(bvh.node_child)
    # every prim appears in exactly one leaf
    leaf_mask = np.asarray(is_leaf(bvh.node_child))
    starts, counts = decode_leaf(bvh.node_child)
    starts, counts = np.asarray(starts), np.asarray(counts)
    covered = np.zeros(n, bool)
    for nd in range(child.shape[0]):
        for w in range(child.shape[1]):
            if leaf_mask[nd, w]:
                for k in range(counts[nd, w]):
                    slot = starts[nd, w] + k
                    assert not covered[slot], "prim referenced twice"
                    covered[slot] = True
    assert covered.all(), "some prim not referenced by any leaf"

    # node bounds contain their subtree prim bounds
    root_lo, root_up = bvh.bounds()
    order = np.asarray(bvh.prim_order)
    np.testing.assert_array_compare(
        lambda a, b: a <= b + 1e-5, np.asarray(root_lo), np.asarray(lo).min(0))
    np.testing.assert_array_compare(
        lambda a, b: a >= b - 1e-5, np.asarray(root_up), np.asarray(up).max(0))


@pytest.mark.parametrize("n_rays", [512])
def test_bvh_matches_brute_force(n_rays):
    verts, idx = make_sphere_mesh()
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()

    rays = random_rays(jax.random.PRNGKey(3), n_rays)
    h_bvh = jax.jit(et.intersect)(cs, rays)
    h_ref = jax.jit(et.intersect_brute)(cs, rays)

    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_ref.valid))
    m = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h_bvh.t)[m], np.asarray(h_ref.t)[m], rtol=1e-4)
    # prim ids can differ only when two prims are hit at the same t
    same = np.asarray(h_bvh.prim_id)[m] == np.asarray(h_ref.prim_id)[m]
    t_close = np.isclose(np.asarray(h_bvh.t)[m], np.asarray(h_ref.t)[m], rtol=1e-4)
    assert (same | t_close).all()


def test_occluded_matches_intersect():
    verts, idx = make_sphere_mesh(8, 12)
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()
    rays = random_rays(jax.random.PRNGKey(11), 256)
    occ = jax.jit(et.occluded)(cs, rays)
    hits = jax.jit(et.intersect)(cs, rays)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hits.valid))


def test_two_geometries_ids():
    v1, i1 = make_sphere_mesh(6, 8, radius=1.0, center=(-2.0, 0, 0))
    v2, i2 = make_sphere_mesh(6, 8, radius=1.0, center=(2.0, 0, 0))
    scene = et.Scene()
    g0 = scene.attach(et.TriangleGeometry(jnp.asarray(v1), jnp.asarray(i1)))
    g1 = scene.attach(et.TriangleGeometry(jnp.asarray(v2), jnp.asarray(i2)))
    cs = scene.commit()

    org = jnp.array([[-2.0, 0.0, 5.0], [2.0, 0.0, 5.0]])
    dir = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hits = et.intersect(cs, et.make_rays(org, dir))
    assert np.asarray(hits.valid).all()
    np.testing.assert_array_equal(np.asarray(hits.geom_id), [g0, g1])


def test_ray_masks():
    """RayMasksTest analog (verify.cpp:2626)."""
    verts, idx = make_sphere_mesh(6, 8)
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx), mask=0x1))
    cs = scene.commit()
    org = jnp.array([[0.0, 0.0, 5.0]] * 2)
    dir = jnp.array([[0.0, 0.0, -1.0]] * 2)
    rays = et.make_rays(org, dir, mask=jnp.array([0x1, 0x2], jnp.uint32))
    hits = et.intersect(cs, rays)
    np.testing.assert_array_equal(np.asarray(hits.valid), [True, False])


def test_single_triangle_scene():
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(
        jnp.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]]),
        jnp.array([[0, 1, 2]], jnp.int32)))
    cs = scene.commit()
    rays = et.make_rays(jnp.array([[0.2, 0.2, 1.0]]), jnp.array([[0., 0., -1.]]))
    hits = et.intersect(cs, rays)
    assert bool(hits.valid[0])
    np.testing.assert_allclose(float(hits.t[0]), 1.0, atol=1e-5)
