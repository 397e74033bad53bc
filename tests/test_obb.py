"""Hair-tier strand-aligned leaf OBBs (accel/obb.py).

Reference role: kernels/builders/bvh_builder_hair.h:19 + common/math/obbox.h
(unaligned bounds for hair). Verified properties:
  1. conservativeness — enabling the tier never changes any image/hit,
  2. effectiveness — diagonal-strand scenes traverse in measurably fewer
     steps (the OBB culls leaf pushes the loose AABB admits).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import embree_tpu as et
from embree_tpu import scene as scene_mod
from embree_tpu.scene import _make_prim_test, _scene_leaf_obb
from embree_tpu.accel import traverse as trav_mod


def _hair_scene(n_strands=64, seed=0, kind="flat"):
    """Diagonal near-parallel strands: worst case for AABBs, best for OBBs."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n_strands, 3)).astype(np.float32)
    d = np.array([1.0, 1.0, 0.2], np.float32)
    d /= np.linalg.norm(d)
    jitter = 0.05 * rng.standard_normal((n_strands, 3)).astype(np.float32)
    verts = []
    for i in range(n_strands):
        p0 = base[i]
        p3 = base[i] + 2.0 * (d + jitter[i])
        p1 = p0 + (p3 - p0) / 3.0
        p2 = p0 + 2.0 * (p3 - p0) / 3.0
        for p in (p0, p1, p2, p3):
            verts.append([p[0], p[1], p[2], 0.01])
    verts = np.asarray(verts, np.float32)
    idx = (np.arange(n_strands, dtype=np.int32) * 4).astype(np.int32)
    s = et.Scene()
    s.attach(et.CurveGeometry(verts, idx, basis="bezier", kind=kind))
    return s


def _rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    dirs = tgt - org
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return et.make_rays(jnp.asarray(org), jnp.asarray(dirs))


def _commit_toggled(build_scene, enabled: bool):
    old = os.environ.get("EMBREE_TPU_HAIR_OBB")
    os.environ["EMBREE_TPU_HAIR_OBB"] = "1" if enabled else "0"
    try:
        return build_scene().commit()
    finally:
        if old is None:
            del os.environ["EMBREE_TPU_HAIR_OBB"]
        else:
            os.environ["EMBREE_TPU_HAIR_OBB"] = old


def _traverse(cs, rays, occlusion=False):
    return trav_mod.traverse(
        cs.bvh, _make_prim_test(cs, rays), rays.org, rays.dir, rays.tnear,
        rays.tfar, occlusion=occlusion, max_leaf_size=scene_mod.LEAF_SIZE,
        robust=cs.robust, leaf_obb=_scene_leaf_obb(cs))


@pytest.mark.parametrize("kind", ["flat", "round"])
def test_obb_identical_hits(kind):
    cs_on = _commit_toggled(lambda: _hair_scene(kind=kind), True)
    cs_off = _commit_toggled(lambda: _hair_scene(kind=kind), False)
    assert cs_on.leaf_obb_rot.shape[0] > 0
    assert cs_off.leaf_obb_rot.shape[0] == 0
    rays = _rays()
    r_on = _traverse(cs_on, rays)
    r_off = _traverse(cs_off, rays)
    np.testing.assert_array_equal(np.asarray(r_on.best_prim),
                                  np.asarray(r_off.best_prim))
    np.testing.assert_array_equal(np.asarray(r_on.tfar),
                                  np.asarray(r_off.tfar))
    assert np.asarray(r_on.best_prim >= 0).any()


def test_obb_reduces_steps():
    cs_on = _commit_toggled(_hair_scene, True)
    cs_off = _commit_toggled(_hair_scene, False)
    rays = _rays()
    steps_on = int(_traverse(cs_on, rays).steps)
    steps_off = int(_traverse(cs_off, rays).steps)
    # lockstep step count = max over rays; culling leaf pushes shortens the
    # longest ray's walk on diagonal-strand content
    assert steps_on < steps_off


def test_obb_lines_identical_hits():
    def build():
        rng = np.random.default_rng(3)
        p = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        q = p + np.float32([0.8, 0.8, 0.1])
        verts = np.zeros((80, 4), np.float32)
        verts[0::2, :3] = p
        verts[1::2, :3] = q
        verts[:, 3] = 0.02
        idx = np.arange(0, 80, 2, dtype=np.int32)
        s = et.Scene()
        s.attach(et.LineSegmentsGeometry(verts, idx, kind="round"))
        return s
    cs_on = _commit_toggled(build, True)
    cs_off = _commit_toggled(build, False)
    assert cs_on.leaf_obb_rot.shape[0] > 0
    rays = _rays(seed=4)
    r_on = _traverse(cs_on, rays)
    r_off = _traverse(cs_off, rays)
    np.testing.assert_array_equal(np.asarray(r_on.best_prim),
                                  np.asarray(r_off.best_prim))


def test_mixed_kind_scene_per_leaf_eligibility():
    """Hair + ground-plane triangle (the hair0.xml shape): the tier stays ON
    (hair-majority), triangle leaves keep pass-through boxes, hits match."""
    def build():
        s = _hair_scene(n_strands=20)
        tri = np.array([[-3, -3, -1.5], [3, -3, -1.5], [0, 3, -1.5]],
                       np.float32)
        s.attach(et.TriangleGeometry(tri, np.array([[0, 1, 2]], np.int32)))
        return s
    cs_on = _commit_toggled(build, True)
    cs_off = _commit_toggled(build, False)
    assert cs_on.leaf_obb_rot.shape[0] > 0
    rays = _rays(seed=5)
    r_on = _traverse(cs_on, rays)
    r_off = _traverse(cs_off, rays)
    np.testing.assert_array_equal(np.asarray(r_on.best_prim),
                                  np.asarray(r_off.best_prim))


def test_majority_triangle_scene_disables_tier():
    def build():
        s = _hair_scene(n_strands=4)
        rng = np.random.default_rng(9)
        v = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
        idx = np.arange(60, dtype=np.int32).reshape(20, 3)
        s.attach(et.TriangleGeometry(v, idx))
        return s
    cs = _commit_toggled(build, True)
    assert cs.leaf_obb_rot.shape[0] == 0


def test_obb_full_intersect_image():
    """End-to-end through et.intersect (jnp engine): identical hit images."""
    cs_on = _commit_toggled(lambda: _hair_scene(n_strands=48, seed=7), True)
    cs_off = _commit_toggled(lambda: _hair_scene(n_strands=48, seed=7), False)
    rays = _rays(n=1024, seed=8)
    h_on = et.intersect(cs_on, rays, backend="jnp")
    h_off = et.intersect(cs_off, rays, backend="jnp")
    np.testing.assert_array_equal(np.asarray(h_on.valid),
                                  np.asarray(h_off.valid))
    np.testing.assert_allclose(np.asarray(h_on.t), np.asarray(h_off.t))
