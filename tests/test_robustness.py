"""Numerical robustness: watertightness, NaN/Inf rays, degenerate input.

Parity targets: WatertightTest (verify.cpp:3611, miss rate <= 2e-5 asserted
at :3686), NaNTest (:3813), InfTest (:3884), GarbageGeometryTest (:1915).
"""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from test_bvh import make_sphere_mesh

MISS_RATE_BOUND = 2e-5  # verify.cpp:3686


def test_watertight_sphere():
    """Rays from the center of a closed tessellated sphere must always hit."""
    verts, idx = make_sphere_mesh(32, 64)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()

    n = 50_000
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(jnp.zeros((n, 3)), jnp.asarray(d))
    hits = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    miss = 1.0 - float(jnp.mean(hits.valid))
    assert miss <= MISS_RATE_BOUND, f"miss rate {miss}"


def test_watertight_plane_grid():
    """Random rays at a finely tessellated plane: no cracks along shared
    edges (the plane variant of WatertightTest)."""
    n = 64
    xs, ys = np.meshgrid(np.linspace(-1, 1, n + 1, dtype=np.float32),
                         np.linspace(-1, 1, n + 1, dtype=np.float32),
                         indexing="ij")
    v = np.stack([xs.ravel(), ys.ravel(), np.zeros((n + 1) ** 2, np.float32)], -1)
    idx = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            idx += [[a, a + 1, a + n + 2], [a, a + n + 2, a + n + 1]]
    s = et.Scene()
    s.attach(et.TriangleGeometry(v, np.asarray(idx, np.int32)))
    cs = s.commit()

    m = 50_000
    rng = np.random.default_rng(1)
    targets = rng.uniform(-0.98, 0.98, (m, 2)).astype(np.float32)
    org = np.concatenate([rng.uniform(-0.5, 0.5, (m, 2)), np.full((m, 1), 3.0)],
                         axis=1).astype(np.float32)
    d = np.concatenate([targets, np.zeros((m, 1))], axis=1) - org
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(d))
    hits = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    miss = 1.0 - float(jnp.mean(hits.valid))
    assert miss <= MISS_RATE_BOUND, f"miss rate {miss}"


def test_nan_inf_rays_do_not_hit_or_hang():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    bad = np.array([
        [np.nan, 0, 0], [0, np.inf, 0], [0, 0, -np.inf]], np.float32)
    org = np.vstack([bad, np.zeros((3, 3), np.float32)]).astype(np.float32)
    dirs = np.vstack([np.tile([0, 0, -1.0], (3, 1)), bad]).astype(np.float32)
    rays = et.make_rays(jnp.asarray(org) + jnp.array([0, 0, 5.0]), jnp.asarray(dirs))
    hits = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    assert np.isfinite(np.asarray(hits.t)[np.asarray(hits.valid)]).all()


def test_garbage_geometry_does_not_crash():
    """GarbageGeometryTest analog: NaN/huge vertices must not crash commit or
    traversal (invalid prims may simply never be hit)."""
    rng = np.random.default_rng(2)
    v = rng.normal(size=(64, 3)).astype(np.float32) * 1e30
    v[::7] = np.nan
    idx = rng.integers(0, 64, (40, 3)).astype(np.int32)
    s = et.Scene()
    s.attach(et.TriangleGeometry(v, idx))
    s.attach(et.TriangleGeometry(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    cs = s.commit()
    rays = et.make_rays(jnp.array([[0.2, 0.2, 1.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    hits = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    # the valid triangle must still be found
    assert bool(hits.valid[0]) and abs(float(hits.t[0]) - 1.0) < 1e-4


def test_tnear_tfar_extreme():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    org = jnp.array([[0.0, 0.0, 5.0]] * 3)
    d = jnp.array([[0.0, 0.0, -1.0]] * 3)
    rays = et.RayBatch(
        org=org, dir=d,
        tnear=jnp.array([0.0, 1e30, 0.0]),
        tfar=jnp.array([jnp.inf, jnp.inf, 1e-30]),
        time=jnp.zeros(3), mask=jnp.full(3, 0xFFFFFFFF, jnp.uint32))
    hits = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    np.testing.assert_array_equal(np.asarray(hits.valid), [True, False, False])


def test_robust_mode_watertight_both_backends():
    """robust=True (RTC_SCENE_FLAG_ROBUST analog): widened slabs + Plücker
    leaf tests on BOTH traversal engines (node_intersector1.h:106-110,
    triangle_intersector_pluecker.h). Small interpreted-kernel sample here;
    the full 2e-5 bound on the compiled kernel runs in perf/tpu_checks.py."""
    from embree_tpu import scene as scene_mod
    verts, idx = make_sphere_mesh(16, 24)
    s = et.Scene(robust=True)
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    assert cs.robust

    n = 2048
    rng = np.random.default_rng(3)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(jnp.zeros((n, 3)), jnp.asarray(d))
    h_jnp = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    assert float(jnp.mean(h_jnp.valid)) == 1.0, "robust jnp path leaked a miss"

    small = et.make_rays(jnp.zeros((256, 3)), jnp.asarray(d[:256]))
    scene_mod.PALLAS_INTERPRET = True
    try:
        h_pal = et.intersect(cs, small, backend="pallas")
    finally:
        scene_mod.PALLAS_INTERPRET = False
    assert float(jnp.mean(h_pal.valid)) == 1.0, "robust pallas path leaked a miss"


def test_stack_overflow_counter_zero_on_deep_scene():
    """Deep-tree stress: traversal must report zero dropped stack pushes
    (the silent-overflow hazard VERDICT flagged; reference sizes stacks from
    an enforced depth bound, bvh.h:71-73)."""
    from embree_tpu.accel import traverse as trav_mod
    from embree_tpu.scene import LEAF_SIZE, _make_prim_test
    # clustered geometry at exponentially shrinking scales drives depth up
    rng = np.random.default_rng(4)
    vs, ids = [], []
    base = 0
    for k in range(12):
        c = np.array([2.0 ** -k, 0, 0], np.float32)
        tri = (rng.normal(size=(8, 3, 3)).astype(np.float32) * 2.0 ** -(k + 3)
               + c)
        vs.append(tri.reshape(-1, 3))
        ids.append(np.arange(24).reshape(8, 3) + base)
        base += 24
    s = et.Scene()
    s.attach(et.TriangleGeometry(np.concatenate(vs), np.concatenate(ids).astype(np.int32)))
    cs = s.commit()
    n = 512
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = np.full((n, 3), 3.0, np.float32)
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(d))
    res = jax.jit(lambda c, r: trav_mod.traverse(
        c.bvh, _make_prim_test(c, r), r.org, r.dir, r.tnear, r.tfar,
        max_leaf_size=LEAF_SIZE))(cs, rays.reshape(n))
    assert int(res.overflow) == 0
