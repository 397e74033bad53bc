"""Pallas traversal kernel correctness (interpret mode on the CPU mesh).

The compiled-on-TPU path is exercised by bench.py / the driver; here the same
kernel runs under the Pallas interpreter and must agree with the jnp traversal
and brute force.
"""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu import scene as scene_mod
from test_bvh import make_sphere_mesh, random_rays


def setup_module(module):
    scene_mod.PALLAS_INTERPRET = True


def teardown_module(module):
    scene_mod.PALLAS_INTERPRET = False


def _sphere_scene(mask=0xFFFFFFFF):
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx), mask=mask))
    return s.commit()


def test_intersect_matches_jnp():
    cs = _sphere_scene()
    rays = random_rays(jax.random.PRNGKey(2), 256)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    m = np.asarray(h_j.valid)
    np.testing.assert_array_equal(np.asarray(h_p.valid), m)
    np.testing.assert_allclose(np.asarray(h_p.t)[m], np.asarray(h_j.t)[m], rtol=1e-4)
    # winning prim ids agree (or tie in t)
    same = np.asarray(h_p.prim_id)[m] == np.asarray(h_j.prim_id)[m]
    assert same.mean() > 0.95


def test_occluded_matches_jnp():
    cs = _sphere_scene()
    rays = random_rays(jax.random.PRNGKey(3), 256)
    o_p = et.occluded(cs, rays, backend="pallas")
    o_j = jax.jit(lambda c, r: et.occluded(c, r, backend="jnp"))(cs, rays)
    np.testing.assert_array_equal(np.asarray(o_p), np.asarray(o_j))


def test_ray_mask_respected():
    cs = _sphere_scene(mask=0x2)
    org = jnp.array([[0.0, 0.0, 5.0]] * 2)
    d = jnp.array([[0.0, 0.0, -1.0]] * 2)
    rays = et.make_rays(org, d, mask=jnp.array([0x2, 0x1], jnp.uint32))
    h = et.intersect(cs, rays, backend="pallas")
    np.testing.assert_array_equal(np.asarray(h.valid), [True, False])


def test_non_multiple_of_128_rays():
    cs = _sphere_scene()
    rays = random_rays(jax.random.PRNGKey(4), 37)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    np.testing.assert_array_equal(np.asarray(h_p.valid), np.asarray(h_j.valid))


def _mixed_scene(motion=False):
    """Triangles + quads + all point kinds + both line kinds in one scene —
    the full packed-palette coverage (VERDICT task 3)."""
    rng = np.random.default_rng(7)
    s = et.Scene()
    verts, idx = make_sphere_mesh(6, 8)
    if motion:
        verts = np.stack([verts, verts + np.array([0.1, 0, 0], np.float32)])
    s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    qv = np.array([[-2, -2, -1], [2, -2, -1], [2, 2, -1], [-2, 2, -1]],
                  np.float32)
    s.attach(et.QuadGeometry(qv, np.array([[0, 1, 2, 3]], np.int32)))
    pts = np.concatenate([rng.uniform(-1.5, 1.5, (6, 3)),
                          rng.uniform(0.2, 0.4, (6, 1))], 1).astype(np.float32)
    s.attach(et.PointGeometry(pts[:2], kind="sphere"))
    s.attach(et.PointGeometry(pts[2:4], kind="disc"))
    s.attach(et.PointGeometry(pts[4:6], kind="oriented_disc",
                              normals=np.eye(3, dtype=np.float32)[:2]))
    lv = np.concatenate([rng.uniform(-1.5, 1.5, (4, 3)),
                         rng.uniform(0.1, 0.3, (4, 1))], 1).astype(np.float32)
    s.attach(et.LineSegmentsGeometry(lv, np.array([0, 2], np.int32),
                                     kind="round"))
    s.attach(et.LineSegmentsGeometry(lv + 0.5, np.array([0, 2], np.int32),
                                     kind="flat"))
    return s.commit()


def test_mixed_kind_scene_matches_jnp():
    cs = _mixed_scene()
    assert cs.packed is not None and cs.packed.has_kinds
    rays = random_rays(jax.random.PRNGKey(8), 256)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    m = np.asarray(h_j.valid)
    np.testing.assert_array_equal(np.asarray(h_p.valid), m)
    np.testing.assert_allclose(np.asarray(h_p.t)[m], np.asarray(h_j.t)[m],
                               rtol=1e-4)
    same = np.asarray(h_p.prim_id)[m] == np.asarray(h_j.prim_id)[m]
    assert same.mean() > 0.95


def test_motion_scene_matches_jnp():
    cs = _mixed_scene(motion=True)
    assert cs.packed is not None and cs.packed.has_motion
    rays = random_rays(jax.random.PRNGKey(9), 256)
    rays = et.RayBatch(org=rays.org, dir=rays.dir, tnear=rays.tnear,
                       tfar=rays.tfar,
                       time=jnp.linspace(0.0, 1.0, 256), mask=rays.mask)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    m = np.asarray(h_j.valid)
    np.testing.assert_array_equal(np.asarray(h_p.valid), m)
    np.testing.assert_allclose(np.asarray(h_p.t)[m], np.asarray(h_j.t)[m],
                               rtol=1e-4)


def test_streamed_tables_match_resident():
    """HBM-streamed tables (node + leaf DMA staging) must agree exactly with
    the VMEM-resident specialization — the big-scene path of VERDICT task 1."""
    from embree_tpu.accel import traverse_pallas as tp
    cs = _sphere_scene()
    rays = random_rays(jax.random.PRNGKey(5), 256)
    h_res = et.intersect(cs, rays, backend="pallas")
    budget = tp.VMEM_RESIDENT_BUDGET
    tp.VMEM_RESIDENT_BUDGET = 1       # force node + leaf streaming
    try:
        h_str = et.intersect(cs, rays, backend="pallas")
    finally:
        tp.VMEM_RESIDENT_BUDGET = budget
    np.testing.assert_array_equal(np.asarray(h_str.valid), np.asarray(h_res.valid))
    m = np.asarray(h_res.valid)
    np.testing.assert_allclose(np.asarray(h_str.t)[m], np.asarray(h_res.t)[m],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h_str.prim_id)[m],
                                  np.asarray(h_res.prim_id)[m])


def test_multistep_window_scene_matches_jnp():
    """Time-sliced multi-step motion rides the packed kernel: per-slot
    [t0,t1] window chunks select the active time segment in-kernel."""
    S = 5
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    steps = np.stack([base + np.array(
        [0, 0, np.sin(np.pi * k / (S - 1))], np.float32) for k in range(S)])
    verts, idx = make_sphere_mesh(6, 8)
    s = et.Scene()
    s.attach(et.TriangleGeometry(steps, np.array([[0, 1, 2]], np.int32)))
    s.attach(et.TriangleGeometry(jnp.asarray(verts * 0.4 + 2.0),
                                 jnp.asarray(idx)))
    cs = s.commit()
    assert cs.has_windows and cs.packed is not None and cs.packed.has_win
    rng = np.random.default_rng(5)
    R = 256
    org = jnp.asarray(rng.uniform(-1, 3, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, R).astype(np.float32))
    rays = et.make_rays(org, d, time=t)
    hp = jax.jit(lambda r: et.intersect(cs, r, backend="pallas"))(rays)
    hj = jax.jit(lambda r: et.intersect(cs, r, backend="jnp"))(rays)
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hj.valid))
    m = np.asarray(hj.valid)
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hj.t)[m],
                               rtol=1e-4, atol=1e-4)
    assert np.mean(np.asarray(hp.prim_id)[m] == np.asarray(hj.prim_id)[m]) > 0.99


def _curve_scene(kind):
    """A few fat Bezier curves + a backdrop triangle (mixed-kind packing)."""
    rng = np.random.default_rng(4)
    n_curves = 6
    cp = np.zeros((n_curves * 4, 4), np.float32)
    for c in range(n_curves):
        base = rng.uniform(-1, 1, 3)
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        side = rng.normal(size=3) * 0.3
        for j in range(4):
            cp[4 * c + j, :3] = base + d * (0.5 * j) + side * (j % 2)
            cp[4 * c + j, 3] = 0.15 - 0.02 * j
    idx = (np.arange(n_curves) * 4).astype(np.int32)
    s = et.Scene()
    s.attach(et.CurveGeometry(cp, idx, basis="bezier", kind=kind))
    s.attach(et.TriangleGeometry(
        np.array([[-3, -3, -3], [3, -3, -3], [0, 3, -3]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    return s.commit()


def test_flat_curve_kernel_matches_jnp():
    """In-kernel ribbon intersector (16-field curve slots) vs the jnp
    engine: hit sets and distances agree."""
    cs = _curve_scene("flat")
    assert cs.packed is not None and cs.packed.nf == 16
    rays = random_rays(jax.random.PRNGKey(3), 256)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    m_p, m_j = np.asarray(h_p.valid), np.asarray(h_j.valid)
    assert (m_p == m_j).mean() > 0.99
    both = m_p & m_j
    np.testing.assert_allclose(np.asarray(h_p.t)[both],
                               np.asarray(h_j.t)[both], rtol=1e-3, atol=1e-3)


def test_round_curve_kernel_close_to_jnp():
    """In-kernel swept-circle (cone candidates + Newton polish) vs the jnp
    sweep solver: hit sets agree except at silhouette-grazing rays.

    The round kernel path is gated off by default (EMBREE_TPU_KERNEL_ROUND;
    ~2% silhouette selection divergence vs the 32-seed sweep) — enabled here
    via the module-level kind set to keep the kernel code covered."""
    from embree_tpu.geometry import KIND_CURVE_ROUND
    scene_mod._PACKED_KINDS.add(KIND_CURVE_ROUND)
    try:
        cs = _curve_scene("round")
    finally:
        scene_mod._PACKED_KINDS.discard(KIND_CURVE_ROUND)
    assert cs.packed is not None and cs.packed.nf == 16
    rays = random_rays(jax.random.PRNGKey(5), 256)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    m_p, m_j = np.asarray(h_p.valid), np.asarray(h_j.valid)
    assert (m_p == m_j).mean() > 0.97
    both = m_p & m_j
    tp_, tj_ = np.asarray(h_p.t)[both], np.asarray(h_j.t)[both]
    # distances agree to ~1% for the vast majority of rays
    assert (np.abs(tp_ - tj_) / np.maximum(tj_, 1e-3) < 0.01).mean() > 0.95


def test_flat_curve_motion_kernel_matches_jnp():
    """Curve (16-field) records with 2-step motion: the kernel's B-field
    lerp must read at offset NF, not the 9-field constant (regression:
    mblur_time_range_curve diverged only on the kernel path)."""
    rng = np.random.default_rng(11)
    cp0 = np.zeros((8, 4), np.float32)
    for c in range(2):
        base = rng.uniform(-1, 1, 3)
        d = rng.normal(size=3); d /= np.linalg.norm(d)
        for j in range(4):
            cp0[4 * c + j, :3] = base + d * (0.6 * j)
            cp0[4 * c + j, 3] = 0.2
    cp1 = cp0.copy()
    cp1[:, :3] += np.array([0.0, 0.0, 1.0], np.float32)
    s = et.Scene()
    s.attach(et.CurveGeometry(np.stack([cp0, cp1]),
                              np.array([0, 4], np.int32),
                              basis="bezier", kind="flat"))
    cs = s.commit()
    assert cs.packed is not None and cs.packed.nf == 16 and cs.packed.has_motion
    rays = random_rays(jax.random.PRNGKey(6), 256)
    t = jnp.asarray(np.random.default_rng(2).uniform(0, 1, 256)
                    .astype(np.float32))
    rays = jax.tree.map(lambda x: x, rays)
    import dataclasses as _dc
    rays = _dc.replace(rays, time=t)
    h_p = et.intersect(cs, rays, backend="pallas")
    h_j = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    m_p, m_j = np.asarray(h_p.valid), np.asarray(h_j.valid)
    assert (m_p == m_j).mean() > 0.99
    both = m_p & m_j
    np.testing.assert_allclose(np.asarray(h_p.t)[both],
                               np.asarray(h_j.t)[both], rtol=1e-3, atol=1e-3)
