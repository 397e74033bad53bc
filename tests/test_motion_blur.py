"""Multi-step + quaternion motion blur (time-sliced replication).

Reference features covered: rtcSetGeometryTimeStepCount up to 129 steps
(rtcore_common.h:54), MSMBlur-style time splits (each prim is replicated
per linear time segment with tight per-segment bounds,
bvh_builder_msmblur.h role), and rtcSetGeometryTransformQuaternion
(rtcore_quaternion.h) via slerp resampling onto the knot grid.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.core.math import (QuaternionDecomposition, affine_identity,
                                  quat_from_axis_angle, quat_identity)
from embree_tpu.scene import Scene, intersect, intersect_brute, occluded


def _steps_z(S):
    """S-step motion: triangle translating along z by sin(pi t)."""
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    return np.stack([base + np.array([0, 0, np.sin(np.pi * k / (S - 1))],
                                     np.float32) for k in range(S)])


def _expected_z(S, t):
    x = t * (S - 1)
    k = min(int(np.floor(x)), S - 2)
    w = x - k
    zk = np.sin(np.pi * np.array([k, k + 1]) / (S - 1))
    return (1 - w) * zk[0] + w * zk[1]


@pytest.mark.parametrize("S", [3, 5, 9])
def test_multistep_triangle_exact(S):
    s = Scene()
    s.attach(et.TriangleGeometry(_steps_z(S), np.array([[0, 1, 2]], np.int32)))
    cs = s.commit()
    assert cs.num_prims == S - 1            # one copy per time segment
    assert cs.has_windows
    times = np.linspace(0, 1, 17).astype(np.float32)
    org = jnp.tile(jnp.array([[0.2, 0.2, 5.0]]), (times.shape[0], 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (times.shape[0], 1))
    rays = et.make_rays(org, d, time=jnp.asarray(times))
    h = jax.jit(intersect)(cs, rays)
    texp = np.array([5.0 - _expected_z(S, float(t)) for t in times])
    assert np.all(np.asarray(h.valid))
    np.testing.assert_allclose(np.asarray(h.t), texp, atol=1e-5)
    # every reported hit keeps the source prim id, not the replica index
    assert np.all(np.asarray(h.prim_id) == 0)


def test_multistep_matches_brute_force():
    rng = np.random.default_rng(7)
    S = 4
    n = 18
    v0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    steps = np.stack([v0 + 0.3 * np.sin(np.pi * k / (S - 1))
                      * rng.standard_normal((n, 3)).astype(np.float32) * 0.3
                      for k in range(S)])
    idx = np.arange(n, dtype=np.int32).reshape(-1, 3)
    s = Scene()
    s.attach(et.TriangleGeometry(steps, idx))
    cs = s.commit()
    R = 128
    org = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    times = rng.uniform(0, 1, R).astype(np.float32)
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(dirs),
                        time=jnp.asarray(times))
    h = jax.jit(intersect)(cs, rays)
    hb = jax.jit(intersect_brute)(cs, rays)
    np.testing.assert_array_equal(np.asarray(h.valid), np.asarray(hb.valid))
    m = np.asarray(hb.valid)
    np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-5, atol=1e-5)


def test_two_step_scene_keeps_fast_path():
    two = np.stack([_steps_z(3)[0], _steps_z(3)[2]])
    s = Scene()
    s.attach(et.TriangleGeometry(two, np.array([[0, 1, 2]], np.int32)))
    cs = s.commit()
    assert not cs.has_windows
    assert cs.packed is not None            # packed kernel still eligible


def test_multistep_occlusion_window():
    S = 5
    s = Scene()
    s.attach(et.TriangleGeometry(_steps_z(S), np.array([[0, 1, 2]], np.int32)))
    cs = s.commit()
    # ray segment that only reaches the triangle when it is lifted high
    org = jnp.array([[0.2, 0.2, 1.5]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    for t, expect in ((0.5, True), (0.0, True)):
        r = et.make_rays(org, d, tfar=jnp.array([3.0]),
                         time=jnp.array([t], jnp.float32))
        assert bool(jax.jit(occluded)(cs, r)[0]) == expect


def test_quaternion_instance_rotation():
    tri = np.array([[2, -0.2, -0.2], [2, 0.2, -0.2], [2, 0.0, 0.3]],
                   np.float32)
    child = Scene()
    child.attach(et.TriangleGeometry(tri, np.array([[0, 1, 2]], np.int32)))
    qd0 = QuaternionDecomposition(affine_identity(), quat_identity(),
                                  jnp.zeros(3))
    qd1 = QuaternionDecomposition(
        affine_identity(),
        quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2),
        jnp.zeros(3))
    top = Scene()
    iid = top.attach(et.InstanceGeometry(scene=child, transform=(qd0, qd1)))
    cs = top.commit()
    assert cs.has_windows                    # slerp resampled to knots
    for t in (0.0, 0.3, 0.5, 0.85, 1.0):
        ang = t * np.pi / 2
        org = np.array([[3 * np.cos(ang), 3 * np.sin(ang), 0.0]], np.float32)
        d = -org / np.linalg.norm(org)
        r = et.make_rays(jnp.asarray(org), jnp.asarray(d),
                         time=jnp.array([t], jnp.float32))
        h = jax.jit(intersect)(cs, r)
        assert bool(h.valid[0]), t
        # rotating at radius 2, ray from radius 3 toward origin: t ~ 1
        assert abs(float(h.t[0]) - 1.0) < 2e-2, (t, float(h.t[0]))
        assert int(h.inst_id[0, 0]) == iid
    # a ray aimed at the t=0 position must MISS at t=1 (the instance moved)
    org = np.array([[3.0, 0.0, 0.0]], np.float32)
    d = np.array([[-1.0, 0.0, 0.0]], np.float32)
    r = et.make_rays(jnp.asarray(org), jnp.asarray(d),
                     time=jnp.array([1.0], jnp.float32))
    assert not bool(jax.jit(intersect)(cs, r).valid[0])


def test_multistep_linear_transform_instance():
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    child = Scene()
    child.attach(et.TriangleGeometry(tri, np.array([[0, 1, 2]], np.int32)))
    # 3-step transform: z offset 0 -> 1 -> 0 (piecewise linear tent)
    xfs = np.stack([np.hstack([np.eye(3, dtype=np.float32),
                               np.array([[0], [0], [z]], np.float32)])
                    for z in (0.0, 1.0, 0.0)])
    top = Scene()
    top.attach(et.InstanceGeometry(scene=child, transform=xfs))
    cs = top.commit()
    assert cs.num_prims == 2                 # two time segments
    for t, z in ((0.0, 0.0), (0.25, 0.5), (0.5, 1.0), (0.75, 0.5), (1.0, 0.0)):
        r = et.make_rays(jnp.array([[0.2, 0.2, 5.0]]),
                         jnp.array([[0.0, 0.0, -1.0]]),
                         time=jnp.array([t], jnp.float32))
        h = jax.jit(intersect)(cs, r)
        assert bool(h.valid[0])
        assert abs(float(h.t[0]) - (5.0 - z)) < 1e-5, (t, float(h.t[0]))


def test_instance_knots_split_with_child_buffer_knots():
    """A 2-step instance transform over a 3-step tent triangle must sample
    the transform at the union of knot times (ADVICE r2 high): at t=0.25
    the triangle is at child z=0.5 + transform z=1.0 -> 1.5; at t=0.5
    child z=1.0 + transform z=2.0 -> 3.0."""
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tent = np.stack([base, base + [0, 0, 1], base])       # z: 0 -> 1 -> 0
    child = Scene()
    child.attach(et.TriangleGeometry(tent, np.array([[0, 1, 2]], np.int32)))
    xf = np.zeros((2, 3, 4), np.float32)
    xf[:, :3, :3] = np.eye(3)
    xf[1, 2, 3] = 4.0                                     # z: 0 -> 4
    s = Scene()
    s.attach(et.InstanceGeometry(child, xf))
    cs = s.commit()
    times = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    org = jnp.tile(jnp.array([[0.2, 0.2, 10.0]]), (5, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1))
    h = jax.jit(intersect)(cs, et.make_rays(org, d, time=jnp.asarray(times)))
    z_child = np.array([0.0, 0.5, 1.0, 0.5, 0.0])
    z_inst = 4.0 * times
    assert np.all(np.asarray(h.valid))
    np.testing.assert_allclose(np.asarray(h.t), 10.0 - (z_child + z_inst),
                               atol=1e-5)


def test_nested_instance_inner_transform_knots():
    """Inner instance's own multi-step transform knots must split the outer
    window (ADVICE r2 medium): 3-step inner translation z 0->2->2 under a
    static outer instance."""
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    leaf = Scene()
    leaf.attach(et.TriangleGeometry(base, np.array([[0, 1, 2]], np.int32)))
    inner_xf = np.zeros((3, 3, 4), np.float32)
    inner_xf[:, :3, :3] = np.eye(3)
    inner_xf[1, 2, 3] = 2.0
    inner_xf[2, 2, 3] = 2.0                               # z: 0 -> 2 -> 2
    mid = Scene()
    mid.attach(et.InstanceGeometry(leaf, inner_xf))
    outer = Scene()
    outer.attach(et.InstanceGeometry(mid, affine_identity()))
    cs = outer.commit()
    times = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    org = jnp.tile(jnp.array([[0.2, 0.2, 10.0]]), (5, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1))
    h = jax.jit(intersect)(cs, et.make_rays(org, d, time=jnp.asarray(times)))
    z = np.array([0.0, 1.0, 2.0, 2.0, 2.0])              # piecewise linear
    assert np.all(np.asarray(h.valid))
    np.testing.assert_allclose(np.asarray(h.t), 10.0 - z, atol=1e-5)


# ---------------------------------------------------------------------------
# rtcSetGeometryTimeRange (rtcore_geometry.h:151): motion buffers span a
# sub-(or super-)range of [0,1]; segment index clamps but fractional time
# does not -> linear extrapolation outside (default.h:223 getTimeSegment)
# ---------------------------------------------------------------------------

def _tri_at_z(z):
    base = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    return base + np.array([0, 0, z], np.float32)


def test_time_range_subrange_appears_disappears():
    """Sub-[0,1] time range: the geometry EXISTS only within its range
    ("appear and disappear during the camera shutter",
    doc/src/api/rtcSetGeometryTimeRange.md); inside, positions interpolate
    over the local coordinate (t-r0)/(r1-r0)."""
    verts = np.stack([_tri_at_z(0.0), _tri_at_z(4.0)])
    s = Scene()
    s.attach(et.TriangleGeometry(verts, np.array([[0, 1, 2]], np.int32),
                                 time_range=(0.25, 0.75)))
    cs = s.commit()
    times = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    org = jnp.tile(jnp.array([[0.0, 0.0, 30.0]]), (5, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1))
    h = jax.jit(intersect)(cs, et.make_rays(org, d, time=jnp.asarray(times)))
    valid = np.asarray(h.valid)
    assert list(valid) == [False, True, True, True, False]
    zloc = (times[1:4] - 0.25) / 0.5 * 4.0
    np.testing.assert_allclose(np.asarray(h.t)[1:4], 30.0 - zloc, atol=1e-4)


def test_time_range_superrange_interpolates():
    """A range extending beyond [0,1] shifts the knot grid: ray times in
    [0,1] interpolate within the boundary segments (default.h:223)."""
    verts = np.stack([_tri_at_z(0.0), _tri_at_z(4.0)])
    s = Scene()
    s.attach(et.TriangleGeometry(verts, np.array([[0, 1, 2]], np.int32),
                                 time_range=(-0.2, 1.2)))
    cs = s.commit()
    times = np.array([0.0, 0.3, 0.5, 0.8, 1.0], np.float32)
    zloc = (times + 0.2) / 1.4 * 4.0
    org = jnp.tile(jnp.array([[0.0, 0.0, 30.0]]), (5, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1))
    h = jax.jit(intersect)(cs, et.make_rays(org, d, time=jnp.asarray(times)))
    assert np.all(np.asarray(h.valid))
    np.testing.assert_allclose(np.asarray(h.t), 30.0 - zloc, atol=1e-4)


def test_time_range_multistep_knots_move():
    """S=3 steps over [0.4, 1]: interior knot sits at global 0.7; the
    geometry is absent below 0.4 and piecewise linear above."""
    verts = np.stack([_tri_at_z(0.0), _tri_at_z(1.0), _tri_at_z(0.0)])
    s = Scene()
    s.attach(et.TriangleGeometry(verts, np.array([[0, 1, 2]], np.int32),
                                 time_range=(0.4, 1.0)))
    cs = s.commit()
    times = np.array([0.0, 0.4, 0.55, 0.7, 0.85, 1.0], np.float32)
    x = (times - 0.4) / 0.6 * 2.0        # local segment coordinate
    k = np.clip(np.floor(x), 0, 1)
    w = x - k
    zs = np.array([0.0, 1.0, 0.0])
    z = (1 - w) * zs[k.astype(int)] + w * zs[k.astype(int) + 1]
    org = jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (6, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (6, 1))
    h = jax.jit(intersect)(cs, et.make_rays(org, d, time=jnp.asarray(times)))
    valid = np.asarray(h.valid)
    assert list(valid) == [False, True, True, True, True, True]
    np.testing.assert_allclose(np.asarray(h.t)[1:], (10.0 - z)[1:], atol=1e-4)


def test_time_range_instance_transform():
    """Instance transform animation with a sub range: the whole instance
    appears only within it (scene_instance.h time_range handling)."""
    base = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    leaf = Scene()
    leaf.attach(et.TriangleGeometry(base, np.array([[0, 1, 2]], np.int32)))
    xfs = np.zeros((2, 3, 4), np.float32)
    xfs[:, :3, :3] = np.eye(3)
    xfs[1, 2, 3] = 4.0                   # z: 0 -> 4 over [0.5, 1.0]
    top = Scene()
    top.attach(et.InstanceGeometry(leaf, xfs, time_range=(0.5, 1.0)))
    cs = top.commit()
    times = np.array([0.0, 0.5, 0.75, 1.0], np.float32)
    z = (times - 0.5) / 0.5 * 4.0
    org = jnp.tile(jnp.array([[0.0, 0.0, 10.0]]), (4, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    h = jax.jit(intersect)(cs, et.make_rays(org, d, time=jnp.asarray(times)))
    valid = np.asarray(h.valid)
    assert list(valid) == [False, True, True, True]
    np.testing.assert_allclose(np.asarray(h.t)[1:], (10.0 - z)[1:], atol=1e-4)
