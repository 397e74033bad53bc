"""Aux subsystems: device/config/errors, refit/dynamic scenes, point query,
collision, stats, serialization.

Parity targets: DeviceCreationTest (verify.cpp:687), UpdateTest (:1835),
ClosestPointTest (:3970), rtcCollide (collide tutorial), MemoryMonitorTest
(:5378), bvh_statistics.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.rtcore import Device, DeviceConfig, ERROR_INVALID_ARGUMENT
from embree_tpu.query import collide_scenes, point_query_scene, scene_stats
from embree_tpu.utils.checkpoint import load_scene, save_scene
from test_bvh import make_sphere_mesh


# ------------------------------------------------------------ device/config
def test_device_config_parse():
    cfg = DeviceConfig.parse("threads=8,verbose=2,quality=low,robust,unknown_key=5")
    assert cfg.threads == 8 and cfg.verbose == 2
    assert cfg.quality == et.BuildQuality.LOW
    assert cfg.robust
    assert cfg.raw["unknown_key"] == "5"  # unknown keys recorded, not fatal


def test_device_properties_and_scene():
    dev = Device("verbose=0")
    assert dev.get_property("triangle_geometry_supported")
    assert dev.get_property("max_instance_level_count") == 2
    s = dev.new_scene()
    s.attach(et.TriangleGeometry(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    cs = dev.commit_scene(s)
    assert cs.num_prims == 1


def test_device_error_capture():
    dev = Device()
    seen = []
    dev.set_error_function(lambda code, msg: seen.append((code, msg)))
    s = dev.new_scene()
    try:
        dev.commit_scene(s)  # empty -> invalid argument
    except ValueError:
        pass
    assert seen and seen[0][0] == ERROR_INVALID_ARGUMENT
    code, _ = dev.get_error()
    assert code == ERROR_INVALID_ARGUMENT
    assert dev.get_error()[0] == 0  # cleared


def test_memory_monitor_veto():
    dev = Device()
    dev.set_memory_monitor(lambda nbytes, post: False)
    s = dev.new_scene()
    s.attach(et.TriangleGeometry(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    try:
        dev.commit_scene(s)
        assert False, "veto should raise"
    except MemoryError:
        pass


# ------------------------------------------------------------ refit / dynamic
def test_refit_dynamic_update():
    """UpdateTest analog: move vertices, recommit with REFIT, hits follow."""
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene(quality=et.BuildQuality.REFIT)
    gid = s.attach(et.TriangleGeometry(verts, idx))
    cs0 = s.commit()
    r = et.make_rays(jnp.array([[0.0, 0.0, 5.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    h0 = jax.jit(lambda c, rr: et.intersect(c, rr, backend="jnp"))(cs0, r)
    assert bool(h0.valid[0])

    # shift the whole sphere +3 in x and refit
    s.get(gid).vertices = verts + np.array([3, 0, 0], np.float32)
    cs1 = s.commit()
    h1 = jax.jit(lambda c, rr: et.intersect(c, rr, backend="jnp"))(cs1, r)
    assert not bool(h1.valid[0])
    r2 = et.make_rays(jnp.array([[3.0, 0.0, 5.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    h2 = jax.jit(lambda c, rr: et.intersect(c, rr, backend="jnp"))(cs1, r2)
    assert bool(h2.valid[0])
    # topology unchanged (refit kept the same tree)
    np.testing.assert_array_equal(np.asarray(cs0.bvh.node_child),
                                  np.asarray(cs1.bvh.node_child))


# ------------------------------------------------------------ point query
def test_point_query_closest():
    verts, idx = make_sphere_mesh(16, 24, radius=1.0)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    pts = np.array([[2.0, 0, 0], [0, 0.5, 0], [0, 0, -3.0]], np.float32)
    res = jax.jit(lambda c, p: point_query_scene(c, p, 10.0))(cs, pts)
    d = np.asarray(res.dist)
    # distances to a unit sphere surface (tessellated -> small tolerance)
    np.testing.assert_allclose(d, [1.0, 0.5, 2.0], atol=0.05)
    assert (np.asarray(res.prim) >= 0).all()


def test_point_query_radius_limit():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    res = jax.jit(lambda c, p: point_query_scene(c, p, 0.5))(
        cs, np.array([[5.0, 0, 0]], np.float32))
    assert int(res.prim[0]) == -1  # outside radius


# ------------------------------------------------------------ collide
def test_collide_triangle_pairs():
    # two crossing triangles vs a separated one
    a = et.Scene()
    a.attach(et.TriangleGeometry(
        np.array([[-1, 0, -1], [1, 0, -1], [0, 0, 1]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    ca = a.commit()

    b = et.Scene()
    b.attach(et.TriangleGeometry(
        np.array([[0, -1, -0.5], [0, 1, -0.5], [0, 0, 0.5],      # crosses A
                  [5, -1, 0], [5, 1, 0], [5, 0, 1]], np.float32), # far away
        np.array([[0, 1, 2], [3, 4, 5]], np.int32)))
    cb = b.commit()

    res = jax.jit(collide_scenes)(ca, cb)
    assert int(res.count) == 1
    pair = np.asarray(res.pairs[0])
    assert pair[0] == 0 and pair[1] == 0


def test_collide_no_overlap():
    a = et.Scene()
    a.attach(et.TriangleGeometry(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    b = et.Scene()
    b.attach(et.TriangleGeometry(
        np.array([[10, 0, 0], [11, 0, 0], [10, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))
    res = jax.jit(collide_scenes)(a.commit(), b.commit())
    assert int(res.count) == 0


# ------------------------------------------------------------ stats
def test_scene_stats():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    st = scene_stats(cs)
    assert st["num_prims"] == idx.shape[0]
    assert st["bvh_width"] == 8
    assert st["prims_in_leaves"] == idx.shape[0]
    assert 1.0 <= st["avg_leaf_size"] <= 8.0
    assert st["sah_cost"] > 0 and st["memory_bytes"] > 0


# ------------------------------------------------------------ serialization
def test_scene_checkpoint_roundtrip():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.npz")
        save_scene(path, cs)
        cs2 = load_scene(path)
    r = et.make_rays(jnp.array([[0.0, 0.0, 5.0], [3.0, 3.0, 5.0]]),
                     jnp.array([[0.0, 0.0, -1.0]] * 2))
    h1 = jax.jit(lambda c, rr: et.intersect(c, rr, backend="jnp"))(cs, r)
    h2 = jax.jit(lambda c, rr: et.intersect(c, rr, backend="jnp"))(cs2, r)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t))


def test_progress_monitor_and_cancel():
    """rtcSetSceneProgressMonitorFunction analog: monotone progress
    callbacks during commit; returning False cancels with
    RTC_ERROR_CANCELLED and leaves the scene re-committable."""
    import embree_tpu as et
    import pytest
    from embree_tpu.rtcore import Device, ERROR_CANCELLED
    from embree_tpu.scene import CommitCancelled

    dev = Device()
    s = dev.new_scene()
    s.attach(et.TriangleGeometry(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2]], np.int32)))

    seen = []
    s.set_progress_monitor(lambda f: (seen.append(f), True)[1])
    cs = dev.commit_scene(s)
    assert cs is not None
    assert seen == sorted(seen) and seen[0] == 0.0 and seen[-1] == 1.0

    s.set_progress_monitor(lambda f: f < 0.4)     # cancel mid-build
    with pytest.raises(CommitCancelled):
        dev.commit_scene(s)
    code, _ = dev.get_error()
    assert code == ERROR_CANCELLED

    s.set_progress_monitor(None)                   # scene still valid
    assert dev.commit_scene(s) is not None


def test_import_does_not_initialize_backend():
    """Importing the package must not create jax arrays (a module-level jnp
    scalar would lock the platform before tools can select CPU vs TPU)."""
    import subprocess, sys
    code = (
        "import embree_tpu, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.default_backend() == 'cpu'\n"
        "print('lazy-ok')\n")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert "lazy-ok" in out.stdout, out.stderr[-2000:]
