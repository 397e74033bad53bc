"""rtcInterpolate + rtcBuildBVH analog APIs (VERDICT missing #8).

Parity targets: InterpolateTrianglesTest (verify.cpp:2042), rtcBuildBVH
user-callback builds (rtcore_builder.h:53-113, tutorials/bvh_builder),
bvh_access node walking.
"""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et


def test_interpolate_triangles():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    g = et.TriangleGeometry(v, np.array([[0, 1, 2]], np.int32))
    attr = np.array([[1.0, 10], [2.0, 20], [3.0, 30]], np.float32)
    out = et.interpolate(g, jnp.array([0]), jnp.array([0.25]),
                         jnp.array([0.5]), attr)
    # w0=0.25, u=0.25, v=0.5 -> 0.25*1 + 0.25*2 + 0.5*3 = 2.25
    np.testing.assert_allclose(np.asarray(out)[0], [2.25, 22.5], rtol=1e-6)


def test_interpolate_matches_hit():
    """Interpolating positions at a hit reproduces the hit point."""
    rng = np.random.default_rng(5)
    v = rng.normal(size=(12, 3)).astype(np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]], np.int32)
    g = et.TriangleGeometry(v, idx)
    s = et.Scene()
    s.attach(g)
    cs = s.commit()
    rays = et.make_rays(jnp.asarray(rng.normal(size=(64, 3)) * 3),
                        jnp.asarray(rng.normal(size=(64, 3))))
    h = jax.jit(et.intersect)(cs, rays)
    m = np.asarray(h.valid)
    if m.any():
        p_interp = et.interpolate(g, h.prim_id, h.u, h.v, v)
        p_hit = rays.org + rays.dir * h.t[..., None]
        np.testing.assert_allclose(np.asarray(p_interp)[m],
                                   np.asarray(p_hit)[m], atol=1e-4)


def test_interpolate_quad_and_line():
    qv = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    q = et.QuadGeometry(qv, np.array([[0, 1, 2, 3]], np.int32))
    attr = np.array([[0.0], [1.0], [2.0], [1.0]], np.float32)
    out = et.interpolate(q, jnp.array([0]), jnp.array([0.5]),
                         jnp.array([0.5]), attr)
    np.testing.assert_allclose(np.asarray(out)[0], [1.0], atol=1e-6)

    lv = np.array([[0, 0, 0, 0.1], [1, 0, 0, 0.1]], np.float32)
    line = et.LineSegmentsGeometry(lv, np.array([0], np.int32))
    out = et.interpolate(line, jnp.array([0]), jnp.array([0.25]),
                         jnp.array([0.0]), np.array([[0.0], [4.0]], np.float32))
    np.testing.assert_allclose(np.asarray(out)[0], [1.0], atol=1e-6)


def test_build_bvh_user_callbacks():
    rng = np.random.default_rng(1)
    lo = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    up = lo + rng.uniform(0.01, 1, (500, 3)).astype(np.float32)

    seen = set()
    stats = {"nodes": 0, "leaves": 0}

    def create_node(n):
        stats["nodes"] += 1
        return {"kind": "node", "children": None, "bounds": None}

    def set_node_children(node, kids):
        node["children"] = kids

    def set_node_bounds(node, kl, ku):
        node["bounds"] = (kl, ku)

    def create_leaf(ids, bl, bu):
        stats["leaves"] += 1
        seen.update(int(i) for i in ids)
        return {"kind": "leaf", "ids": list(ids), "lo": bl, "up": bu}

    root = et.build_bvh(lo, up, create_node=create_node,
                        set_node_children=set_node_children,
                        set_node_bounds=set_node_bounds,
                        create_leaf=create_leaf, leaf_size=4)
    assert root["kind"] == "node"
    # every primitive reaches exactly one leaf
    assert seen == set(range(500))
    assert stats["leaves"] >= 500 // 15

    # user-tree containment: every leaf bound inside its recorded child bound
    def check(node):
        if node["kind"] == "leaf":
            return
        kl, ku = node["bounds"]
        for kid, bl, bu in zip(node["children"], kl, ku):
            if kid["kind"] == "leaf":
                assert (kid["lo"] >= bl - 1e-4).all()
                assert (kid["up"] <= bu + 1e-4).all()
            check(kid)
    check(root)


def test_walk_bvh_visits_all_prims():
    verts = np.random.default_rng(2).normal(size=(30, 3)).astype(np.float32)
    idx = np.arange(30, dtype=np.int32).reshape(10, 3)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()
    got = []
    et.walk_bvh(cs.bvh, lambda nid, d, lo, up: None,
                lambda prims, d: got.extend(int(p) for p in prims))
    assert sorted(got) == list(range(10))


def test_threads_config_knob():
    """threads= reaches the native builder's OpenMP team (state.h numThreads
    analog); builds stay correct at any thread count."""
    import numpy as np
    from embree_tpu.native import build_bvh8_native, native_available
    if not native_available():
        import pytest
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(0)
    lo = rng.uniform(-1, 1, (60000, 3)).astype(np.float32)
    up = lo + rng.uniform(0, 0.05, (60000, 3)).astype(np.float32)
    r1 = build_bvh8_native(lo, up, threads=1)
    r2 = build_bvh8_native(lo, up, threads=4)
    assert r1[4] > 0 and r2[4] > 0
    # same prim coverage regardless of team size
    np.testing.assert_array_equal(np.sort(r1[3]), np.arange(60000))
    np.testing.assert_array_equal(np.sort(r2[3]), np.arange(60000))
    # device-config string path
    from embree_tpu.rtcore import Device
    dev = Device("threads=2,quality=medium")
    s = dev.new_scene()
    assert s.threads == 2


def test_compact_flag_drops_unpacked_tables():
    """RTC_SCENE_FLAG_COMPACT analog (state.h compact accels): a compact
    pure-triangle scene drops the unpacked kind tables and still serves
    correct hits from the packed kernel attributes."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.query import scene_stats

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    i = rng.integers(0, 300, (200, 3)).astype(np.int32)
    sd = et.Scene()
    sd.attach(et.TriangleGeometry(v, i))
    base = sd.commit()
    sc = et.Scene(compact=True)
    sc.attach(et.TriangleGeometry(v, i))
    comp = sc.commit()
    assert comp.compact and comp.tri_v0.shape[0] == 0
    assert (scene_stats(comp)["memory_bytes"]
            < scene_stats(base)["memory_bytes"])
    org = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    h0 = jax.jit(et.intersect)(base, et.make_rays(org, d))
    h1 = jax.jit(et.intersect)(comp, et.make_rays(org, d))
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_allclose(np.asarray(h0.t)[np.asarray(h0.valid)],
                               np.asarray(h1.t)[np.asarray(h1.valid)],
                               rtol=1e-5)


def test_max_spatial_split_replications_knob():
    """The HIGH-quality replication budget (state.h:117) is parsed and
    honored: a higher budget may only grow the replicated ref count."""
    import numpy as np
    import embree_tpu as et
    from embree_tpu.rtcore import Device
    from embree_tpu.scene import BuildQuality

    d = Device("max_spatial_split_replications=3.0")
    assert d.config.max_spatial_split_replications == 3.0
    rng = np.random.default_rng(1)
    # long diagonal slivers: presplit targets
    base = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    v = np.concatenate([base, base + np.array([4, 4, 4], np.float32),
                        base + np.array([4.1, 4, 4], np.float32)])
    i = (np.arange(64)[:, None] + np.array([[0, 64, 128]])).astype(np.int32)

    def leaf_refs(ssr):
        s = et.Scene(quality=BuildQuality.HIGH,
                     max_spatial_split_replications=ssr)
        s.attach(et.TriangleGeometry(v, i))
        cs = s.commit()
        return int(np.asarray(cs.bvh.prim_order).shape[0])

    assert leaf_refs(3.0) >= leaf_refs(1.0)


def test_buffer_stride_and_slots():
    """BufferStrideTest analog (verify.cpp:915) + the vertex-attribute SLOT
    registry (rtcore_buffer.h): vertices registered through an interleaved
    allocation with byte offset/stride resolve to the same scene as the
    contiguous buffer; attribute slots feed rtcInterpolate; misuse raises."""
    import numpy as np
    import pytest
    import embree_tpu as et
    from embree_tpu.buffer import Buffer, BufferError

    rng = np.random.default_rng(0)
    verts = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]], np.int32)
    temp = rng.uniform(0, 1, (12, 2)).astype(np.float32)

    # interleaved allocation: [pos.xyz | uv | pad] per vertex, 4-byte lead-in
    stride = (3 + 2 + 1) * 4
    raw = np.zeros(1 + 12 * 6, np.float32)
    inter = raw[1:].reshape(12, 6)
    inter[:, 0:3] = verts
    inter[:, 3:5] = temp
    pos_buf = Buffer(raw, channels=3, offset=4, stride=stride, count=12)
    uv_buf = Buffer(raw, channels=2, offset=16, stride=stride, count=12)
    np.testing.assert_array_equal(pos_buf.resolve(), verts)
    np.testing.assert_array_equal(uv_buf.resolve(), temp)

    g = et.TriangleGeometry(pos_buf.resolve(), idx)
    et.set_vertex_attribute_count(g, 2)
    et.set_geometry_buffer(g, et.BUFFER_TYPE_VERTEX_ATTRIBUTE, 0, uv_buf)
    et.set_geometry_buffer(g, et.BUFFER_TYPE_VERTEX_ATTRIBUTE, 1, verts)

    # strided-vs-contiguous scenes agree exactly
    s0, s1 = et.Scene(), et.Scene()
    s0.attach(et.TriangleGeometry(verts, idx))
    s1.attach(g)
    rays = et.make_rays(rng.uniform(-2, 2, (64, 3)).astype(np.float32),
                        rng.normal(size=(64, 3)).astype(np.float32))
    h0 = et.intersect(s0.commit(), rays, backend="jnp")
    h1 = et.intersect(s1.commit(), rays, backend="jnp")
    np.testing.assert_array_equal(np.asarray(h0.valid), np.asarray(h1.valid))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))

    # slot-addressed interpolation == direct-buffer interpolation
    pid = np.asarray(h1.prim_id[h1.valid], np.int32)
    u = np.asarray(h1.u)[np.asarray(h1.valid)]
    v = np.asarray(h1.v)[np.asarray(h1.valid)]
    st = et.interpolate_slot(g, pid, u, v, slot=0)
    ref = et.interpolate(g, pid, u, v, temp)
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref), rtol=1e-6)

    # error model: misaligned stride, overrun, undeclared slot
    with pytest.raises(BufferError):
        Buffer(raw, channels=3, offset=4, stride=13, count=12).resolve()
    with pytest.raises(BufferError):
        Buffer(raw, channels=3, offset=4, stride=stride, count=13).resolve()
    with pytest.raises(BufferError):
        et.set_geometry_buffer(g, et.BUFFER_TYPE_VERTEX_ATTRIBUTE, 2, temp)
    with pytest.raises(BufferError):
        et.get_geometry_buffer(g, et.BUFFER_TYPE_VERTEX, 0)
