"""Subdivision surfaces + grid geometry.

Parity targets: subdivision_geometry / grid_geometry tutorials,
InterpolateSubdivTest-style closed-form checks on the Catmull-Clark rules.
"""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.ops.subdiv import catmull_clark


def cube():
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                 np.float32)
    # 6 quad faces (consistent winding not required for subdivision rules)
    f = np.array([
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]], np.int64)
    return v, np.full(6, 4, np.int64), f.reshape(-1)


def test_catmull_clark_counts():
    v, fc, idx = cube()
    verts, quads, base, _uvm = catmull_clark(v, fc, idx, levels=1)
    # level 1: V + F + E = 8 + 6 + 12 = 26 verts, 6*4 = 24 quads
    assert verts.shape[0] == 26
    assert quads.shape[0] == 24
    assert set(np.asarray(base)) == set(range(6))
    verts2, quads2, _, _ = catmull_clark(v, fc, idx, levels=2)
    assert quads2.shape[0] == 96


def test_catmull_clark_converges_inward():
    """Subdivided cube shrinks toward the limit surface (inside the cube)."""
    v, fc, idx = cube()
    verts, quads, _, _ = catmull_clark(v, fc, idx, levels=3)
    r = np.linalg.norm(verts, axis=1)
    assert r.max() < np.sqrt(3.0) - 0.2      # well inside the original corners
    assert r.min() > 0.5                      # still a solid surface


def test_flat_grid_stays_planar():
    """Subdividing a planar quad grid must keep z == 0 exactly (affine rule)."""
    xs, ys = np.meshgrid(np.arange(4, dtype=np.float32),
                         np.arange(4, dtype=np.float32), indexing="ij")
    v = np.stack([xs.ravel(), ys.ravel(), np.zeros(16, np.float32)], -1)
    faces = []
    for i in range(3):
        for j in range(3):
            a = i * 4 + j
            faces.append([a, a + 1, a + 5, a + 4])
    fc = np.full(9, 4, np.int64)
    verts, quads, _, _ = catmull_clark(v, fc, np.asarray(faces).reshape(-1), levels=2)
    np.testing.assert_allclose(verts[:, 2], 0.0, atol=1e-6)


def test_crease_keeps_edge_sharp():
    v, fc, idx = cube()
    creases = {}
    # make every edge infinitely sharp -> subdivision keeps the cube shape
    f = idx.reshape(6, 4)
    for face in f:
        for k in range(4):
            e = tuple(sorted((int(face[k]), int(face[(k + 1) % 4]))))
            creases[e] = 10.0
    verts, quads, _, _ = catmull_clark(v, fc, idx, levels=2, creases=creases)
    # all refined verts stay on the cube surface (max coordinate == 1)
    m = np.abs(verts).max(axis=1)
    np.testing.assert_allclose(m, 1.0, atol=1e-5)


def test_subdivision_geometry_render():
    v, fc, idx = cube()
    s = et.Scene()
    gid = s.attach(et.SubdivisionGeometry(v, fc, idx, levels=2))
    cs = s.commit()
    rays = et.make_rays(jnp.array([[0.0, 0.0, 3.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    h = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)
    assert bool(h.valid[0])
    # limit surface of the cube pulls inside |z|=1
    assert 2.0 < float(h.t[0]) < 2.5
    assert int(h.geom_id[0]) == gid
    assert 0 <= int(h.prim_id[0]) < 6   # base face id


def test_grid_geometry():
    # one 3x3-vertex grid = 4 quad cells over [0,2]^2 at z=0
    xs, ys = np.meshgrid(np.arange(3, dtype=np.float32),
                         np.arange(3, dtype=np.float32), indexing="ij")
    v = np.stack([xs.ravel(), ys.ravel(), np.zeros(9, np.float32)], -1)
    grids = np.array([[0, 3, 3, 3]], np.int32)  # start 0, stride 3, 3x3
    s = et.Scene()
    gid = s.attach(et.GridGeometry(v, grids))
    cs = s.commit()
    h = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(
        cs, et.make_rays(jnp.array([[0.5, 0.5, 2.0], [1.5, 1.5, 2.0], [2.5, 0.5, 2.0]]),
                         jnp.array([[0, 0, -1.0]] * 3)))
    np.testing.assert_array_equal(np.asarray(h.valid), [True, True, False])
    np.testing.assert_array_equal(np.asarray(h.geom_id[:2]), [gid, gid])
    np.testing.assert_array_equal(np.asarray(h.prim_id[:2]), [0, 0])  # grid 0


def test_subdiv_boundary_modes_and_holes():
    """RTC_SUBDIVISION_MODE pinning + pre-refinement holes
    (rtcore_geometry.h:56-63): pin_all keeps the cage exactly; pin_boundary
    pins the outline; holes open the surface before refinement."""
    import numpy as np
    from embree_tpu.ops.subdiv import catmull_clark
    v = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],
                  [0, 1, 0], [1, 1, 1], [2, 1, 0],
                  [0, 2, 0], [1, 2, 0], [2, 2, 0]], np.float32)
    fc = np.full(4, 4, np.int64)
    idx = np.array([0, 1, 4, 3, 1, 2, 5, 4, 3, 4, 7, 6, 4, 5, 8, 7],
                   np.int64)

    # pin_all: limit == cage (every vertex frozen, linear splitting)
    pv, pq, _, _ = catmull_clark(v, fc, idx, levels=2,
                                 boundary_mode="pin_all")
    corners = {tuple(np.round(p, 5)) for p in pv.reshape(-1, 3)}
    for orig in v:
        assert tuple(np.round(orig, 5)) in corners
    assert abs(pv[:, 2].max() - 1.0) < 1e-6      # center peak unchanged

    # pin_boundary: outline verts frozen, interior smooths the peak down
    bv, *_ = catmull_clark(v, fc, idx, levels=2,
                           boundary_mode="pin_boundary")
    bcorners = {tuple(np.round(p, 5)) for p in bv.reshape(-1, 3)}
    for orig in v[[0, 1, 2, 3, 5, 6, 7, 8]]:     # boundary ring
        assert tuple(np.round(orig, 5)) in bcorners
    assert bv[:, 2].max() < 1.0 - 1e-3           # peak smoothed

    # smooth (default): the interior peak pulls the surface up between
    # pinned-mode and cage heights
    sv, *_ = catmull_clark(v, fc, idx, levels=2)
    assert 0.0 < sv[:, 2].max() < 1.0

    # holes via the scene path: a 4-quad sheet with one face holed keeps
    # 3 base faces' quads only
    import embree_tpu as et
    s = et.Scene()
    s.attach(et.SubdivisionGeometry(v, fc, idx, levels=2,
                                    holes=np.array([0])))
    cs = s.commit()
    import numpy as _np
    assert 0 not in set(_np.asarray(cs.prim_local).tolist()) or True
    # base face 0 contributes no prims
    assert (_np.asarray(cs.prim_local) != 0).all()
