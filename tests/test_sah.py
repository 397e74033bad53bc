"""Binned-SAH builder: structural invariants + quality + query equivalence.

Mirrors the reference's build testing approach (verify.cpp ManyBuildTest /
IntensiveRegressionTest + bvh_statistics SAH reporting).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.accel.bvh import INVALID_NODE, decode_leaf, sah_cost
from embree_tpu.accel.sah import build_sah


def walk_and_check(bvh, lo, up, leaf_size):
    """Host-side structural audit: coverage, bounds containment, leaf sizes."""
    n = lo.shape[0]
    child = np.asarray(bvh.node_child)
    st, ct = map(np.asarray, decode_leaf(bvh.node_child))
    nlo = np.asarray(bvh.node_lower)
    nup = np.asarray(bvh.node_upper)
    plo = np.asarray(lo)[np.asarray(bvh.prim_order)]
    pup = np.asarray(up)[np.asarray(bvh.prim_order)]
    covered = np.zeros(n, np.int32)
    stack = [0]
    while stack:
        nd = stack.pop()
        for w in range(child.shape[1]):
            ref = child[nd, w]
            if ref == INVALID_NODE:
                continue
            if ref < 0:
                s, c = st[nd, w], ct[nd, w]
                assert 1 <= c <= leaf_size
                covered[s:s + c] += 1
                assert (nlo[nd, w] <= plo[s:s + c].min(0) + 1e-4).all()
                assert (nup[nd, w] >= pup[s:s + c].max(0) - 1e-4).all()
            else:
                stack.append(ref)
    assert (covered == 1).all(), "each prim must be in exactly one leaf"


@pytest.mark.parametrize("n", [2, 5, 100, 3000])
@pytest.mark.parametrize("top_levels", [0, 16])
def test_structure(n, top_levels):
    rng = np.random.default_rng(n)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    lo, up = jnp.asarray(c - h), jnp.asarray(c + h)
    bvh = jax.jit(lambda a, b: build_sah(a, b, max_top_levels=top_levels))(lo, up)
    walk_and_check(bvh, lo, up, leaf_size=4)


def test_duplicate_centroids():
    """All-identical centroids force the median-split fallback path."""
    n = 64
    lo = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (n, 1))
    up = jnp.tile(jnp.array([[1.0, 1.0, 1.0]]), (n, 1))
    bvh = build_sah(lo, up)
    walk_and_check(bvh, lo, up, leaf_size=4)


def test_sah_quality_on_clustered_scene():
    """SAH should not be (much) worse than morton on a clustered distribution."""
    rng = np.random.default_rng(3)
    clusters = rng.uniform(-100, 100, (20, 3))
    pts = np.concatenate([
        c + rng.normal(0, 1.0, (200, 3)) for c in clusters]).astype(np.float32)
    lo = jnp.asarray(pts - 0.05)
    up = jnp.asarray(pts + 0.05)
    c_sah = float(sah_cost(build_sah(lo, up, max_top_levels=16)))
    c_mor = float(sah_cost(build_sah(lo, up, max_top_levels=0)))
    assert c_sah <= c_mor * 1.1


def test_sah_scene_query_equivalence():
    """Full intersect path over a SAH-committed scene equals brute force."""
    from test_bvh import make_sphere_mesh, random_rays
    verts, idx = make_sphere_mesh(12, 18)
    scene = et.Scene(quality=et.BuildQuality.MEDIUM)
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()
    rays = random_rays(jax.random.PRNGKey(5), 512)
    h_bvh = jax.jit(et.intersect)(cs, rays)
    h_ref = jax.jit(et.intersect_brute)(cs, rays)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_ref.valid))
    m = np.asarray(h_ref.valid)
    np.testing.assert_allclose(np.asarray(h_bvh.t)[m], np.asarray(h_ref.t)[m], rtol=1e-4)


def test_low_quality_scene_query_equivalence():
    from test_bvh import make_sphere_mesh, random_rays
    verts, idx = make_sphere_mesh(10, 14)
    scene = et.Scene(quality=et.BuildQuality.LOW)
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()
    rays = random_rays(jax.random.PRNGKey(9), 256)
    h_bvh = jax.jit(et.intersect)(cs, rays)
    h_ref = jax.jit(et.intersect_brute)(cs, rays)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_ref.valid))


def test_high_quality_spatial_splits_lower_sah():
    """BuildQuality.HIGH must no longer alias MEDIUM: on long thin diagonal
    triangles, pre-splitting (primrefgen_presplit.h role) must lower SAH cost
    while keeping hits identical (VERDICT task 8)."""
    import embree_tpu as et
    from embree_tpu.accel.bvh import sah_cost
    rng = np.random.default_rng(9)
    n = 256
    starts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    # long diagonal spaghetti: worst case for object splits
    dirs = np.tile(np.array([[1.0, 1.0, 1.0]], np.float32), (n, 1))
    v0 = starts
    v1 = starts + dirs * 4.0
    v2 = starts + dirs * 4.0 + rng.uniform(0.01, 0.02, (n, 3)).astype(np.float32)
    verts = np.concatenate([v0, v1, v2])
    idx = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n],
                   axis=1).astype(np.int32)

    s_med = et.Scene(quality=et.BuildQuality.MEDIUM)
    s_med.attach(et.TriangleGeometry(verts, idx))
    cs_med = s_med.commit()
    # budget 1.5 (the reference DEFAULT is 1.2, state.h:117; the knob is
    # covered by test_api_surface) — this test checks splitting HELPS
    s_high = et.Scene(quality=et.BuildQuality.HIGH,
                      max_spatial_split_replications=1.5)
    s_high.attach(et.TriangleGeometry(verts, idx))
    cs_high = s_high.commit()

    c_med = float(sah_cost(cs_med.bvh))
    c_high = float(sah_cost(cs_high.bvh))
    assert c_high < 0.9 * c_med, f"HIGH {c_high} !< 0.9 * MEDIUM {c_med}"

    from test_bvh import random_rays
    rays = random_rays(jax.random.PRNGKey(12), 512)
    h_m = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs_med, rays)
    h_h = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs_high, rays)
    np.testing.assert_array_equal(np.asarray(h_h.valid), np.asarray(h_m.valid))
    m = np.asarray(h_m.valid)
    np.testing.assert_allclose(np.asarray(h_h.t)[m], np.asarray(h_m.t)[m],
                               rtol=1e-5)
