"""Native C++ builder: structure + query equivalence vs JAX builder."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.native import build_bvh8_native, native_available
from embree_tpu.accel.bvh import BVH, INVALID_NODE
from test_bvh import make_sphere_mesh, random_rays

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def audit(nl, nu, ch, order, lo, up):
    n = lo.shape[0]
    covered = np.zeros(n, np.int32)
    plo, pup = lo[order], up[order]
    stack = [0]
    while stack:
        nd = stack.pop()
        for w in range(8):
            ref = ch[nd, w]
            if ref == int(INVALID_NODE):
                continue
            if ref < 0:
                packed = -(ref + 1)
                s0, cn = packed >> 4, packed & 0xF
                assert 1 <= cn <= 8
                covered[s0:s0 + cn] += 1
                assert (nl[nd, w] <= plo[s0:s0 + cn].min(0) + 1e-4).all()
                assert (nu[nd, w] >= pup[s0:s0 + cn].max(0) - 1e-4).all()
            else:
                stack.append(ref)
    assert (covered == 1).all()


@pytest.mark.parametrize("n", [1, 3, 5, 100, 5000])
def test_native_structure(n):
    rng = np.random.default_rng(n)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.3, (n, 3)).astype(np.float32)
    nl, nu, ch, order, cnt = build_bvh8_native(c - h, c + h)
    audit(nl, nu, ch, order, c - h, c + h)


def test_native_scene_query_equivalence():
    """Force-native commit must produce identical hits to the JAX build."""
    verts, idx = make_sphere_mesh(12, 18)
    rays = random_rays(jax.random.PRNGKey(7), 512)

    os.environ["EMBREE_TPU_NATIVE_BUILD"] = "1"
    try:
        s1 = et.Scene()
        s1.attach(et.TriangleGeometry(verts, idx))
        cs_native = s1.commit()
    finally:
        os.environ["EMBREE_TPU_NATIVE_BUILD"] = "0"
    s2 = et.Scene()
    s2.attach(et.TriangleGeometry(verts, idx))
    cs_jax = s2.commit()
    os.environ.pop("EMBREE_TPU_NATIVE_BUILD", None)

    h1 = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs_native, rays)
    h2 = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs_jax, rays)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    m = np.asarray(h2.valid)
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4)
