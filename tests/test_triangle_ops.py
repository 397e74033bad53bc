"""Unit tests for triangle intersectors vs closed form.

Mirrors the reference's TriangleHitTest (tutorials/verify/verify.cpp:2462):
random triangles, rays constructed through known barycentric points must hit
with matching t/u/v; rays outside must miss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embree_tpu.ops import triangle as tri


def random_triangles(key, n):
    return jax.random.normal(key, (n, 3, 3)) * 2.0


@pytest.mark.parametrize("intersector", [tri.intersect_moeller, tri.intersect_pluecker])
def test_hit_at_known_barycentrics(intersector):
    key = jax.random.PRNGKey(0)
    n = 256
    tris = random_triangles(key, n)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]

    ku, kv, ko = jax.random.split(jax.random.PRNGKey(1), 3)
    u = jax.random.uniform(ku, (n,), minval=0.05, maxval=0.9)
    v = jax.random.uniform(kv, (n,), minval=0.05, maxval=0.9) * (1 - u)
    p = (1 - u - v)[:, None] * v0 + u[:, None] * v1 + v[:, None] * v2

    org = p + jnp.array([0.3, 0.5, 0.7]) * 3.0
    dir = p - org  # t=1 at the surface point

    hit, t, uu, vv, ng = intersector(org, dir, v0, v1, v2, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hit), True)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uu), np.asarray(u), atol=1e-3)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(v), atol=1e-3)
    # geometric normal parallel to e1 x e2
    ref_ng = jnp.cross(v1 - v0, v2 - v0)
    cos = jnp.sum(ng * ref_ng, -1) / (
        jnp.linalg.norm(ng, axis=-1) * jnp.linalg.norm(ref_ng, axis=-1))
    np.testing.assert_allclose(np.asarray(cos), 1.0, atol=1e-4)


@pytest.mark.parametrize("intersector", [tri.intersect_moeller, tri.intersect_pluecker])
def test_miss_outside(intersector):
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    org = jnp.array([[2.0, 2.0, 1.0], [0.2, 0.2, 1.0], [0.2, 0.2, 1.0]])
    dir = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    hit, t, _, _, _ = intersector(org, dir, v0, v1, v2, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hit), [False, False, True])


@pytest.mark.parametrize("intersector", [tri.intersect_moeller, tri.intersect_pluecker])
def test_tnear_tfar_clipping(intersector):
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    org = jnp.array([0.2, 0.2, 1.0])
    dir = jnp.array([0.0, 0.0, -1.0])
    hit, *_ = intersector(org, dir, v0, v1, v2, 0.0, 0.5)
    assert not bool(hit)  # hit at t=1 is beyond tfar
    hit, *_ = intersector(org, dir, v0, v1, v2, 1.5, jnp.inf)
    assert not bool(hit)  # before tnear
    hit, *_ = intersector(org, dir, v0, v1, v2, 0.5, 1.5)
    assert bool(hit)


def test_gradients_wrt_vertices():
    """dt/dvertex via autodiff matches finite differences (new capability;
    SURVEY.md §2.8 P9)."""
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    org = jnp.array([0.2, 0.3, 1.0])
    dir = jnp.array([0.0, 0.0, -1.0])

    def t_of_verts(dz):
        _, t, _, _, _ = tri.intersect_moeller(
            org, dir, v0 + jnp.array([0., 0., 1.]) * dz,
            v1 + jnp.array([0., 0., 1.]) * dz,
            v2 + jnp.array([0., 0., 1.]) * dz, 0.0, jnp.inf)
        return t

    g = jax.grad(t_of_verts)(0.0)
    eps = 1e-3
    fd = (t_of_verts(eps) - t_of_verts(-eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), atol=1e-3)
    np.testing.assert_allclose(np.asarray(g), -1.0, atol=1e-4)


def test_interpolation():
    a0 = jnp.array([[1.0, 0.0]])
    a1 = jnp.array([[0.0, 1.0]])
    a2 = jnp.array([[0.0, 0.0]])
    out = tri.interpolate_attribute(a0, a1, a2, jnp.array([0.25]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(out[0]), [0.25, 0.25], atol=1e-6)
