"""Multi-device sharding on the virtual 8-device CPU mesh (the fake-cluster
tier the reference lacks — SURVEY.md §4 implication)."""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.models.camera import Camera
from embree_tpu.parallel.render import (make_mesh, measure_scaling,
                                        render_image_sharded, replicate,
                                        shard_rays)
from test_bvh import make_sphere_mesh, random_rays


def _scene():
    verts, idx = make_sphere_mesh(8, 12)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    return s.commit()


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_sharded_intersect_matches_single():
    cs = _scene()
    rays = random_rays(jax.random.PRNGKey(0), 1024)
    h_single = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs, rays)

    mesh = make_mesh(8)
    sharded = shard_rays(rays, mesh)
    cs_r = replicate(cs, mesh)
    h_shard = jax.jit(lambda c, r: et.intersect(c, r, backend="jnp"))(cs_r, sharded)
    np.testing.assert_array_equal(np.asarray(h_single.valid),
                                  np.asarray(h_shard.valid))
    np.testing.assert_allclose(np.asarray(h_single.t), np.asarray(h_shard.t),
                               rtol=1e-5)
    # output inherits the ray sharding
    assert len(h_shard.t.sharding.device_set) == 8


def test_sharded_image_render():
    cs = _scene()
    cam = Camera(from_point=np.array([0, 0, 4], np.float32),
                 to_point=np.zeros(3, np.float32),
                 up=np.array([0, 1, 0], np.float32))
    mesh = make_mesh(8)
    img = render_image_sharded(cs, cam, 64, 64, mesh)
    a = np.asarray(img)
    assert a.shape == (64, 64, 3) and np.isfinite(a).all() and a.max() > 0


def test_scaling_measurement_runs():
    cs = _scene()
    rays = random_rays(jax.random.PRNGKey(1), 2048)
    table = measure_scaling(cs, rays, device_counts=[1, 8], iters=1)
    assert set(table) == {1, 8}
    assert table[1]["rays_per_s"] > 0 and table[8]["rays_per_s"] > 0


def test_sharded_gradient_allreduce():
    """Vertex gradients from sharded rays match unsharded gradients (XLA
    inserts the psum; the gradient all-reduce north star)."""
    import dataclasses
    cs = _scene()
    rays = random_rays(jax.random.PRNGKey(2), 512)

    def loss(v0, scene, rr):
        s2 = dataclasses.replace(scene, tri_v0=v0, tri_v0b=v0)
        h = et.intersect(s2, rr, backend="jnp")
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))

    g_single = jax.jit(jax.grad(loss))(cs.tri_v0, cs, rays)

    mesh = make_mesh(8)
    sharded = shard_rays(rays, mesh)
    cs_r = replicate(cs, mesh)
    g_shard = jax.jit(jax.grad(loss))(cs_r.tri_v0, cs_r, sharded)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_shard),
                               atol=1e-4)
