"""Image-level gradient parity vs finite differences — the BASELINE.md
north-star metric ("pixel gradients vs finite differences allclose";
SURVEY.md §2.8 P9, a capability the reference does not have).

The traversal SELECTION is treated as constant (structure gradients are
excluded by design, SURVEY.md §7 hard-part 5), so the test scenes keep pixel
coverage stable under the FD epsilon: geometry fills the frame / moves
parallel to the image plane, and losses weight every pixel with fixed random
weights so the gradient exercises the whole image.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.models.camera import Camera
from embree_tpu.models.lights import LightSetBuilder
from embree_tpu.models.materials import MATTE, make_materials
from embree_tpu.models.pathtracer import render_pathtracer
from embree_tpu.models.viewer import ispc_camera_rays
from embree_tpu.scene import intersect


def _weights(shape, seed=7):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0.5, 1.5, shape).astype(np.float32))


def test_viewer_image_grad_wrt_vertices_vs_fd():
    """Render a 16x16 viewer-style image of a frame-filling tilted quad;
    d(pixel loss)/d(vertices) via autodiff matches central differences along
    random perturbation directions."""
    # PLANAR quad (z = -x/10) far larger than the frustum: every pixel hits
    # at every FD epsilon and the two triangles shade identically along the
    # shared diagonal, so no structural (selection) terms leak into the FD
    v = np.array([[-60, -60, 6], [60, -60, -6], [60, 60, -6], [-60, 60, 6]],
                 np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    s = et.Scene()
    s.attach(et.TriangleGeometry(v, idx))
    cs = s.commit()
    n = 16
    rays = ispc_camera_rays(np.array([0.0, 0.0, 20.0]), np.zeros(3),
                            np.array([0.0, 1.0, 0.0]), 60.0, n, n)
    flat = jax.tree.map(lambda x: x.reshape((n * n,) + x.shape[2:]), rays)
    w = _weights((n * n,))

    def loss(dv):
        # dv: (4,3) vertex perturbation, scattered through the index buffer
        pv = jnp.asarray(v) + dv
        t0 = pv[idx]                       # (2, 3, 3)
        s2 = dataclasses.replace(
            cs, tri_v0=t0[:, 0], tri_v1=t0[:, 1], tri_v2=t0[:, 2],
            tri_v0b=t0[:, 0], tri_v1b=t0[:, 1], tri_v2b=t0[:, 2])
        h = intersect(s2, flat, backend="jnp")
        ng = h.ng * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(h.ng * h.ng, -1, keepdims=True), 1e-30))
        shade = jnp.abs(jnp.sum(-flat.dir * ng, -1))
        px = jnp.where(h.valid, shade + 0.05 * h.t, 0.0)
        return jnp.sum(w * px)

    g = jax.jit(jax.grad(loss))(jnp.zeros((4, 3)))
    rng = np.random.default_rng(3)
    eps = 1e-3
    lf = jax.jit(loss)
    for _ in range(3):
        delta = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        fd = (float(lf(eps * delta)) - float(lf(-eps * delta))) / (2 * eps)
        ad = float(jnp.sum(g * delta))
        np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=1e-3)
    assert float(jnp.abs(g).max()) > 1e-4


def test_viewer_image_grad_kernel_path_matches_jnp_and_fd():
    """VERDICT r4 #7: the forward intersect SELECTS through the Pallas
    kernel (backend="pallas") and the differentiable re-intersection VJP
    reproduces both the jnp-backend gradient and finite differences.
    Selection is under stop_gradient in both backends, so the two AD paths
    must agree to float tolerance. ONE frame-filling triangle: a quad's
    shared diagonal would let the backends tie-break to different (equally
    valid) triangles whose vertex gradients differ."""
    from embree_tpu import scene as scene_mod
    v = np.array([[-300, -300, 30], [300, -300, -30], [0, 300, 0]],
                 np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    s = et.Scene()
    s.attach(et.TriangleGeometry(v, idx))
    cs = s.commit()
    n = 12
    rays = ispc_camera_rays(np.array([0.0, 0.0, 20.0]), np.zeros(3),
                            np.array([0.0, 1.0, 0.0]), 60.0, n, n)
    flat = jax.tree.map(lambda x: x.reshape((n * n,) + x.shape[2:]), rays)
    w = _weights((n * n,))

    def make_loss(backend):
        def loss(dv):
            pv = jnp.asarray(v) + dv
            t0 = pv[idx]
            s2 = dataclasses.replace(
                cs, tri_v0=t0[:, 0], tri_v1=t0[:, 1], tri_v2=t0[:, 2],
                tri_v0b=t0[:, 0], tri_v1b=t0[:, 1], tri_v2b=t0[:, 2])
            h = intersect(s2, flat, backend=backend)
            ng = h.ng * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(h.ng * h.ng, -1, keepdims=True), 1e-30))
            shade = jnp.abs(jnp.sum(-flat.dir * ng, -1))
            px = jnp.where(h.valid, shade + 0.05 * h.t, 0.0)
            return jnp.sum(w * px)
        return loss

    old = scene_mod.PALLAS_INTERPRET
    scene_mod.PALLAS_INTERPRET = True
    try:
        g_k = jax.jit(jax.grad(make_loss("pallas")))(jnp.zeros((3, 3)))
        lf = jax.jit(make_loss("pallas"))
        g_j = jax.jit(jax.grad(make_loss("jnp")))(jnp.zeros((3, 3)))
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_j),
                                   rtol=1e-4, atol=1e-6)
        rng = np.random.default_rng(3)
        eps = 1e-3
        for _ in range(2):
            delta = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
            fd = (float(lf(eps * delta)) - float(lf(-eps * delta))) / (2 * eps)
            ad = float(jnp.sum(g_k * delta))
            np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=1e-3)
    finally:
        scene_mod.PALLAS_INTERPRET = old
    assert float(jnp.abs(g_k).max()) > 1e-4


def test_sphere_image_grad_kernel_path_vs_fd():
    """Non-triangle gradient at image level (VERDICT r4 #7 second half):
    d(pixel loss)/d(sphere center_z, radius) through the kernel-selected
    re-intersection path matches finite differences. The sphere dwarfs the
    frustum so pixel coverage is FD-stable (structure terms excluded)."""
    from embree_tpu import scene as scene_mod
    c0 = np.array([[0.0, 0.0, -30.0]], np.float32)
    r0 = np.float32(25.0)
    s = et.Scene()
    s.attach(et.PointGeometry(
        np.concatenate([c0, [[r0]]], axis=1), kind="sphere"))
    cs = s.commit()
    n = 12
    rays = ispc_camera_rays(np.array([0.0, 0.0, 20.0]), np.zeros(3),
                            np.array([0.0, 1.0, 0.0]), 40.0, n, n)
    flat = jax.tree.map(lambda x: x.reshape((n * n,) + x.shape[2:]), rays)
    w = _weights((n * n,), seed=5)

    def loss(dc, dr):
        s2 = dataclasses.replace(
            cs, pnt_c=cs.pnt_c + jnp.array([0.0, 0.0, 1.0]) * dc,
            pnt_cb=cs.pnt_cb + jnp.array([0.0, 0.0, 1.0]) * dc,
            pnt_r=cs.pnt_r + dr, pnt_rb=cs.pnt_rb + dr)
        h = intersect(s2, flat, backend="pallas")
        return jnp.sum(w * jnp.where(h.valid, h.t, 0.0))

    old = scene_mod.PALLAS_INTERPRET
    scene_mod.PALLAS_INTERPRET = True
    try:
        gc, gr = jax.jit(jax.grad(loss, argnums=(0, 1)))(0.0, 0.0)
        lf = jax.jit(loss)
        eps = 1e-2
        fdc = (float(lf(eps, 0.0)) - float(lf(-eps, 0.0))) / (2 * eps)
        fdr = (float(lf(0.0, eps)) - float(lf(0.0, -eps))) / (2 * eps)
    finally:
        scene_mod.PALLAS_INTERPRET = old
    np.testing.assert_allclose(float(gc), fdc, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(float(gr), fdr, rtol=2e-2, atol=1e-3)
    assert abs(float(gc)) > 1e-3 and abs(float(gr)) > 1e-3


def test_pathtracer_image_grad_wrt_material_and_vertices_vs_fd():
    """Render an 8x8 pathtracer image (floor + blocker, point light, 1 spp,
    fixed key); gradients of the pixel loss w.r.t. the albedo AND a floor
    translation both match finite differences."""
    s = et.Scene()
    g_floor = s.attach(et.TriangleGeometry(
        np.array([[-40, 0, -40], [40, 0, -40], [40, 0, 40], [-40, 0, 40]],
                 np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32)))
    cs = s.commit()
    lights = LightSetBuilder().point((0, 6, 0), (30, 30, 30)).build()
    cam = Camera(from_point=np.array([0, 8, 10], np.float32),
                 to_point=np.zeros(3, np.float32),
                 up=np.array([0, 1, 0], np.float32), fov_deg=50.0)
    n = 8
    w = _weights((n, n, 3), seed=11)

    mats0 = make_materials(1, {g_floor: (MATTE, (0.6, 0.5, 0.4), 0.0)})

    def loss(albedo, dy):
        mats = dataclasses.replace(mats0, albedo=albedo[None, :])
        shift = jnp.array([0.0, 1.0, 0.0]) * dy
        s2 = dataclasses.replace(
            cs,
            tri_v0=cs.tri_v0 + shift, tri_v1=cs.tri_v1 + shift,
            tri_v2=cs.tri_v2 + shift,
            tri_v0b=cs.tri_v0b + shift, tri_v1b=cs.tri_v1b + shift,
            tri_v2b=cs.tri_v2b + shift)
        img = render_pathtracer(s2, mats, lights, cam, n, n, spp=1,
                                max_depth=2, backend="jnp",
                                key=jax.random.PRNGKey(5))
        return jnp.sum(w * img)

    a0 = jnp.array([0.6, 0.5, 0.4])
    ga, gy = jax.jit(jax.grad(loss, argnums=(0, 1)))(a0, 0.0)
    lf = jax.jit(loss)

    eps = 1e-3
    rng = np.random.default_rng(1)
    for _ in range(2):
        d = jnp.asarray(rng.normal(size=3).astype(np.float32))
        fd = (float(lf(a0 + eps * d, 0.0)) - float(lf(a0 - eps * d, 0.0))) \
            / (2 * eps)
        np.testing.assert_allclose(float(jnp.sum(ga * d)), fd,
                                   rtol=2e-2, atol=1e-3)
    fdy = (float(lf(a0, eps)) - float(lf(a0, -eps))) / (2 * eps)
    np.testing.assert_allclose(float(gy), fdy, rtol=3e-2, atol=1e-3)
    assert float(jnp.abs(ga).max()) > 1e-3
