"""Viewer: the image-regression workhorse renderer.

Behavior parity with the reference viewer's debug shaders
(tutorials/viewer/viewer_device_debug.cpp:213-316, shader CLI names from
tests/CMakeLists.txt:5 'eyelight;uv;Ng;primID;occlusion') as pure jittable
functions over (CommittedScene, rays). Each shader reproduces the reference's
exact pixel formula so renders can be compared against the 330 checked-in
golden EXRs with the reference's error metric (utils/exr.compare_images).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import normalize
from ..core.ray import RayBatch, make_rays
from ..scene import CommittedScene, intersect, occluded
from .camera import Camera


def random_color(ids):
    """The reference's randomColor(ID) (viewer_device_debug.cpp:204-211)."""
    i = ids.astype(jnp.int32)
    r = (((i + 13) * (17 * 23)) & 255).astype(jnp.float32) / 255.0
    g = (((i + 15) * (11 * 13)) & 255).astype(jnp.float32) / 255.0
    b = (((i + 17) * (7 * 19)) & 255).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1)


def shade_eyelight(scene: CommittedScene, rays: RayBatch, hits) -> jnp.ndarray:
    """Miss -> black; front-facing (dot(dir,Ng) < 0) -> |dot(dir,n)| in G,
    back-facing -> in R (viewer_device_debug.cpp:250-256)."""
    d = rays.dir                       # reference dir is already normalized
    ng = hits.ng
    c = jnp.abs(jnp.sum(normalize(ng) * d, -1))
    front = jnp.sum(ng * d, -1) < 0.0
    col = jnp.where(front[..., None],
                    jnp.stack([jnp.zeros_like(c), c, jnp.zeros_like(c)], -1),
                    jnp.stack([c, jnp.zeros_like(c), jnp.zeros_like(c)], -1))
    return jnp.where(hits.valid[..., None], col, 0.0)


def shade_uv(scene, rays, hits):
    """(u, v, 1-u-v); miss -> black (viewer_device_debug.cpp:264-266)."""
    col = jnp.stack([hits.u, hits.v, 1.0 - hits.u - hits.v], axis=-1)
    return jnp.where(hits.valid[..., None], col, 0.0)


def shade_ng(scene, rays, hits):
    """abs(normalize(Ng)); miss -> black (viewer_device_debug.cpp:292-294)."""
    return jnp.where(hits.valid[..., None], jnp.abs(normalize(hits.ng)), 0.0)


def shade_prim_id(scene, rays, hits):
    """randomColor(geomID ^ primID) * |dot(dir, n)|
    (SHADER_GEOMID_PRIMID, viewer_device_debug.cpp:303-305)."""
    c = jnp.abs(jnp.sum(normalize(hits.ng) * rays.dir, -1))
    ids = hits.geom_id.astype(jnp.int32) ^ hits.prim_id.astype(jnp.int32)
    return jnp.where(hits.valid[..., None], random_color(ids) * c[..., None], 0.0)


def shade_geom_id(scene, rays, hits):
    """randomColor(geomID) (SHADER_GEOMID, viewer_device_debug.cpp:298-300)."""
    return jnp.where(hits.valid[..., None],
                     random_color(hits.geom_id.astype(jnp.int32)), 0.0)


def shade_occlusion(scene: CommittedScene, rays: RayBatch, hits) -> jnp.ndarray:
    """PRIMARY-ray occlusion: occluded -> white, free -> black
    (SHADER_OCCLUSION, viewer_device_debug.cpp:258-262: tfar=-inf on hit)."""
    occ = occluded(scene, rays)
    return jnp.where(occ[..., None], 1.0, 0.0) * jnp.ones(3)


def shade_ao(scene: CommittedScene, rays: RayBatch, hits) -> jnp.ndarray:
    """Ambient-occlusion-ish secondary shader (renderPixelAOShader analog,
    single cosine sample instead of 64 — a separate mode, not a parity target)."""
    p = rays.org + rays.dir * hits.t[..., None]
    ng = normalize(hits.ng)
    d = normalize(rays.dir)
    ng = jnp.where(jnp.sum(ng * d, -1, keepdims=True) > 0, -ng, ng)
    srays = make_rays(p + ng * 1e-3, ng, tnear=1e-3)
    occ = occluded(scene, srays)
    col = jnp.where(occ, 0.2, 1.0)
    return jnp.where(hits.valid[..., None], col[..., None].repeat(3, -1), 0.0)


SHADERS: Dict[str, Callable] = {
    "eyelight": shade_eyelight,
    "uv": shade_uv,
    "Ng": shade_ng,
    "primID": shade_prim_id,
    "geomID": shade_geom_id,
    "occlusion": shade_occlusion,
    "ao": shade_ao,
}


def ispc_camera_rays(from_, to, up, fov, width, height, time=0.0):
    """Reference camera model (tutorials/common/tutorial/camera.h:57-81,
    right-handed): per-pixel dir = normalize(x*vx + y*vy + vz) at integer
    pixel coordinates. Returns a RayBatch of shape (H, W)."""
    from_ = jnp.asarray(from_, jnp.float32)
    to = jnp.asarray(to, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    Z = normalize(to - from_)
    U = normalize(jnp.cross(up, Z))
    V = normalize(jnp.cross(Z, U))
    lvx = -U                                   # RIGHT_HANDED flips vx
    lvy, lvz = V, Z
    fov_scale = 1.0 / jnp.tan(jnp.deg2rad(0.5 * fov))
    vx = lvx
    vy = -lvy
    vz = (-0.5 * width * lvx + 0.5 * height * lvy
          + 0.5 * height * fov_scale * lvz)
    x = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    y = jnp.arange(height, dtype=jnp.float32)[:, None, None]
    d = normalize(x * vx + y * vy + vz)
    org = jnp.broadcast_to(from_, d.shape)
    return make_rays(org, d, time=jnp.full(d.shape[:-1], time, jnp.float32))


def render(scene: CommittedScene, camera: Camera, height: int, width: int,
           shader: str = "eyelight") -> jnp.ndarray:
    """Render one frame: (H, W, 3) float32. Jittable (shader is static)."""
    rays = camera.rays(height, width)
    hits = intersect(scene, rays)
    return SHADERS[shader](scene, rays, hits)


def render_debug(scene: CommittedScene, cam: dict, shader: str,
                 width: int = 512, height: int = 512,
                 time: float = 0.0) -> jnp.ndarray:
    """Render with the reference debug-camera model + a parity shader.

    cam: dict(from_, to, up, fov) as produced by utils/xml_scene.load_xml.
    Matches embree_viewer --shader <s> --time <t> output (before 8-bit
    framebuffer quantization; apply utils.exr.quantize8 to compare)."""
    rays = ispc_camera_rays(cam["from_"], cam["to"], cam["up"], cam["fov"],
                            width, height, time=time)
    hits = intersect(scene, rays)
    return SHADERS[shader](scene, rays, hits)
