"""Viewer: the image-regression workhorse renderer.

Behavior parity with the reference viewer (tutorials/viewer/viewer_device.cpp:45-54
shader modes: default/eyelight/occlusion/uv/Ng/primID/...) as pure jittable
functions over (CommittedScene, Camera). Each shader returns an (H, W, 3) float32
image in [0, 1] — compared against goldens the way the reference CTest tier does
(tests/CMakeLists.txt:5 'eyelight;uv;Ng;primID;occlusion').
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..core.math import normalize
from ..core.ray import RayBatch
from ..scene import CommittedScene, intersect, occluded
from .camera import Camera


def _hash_color(ids):
    """Deterministic pseudo-random color per id (primID/geomID shaders;
    reference uses randomColor(id), tutorials/common/tutorial/tutorial_device.h)."""
    x = ids.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x45d9f3b)
    x = (x ^ (x >> 16)) * jnp.uint32(0x45d9f3b)
    x = x ^ (x >> 16)
    r = (x & 0xFF).astype(jnp.float32) / 255.0
    g = ((x >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((x >> 16) & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1)


def shade_eyelight(scene: CommittedScene, rays: RayBatch, hits) -> jnp.ndarray:
    """Headlight shading: |N . dir| (viewer_device.cpp eyelight mode)."""
    ng = normalize(hits.ng)
    d = normalize(rays.dir)
    c = jnp.abs(jnp.sum(ng * d, -1))
    col = 0.1 + 0.9 * c
    return jnp.where(hits.valid[..., None], col[..., None].repeat(3, -1), 0.0)


def shade_uv(scene, rays, hits):
    u = jnp.clip(hits.u, 0, 1)
    v = jnp.clip(hits.v, 0, 1)
    col = jnp.stack([u, v, 1.0 - jnp.clip(u + v, 0, 1)], axis=-1)
    return jnp.where(hits.valid[..., None], col, 0.0)


def shade_ng(scene, rays, hits):
    ng = normalize(hits.ng)
    return jnp.where(hits.valid[..., None], jnp.abs(ng), 0.0)


def shade_prim_id(scene, rays, hits):
    return jnp.where(hits.valid[..., None], _hash_color(hits.prim_id), 0.0)


def shade_geom_id(scene, rays, hits):
    return jnp.where(hits.valid[..., None], _hash_color(hits.geom_id), 0.0)


def shade_occlusion(scene: CommittedScene, rays: RayBatch, hits) -> jnp.ndarray:
    """Ambient-occlusion-ish: occlusion of a single offset ray along the normal
    (reference 'occlusion' test shader renders occluded primary rays)."""
    from ..core.ray import make_rays
    p = rays.org + rays.dir * hits.t[..., None]
    ng = normalize(hits.ng)
    d = normalize(rays.dir)
    # flip normal towards the viewer
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
}


def render(scene: CommittedScene, camera: Camera, height: int, width: int,
           shader: str = "eyelight") -> jnp.ndarray:
    """Render one frame: (H, W, 3) float32. Jittable (shader is static)."""
    rays = camera.rays(height, width)
    hits = intersect(scene, rays)
    return SHADERS[shader](scene, rays, hits)
