"""Monte-Carlo path tracer — the flagship renderer.

Behavior parity with the reference pathtracer
(tutorials/pathtracer/pathtracer_device.cpp renderPixelFunction :1474-1604:
path loop with per-vertex light sampling + occlusion rays, BRDF sampling,
throughput Lw, spp accumulation loop :1619) — restructured wavefront:

- The whole image's rays advance together: one lax.scan iteration = one path
  depth for every pixel (the reference's per-pixel while loop becomes a
  bulk-synchronous pass — SURVEY.md §2.8 P2).
- Terminated paths carry zero throughput; lanes stay dense.
- Per-bounce: emission + next-event estimation (sample one light, shadow ray
  via occluded()) + BRDF direction sampling.
- Differentiable end-to-end w.r.t. geometry/materials/lights through the
  re-intersection hit reconstruction (structure gradients excluded).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.math import dot, normalize
from ..core.ray import RayBatch, make_rays
from ..scene import CommittedScene, intersect, occluded
from .camera import Camera
from .lights import LightSet, sample_one
from .materials import MaterialSet, emission, eval_brdf, sample_brdf


def trace_paths(scene: CommittedScene, mats: MaterialSet, lights: LightSet,
                rays: RayBatch, key, max_depth: int = 4,
                backend=None) -> jnp.ndarray:
    """Trace one path per input ray; returns (..., 3) radiance."""
    shape = rays.shape
    L0 = jnp.zeros(shape + (3,), jnp.float32)
    Lw0 = jnp.ones(shape + (3,), jnp.float32)

    def bounce(carry, k):
        L, Lw, cur_rays, alive = carry
        hits = intersect(scene, cur_rays, backend=backend)
        valid = hits.valid & alive

        # ambient/miss contribution
        L = L + jnp.where((alive & ~hits.valid)[..., None],
                          Lw * lights.ambient, 0.0)

        # sanitize miss lanes (t = inf): an inf hit point would poison the
        # BACKWARD pass — jnp.where zeros the unselected branch's value but
        # inf/nan still propagate through its cotangent (0 * nan = nan)
        t_safe = jnp.where(valid, hits.t, 0.0)
        p = cur_rays.org + cur_rays.dir * t_safe[..., None]
        ng = normalize(jnp.where(valid[..., None], hits.ng, 1.0))
        wo = -normalize(cur_rays.dir)
        entering = dot(ng, wo) > 0            # outside -> inside transition
        n = jnp.where(entering[..., None], ng, -ng)   # face forward

        # emission at the hit (area lights as emissive geometry)
        L = L + jnp.where(valid[..., None], Lw * emission(mats, hits.geom_id), 0.0)

        # next-event estimation: one light sample + shadow ray
        k_light, k_brdf = jax.random.split(k)
        wi_l, dist_l, contrib = sample_one(lights, p, k_light)
        f = eval_brdf(mats, hits.geom_id, n, wo, wi_l, u=hits.u, v=hits.v)
        srays = make_rays(p + n * 1e-3, wi_l, tnear=1e-4,
                          tfar=jnp.where(jnp.isinf(dist_l), 1e30, dist_l - 1e-3),
                          time=cur_rays.time)
        shadowed = occluded(scene, srays, backend=backend)
        ndotl_ok = dot(n, wi_l) > 0
        L = L + jnp.where((valid & ~shadowed & ndotl_ok)[..., None],
                          Lw * f * contrib, 0.0)

        # BRDF sampling -> next ray (dielectrics may refract below the
        # surface: offset along the side wi leaves through)
        wi, w = sample_brdf(mats, hits.geom_id, n, wo, k_brdf,
                            entering=entering, u=hits.u, v=hits.v)
        Lw = Lw * jnp.where(valid[..., None], w, 0.0)
        alive = valid & (jnp.max(Lw, axis=-1) > 1e-4)
        side = jnp.where(dot(wi, n) >= 0, 1.0, -1.0)[..., None]
        nxt = make_rays(p + side * n * 1e-3, wi, tnear=1e-4,
                        time=cur_rays.time)
        # keep dead rays inert (tfar < tnear). tfar is carried FINITE
        # (1e30, not inf): scan's transpose instantiates zero cotangents
        # for the ray carry and an inf residual turns 0*inf into NaN,
        # poisoning every gradient through the path loop
        nxt = RayBatch(org=nxt.org, dir=nxt.dir, tnear=nxt.tnear,
                       tfar=jnp.where(alive, 1e30, -1.0),
                       time=nxt.time, mask=cur_rays.mask)
        return (L, Lw, nxt, alive), None

    rays0 = RayBatch(org=rays.org, dir=rays.dir, tnear=rays.tnear,
                     tfar=jnp.minimum(rays.tfar, 1e30), time=rays.time,
                     mask=rays.mask)
    keys = jax.random.split(key, max_depth)
    (L, _, _, _), _ = jax.lax.scan(
        bounce, (L0, Lw0, rays0, jnp.ones(shape, bool)), keys)
    return L


def render_pathtracer(scene: CommittedScene, mats: MaterialSet,
                      lights: LightSet, camera: Camera, height: int,
                      width: int, spp: int = 4, max_depth: int = 4,
                      key=None, backend=None) -> jnp.ndarray:
    """Render an (H, W, 3) image with spp jittered samples per pixel."""
    if key is None:
        key = jax.random.PRNGKey(0)

    def sample(carry, k):
        acc = carry
        k_jit, k_path = jax.random.split(k)
        jitter = jax.random.uniform(k_jit, (height, width, 2))
        rays = camera.rays(height, width, jitter=jitter)
        L = trace_paths(scene, mats, lights, rays, k_path,
                        max_depth=max_depth, backend=backend)
        return acc + L, None

    keys = jax.random.split(key, spp)
    img, _ = jax.lax.scan(sample, jnp.zeros((height, width, 3), jnp.float32), keys)
    return img / spp
