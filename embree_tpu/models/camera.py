"""Pinhole camera → primary ray generation.

Role parity with the tutorial camera (reference tutorials/common/tutorial/camera.h:
Camera::ISPCCamera pixel-to-ray frame). Generates a full image's rays as one
(H, W) RayBatch — the TPU analog of the 8x8-tile parallel_for (tutorial_device.h:9).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.math import cross, normalize
from ..core.ray import RayBatch, make_rays


@dataclasses.dataclass
class Camera:
    from_point: jnp.ndarray  # (3,)
    to_point: jnp.ndarray    # (3,)
    up: jnp.ndarray          # (3,)
    fov_deg: float = 60.0

    def rays(self, height: int, width: int, jitter=None) -> RayBatch:
        """Primary rays through pixel centers (or jittered positions).

        jitter: optional (H, W, 2) offsets in [0,1) for AA sampling.
        """
        eye = jnp.asarray(self.from_point, jnp.float32)
        w = normalize(jnp.asarray(self.to_point, jnp.float32) - eye)
        u = normalize(cross(w, jnp.asarray(self.up, jnp.float32)))
        v = cross(u, w)
        tan_half = jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        aspect = width / height

        off = 0.5 if jitter is None else jitter
        if jitter is None:
            px = (jnp.arange(width) + 0.5) / width
            py = (jnp.arange(height) + 0.5) / height
            sx = (px * 2 - 1)[None, :] * tan_half * aspect
            sy = (1 - py * 2)[:, None] * tan_half
        else:
            px = (jnp.arange(width)[None, :] + jitter[..., 0]) / width
            py = (jnp.arange(height)[:, None] + jitter[..., 1]) / height
            sx = (px * 2 - 1) * tan_half * aspect
            sy = (1 - py * 2) * tan_half

        d = sx[..., None] * u + sy[..., None] * v + w
        org = jnp.broadcast_to(eye, d.shape)
        return make_rays(org, d)
