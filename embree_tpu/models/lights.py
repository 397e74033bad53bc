"""Light types with sample/eval pairs.

Behavior parity with the reference light library (tutorials/common/lights/:
ambient, point (with radius), directional (with angular halo), spot, quad) —
as SoA arrays + pure sample functions. A LightSet packs all lights of all
types; `sample_one` picks a light uniformly per ray (the reference pathtracer
samples all lights per vertex; uniform pick + pdf compensation is the
stochastic equivalent that keeps the TPU kernel dense).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import cross, dot, normalize

TYPE_POINT = 0
TYPE_DIRECTIONAL = 1
TYPE_SPOT = 2
TYPE_QUAD = 3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LightSet:
    """SoA over lights. position/direction/u/v meanings depend on type."""
    type: jnp.ndarray        # (L,) int32
    position: jnp.ndarray    # (L, 3)
    direction: jnp.ndarray   # (L, 3) (directional/spot dir; quad normal)
    radiance: jnp.ndarray    # (L, 3) intensity / radiance
    u_edge: jnp.ndarray      # (L, 3) quad edge 1
    v_edge: jnp.ndarray      # (L, 3) quad edge 2
    cos_angle: jnp.ndarray   # (L,) spot cosAngleMax
    ambient: jnp.ndarray     # (3,) ambient radiance

    def tree_flatten(self):
        return ((self.type, self.position, self.direction, self.radiance,
                 self.u_edge, self.v_edge, self.cos_angle, self.ambient), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def count(self):
        return self.type.shape[0]


class LightSetBuilder:
    def __init__(self):
        self._rows = []
        self._ambient = np.zeros(3, np.float32)

    def ambient(self, radiance):
        self._ambient = self._ambient + np.asarray(radiance, np.float32)
        return self

    def point(self, position, intensity):
        self._rows.append((TYPE_POINT, position, (0, 0, 1), intensity,
                           (0, 0, 0), (0, 0, 0), 0.0))
        return self

    def directional(self, direction, radiance):
        self._rows.append((TYPE_DIRECTIONAL, (0, 0, 0), direction, radiance,
                           (0, 0, 0), (0, 0, 0), 0.0))
        return self

    def spot(self, position, direction, intensity, cos_angle=0.5):
        self._rows.append((TYPE_SPOT, position, direction, intensity,
                           (0, 0, 0), (0, 0, 0), cos_angle))
        return self

    def quad(self, corner, edge_u, edge_v, radiance):
        n = np.cross(np.asarray(edge_u, np.float32), np.asarray(edge_v, np.float32))
        n = n / max(np.linalg.norm(n), 1e-20)
        self._rows.append((TYPE_QUAD, corner, n, radiance, edge_u, edge_v, 0.0))
        return self

    def build(self) -> LightSet:
        if not self._rows:
            self._rows.append((TYPE_POINT, (0, 0, 0), (0, 0, 1), (0, 0, 0),
                               (0, 0, 0), (0, 0, 0), 0.0))
        r = self._rows
        return LightSet(
            type=jnp.asarray([x[0] for x in r], jnp.int32),
            position=jnp.asarray([x[1] for x in r], jnp.float32),
            direction=jnp.asarray([normalize(jnp.asarray(x[2], jnp.float32)) for x in r]),
            radiance=jnp.asarray([x[3] for x in r], jnp.float32),
            u_edge=jnp.asarray([x[4] for x in r], jnp.float32),
            v_edge=jnp.asarray([x[5] for x in r], jnp.float32),
            cos_angle=jnp.asarray([x[6] for x in r], jnp.float32),
            ambient=jnp.asarray(self._ambient),
        )


def sample_one(lights: LightSet, p, key):
    """Sample one light uniformly per shading point.

    Returns (wi, dist, radiance_over_pdf): direction to light, distance (inf
    for directional), and radiance already divided by the selection + area
    pdfs (Light*::sample parity, tutorials/common/lights/*.cpp).
    """
    L = lights.count
    k1, k2 = jax.random.split(key)
    li = jax.random.randint(k1, p.shape[:-1], 0, L)
    uv = jax.random.uniform(k2, p.shape[:-1] + (2,))

    ltype = lights.type[li]
    pos = lights.position[li]
    ldir = lights.direction[li]
    rad = lights.radiance[li]

    # point / spot
    to_l = pos - p
    d2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist_pt = jnp.sqrt(d2)
    wi_pt = to_l / dist_pt[..., None]
    contrib_pt = rad / d2[..., None]
    cos_spot = dot(-wi_pt, ldir)
    spot_fall = jnp.clip((cos_spot - lights.cos_angle[li]) /
                         jnp.maximum(1 - lights.cos_angle[li], 1e-6), 0.0, 1.0)
    contrib_spot = contrib_pt * spot_fall[..., None]

    # directional
    wi_dir = -ldir
    contrib_dir = rad

    # quad area light: sample uniform point on the quad
    q = pos + uv[..., 0:1] * lights.u_edge[li] + uv[..., 1:2] * lights.v_edge[li]
    to_q = q - p
    dq2 = jnp.maximum(dot(to_q, to_q), 1e-12)
    dist_q = jnp.sqrt(dq2)
    wi_q = to_q / dist_q[..., None]
    area = jnp.linalg.norm(cross(lights.u_edge[li], lights.v_edge[li]), axis=-1)
    cos_l = jnp.maximum(dot(-wi_q, ldir), 0.0)
    contrib_q = rad * (area * cos_l / dq2)[..., None]

    is_pt = (ltype == TYPE_POINT)[..., None]
    is_dir = (ltype == TYPE_DIRECTIONAL)[..., None]
    is_spot = (ltype == TYPE_SPOT)[..., None]
    wi = jnp.where(is_dir, wi_dir, jnp.where(is_pt | is_spot, wi_pt, wi_q))
    dist = jnp.where(is_dir[..., 0], jnp.inf,
                     jnp.where((is_pt | is_spot)[..., 0], dist_pt, dist_q))
    contrib = jnp.where(is_pt, contrib_pt,
                        jnp.where(is_spot, contrib_spot,
                                  jnp.where(is_dir, contrib_dir, contrib_q)))
    return wi, dist, contrib * L  # * L compensates the uniform pick pdf
