"""Ray / hit batch types (SoA pytrees).

Role parity with the reference ray layout (``kernels/common/ray.h:15-204`` RayK/RayHitK
and the public ``include/embree4/rtcore_ray.h:11-60`` RTCRay/RTCRayHit): org, dir,
tnear, tfar, time, mask, id, flags; hit carries Ng, u, v, primID, geomID, instID stack.

Unlike the reference's K-wide register packets, a RayBatch is an arbitrary-shape
array-of-rays — the TPU "packet width" is whatever the kernels tile it into.
Occlusion results follow the reference convention: ``tfar = -inf`` means occluded
(ray.h:196).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# RTC_INVALID_GEOMETRY_ID (rtcore_common.h:49). Plain numpy on purpose: a
# module-level jnp scalar would initialize (and lock) the jax backend at
# import time, before callers can select a platform.
INVALID_ID = np.uint32(0xFFFFFFFF)
MAX_INSTANCE_LEVELS = 2              # analog of RTC_MAX_INSTANCE_LEVEL_COUNT


def _f32(x):
    return jnp.asarray(x, jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RayBatch:
    """A batch of rays; every field has the same leading shape ``shape``."""
    org: jnp.ndarray    # (..., 3) float32
    dir: jnp.ndarray    # (..., 3) float32
    tnear: jnp.ndarray  # (...,)   float32
    tfar: jnp.ndarray   # (...,)   float32
    time: jnp.ndarray   # (...,)   float32 in [0,1]
    mask: jnp.ndarray   # (...,)   uint32

    def tree_flatten(self):
        return (self.org, self.dir, self.tnear, self.tfar, self.time, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.org.shape[:-1]

    def reshape(self, *shape):
        return jax.tree.map(
            lambda a: a.reshape(shape + a.shape[len(self.shape):]), self)


def make_rays(org, dir, tnear=0.0, tfar=jnp.inf, time=0.0, mask=0xFFFFFFFF):
    org = _f32(org)
    dir = _f32(dir)
    shape = org.shape[:-1]
    return RayBatch(
        org=org,
        dir=dir,
        tnear=jnp.broadcast_to(_f32(tnear), shape),
        tfar=jnp.broadcast_to(_f32(tfar), shape),
        time=jnp.broadcast_to(_f32(time), shape),
        mask=jnp.broadcast_to(jnp.asarray(mask, jnp.uint32), shape),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HitBatch:
    """Hit records matching RTCHit (rtcore_ray.h:42-52)."""
    t: jnp.ndarray        # (...,) float32, hit distance (== updated tfar); inf if miss
    u: jnp.ndarray        # (...,) float32 barycentric / param
    v: jnp.ndarray        # (...,) float32
    ng: jnp.ndarray       # (..., 3) float32 unnormalized geometric normal
    prim_id: jnp.ndarray  # (...,) uint32
    geom_id: jnp.ndarray  # (...,) uint32, INVALID_ID if miss
    inst_id: jnp.ndarray  # (..., MAX_INSTANCE_LEVELS) uint32

    def tree_flatten(self):
        return (self.t, self.u, self.v, self.ng, self.prim_id, self.geom_id, self.inst_id), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.t.shape

    @property
    def valid(self):
        return self.geom_id != INVALID_ID


def make_miss_hits(shape):
    return HitBatch(
        t=jnp.full(shape, jnp.inf, jnp.float32),
        u=jnp.zeros(shape, jnp.float32),
        v=jnp.zeros(shape, jnp.float32),
        ng=jnp.zeros(shape + (3,), jnp.float32),
        prim_id=jnp.full(shape, INVALID_ID, jnp.uint32),
        geom_id=jnp.full(shape, INVALID_ID, jnp.uint32),
        inst_id=jnp.full(shape + (MAX_INSTANCE_LEVELS,), INVALID_ID, jnp.uint32),
    )


def select_hits(pred, a: HitBatch, b: HitBatch) -> HitBatch:
    """Elementwise hit select: where pred, take a, else b."""
    def sel(x, y):
        p = pred
        if x.ndim > pred.ndim:
            p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)
    return jax.tree.map(sel, a, b)
