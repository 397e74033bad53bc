"""Material models (BRDFs) for the pathtracer.

Behavior parity with the reference pathtracer material set
(tutorials/pathtracer/pathtracer_device.cpp Material_{sample,eval}: matte
(lambert), mirror, metal (rough conductor), emissive; dielectric deferred).
Materials are a per-geometry SoA table; sample/eval are pure functions
dispatched by type id — the function-composition analog of the reference's
material switch (pathtracer_device.cpp Material_dispatch).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import cross, dot, normalize, reflect

MATTE = 0
MIRROR = 1
METAL = 2
EMISSIVE = 3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MaterialSet:
    """Per-geometry material table (indexed by geom_id)."""
    type: jnp.ndarray       # (G,) int32
    albedo: jnp.ndarray     # (G, 3) reflectance / emission
    roughness: jnp.ndarray  # (G,)

    def tree_flatten(self):
        return ((self.type, self.albedo, self.roughness), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_materials(n_geoms: int, assignments: Dict[int, tuple]) -> MaterialSet:
    """assignments: geom_id -> (type, albedo, roughness)."""
    t = np.zeros(n_geoms, np.int32)
    a = np.full((n_geoms, 3), 0.8, np.float32)
    r = np.zeros(n_geoms, np.float32)
    for gid, (ty, al, ro) in assignments.items():
        t[gid] = ty
        a[gid] = al
        r[gid] = ro
    return MaterialSet(jnp.asarray(t), jnp.asarray(a), jnp.asarray(r))


def _onb(n):
    """Orthonormal basis around normal n (branchless Frisvad)."""
    s = jnp.where(n[..., 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], -1)
    t2 = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t1, t2


def cosine_sample_hemisphere(n, key):
    u = jax.random.uniform(key, n.shape[:-1] + (2,))
    r = jnp.sqrt(u[..., 0])
    phi = 2 * jnp.pi * u[..., 1]
    t1, t2 = _onb(n)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    return normalize(x[..., None] * t1 + y[..., None] * t2 + z[..., None] * n)


def eval_brdf(mats: MaterialSet, geom_id, n, wo, wi):
    """BRDF value * cos(theta_i) for light sampling (Material_eval parity).

    Specular materials return 0 (no NEE contribution through deltas).
    """
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    mtype = mats.type[gid]
    albedo = mats.albedo[gid]
    cos_i = jnp.maximum(dot(n, wi), 0.0)
    matte = albedo / jnp.pi * cos_i[..., None]
    zero = jnp.zeros_like(matte)
    is_matte = (mtype == MATTE)[..., None]
    # metal: rough specular lobe approximated by a Phong-like pdf around the
    # mirror direction (reference metal uses a microfacet model; roughness
    # mapping kept compatible in spirit)
    refl = reflect(wo, n)
    gid_r = jnp.maximum(mats.roughness[gid], 1e-3)
    shin = 2.0 / (gid_r * gid_r)
    phong = albedo * ((shin + 2) / (2 * jnp.pi) *
                      jnp.power(jnp.maximum(dot(refl, wi), 0.0), shin) *
                      cos_i)[..., None]
    is_metal = (mtype == METAL)[..., None]
    return jnp.where(is_matte, matte, jnp.where(is_metal, phong, zero))


def sample_brdf(mats: MaterialSet, geom_id, n, wo, key):
    """Sample an outgoing direction; returns (wi, weight) with weight =
    brdf * cos / pdf (Material_sample parity)."""
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    mtype = mats.type[gid]
    albedo = mats.albedo[gid]

    k1, k2 = jax.random.split(key)
    wi_diff = cosine_sample_hemisphere(n, k1)
    w_diff = albedo  # lambert: brdf*cos/pdf = albedo

    refl = normalize(reflect(wo, n))
    # metal: perturb mirror direction within roughness cone
    perturb = cosine_sample_hemisphere(refl, k2)
    rough = mats.roughness[gid][..., None]
    wi_metal = normalize(refl * (1 - rough) + perturb * rough)
    w_metal = albedo

    is_mirror = (mtype == MIRROR)[..., None]
    is_metal = (mtype == METAL)[..., None]
    wi = jnp.where(is_mirror, refl, jnp.where(is_metal, wi_metal, wi_diff))
    w = jnp.where(is_mirror | is_metal, w_metal, w_diff)
    # emissive surfaces terminate (no scattering weight)
    w = jnp.where((mtype == EMISSIVE)[..., None], 0.0, w)
    return wi, w


def emission(mats: MaterialSet, geom_id):
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    return jnp.where((mats.type[gid] == EMISSIVE)[..., None],
                     mats.albedo[gid], 0.0)
