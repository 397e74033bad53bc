"""Material models (BRDFs) for the pathtracer.

Behavior parity with the reference pathtracer material set
(tutorials/pathtracer/pathtracer_device.cpp Material_{sample,eval}: matte
(lambert), mirror, metal (rough conductor), emissive, dielectric (glass,
exact Fresnel + Snell refraction with transmission tint), plus textured
base color (the reference's ObjMaterial map_Kd texture path,
tutorials/common/texture/texture.cpp bilinear sampling)).
Materials are a per-geometry SoA table; sample/eval are pure functions
dispatched by type id — the function-composition analog of the reference's
material switch (pathtracer_device.cpp Material_dispatch).

Divergence note: the reference tracks nested dielectric media along the
path (Medium stack); here Beer-Lambert tinting is applied at the refraction
event itself (stateless bounce — keeps the wavefront scan dense).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import cross, dot, normalize, reflect

MATTE = 0
MIRROR = 1
METAL = 2
EMISSIVE = 3
DIELECTRIC = 4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MaterialSet:
    """Per-geometry material table (indexed by geom_id)."""
    type: jnp.ndarray       # (G,) int32
    albedo: jnp.ndarray     # (G, 3) reflectance / emission / transmission tint
    roughness: jnp.ndarray  # (G,)
    ior: jnp.ndarray = None        # (G,) dielectric index of refraction
    tex: jnp.ndarray = None        # (G, TH, TW, 3) base-color texture atlas
    textured: jnp.ndarray = None   # (G,) bool: modulate albedo by tex

    def tree_flatten(self):
        return ((self.type, self.albedo, self.roughness, self.ior,
                 self.tex, self.textured), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_materials(n_geoms: int, assignments: Dict[int, tuple],
                   textures: Optional[Dict[int, np.ndarray]] = None,
                   tex_size: int = 64) -> MaterialSet:
    """assignments: geom_id -> (type, albedo, roughness[, ior]).
    textures: geom_id -> (th, tw, 3) base-color image (resampled onto the
    shared (tex_size, tex_size) atlas layer with nearest filtering)."""
    t = np.zeros(n_geoms, np.int32)
    a = np.full((n_geoms, 3), 0.8, np.float32)
    r = np.zeros(n_geoms, np.float32)
    ior = np.full(n_geoms, 1.5, np.float32)
    for gid, spec in assignments.items():
        t[gid] = spec[0]
        a[gid] = spec[1]
        r[gid] = spec[2]
        if len(spec) > 3:
            ior[gid] = spec[3]
    tex = textured = None
    if textures:
        tex = np.ones((n_geoms, tex_size, tex_size, 3), np.float32)
        textured = np.zeros(n_geoms, bool)
        for gid, img in textures.items():
            img = np.asarray(img, np.float32)
            ys = (np.arange(tex_size) * img.shape[0] // tex_size)
            xs = (np.arange(tex_size) * img.shape[1] // tex_size)
            tex[gid] = img[ys][:, xs]
            textured[gid] = True
        tex = jnp.asarray(tex)
        textured = jnp.asarray(textured)
    return MaterialSet(jnp.asarray(t), jnp.asarray(a), jnp.asarray(r),
                       jnp.asarray(ior), tex, textured)


def texture_lookup(tex, gid, u, v):
    """Bilinear texture fetch from the (G, TH, TW, 3) atlas with wrap
    addressing (texture.cpp getTexel1f bilinear analog)."""
    G, TH, TW, _ = tex.shape
    x = u * TW - 0.5
    y = v * TH - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def at(ix, iy):
        ix = ix.astype(jnp.int32) % TW
        iy = iy.astype(jnp.int32) % TH
        return tex[gid, iy, ix]

    return (at(x0, y0) * (1 - fx) * (1 - fy) + at(x0 + 1, y0) * fx * (1 - fy)
            + at(x0, y0 + 1) * (1 - fx) * fy + at(x0 + 1, y0 + 1) * fx * fy)


def base_color(mats: MaterialSet, geom_id, u=None, v=None):
    """Albedo, modulated by the geometry's base-color texture when present."""
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    alb = mats.albedo[gid]
    if mats.tex is not None and u is not None:
        tx = texture_lookup(mats.tex, gid, u, v)
        alb = jnp.where(mats.textured[gid][..., None], alb * tx, alb)
    return alb


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


def fresnel_dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel reflectance.

    eta = n_incident / n_transmitted; returns (F, cos_t, tir_mask)
    (fresnel.h FresnelDielectric analog)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t >= 1.0
    # floor the sqrt argument: at (or beyond) total internal reflection
    # sqrt(0) has an infinite derivative, and even a ZERO cotangent through
    # it turns into NaN (0*inf) — which poisons whole-image gradients when
    # the path loop's scan transposes the brdf-sampling branch
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    cos_t = jnp.where(tir, 0.0, cos_t)
    rs = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    rp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    F = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    return F, cos_t, tir


def eval_brdf(mats: MaterialSet, geom_id, n, wo, wi, u=None, v=None):
    """BRDF value * cos(theta_i) for light sampling (Material_eval parity).

    Specular materials (mirror, dielectric) return 0 — no NEE contribution
    through delta lobes.
    """
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    mtype = mats.type[gid]
    albedo = base_color(mats, geom_id, u, v)
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


def sample_brdf(mats: MaterialSet, geom_id, n, wo, key, entering=None,
                u=None, v=None):
    """Sample an outgoing direction; returns (wi, weight) with weight =
    brdf * cos / pdf (Material_sample parity).

    n is the face-forward shading normal; entering (bool mask) says whether
    the ray arrives from outside the surface (needed for dielectric eta
    orientation; defaults to True everywhere)."""
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    mtype = mats.type[gid]
    albedo = base_color(mats, geom_id, u, v)

    k1, k2, k3 = jax.random.split(key, 3)
    wi_diff = cosine_sample_hemisphere(n, k1)
    w_diff = albedo  # lambert: brdf*cos/pdf = albedo

    refl = normalize(reflect(wo, n))
    # metal: perturb mirror direction within roughness cone
    perturb = cosine_sample_hemisphere(refl, k2)
    rough = mats.roughness[gid][..., None]
    wi_metal = normalize(refl * (1 - rough) + perturb * rough)
    w_metal = albedo

    # dielectric: exact Fresnel split between reflection and refraction
    # (pathtracer_device.cpp DielectricLayer / refraction path)
    if entering is None:
        entering = jnp.ones(mtype.shape, bool)
    ior = mats.ior[gid] if mats.ior is not None \
        else jnp.full(mtype.shape, 1.5, jnp.float32)
    eta = jnp.where(entering, 1.0 / ior, ior)
    cos_i = jnp.clip(dot(n, wo), 0.0, 1.0)
    F, cos_t, tir = fresnel_dielectric(cos_i, eta)
    wi_refr = normalize(-eta[..., None] * wo
                        + (eta * cos_i - cos_t)[..., None] * n)
    pick_refl = (jax.random.uniform(k3, mtype.shape) < F) | tir
    wi_diel = jnp.where(pick_refl[..., None], refl, wi_refr)
    # weight 1 on reflection; transmission carries the Beer-Lambert-style
    # tint (reference applies medium transmission along the inside segment)
    w_diel = jnp.where(pick_refl[..., None], jnp.ones_like(albedo), albedo)

    is_mirror = (mtype == MIRROR)[..., None]
    is_metal = (mtype == METAL)[..., None]
    is_diel = (mtype == DIELECTRIC)[..., None]
    wi = jnp.where(is_mirror, refl,
                   jnp.where(is_metal, wi_metal,
                             jnp.where(is_diel, wi_diel, wi_diff)))
    w = jnp.where(is_mirror | is_metal, w_metal,
                  jnp.where(is_diel, w_diel, w_diff))
    # emissive surfaces terminate (no scattering weight)
    w = jnp.where((mtype == EMISSIVE)[..., None], 0.0, w)
    return wi, w


def emission(mats: MaterialSet, geom_id):
    gid = jnp.clip(geom_id.astype(jnp.int32), 0, mats.type.shape[0] - 1)
    return jnp.where((mats.type[gid] == EMISSIVE)[..., None],
                     mats.albedo[gid], 0.0)
