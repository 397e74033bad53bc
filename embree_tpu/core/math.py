"""Vector math for the TPU ray tracer.

Role parity with Embree's ``common/math`` layer (reference: ``common/math/vec3fa.h``,
``bbox.h``, ``lbbox.h``, ``affinespace.h``, ``quaternion.h``) — but arrays-first:
every "vector" is just a trailing-dim-3 jnp array, every AABB a (lower, upper)
pair of such arrays, so everything vmaps/shards trivially.

All functions are shape-polymorphic over leading batch dims.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

# Large-but-finite sentinel used instead of inf where XLA min/max with inf is
# awkward. Matches float("inf") semantics for comparisons we rely on.
INF = jnp.inf
NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# vec3 helpers (trailing dim 3)
# ---------------------------------------------------------------------------

def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(dot(a, a))


def sqr_length(a):
    return dot(a, a)


def normalize(a, eps=1e-20):
    return a * jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))[..., None]


def reflect(v, n):
    """Reflect direction v about normal n (both pointing away from surface)."""
    return 2.0 * dot(v, n)[..., None] * n - v


def rcp_safe(x, eps=1e-18):
    """Reciprocal that avoids inf for near-zero input by clamping magnitude.

    Used for ray direction reciprocals (cf. Embree rcp_safe in
    kernels/common/ray.h usage in node_intersector1.h:33).
    """
    return 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)


# ---------------------------------------------------------------------------
# AABB — represented as (lower, upper) arrays, trailing dim 3
# ---------------------------------------------------------------------------

def aabb_empty(shape=(), dtype=jnp.float32):
    lower = jnp.full(shape + (3,), INF, dtype)
    upper = jnp.full(shape + (3,), NEG_INF, dtype)
    return lower, upper


def aabb_union(lo_a, up_a, lo_b, up_b):
    return jnp.minimum(lo_a, lo_b), jnp.maximum(up_a, up_b)


def aabb_extend_point(lo, up, p):
    return jnp.minimum(lo, p), jnp.maximum(up, p)


def aabb_center(lo, up):
    return 0.5 * (lo + up)


def aabb_half_area(lo, up):
    """Half surface area (SAH metric; cf. halfArea in common/math/bbox.h)."""
    d = jnp.maximum(up - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def aabb_contains_point(lo, up, p):
    return jnp.all((p >= lo) & (p <= up), axis=-1)


def aabb_lerp(lo0, up0, lo1, up1, t):
    """Linear bounds interpolation (LBBox, reference common/math/lbbox.h)."""
    t = jnp.asarray(t)[..., None]
    return lo0 * (1 - t) + lo1 * t, up0 * (1 - t) + up1 * t


# ---------------------------------------------------------------------------
# Affine transforms — 3x4 matrices stored as (..., 3, 4): [R|t]
# (reference common/math/affinespace.h AffineSpace3fa)
# ---------------------------------------------------------------------------

def affine_identity(dtype=jnp.float32):
    return jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], axis=-1)


def affine_from_cols(vx, vy, vz, p):
    """Build from column vectors (linear part columns + translation)."""
    return jnp.stack([vx, vy, vz, p], axis=-1)


def affine_translate(t):
    return jnp.concatenate([jnp.eye(3, dtype=jnp.asarray(t).dtype),
                            jnp.asarray(t)[..., None]], axis=-1)


def affine_scale(s):
    s = jnp.asarray(s)
    if s.ndim == 0:
        s = jnp.stack([s, s, s])
    return jnp.concatenate([jnp.diag(s), jnp.zeros((3, 1), s.dtype)], axis=-1)


def affine_rotate(axis, angle):
    """Rotation about axis by angle (radians)."""
    axis = normalize(jnp.asarray(axis, jnp.float32))
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c, s = jnp.cos(angle), jnp.sin(angle)
    C = 1 - c
    R = jnp.stack([
        jnp.stack([x * x * C + c, x * y * C - z * s, x * z * C + y * s], -1),
        jnp.stack([y * x * C + z * s, y * y * C + c, y * z * C - x * s], -1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, z * z * C + c], -1),
    ], axis=-2)
    return jnp.concatenate([R, jnp.zeros(R.shape[:-1] + (1,), R.dtype)], axis=-1)


def affine_mul(a, b):
    """Compose: (a @ b)(x) = a(b(x))."""
    Ra, ta = a[..., :3], a[..., 3]
    Rb, tb = b[..., :3], b[..., 3]
    R = Ra @ Rb
    t = jnp.einsum('...ij,...j->...i', Ra, tb, precision="highest") + ta
    return jnp.concatenate([R, t[..., None]], axis=-1)


def affine_inverse(a):
    R, t = a[..., :3], a[..., 3]
    Rinv = jnp.linalg.inv(R)
    tinv = -jnp.einsum('...ij,...j->...i', Rinv, t, precision="highest")
    return jnp.concatenate([Rinv, tinv[..., None]], axis=-1)


def xfm_point(a, p):
    return jnp.einsum('...ij,...j->...i', a[..., :3], p, precision="highest") + a[..., 3]


def xfm_vector(a, v):
    return jnp.einsum('...ij,...j->...i', a[..., :3], v, precision="highest")


def xfm_normal(a, n):
    """Transform a normal: inverse-transpose of linear part."""
    Rinv = jnp.linalg.inv(a[..., :3])
    return jnp.einsum('...ji,...j->...i', Rinv, n, precision="highest")


def xfm_aabb(a, lo, up):
    """Transform an AABB, returning the AABB of the transformed box corners."""
    corners = jnp.stack([
        vec3(lo[..., 0], lo[..., 1], lo[..., 2]),
        vec3(up[..., 0], lo[..., 1], lo[..., 2]),
        vec3(lo[..., 0], up[..., 1], lo[..., 2]),
        vec3(up[..., 0], up[..., 1], lo[..., 2]),
        vec3(lo[..., 0], lo[..., 1], up[..., 2]),
        vec3(up[..., 0], lo[..., 1], up[..., 2]),
        vec3(lo[..., 0], up[..., 1], up[..., 2]),
        vec3(up[..., 0], up[..., 1], up[..., 2]),
    ], axis=-2)
    tc = xfm_point(a[..., None, :, :], corners)
    return jnp.min(tc, axis=-2), jnp.max(tc, axis=-2)


# ---------------------------------------------------------------------------
# Quaternions — (..., 4) arrays as (w, x, y, z)
# (reference common/math/quaternion.h; quaternion motion blur
#  kernels/common/motion_derivative.h)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype)


def quat_from_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, jnp.float32))
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_normalize(q):
    return q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1), 1e-20))[..., None]


def quat_slerp(q0, q1, t):
    """Spherical lerp with fallback to nlerp for nearly-parallel quats."""
    cosom = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cosom[..., None] < 0, -q1, q1)
    cosom = jnp.abs(cosom)
    om = jnp.arccos(jnp.clip(cosom, -1.0, 1.0))
    sinom = jnp.sin(om)
    near = sinom < 1e-4
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * om) / jnp.where(near, 1.0, sinom))
    w1 = jnp.where(near, t, jnp.sin(t * om) / jnp.where(near, 1.0, sinom))
    return quat_normalize(w0[..., None] * q0 + w1[..., None] * q1)


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# Quaternion decomposition for quaternion motion blur
# (reference include/embree4/rtcore_quaternion.h RTCQuaternionDecomposition)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuaternionDecomposition:
    """Transform = T * R(q) * S, interpolated component-wise for motion blur."""
    scale: jnp.ndarray        # (..., 3, 4) upper-triangular scale/shear+shift
    quat: jnp.ndarray         # (..., 4)
    translation: jnp.ndarray  # (..., 3)

    def tree_flatten(self):
        return (self.scale, self.quat, self.translation), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def to_affine(self):
        R = quat_to_matrix(quat_normalize(self.quat))
        S_lin, S_t = self.scale[..., :3], self.scale[..., 3]
        lin = R @ S_lin
        t = jnp.einsum('...ij,...j->...i', R, S_t, precision="highest") + self.translation
        return jnp.concatenate([lin, t[..., None]], axis=-1)


def qd_identity():
    return QuaternionDecomposition(affine_identity(), quat_identity(), jnp.zeros(3, jnp.float32))


def qd_interpolate(qd0: QuaternionDecomposition, qd1: QuaternionDecomposition, t):
    """Interpolate decomposed transforms: lerp scale/translation, slerp rotation."""
    t = jnp.asarray(t, jnp.float32)
    return QuaternionDecomposition(
        scale=qd0.scale * (1 - t) + qd1.scale * t,
        quat=quat_slerp(qd0.quat, qd1.quat, t),
        translation=qd0.translation * (1 - t) + qd1.translation * t,
    )


# ---------------------------------------------------------------------------
# Morton codes (for LBVH build; reference kernels/builders/bvh_builder_morton.h:108)
# ---------------------------------------------------------------------------

def _expand_bits_10(v):
    """Spread lower 10 bits of v to every 3rd bit (uint32)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_code(p_norm):
    """30-bit Morton code from points normalized to [0,1)^3."""
    q = jnp.clip(p_norm * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits_10(q[..., 0]) << 2) | (_expand_bits_10(q[..., 1]) << 1) | _expand_bits_10(q[..., 2])
