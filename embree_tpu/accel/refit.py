"""BVH refit: bottom-up bounds refresh over existing topology.

Behavior parity with the reference refitter (kernels/bvh/bvh_refit.h:13-50
BVHNRefitter: leaf bounds recomputed, internal bounds propagated bottom-up) —
as a fixpoint of data-parallel passes over the flat arrays (the same pattern
as the builders' refit stage). Used by RTC_BUILD_QUALITY_REFIT dynamic scenes
(UpdateTest parity, verify.cpp:1835).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bvh import BVH, INVALID_NODE

_MAX_PASSES = 96


def refit_bvh(bvh: BVH, prim_lower, prim_upper) -> BVH:
    """Recompute node bounds for updated primitive bounds (same topology).

    prim_lower/upper are in ORIGINAL prim order; bvh.prim_order maps leaf
    slots to prims.
    """
    W = bvh.width
    child = bvh.node_child                       # (N, W)
    order = bvh.prim_order
    lo_sorted = prim_lower[order]
    up_sorted = prim_upper[order]
    n = order.shape[0]
    N = child.shape[0]

    is_leaf = (child < 0) & (child != INVALID_NODE)
    packed = jnp.where(is_leaf, -(child + 1), 0)
    start = packed >> 4
    count = packed & 0xF

    # static leaf-block bounds (depend only on prim data)
    leaf_lo = jnp.full((N, W, 3), jnp.inf)
    leaf_up = jnp.full((N, W, 3), -jnp.inf)
    for k in range(15):
        m = (k < count)[..., None]
        s = jnp.clip(start + k, 0, n - 1)
        leaf_lo = jnp.where(m & is_leaf[..., None],
                            jnp.minimum(leaf_lo, lo_sorted[s]), leaf_lo)
        leaf_up = jnp.where(m & is_leaf[..., None],
                            jnp.maximum(leaf_up, up_sorted[s]), leaf_up)

    is_int = child >= 0
    node_i = jnp.where(is_int, child, 0)

    def body(state):
        _, lo, up, it = state
        agg_lo = jnp.min(lo, axis=1)
        agg_up = jnp.max(up, axis=1)
        new_lo = jnp.where(is_int[..., None], agg_lo[node_i], leaf_lo)
        new_up = jnp.where(is_int[..., None], agg_up[node_i], leaf_up)
        changed = jnp.any(new_lo != lo) | jnp.any(new_up != up)
        return changed, new_lo, new_up, it + 1

    def cond(state):
        changed, _, _, it = state
        return changed & (it < _MAX_PASSES)

    lo0 = jnp.where(is_leaf[..., None], leaf_lo, jnp.inf)
    up0 = jnp.where(is_leaf[..., None], leaf_up, -jnp.inf)
    _, lo, up, _ = jax.lax.while_loop(cond, body, (jnp.bool_(True), lo0, up0, 0))

    return BVH(node_lower=lo, node_upper=up, node_child=child,
               prim_order=order)
