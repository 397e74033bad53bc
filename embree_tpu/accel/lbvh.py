"""LBVH (Morton/radix-tree) builder — the LOW-quality / dynamic-scene build tier.

Behavior parity with the reference Morton builder
(kernels/builders/bvh_builder_morton.h:14, MortonCodeGenerator :108), redesigned as
a fully data-parallel, jittable pipeline (no task recursion, no allocator):

  1. centroid → 30-bit Morton code (quantized against the centroid bounds)
  2. radix sort == jax.lax.sort over (code, prim_id) pairs
  3. Karras-style parallel radix-tree construction: every internal node's range and
     split are found independently with branchless binary searches — O(n log n)
     vector work, no sequential recursion (T. Karras, HPG 2012, the standard
     GPU-parallel analog of the reference's top-down Morton recursion).
  4. bottom-up bounds refit by fixed-depth iteration (radix tree depth <= key bits).

Ties are broken by appending the primitive index to the key (conceptual 64-bit key),
exactly like the reference handles duplicate codes by splitting mid-range
(bvh_builder_morton.h recurse with equal codes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import morton_code
from .bvh import BVH, INVALID_NODE, encode_leaf

_KEY_BITS = 62  # 30 morton + 32 index


def _clz32(x):
    """Branchless count-leading-zeros for uint32 arrays."""
    x = x.astype(jnp.uint32)
    n = jnp.zeros(x.shape, jnp.int32)
    for shift, mask in ((16, jnp.uint32(0xFFFF0000)), (8, jnp.uint32(0xFF000000)),
                       (4, jnp.uint32(0xF0000000)), (2, jnp.uint32(0xC0000000)),
                       (1, jnp.uint32(0x80000000))):
        cond = (x & mask) == 0
        n = jnp.where(cond, n + shift, n)
        x = jnp.where(cond, x << shift, x)
    return jnp.where(x == 0, jnp.int32(32), n)


def build_lbvh(prim_lower, prim_upper):
    """Build a binary (W=2) LBVH over primitive AABBs.

    Args:
      prim_lower, prim_upper: (n, 3) float32 per-primitive bounds, n >= 1 (static).
    Returns:
      BVH with W=2, n-1 internal nodes (1 if n == 1), single-prim leaves.
    """
    n = prim_lower.shape[0]
    if n == 1:
        return BVH(
            node_lower=jnp.stack([prim_lower, prim_lower], 1),
            node_upper=jnp.stack([prim_upper, prim_upper], 1),
            node_child=jnp.array([[encode_leaf(0, 1), INVALID_NODE]], jnp.int32),
            prim_order=jnp.zeros((1,), jnp.int32),
        )

    centers = 0.5 * (prim_lower + prim_upper)
    cb_lo = jnp.min(centers, axis=0)
    cb_up = jnp.max(centers, axis=0)
    extent = jnp.maximum(cb_up - cb_lo, 1e-20)
    codes = morton_code((centers - cb_lo) / extent)  # (n,) uint32, 30 bits

    order = jnp.argsort(codes)
    codes = codes[order]
    prim_order = order.astype(jnp.int32)

    idx = jnp.arange(n, dtype=jnp.int32)

    def delta_adj(i, j):
        """Common-prefix length between sorted keys i and j (valid j assumed in range)."""
        ci, cj = codes[i], codes[j]
        d = _clz32(ci ^ cj)
        # tie-break: same morton code -> extend prefix with index bits
        tie = ci == cj
        d_idx = _clz32(i.astype(jnp.uint32) ^ j.astype(jnp.uint32))
        return jnp.where(tie, 32 + d_idx, d)

    def delta(i, j):
        valid = (j >= 0) & (j <= n - 1)
        jj = jnp.clip(j, 0, n - 1)
        return jnp.where(valid, delta_adj(i, jj), jnp.int32(-1))

    # --- determine per-internal-node ranges (Karras alg. 1, vectorized) ---
    i = idx[: n - 1]
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # upper bound for range length: doubling search
    lmax = jnp.full(n - 1, 2, jnp.int32)
    done = jnp.zeros(n - 1, bool)
    for _ in range(32):
        grow = (~done) & (delta(i, i + lmax * d) > delta_min)
        lmax = jnp.where(grow, lmax * 2, lmax)
        done = done | ~grow

    # binary search exact length
    l = jnp.zeros(n - 1, jnp.int32)
    t = lmax // 2
    for _ in range(32):
        cond = (t >= 1) & (delta(i, i + (l + t) * d) > delta_min)
        l = jnp.where(cond, l + t, l)
        t = t // 2
    j = i + l * d  # other end of the range

    # --- find split position (Karras alg. 2) ---
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)
    delta_node = delta(i, j)
    s = jnp.zeros(n - 1, jnp.int32)
    t = (l + 1) // 2  # ceil(l / 2)
    for _ in range(32):
        cond = (t >= 1) & (delta(i, i + (s + t) * d) > delta_node)
        s = jnp.where(cond, s + t, s)
        t = jnp.where(t > 1, (t + 1) // 2, 0)
    gamma = i + s * d + jnp.minimum(d, 0)

    # children: [first..gamma] and [gamma+1..last]
    left_is_leaf = first == gamma
    right_is_leaf = last == gamma + 1
    left = jnp.where(left_is_leaf, encode_leaf(gamma, 1), gamma)
    right = jnp.where(right_is_leaf, encode_leaf(gamma + 1, 1), gamma + 1)
    node_child = jnp.stack([left, right], axis=1)

    # --- bottom-up bounds: fixed-pass refit (depth <= key bits) ---
    leaf_lo = prim_lower[prim_order]
    leaf_up = prim_upper[prim_order]

    def child_bounds(ref, node_lo, node_up):
        leaf = ref < 0
        prim_i = jnp.where(leaf, -(ref + 1) >> 4, 0)
        node_i = jnp.where(leaf, 0, ref)
        lo = jnp.where(leaf[:, None], leaf_lo[prim_i], node_lo[node_i])
        up = jnp.where(leaf[:, None], leaf_up[prim_i], node_up[node_i])
        return lo, up

    def refit_pass(node_lo, node_up):
        # A node's aggregate bounds = union over its child slots (min/max over axis 1).
        agg_lo, agg_up = jnp.min(node_lo, 1), jnp.max(node_up, 1)
        l_lo, l_up = child_bounds(node_child[:, 0], agg_lo, agg_up)
        r_lo, r_up = child_bounds(node_child[:, 1], agg_lo, agg_up)
        return jnp.stack([l_lo, r_lo], 1), jnp.stack([l_up, r_up], 1)

    # Iterate to fixpoint; radix-tree depth <= _KEY_BITS bounds the pass count.
    def cond(state):
        changed, _, _, it = state
        return changed & (it < _KEY_BITS + 1)

    def body(state):
        _, node_lo, node_up, it = state
        new_lo, new_up = refit_pass(node_lo, node_up)
        changed = jnp.any(new_lo != node_lo) | jnp.any(new_up != node_up)
        return changed, new_lo, new_up, it + 1

    node_lo = jnp.zeros((n - 1, 2, 3), jnp.float32)
    node_up = jnp.zeros((n - 1, 2, 3), jnp.float32)
    _, node_lo, node_up, _ = jax.lax.while_loop(
        cond, body, (jnp.bool_(True), node_lo, node_up, jnp.int32(0)))

    return BVH(node_lower=node_lo, node_upper=node_up,
               node_child=node_child, prim_order=prim_order)
