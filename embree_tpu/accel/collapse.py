"""Binary BVH -> wide (BVH8) collapse.

Role parity with the reference's wide-BVH construction: Embree builds BVH4/BVH8
directly (kernels/bvh/bvh_builder_sah.cpp instantiations over N); we build a
binary tree with data-parallel passes (sah.py/lbvh.py) then collapse to width W
in a level-synchronous BFS — each wide node adopts the frontier obtained by
expanding its binary subtree log2(W) levels deep (leaf refs stop expansion).

Jittable, static shapes: per-level arrays padded to the worst-case wide-node
count; fixpoint iteration over levels in a lax.while_loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bvh import BVH, INVALID_NODE

_MAX_LEVELS = 24  # binary depth <= 62+16, wide depth <= ceil(that / log2(W)) + slack


def collapse(bvh: BVH, width: int = 8):
    """Collapse a W=2 BVH into a width-W BVH (W must be 4 or 8).

    Returns (wide_bvh, n_wide) — n_wide is the number of live wide nodes
    (a device scalar; bring to host before pack())."""
    assert bvh.width == 2 and width in (4, 8)
    depth = {4: 2, 8: 3}[width]
    N = bvh.n_nodes
    child2 = bvh.node_child      # (N, 2)
    lo2 = bvh.node_lower         # (N, 2, 3)
    up2 = bvh.node_upper

    # Max wide nodes is bounded by the number of binary internal nodes.
    M = N

    def expand(b):
        """Expand binary node b up to `depth` levels -> (refs[W], lo[W,3], up[W,3]).

        Elements are binary refs: >=0 internal binary node, <0 leaf ref,
        INVALID_NODE empty. b may be an array (vectorized over wide nodes).
        """
        # frontier of (ref, lo, up); start with b's two children
        refs = child2[b]                     # (..., 2)
        los = lo2[b]
        ups = up2[b]
        for _ in range(depth - 1):
            W_cur = refs.shape[-1]
            # expand each internal element into its two children
            is_int = refs >= 0
            safe = jnp.where(is_int, refs, 0)
            c = child2[safe]                 # (..., W_cur, 2)
            cl = lo2[safe]
            cu = up2[safe]
            # element i -> slots 2i, 2i+1 : expanded children if internal,
            # else [element, INVALID]
            keep_ref = jnp.stack([refs, jnp.full_like(refs, INVALID_NODE)], -1)
            keep_lo = jnp.stack([los, los], -2)
            keep_up = jnp.stack([ups, ups], -2)
            refs = jnp.where(is_int[..., None], c, keep_ref).reshape(
                refs.shape[:-1] + (2 * W_cur,))
            los = jnp.where(is_int[..., None, None], cl, keep_lo).reshape(
                los.shape[:-2] + (2 * W_cur, 3))
            ups = jnp.where(is_int[..., None, None], cu, keep_up).reshape(
                ups.shape[:-2] + (2 * W_cur, 3))
        return refs, los, ups

    # BFS state
    wide_root = jnp.full(M, -1, jnp.int32).at[0].set(0)   # wide id -> binary id
    n_wide = jnp.int32(1)
    frontier_start = jnp.int32(0)                          # wide ids in [start, n_wide) to expand
    out_child = jnp.full((M, width), INVALID_NODE, jnp.int32)
    out_lo = jnp.zeros((M, width, 3), jnp.float32)
    out_up = jnp.zeros((M, width, 3), jnp.float32)

    def cond(state):
        wide_root, n_wide, start, oc, ol, ou, it = state
        return (start < n_wide) & (it < _MAX_LEVELS)

    def body(state):
        wide_root, n_wide, start, oc, ol, ou, it = state
        wid = jnp.arange(M, dtype=jnp.int32)
        in_frontier = (wid >= start) & (wid < n_wide)
        b = jnp.where(in_frontier, wide_root[wid], 0)
        refs, los, ups = expand(b)                       # (M, W), (M, W, 3)
        refs = jnp.where(in_frontier[:, None], refs, INVALID_NODE)

        # allocate new wide ids for internal elements, in row-major order
        is_int = (refs >= 0)
        flat = is_int.reshape(-1)
        alloc_idx = jnp.cumsum(flat.astype(jnp.int32)) - flat.astype(jnp.int32)
        new_wide = (n_wide + alloc_idx).reshape(refs.shape)
        n_new = jnp.sum(flat.astype(jnp.int32))

        # wide child refs: internal -> new wide id; leaf/invalid passthrough
        child_ref = jnp.where(is_int, new_wide, refs)
        oc = jnp.where(in_frontier[:, None], child_ref, oc)
        ol = jnp.where(in_frontier[:, None, None], los, ol)
        ou = jnp.where(in_frontier[:, None, None], ups, ou)

        # record binary roots of new wide nodes (scatter, drop OOB)
        tgt = jnp.where(flat & (new_wide.reshape(-1) < M), new_wide.reshape(-1), M)
        wide_root = wide_root.at[tgt].set(refs.reshape(-1), mode="drop")

        return wide_root, n_wide + n_new, n_wide, oc, ol, ou, it + 1

    state = (wide_root, n_wide, frontier_start, out_child, out_lo, out_up, jnp.int32(0))
    wide_root, n_wide, _, out_child, out_lo, out_up, _ = jax.lax.while_loop(
        cond, body, state)

    return BVH(node_lower=out_lo, node_upper=out_up, node_child=out_child,
               prim_order=bvh.prim_order), n_wide
