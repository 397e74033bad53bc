"""Binned-SAH builder (MEDIUM quality tier) — bulk-synchronous, fully jittable.

Behavior parity with the reference's default builder
(kernels/builders/bvh_builder_sah.h:216 GeneralBVHBuilder::recurse,
heuristic_binning.h:210 bin accumulation, :339 sweep evaluation), redesigned as
data-parallel passes (SURVEY.md §7 "bulk-synchronous builders"):

  Phase 0: morton-sort primitives once (stable partitions below preserve order).
  Phase A: level-synchronous SAH splitting over a frontier of contiguous prim
    ranges ("segments"): per-level segmented binning (segment_sum/min/max keyed by
    (segment, bin)), SAH sweep via prefix scans over bins, stable in-segment
    partition via segmented cumsum — the vectorized analogs of BinInfo.bin /
    sweep 'best' / parallel_partition. Fallback median split when binning
    degenerates (all prims in one bin), mirroring the reference's fallback split.
  Phase B: one segmented Karras radix pass builds every remaining bottom subtree
    simultaneously (segment boundaries act as -1 prefixes, so each range yields an
    independent subtree rooted at its first internal index). Subtrees collapse to
    blocked leaves of <= leaf_size prims (the TriangleM block analog).

The result is a W=2 BVH in the same flat-array container as the LBVH; top-level
node bounds are exact (patched from segment bounds at split/finalize time), bottom
Karras nodes are refit to fixpoint.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.math import aabb_half_area, morton_code
from .bvh import BVH, INVALID_NODE, encode_leaf
from .lbvh import _clz32

_KEY_BITS = 62


def build_sah(prim_lower, prim_upper, *, leaf_size: int = 4, n_bins: int = 16,
              max_top_levels: int = 16, max_segments: int = 4096,
              freeze_below: int = 16):
    """Build a binned-SAH BVH over primitive AABBs. Returns a W=2 BVH.

    Args:
      leaf_size: max prims per (blocked) leaf, <= 15.
      n_bins: SAH bins per axis (reference default 32 capped; heuristic_binning.h:17).
      max_top_levels / max_segments: phase-A budget; below it the segmented radix
        pass finishes the tree.
      freeze_below: stop SAH-splitting segments at this size (handled by phase B).
    """
    n = prim_lower.shape[0]
    assert leaf_size <= 15
    if n == 1:
        return BVH(
            node_lower=jnp.stack([prim_lower, prim_lower], 1),
            node_upper=jnp.stack([prim_upper, prim_upper], 1),
            node_child=jnp.array([[encode_leaf(0, 1), INVALID_NODE]], jnp.int32),
            prim_order=jnp.zeros((1,), jnp.int32),
        )

    F = int(min(max_segments, max(2, n // max(freeze_below // 2, 1))))
    B = n_bins
    T = F + 1          # top node slots: 0 = pseudo-root, 1..F split nodes
    KARRAS_BASE = T    # karras internal node i -> global node id T + i

    # ---------------- phase 0: morton sort ----------------
    centers = 0.5 * (prim_lower + prim_upper)
    cb_lo = jnp.min(centers, axis=0)
    cb_up = jnp.max(centers, axis=0)
    codes = morton_code((centers - cb_lo) / jnp.maximum(cb_up - cb_lo, 1e-20))
    order = jnp.argsort(codes)
    codes = codes[order]
    prim_order = order.astype(jnp.int32)
    lo = prim_lower[order]
    up = prim_upper[order]

    # ---------------- phase A state ----------------
    seg_of_prim = jnp.zeros(n, jnp.int32)
    seg_start = jnp.zeros(F, jnp.int32)
    seg_count = jnp.zeros(F, jnp.int32).at[0].set(n)
    seg_parent = jnp.full(F, -1, jnp.int32).at[0].set(0)
    seg_side = jnp.zeros(F, jnp.int32)
    seg_alive = jnp.zeros(F, bool).at[0].set(True)   # exists (active or frozen)
    seg_alloc = jnp.int32(1)                          # segments allocated
    node_alloc = jnp.int32(1)                         # node slots allocated (0 = pseudo-root)

    node_child = jnp.full((T, 2), INVALID_NODE, jnp.int32)
    node_lower = jnp.zeros((T, 2, 3), jnp.float32)
    node_upper = jnp.zeros((T, 2, 3), jnp.float32)

    prim_pos = jnp.arange(n, dtype=jnp.int32)  # identity; prims are kept physically sorted

    def seg_reduce_bounds(seg_ids, lo, up, num):
        slo = jax.ops.segment_min(lo, seg_ids, num_segments=num)
        sup = jax.ops.segment_max(up, seg_ids, num_segments=num)
        return slo, sup

    state = dict(
        seg_of_prim=seg_of_prim, seg_start=seg_start, seg_count=seg_count,
        seg_parent=seg_parent, seg_side=seg_side, seg_alive=seg_alive,
        seg_alloc=seg_alloc, node_alloc=node_alloc,
        node_child=node_child, node_lower=node_lower, node_upper=node_upper,
        lo=lo, up=up, codes=codes, prim_order=prim_order,
    )

    if max_top_levels > 0:
        def level_cond(carry):
            st, level = carry
            progressed = (level == 0) | (st["last_splits"] > 0)
            return (level < max_top_levels) & progressed

        def level_body(carry):
            st, level = carry
            return (_sah_level(st, n=n, F=F, B=B, freeze_below=freeze_below,
                               leaf_size=leaf_size), level + 1)

        state["last_splits"] = jnp.int32(0)
        state, _ = jax.lax.while_loop(level_cond, level_body,
                                      (state, jnp.int32(0)))

    s = state
    lo, up, codes, prim_order = s["lo"], s["up"], s["codes"], s["prim_order"]
    seg_of_prim = s["seg_of_prim"]
    node_child, node_lower, node_upper = s["node_child"], s["node_lower"], s["node_upper"]

    # ---------------- phase B: segmented Karras over remaining segments ----------
    kchild, kvalid, kroot_of_seg, leafref_of_seg = _segmented_karras(
        codes, seg_of_prim, s["seg_start"], s["seg_count"], s["seg_alive"],
        F, KARRAS_BASE, leaf_size)

    # patch every live segment's subtree ref + bounds into its parent slot
    T = KARRAS_BASE
    seg_lo, seg_up = seg_reduce_bounds(seg_of_prim, lo, up, F)
    alive = s["seg_alive"]
    # dead segments scatter to an out-of-bounds slot -> dropped (mode="drop")
    parent = jnp.where(alive, s["seg_parent"], T)
    side = s["seg_side"]
    ref = jnp.where(leafref_of_seg != INVALID_NODE, leafref_of_seg, kroot_of_seg)
    node_child = node_child.at[parent, side].set(ref, mode="drop")
    node_lower = node_lower.at[parent, side].set(seg_lo, mode="drop")
    node_upper = node_upper.at[parent, side].set(seg_up, mode="drop")

    # ---------------- combine node arrays + refit karras portion ----------------
    all_child = jnp.concatenate([node_child, kchild], axis=0)

    all_lower, all_upper = _refit_karras(
        all_child, node_lower, node_upper, kchild, kvalid, lo, up, T, leaf_size)

    return BVH(node_lower=all_lower, node_upper=all_upper,
               node_child=all_child, prim_order=prim_order)


# =============================================================================
# phase A: one SAH level
# =============================================================================

def _sah_level(s, *, n, F, B, freeze_below, leaf_size):
    lo, up = s["lo"], s["up"]
    seg = s["seg_of_prim"]
    seg_start, seg_count = s["seg_start"], s["seg_count"]
    centers = 0.5 * (lo + up)

    # segment centroid bounds for binning
    c_lo = jax.ops.segment_min(centers, seg, num_segments=F)
    c_up = jax.ops.segment_max(centers, seg, num_segments=F)
    extent = jnp.maximum(c_up - c_lo, 1e-20)

    # per-prim bin index per axis (heuristic_binning.h BinMapping analog)
    relc = (centers - c_lo[seg]) / extent[seg]
    bins = jnp.clip((relc * B).astype(jnp.int32), 0, B - 1)  # (n, 3)

    active = s["seg_alive"] & (seg_count > freeze_below) & (s["seg_alloc"] < F)

    best_axis = jnp.zeros(F, jnp.int32)
    best_k = jnp.zeros(F, jnp.int32)
    best_cost = jnp.full(F, jnp.inf)
    best_valid = jnp.zeros(F, bool)
    nleft_of = jnp.zeros(F, jnp.int32)
    lbounds_lo = jnp.zeros((F, 3), jnp.float32)
    lbounds_up = jnp.zeros((F, 3), jnp.float32)
    rbounds_lo = jnp.zeros((F, 3), jnp.float32)
    rbounds_up = jnp.zeros((F, 3), jnp.float32)

    for axis in range(3):
        key = seg * B + bins[:, axis]
        cnt = jax.ops.segment_sum(jnp.ones(n, jnp.int32), key,
                                  num_segments=F * B).reshape(F, B)
        blo = jax.ops.segment_min(lo, key, num_segments=F * B).reshape(F, B, 3)
        bup = jax.ops.segment_max(up, key, num_segments=F * B).reshape(F, B, 3)

        # sweep: left prefix / right suffix (heuristic_binning.h:339 'best')
        cntL = jnp.cumsum(cnt, axis=1)
        loL = jax.lax.cummin(blo, axis=1)
        upL = jax.lax.cummax(bup, axis=1)
        cntR = jnp.cumsum(cnt[:, ::-1], axis=1)[:, ::-1]
        loR = jax.lax.cummin(blo[:, ::-1], axis=1)[:, ::-1]
        upR = jax.lax.cummax(bup[:, ::-1], axis=1)[:, ::-1]

        # split after bin k: left = bins [0..k], right = [k+1..B-1]
        aL = aabb_half_area(loL[:, :-1], upL[:, :-1])
        aR = aabb_half_area(loR[:, 1:], upR[:, 1:])
        nL = cntL[:, :-1]
        nR = cntR[:, 1:]
        cost = jnp.where((nL > 0) & (nR > 0),
                         aL * nL + aR * nR, jnp.inf)  # (F, B-1)
        k = jnp.argmin(cost, axis=1)
        ck = jnp.take_along_axis(cost, k[:, None], axis=1)[:, 0]
        improve = ck < best_cost
        best_cost = jnp.where(improve, ck, best_cost)
        best_axis = jnp.where(improve, axis, best_axis)
        best_k = jnp.where(improve, k, best_k)
        best_valid = best_valid | (improve & jnp.isfinite(ck))
        nleft_of = jnp.where(improve, jnp.take_along_axis(nL, k[:, None], 1)[:, 0],
                             nleft_of)
        lbounds_lo = jnp.where(improve[:, None],
                               jnp.take_along_axis(loL[:, :-1], k[:, None, None], 1)[:, 0],
                               lbounds_lo)
        lbounds_up = jnp.where(improve[:, None],
                               jnp.take_along_axis(upL[:, :-1], k[:, None, None], 1)[:, 0],
                               lbounds_up)
        rbounds_lo = jnp.where(improve[:, None],
                               jnp.take_along_axis(loR[:, 1:], k[:, None, None], 1)[:, 0],
                               rbounds_lo)
        rbounds_up = jnp.where(improve[:, None],
                               jnp.take_along_axis(upR[:, 1:], k[:, None, None], 1)[:, 0],
                               rbounds_up)

    # fallback median split for degenerate binning (bvh_builder_sah fallback)
    use_median = active & ~best_valid
    do_split = active

    # allocate node slots + new (right) segment ids; cap at capacity — capped
    # segments freeze and are finished by phase B
    split_idx = jnp.cumsum(do_split.astype(jnp.int32)) - do_split.astype(jnp.int32)
    new_node = s["node_alloc"] + split_idx
    new_seg = s["seg_alloc"] + split_idx
    can = do_split & (new_seg < F) & (new_node < s["node_child"].shape[0])
    n_splits = jnp.sum(can.astype(jnp.int32))

    # per-prim left/right decision
    prim_active = can[seg]
    axis_p = best_axis[seg]
    bin_on_axis = jnp.take_along_axis(bins, axis_p[:, None], axis=1)[:, 0]
    go_left_sah = bin_on_axis <= best_k[seg]

    # segmented cumsum by contiguity: position within segment
    pos_in_seg = jnp.arange(n, dtype=jnp.int32) - seg_start[seg]
    go_left_median = pos_in_seg < (seg_count[seg] // 2)
    go_left = jnp.where(use_median[seg], go_left_median, go_left_sah)
    nleft = jnp.where(use_median, seg_count // 2, nleft_of)

    # stable in-segment partition via segmented exclusive cumsums
    flags = go_left.astype(jnp.int32)
    cum_all = jnp.cumsum(flags)
    seg_base = cum_all[seg_start] - flags[seg_start]  # inclusive-sum before segment
    excl_left = (cum_all - flags) - seg_base[seg]
    flags_r = 1 - flags
    cum_all_r = jnp.cumsum(flags_r)
    seg_base_r = cum_all_r[seg_start] - flags_r[seg_start]
    excl_right = (cum_all_r - flags_r) - seg_base_r[seg]

    new_pos = seg_start[seg] + jnp.where(go_left, excl_left, nleft[seg] + excl_right)
    new_pos = jnp.where(prim_active, new_pos, jnp.arange(n, dtype=jnp.int32))

    def permute(arr):
        return jnp.zeros_like(arr).at[new_pos].set(arr)

    lo = permute(lo)
    up = permute(up)
    codes = jnp.zeros_like(s["codes"]).at[new_pos].set(s["codes"])
    prim_order = jnp.zeros_like(s["prim_order"]).at[new_pos].set(s["prim_order"])

    # patch parent slots: parent's child (side) <- new node; bounds <- current
    # (pre-split) segment bounds — exact subtree bounds from here on.
    slo = jax.ops.segment_min(s["lo"], seg, num_segments=F)
    sup = jax.ops.segment_max(s["up"], seg, num_segments=F)

    T = s["node_child"].shape[0]
    parent = jnp.where(can, s["seg_parent"], T)  # OOB when not splitting -> dropped
    side = s["seg_side"]
    node_child = s["node_child"].at[parent, side].set(new_node, mode="drop")
    node_lower = s["node_lower"].at[parent, side].set(slo, mode="drop")
    node_upper = s["node_upper"].at[parent, side].set(sup, mode="drop")

    # update segment records: left keeps id, right = new id
    tgt = jnp.where(can, new_seg, F)  # OOB when not splitting -> dropped
    iarange = jnp.arange(F)
    left_i = jnp.where(can, iarange, F)
    seg_start_new = s["seg_start"].at[tgt].set(seg_start + nleft, mode="drop")
    seg_count_new = s["seg_count"].at[tgt].set(seg_count - nleft, mode="drop")
    seg_count_new = seg_count_new.at[left_i].set(nleft, mode="drop")
    seg_parent_new = s["seg_parent"].at[tgt].set(new_node, mode="drop")
    seg_parent_new = seg_parent_new.at[left_i].set(new_node, mode="drop")
    seg_side_new = s["seg_side"].at[tgt].set(1, mode="drop")
    seg_side_new = seg_side_new.at[left_i].set(0, mode="drop")
    seg_alive_new = s["seg_alive"].at[tgt].set(True, mode="drop")

    # prims moving right get the new segment id
    seg_of_prim = jnp.where(prim_active & ~go_left, new_seg[seg], seg)
    # note: seg unchanged for left prims; positions permuted
    seg_of_prim = jnp.zeros_like(seg_of_prim).at[new_pos].set(seg_of_prim)

    return dict(
        seg_of_prim=seg_of_prim, seg_start=seg_start_new, seg_count=seg_count_new,
        seg_parent=seg_parent_new, seg_side=seg_side_new, seg_alive=seg_alive_new,
        seg_alloc=s["seg_alloc"] + n_splits, node_alloc=s["node_alloc"] + n_splits,
        node_child=node_child, node_lower=node_lower, node_upper=node_upper,
        lo=lo, up=up, codes=codes, prim_order=prim_order,
        last_splits=n_splits,
    )


# =============================================================================
# phase B: segmented Karras radix pass + blocked-leaf collapse
# =============================================================================

def _segmented_karras(codes, seg_of_prim, seg_start, seg_count, seg_alive,
                      F, base, leaf_size):
    """Build all bottom subtrees at once. Returns:
      kchild: (n-1, 2) child refs (global node ids / leaf refs / INVALID)
      kvalid: (n-1,) whether the karras node exists
      kroot_of_seg: (F,) global node id of each segment's subtree root (or INVALID)
      leafref_of_seg: (F,) leaf ref when the whole segment fits one leaf (else INVALID)
    """
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def delta_adj(i, j):
        ci, cj = codes[i], codes[j]
        d = _clz32(ci ^ cj)
        tie = ci == cj
        d_idx = _clz32(i.astype(jnp.uint32) ^ j.astype(jnp.uint32))
        same_seg = seg_of_prim[i] == seg_of_prim[j]
        return jnp.where(same_seg, jnp.where(tie, 32 + d_idx, d), jnp.int32(-1))

    def delta(i, j):
        ok = (j >= 0) & (j <= n - 1)
        jj = jnp.clip(j, 0, n - 1)
        return jnp.where(ok, delta_adj(i, jj), jnp.int32(-1))

    i = idx[: n - 1]
    kvalid = seg_of_prim[i] == seg_of_prim[jnp.minimum(i + 1, n - 1)]
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    def grow_body(_, carry):
        lmax, done = carry
        grow = (~done) & (delta(i, i + lmax * d) > delta_min)
        return jnp.where(grow, lmax * 2, lmax), done | ~grow

    lmax, _ = jax.lax.fori_loop(
        0, 32, grow_body,
        (jnp.full(n - 1, 2, jnp.int32), jnp.zeros(n - 1, bool)))

    def len_body(_, carry):
        l, t = carry
        take = (t >= 1) & (delta(i, i + (l + t) * d) > delta_min)
        return jnp.where(take, l + t, l), t // 2

    l, _ = jax.lax.fori_loop(
        0, 32, len_body, (jnp.zeros(n - 1, jnp.int32), lmax // 2))
    j = i + l * d
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    delta_node = delta(i, j)

    def split_body(_, carry):
        ss, t = carry
        take = (t >= 1) & (delta(i, i + (ss + t) * d) > delta_node)
        return (jnp.where(take, ss + t, ss),
                jnp.where(t > 1, (t + 1) // 2, 0))

    ss, _ = jax.lax.fori_loop(
        0, 32, split_body, (jnp.zeros(n - 1, jnp.int32), (l + 1) // 2))
    gamma = i + ss * d + jnp.minimum(d, 0)

    # child refs with blocked-leaf collapse: a child covering <= leaf_size prims
    # becomes a leaf ref over its contiguous range.
    lsize = gamma - first + 1
    rsize = last - gamma
    left = jnp.where(lsize <= leaf_size,
                     encode_leaf(first, lsize), base + gamma)
    right = jnp.where(rsize <= leaf_size,
                      encode_leaf(gamma + 1, rsize), base + gamma + 1)
    kchild = jnp.stack([jnp.where(kvalid, left, INVALID_NODE),
                        jnp.where(kvalid, right, INVALID_NODE)], axis=1)

    # a karras node is 'real' only if its own range size > leaf_size
    size = last - first + 1
    kreal = kvalid & (size > leaf_size)
    kchild = jnp.where(kreal[:, None], kchild, INVALID_NODE)

    # segment roots
    a = seg_start
    root_id = base + jnp.clip(a, 0, n - 2)
    kroot_of_seg = jnp.where(seg_alive & (seg_count > leaf_size),
                             root_id, INVALID_NODE)
    leafref_of_seg = jnp.where(
        seg_alive & (seg_count <= leaf_size) & (seg_count > 0),
        encode_leaf(seg_start, seg_count), INVALID_NODE)
    return kchild, kreal, kroot_of_seg, leafref_of_seg


def _refit_karras(all_child, top_lower, top_upper, kchild, kreal, lo, up,
                  T, leaf_size):
    """Bottom-up bounds for the karras portion; top bounds are already exact."""
    n = lo.shape[0]
    nk = kchild.shape[0]

    # prefix-windowed leaf-block bounds
    def leaf_block_bounds(start, count):
        blo = jnp.full((start.shape[0], 3), jnp.inf)
        bup = jnp.full((start.shape[0], 3), -jnp.inf)
        for k in range(leaf_size):
            m = (k < count)[:, None]
            s = jnp.clip(start + k, 0, n - 1)
            blo = jnp.where(m, jnp.minimum(blo, lo[s]), blo)
            bup = jnp.where(m, jnp.maximum(bup, up[s]), bup)
        return blo, bup

    def child_bounds(ref, agg_lo, agg_up):
        leaf = (ref < 0) & (ref != INVALID_NODE)
        packed = jnp.where(leaf, -(ref + 1), 0)
        start = packed >> 4
        count = packed & 0xF
        l_lo, l_up = leaf_block_bounds(start, count)
        node_i = jnp.clip(jnp.where(ref >= 0, ref - T, 0), 0, nk - 1)
        blo = jnp.where(leaf[:, None], l_lo, agg_lo[node_i])
        bup = jnp.where(leaf[:, None], l_up, agg_up[node_i])
        empty = ref == INVALID_NODE
        blo = jnp.where(empty[:, None], jnp.inf, blo)
        bup = jnp.where(empty[:, None], -jnp.inf, bup)
        return blo, bup

    def body(state):
        _, klo, kup, it = state
        agg_lo = jnp.min(klo, axis=1)
        agg_up = jnp.max(kup, axis=1)
        l_lo, l_up = child_bounds(kchild[:, 0], agg_lo, agg_up)
        r_lo, r_up = child_bounds(kchild[:, 1], agg_lo, agg_up)
        new_lo = jnp.stack([l_lo, r_lo], 1)
        new_up = jnp.stack([l_up, r_up], 1)
        changed = jnp.any(new_lo != klo) | jnp.any(new_up != kup)
        return changed, new_lo, new_up, it + 1

    def cond(state):
        changed, _, _, it = state
        return changed & (it < _KEY_BITS + 2)

    klo = jnp.zeros((nk, 2, 3), jnp.float32)
    kup = jnp.zeros((nk, 2, 3), jnp.float32)
    _, klo, kup, _ = jax.lax.while_loop(cond, body, (jnp.bool_(True), klo, kup, 0))

    all_lower = jnp.concatenate([top_lower, klo], axis=0)
    all_upper = jnp.concatenate([top_upper, kup], axis=0)
    return all_lower, all_upper
