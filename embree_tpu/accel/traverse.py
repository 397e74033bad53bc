"""BVH traversal — vectorized wavefront-style, all rays step in lockstep.

Role parity with the reference's traversal stack machines
(kernels/bvh/bvh_intersector1.cpp:31-115 single-ray ordered traversal,
bvh_traverser1.h:58 distance-sorted push, node_intersector1.h:426 N-wide slab
test), redesigned for TPU SIMD rigidity:

- No per-ray control flow. Every ray in the batch executes the same step each
  iteration of one lax.while_loop: pop/descend + slab-test all W children +
  leaf primitive test, selected per-lane with masks. XLA maps the per-ray math
  onto the VPU across the ray batch (the analog of Embree's ray packets, but the
  packet is the whole batch).
- Per-ray traversal stacks live in a (R, STACK_DEPTH) array; pushes are batched
  scatters. STACK_DEPTH mirrors the reference's stack sizing
  (bvh_intersector1.h:26: 1 + (N-1)*BVH::maxDepth).
- Hits track only (tfar, best_prim); u/v/Ng are reconstructed after traversal by
  re-intersecting the single winning primitive per ray — cheaper than carrying
  full hit state through the loop.
- Ordered descent: children sorted by entry distance (the sorting-network analog),
  so nearer subtrees shrink tfar before farther ones are visited.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

from ..core.math import rcp_safe
from .bvh import BVH, INVALID_NODE, LEAF_COUNT_BITS

STACK_DEPTH = 64


# robust-mode slab widening factors (node_intersector1.h:106-110: near/far
# reciprocal directions scaled by 1 -/+ 3 ulp so conservative rounding can
# never miss a box the exact test would hit)
ROUND_DOWN = np.float32(1.0 - 3.0 * 1.19209290e-07)
ROUND_UP = np.float32(1.0 + 3.0 * 1.19209290e-07)


def slab_test(node_lo, node_up, org, rdir, tnear, tfar, robust: bool = False):
    """Ray/AABB slab test over a trailing child axis.

    Args:
      node_lo, node_up: (..., W, 3)
      org, rdir: (..., 3); tnear, tfar: (...,)
      robust: widen the slab interval by ±3 ulp (RTC_SCENE_FLAG_ROBUST).
    Returns:
      (hit, t_entry): (..., W) bool / float32.
    """
    t0 = (node_lo - org[..., None, :]) * rdir[..., None, :]
    t1 = (node_up - org[..., None, :]) * rdir[..., None, :]
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    if robust:
        tmin = tmin * ROUND_DOWN
        tmax = tmax * ROUND_UP
    t_entry = jnp.maximum(jnp.max(tmin, axis=-1), tnear[..., None])
    t_exit = jnp.minimum(jnp.min(tmax, axis=-1), tfar[..., None])
    return t_entry <= t_exit, t_entry


class TraversalResult(NamedTuple):
    tfar: jnp.ndarray       # (R,) updated hit distance (inf if miss for closest-hit)
    best_prim: jnp.ndarray  # (R,) int32 global prim index into prim_order target, -1 if miss
    steps: jnp.ndarray      # () int32 — iteration count (observability; cf. stat.h counters)
    overflow: jnp.ndarray = 0  # () dropped stack pushes (must be 0; the
    # reference instead sizes stacks from an enforced max depth, bvh.h:71)


def _pop(stack, sp, active):
    """Vectorized stack pop; rays with empty stacks become inactive."""
    has = sp > 0
    new_sp = jnp.where(has, sp - 1, sp)
    r = jnp.arange(sp.shape[0])
    top = stack[r, jnp.maximum(new_sp, 0)]
    cur = jnp.where(has, top, INVALID_NODE)
    return cur, new_sp, active & has


def traverse(
    bvh: BVH,
    prim_test: Callable,
    org: jnp.ndarray,
    dir: jnp.ndarray,
    tnear: jnp.ndarray,
    tfar: jnp.ndarray,
    occlusion: bool = False,
    max_leaf_size: int = 1,
    robust: bool = False,
    leaf_obb=None,
) -> TraversalResult:
    """Find closest (or any, if occlusion) primitive hit along each ray.

    Args:
      prim_test: callable (prim_ids[R], valid[R], org, dir, tnear, tfar) ->
        (hit[R] bool, t[R]) testing one primitive per ray.
      max_leaf_size: static upper bound of prims per leaf (loop unroll factor).
      leaf_obb: optional (rot, lo, up) strand-aligned leaf bounds indexed by
        leaf start slot (accel/obb.py, the hair-tier OBB analog of
        bvh_node_obb.h). Leaf children additionally slab-test in their local
        frame at push time, culling pops/prim tests a loose AABB lets through.
    """
    R = org.shape[0]
    W = bvh.width
    rdir = rcp_safe(dir)
    ray_idx = jnp.arange(R)

    # Per-ray state
    cur0 = jnp.zeros(R, jnp.int32)  # root node
    stack0 = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    sp0 = jnp.zeros(R, jnp.int32)
    active0 = jnp.ones(R, bool)
    best0 = jnp.full(R, -1, jnp.int32)

    def cond(state):
        active, *_ = state
        return jnp.any(active)

    def body(state):
        active, cur, stack, sp, t_far, best, steps, ovf = state

        is_node = active & (cur >= 0)
        is_leaf = active & (cur < 0) & (cur != INVALID_NODE)

        # ---- internal node step: W-wide slab test + ordered push ----
        node = jnp.where(is_node, cur, 0)
        child = bvh.node_child[node]                      # (R, W)
        c_lo = bvh.node_lower[node]                       # (R, W, 3)
        c_up = bvh.node_upper[node]
        hit, t_entry = slab_test(c_lo, c_up, org, rdir, tnear, t_far,
                                 robust=robust)
        hit = hit & (child != INVALID_NODE) & is_node[:, None]

        if leaf_obb is not None:
            # hair-tier refinement: children that are leaves re-test in
            # their strand-aligned frame (rot rows = local axes); non-leaf
            # slots fetch the pass-through infinite box at slot 0's table
            # entry via clamping — their mask keeps the AABB verdict.
            obb_rot, obb_lo, obb_up = leaf_obb
            child_leaf = (child < 0) & (child != INVALID_NODE)
            start_c = jnp.where(child_leaf,
                                (-(child + 1)) >> LEAF_COUNT_BITS, 0)
            cr = obb_rot[start_c]                        # (R, W, 3, 3)
            clo = obb_lo[start_c]                        # (R, W, 3)
            cup = obb_up[start_c]
            org_l = jnp.einsum("rwij,rj->rwi", cr, org)
            dir_l = jnp.einsum("rwij,rj->rwi", cr, dir)
            rdir_l = rcp_safe(dir_l)
            o0 = (clo - org_l) * rdir_l
            o1 = (cup - org_l) * rdir_l
            omin = jnp.minimum(o0, o1)
            omax = jnp.maximum(o0, o1)
            if robust:
                omin = omin * ROUND_DOWN
                omax = omax * ROUND_UP
            oin = jnp.maximum(jnp.max(omin, axis=-1), tnear[:, None])
            oout = jnp.minimum(jnp.min(omax, axis=-1), t_far[:, None])
            hit = hit & (~child_leaf | (oin <= oout))

        dist = jnp.where(hit, t_entry, jnp.inf)

        # sort children by entry distance (ascending); misses to the back
        sort_idx = jnp.argsort(dist, axis=-1)
        child_sorted = jnp.take_along_axis(child, sort_idx, axis=-1)
        hit_sorted = jnp.take_along_axis(hit, sort_idx, axis=-1)
        num_hits = jnp.sum(hit, axis=-1)

        # push far children (indices W-1 .. 1) onto the stack
        new_stack, new_sp = stack, sp
        dropped = jnp.int32(0)
        for k in range(W - 1, 0, -1):
            want_push = is_node & hit_sorted[:, k]
            do_push = want_push & (new_sp < STACK_DEPTH)
            dropped += jnp.sum((want_push & ~do_push).astype(jnp.int32))
            slot = jnp.where(do_push, new_sp, 0)
            val = jnp.where(do_push, child_sorted[:, k], new_stack[ray_idx, slot])
            new_stack = new_stack.at[ray_idx, slot].set(val)
            new_sp = jnp.where(do_push, new_sp + 1, new_sp)

        node_next = jnp.where(num_hits > 0, child_sorted[:, 0], INVALID_NODE)

        # ---- leaf step: test up to max_leaf_size prims ----
        packed = jnp.where(is_leaf, -(cur + 1), 0)
        start = packed >> 4
        count = packed & 0xF
        leaf_tfar = t_far
        leaf_best = best
        for k in range(max_leaf_size):
            valid = is_leaf & (k < count)
            slot = jnp.clip(start + k, 0, bvh.n_prims - 1)
            prim = bvh.prim_order[slot]
            p_hit, p_t = prim_test(prim, valid, org, dir, tnear, leaf_tfar)
            p_hit = p_hit & valid
            # deterministic tie-break: on exactly equal t keep the LOWER prim
            # id (segments sharing an endpoint produce bit-identical cap hits;
            # the reference's M-wide select keeps the lowest leaf slot)
            better = p_hit & ((p_t < leaf_tfar) | (leaf_best < 0)
                              | ((p_t == leaf_tfar) & (prim < leaf_best)))
            leaf_tfar = jnp.where(better, p_t, leaf_tfar)
            leaf_best = jnp.where(better, prim, leaf_best)

        t_far = jnp.where(is_leaf, leaf_tfar, t_far)
        best = jnp.where(is_leaf, leaf_best, best)

        # ---- advance: node rays descend or pop; leaf rays pop ----
        need_pop = (is_leaf | (is_node & (num_hits == 0)))
        pop_cur, pop_sp, pop_active = _pop(new_stack, new_sp, active)
        cur = jnp.where(need_pop, pop_cur, jnp.where(is_node, node_next, cur))
        sp = jnp.where(need_pop, pop_sp, new_sp)
        active = jnp.where(need_pop, pop_active, active)

        if occlusion:
            # any-hit: a ray with a recorded hit is done
            active = active & (best < 0)

        return active, cur, new_stack, sp, t_far, best, steps + 1, ovf + dropped

    state = (active0, cur0, stack0, sp0, tfar, best0, jnp.int32(0),
             jnp.int32(0))
    (_, _, _, _, t_out, best_out, steps, ovf) = jax.lax.while_loop(
        cond, body, state)
    return TraversalResult(tfar=t_out, best_prim=best_out, steps=steps,
                           overflow=ovf)
