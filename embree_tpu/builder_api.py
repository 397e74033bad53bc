"""User-facing generic BVH build — the rtcBuildBVH analog.

Role parity with the builder C API (include/embree4/rtcore_builder.h:53-113,
kernels/common/rtcore_builder.cpp; demo tutorials/bvh_builder): the caller
supplies primitive bounds and callbacks and receives THEIR node structure
built over our internal builder. The reference drives callbacks from inside
its recursion; TPU-first we build the flat BVH8 with the production builders
(native binned-SAH / LBVH), then replay the finished topology depth-first
through the callbacks — same contract (create_node / set_node_children /
set_node_bounds / create_leaf), deterministic, and the internal build stays
fully parallel.

Also exposes walk_bvh for direct node access (the bvh_access tutorial role).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from .accel.bvh import BVH, INVALID_NODE, decode_leaf
from .scene import BuildQuality, LEAF_SIZE, _native_build_enabled


def _build_internal(lo, up, quality, leaf_size):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from .accel.sah import build_sah
    from .accel.lbvh import build_lbvh
    from .accel.collapse import collapse

    if _native_build_enabled(lo.shape[0]) and quality != BuildQuality.LOW:
        from .native import build_bvh8_native
        nl, nu, nc, order, cnt = build_bvh8_native(lo, up, leaf_size=leaf_size)
        return (BVH(node_lower=nl, node_upper=nu, node_child=nc,
                    prim_order=order), cnt)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if quality == BuildQuality.LOW:
            bvh2 = jax.jit(build_lbvh)(jnp.asarray(lo), jnp.asarray(up))
        else:
            bvh2 = jax.jit(partial(build_sah, leaf_size=leaf_size))(
                jnp.asarray(lo), jnp.asarray(up))
        bvh8, n_wide = jax.jit(partial(collapse, width=8))(bvh2)
    return jax.tree.map(np.asarray, bvh8), int(n_wide)


def build_bvh(bounds_lower, bounds_upper, *,
              create_node: Callable,
              set_node_children: Callable,
              set_node_bounds: Callable,
              create_leaf: Callable,
              prim_ids: Optional[Sequence[int]] = None,
              quality: int = BuildQuality.MEDIUM,
              leaf_size: int = 4):
    """Build a BVH over user primitives, materialized through user callbacks.

    Args (rtcore_builder.h:26-49 roles):
      bounds_lower/upper: (n, 3) primitive AABBs (RTCBuildPrimitive bounds).
      create_node(n_children) -> node object
      set_node_children(node, children_list)
      set_node_bounds(node, lower_list, upper_list)  # per child (3,) arrays
      create_leaf(prim_ids, lower, upper) -> leaf object
      prim_ids: optional user primID array (default arange).
      quality: BuildQuality.LOW (Morton) or MEDIUM/HIGH (binned SAH).
      leaf_size: max prims per leaf (<= 15; rtcore_builder.h:49 caps at 32).
    Returns the user root object.
    """
    lo = np.ascontiguousarray(bounds_lower, np.float32)
    up = np.ascontiguousarray(bounds_upper, np.float32)
    ids = (np.arange(lo.shape[0], dtype=np.int64) if prim_ids is None
           else np.asarray(prim_ids))
    bvh, n_wide = _build_internal(lo, up, quality, leaf_size)
    child = np.asarray(bvh.node_child)
    nlo = np.asarray(bvh.node_lower)
    nup = np.asarray(bvh.node_upper)
    order = np.asarray(bvh.prim_order)
    starts, counts = decode_leaf(child)
    starts = np.asarray(starts)
    counts = np.asarray(counts)

    def leaf_bounds(s, c):
        sel = order[s:s + c]
        return lo[sel].min(0), up[sel].max(0)

    def replay(node_id):
        ch = child[node_id]
        valid = ch != int(INVALID_NODE)
        kids, kl, ku = [], [], []
        for k in range(ch.shape[0]):
            if not valid[k]:
                continue
            if ch[k] < 0:
                s, c = int(starts[node_id, k]), int(counts[node_id, k])
                bl, bu = leaf_bounds(s, c)
                kids.append(create_leaf(ids[order[s:s + c]], bl, bu))
            else:
                kids.append(replay(int(ch[k])))
            kl.append(nlo[node_id, k].copy())
            ku.append(nup[node_id, k].copy())
        node = create_node(len(kids))
        set_node_children(node, kids)
        set_node_bounds(node, kl, ku)
        return node

    return replay(0)


def walk_bvh(bvh: BVH, visit_node: Callable, visit_leaf: Callable,
             node_id: int = 0, depth: int = 0):
    """Depth-first walk of a committed scene's internal BVH — the
    tutorials/bvh_access role (walking BVH4 nodes, bvh_access tutorial).

    visit_node(node_id, depth, child_lower (W,3), child_upper (W,3)) and
    visit_leaf(prim_ids, depth) are called per node / leaf."""
    child = np.asarray(bvh.node_child)
    nlo = np.asarray(bvh.node_lower)
    nup = np.asarray(bvh.node_upper)
    order = np.asarray(bvh.prim_order)
    starts, counts = decode_leaf(child)
    starts = np.asarray(starts)
    counts = np.asarray(counts)

    def rec(nid, depth):
        visit_node(nid, depth, nlo[nid], nup[nid])
        for k in range(child.shape[1]):
            c = child[nid, k]
            if c == int(INVALID_NODE):
                continue
            if c < 0:
                s, cnt = int(starts[nid, k]), int(counts[nid, k])
                visit_leaf(order[s:s + cnt], depth + 1)
            else:
                rec(int(c), depth + 1)

    rec(node_id, depth)
