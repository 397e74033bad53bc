"""BVH container: a pytree of flat arrays (no pointers, no allocator).

Replaces the reference's pointer-based ``BVHN<N>`` + ``NodeRef`` tagged pointers +
``FastAllocator`` (kernels/bvh/bvh.h:42, bvh_node_ref.h, kernels/common/alloc.h:15)
with index-based flat arrays, the idiomatic TPU representation:

- ``node_lower/node_upper``: (n_nodes, W, 3) child AABBs in SoA form — the analog of
  AABBNode's per-child SoA bounds (bvh_node_aabb.h).
- ``node_child``: (n_nodes, W) int32 child refs. ref >= 0 → internal node index;
  ref < 0 → leaf: encodes (start, count) into the ``prim_order`` array;
  ref == INVALID_NODE → empty slot.
- ``prim_order``: (n_prims,) int32 permutation mapping leaf slots to primitive ids.

Leaf encoding mirrors NodeRef's tagged low bits, but in the sign/int domain:
``ref = -(start * MAX_LEAF_SIZE_FIELD + count)`` with count in [1, 15].
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

INVALID_NODE = np.int32(-0x7FFFFFFF)  # empty child slot sentinel (np:
#   jnp at module level would init the backend at import time)
LEAF_COUNT_BITS = 4
LEAF_COUNT_MASK = (1 << LEAF_COUNT_BITS) - 1  # max 15 prims per leaf


def encode_leaf(start, count):
    """Pack a leaf reference: negative int32 carrying (start, count)."""
    packed = (jnp.asarray(start, jnp.int32) << LEAF_COUNT_BITS) | jnp.asarray(count, jnp.int32)
    return -packed - 1


def decode_leaf(ref):
    packed = -(jnp.asarray(ref, jnp.int32) + 1)
    return packed >> LEAF_COUNT_BITS, packed & LEAF_COUNT_MASK


def is_leaf(ref):
    return (ref < 0) & (ref != INVALID_NODE)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BVH:
    """Width-W BVH over a primitive array. Node 0 is the root."""
    node_lower: jnp.ndarray  # (n_nodes, W, 3) float32
    node_upper: jnp.ndarray  # (n_nodes, W, 3) float32
    node_child: jnp.ndarray  # (n_nodes, W) int32
    prim_order: jnp.ndarray  # (n_prims,) int32

    def tree_flatten(self):
        return (self.node_lower, self.node_upper, self.node_child, self.prim_order), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def width(self):
        return self.node_child.shape[1]

    @property
    def n_nodes(self):
        return self.node_child.shape[0]

    @property
    def n_prims(self):
        return self.prim_order.shape[0]

    def bounds(self):
        """Scene bounds: union over the root's valid children."""
        valid = (self.node_child[0] != INVALID_NODE)[..., None]
        lo = jnp.min(jnp.where(valid, self.node_lower[0], jnp.inf), axis=0)
        up = jnp.max(jnp.where(valid, self.node_upper[0], -jnp.inf), axis=0)
        return lo, up


def sah_cost(bvh: BVH, trav_cost: float = 1.0, int_cost: float = 1.0):
    """SAH cost of the tree relative to root area (parity metric vs the
    reference's bvh_statistics.cpp). Pure reduction over the arrays."""
    from ..core.math import aabb_half_area

    valid = bvh.node_child != INVALID_NODE
    leaf = is_leaf(bvh.node_child)
    area = aabb_half_area(bvh.node_lower, bvh.node_upper)
    area = jnp.where(valid, area, 0.0)
    _, counts = decode_leaf(bvh.node_child)
    counts = jnp.where(leaf, counts, 0)

    root_lo, root_up = bvh.bounds()
    root_area = jnp.maximum(aabb_half_area(root_lo, root_up), 1e-30)
    cost_internal = trav_cost * jnp.sum(jnp.where(valid & ~leaf, area, 0.0))
    cost_leaf = int_cost * jnp.sum(area * counts)
    return (cost_internal + cost_leaf) / root_area
