"""Pack a BVH8 + triangle SoA into the two record tables the Pallas
traversal kernel consumes.

Layout rationale (TPU-first): the kernel fetches one record per ray per step
with a lane-dimension dynamic gather (tpu.dynamic_gather along lanes), so
records live along LANES (128 per tile) and record features along SUBLANES.
Record features are grouped in 8-ROW REGISTER-ALIGNED fields so the
tile-parallel kernel (traverse_pallas.py) can consume each field as a whole
(UGRP*8, 128) register block with zero sub-register slicing. Lane gathers
move one (8,128) register per op, so records are kept SMALL: internal nodes
store child bounds as conservatively-rounded bfloat16 PAIRS (two bounds per
int32 row) — the TPU analog of Embree's QuantizedNode
(kernels/bvh/bvh_node_qaabb.h). Leaf triangles stay exact f32 (watertightness
lives in the leaf test, the node test only needs to be conservative).

Internal record (node_table, int32, 32 rows = 4 gather chunks):
  row 0..7     : child refs (>=0: node record id; <0: leaf record ref
                 = -(leaf id)-1; INVALID_REC: empty slot)
  row 8+8d+c   : dim d (x,y,z) of child c: lo as the LOW 16 bits (bf16
                 pattern, decode = bits<<16), hi as the HIGH 16 bits
                 (decode = bits & 0xFFFF0000); lo rounded toward -inf, hi
                 toward +inf (boxes only grow). Row index == child slot, so
                 the fetched (8,128) register needs NO sublane expansion
                 gather in the kernel — decode is two shifts + bitcasts.

Leaf record (leaf_table, float32, 8 triangles per leaf, LEAF_WIDTH == the
node branching factor so leaf tests ride the same (8*U,128) register layout
as the node slab test; TriangleM precomputed-edge analog,
kernels/geometry/triangle.h:14):
  rows 0..7   : v0.x (triangle slot s = row s)     8..15  : v0.y
  rows 16..23 : v0.z     24..31: e1.x    32..39: e1.y    40..47: e1.z
  rows 48..55 : e2.x     56..63: e2.y    64..71: e2.z
  [rows 72..79: geometry mask (int32 bitcast) — ONLY when the scene uses
   non-default masks (has_mask); mask-free scenes save the fetch chunk.
   The static specialization is the RTCFeatureFlags analog.]
Empty slots are all-zero v0/e1/e2: det == 0 so they can never report a hit,
which removes the need for count/valid rows entirely. Triangle identity is
IMPLICIT: hit slot s of leaf record r encodes to 8*r + s, mapped back to the
original primitive id through pid_map (one XLA gather after traversal).

Record 0 of node_table is the root. Table shapes: (G, rows, 128).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH, INVALID_NODE, decode_leaf, is_leaf

INVALID_REC = np.int32(0x40000000)  # empty child slot in packed records
NODE_ROWS = 32
LEAF_WIDTH = 8               # triangles per leaf record (== node width)
LEAF_ROWS_NOMASK = 72
LEAF_ROWS_MASK = 80
LANE = 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedScene:
    """Device-resident packed traversable for the Pallas kernel."""
    node_table: jnp.ndarray    # (GN, 32, 128) int32
    leaf_table: jnp.ndarray    # (GL, 72|80, 128) float32
    pid_map: jnp.ndarray       # (GL*128*8,) int32: slot -> original prim id
    has_mask: bool = False     # static: leaf records carry a mask chunk

    def tree_flatten(self):
        return ((self.node_table, self.leaf_table, self.pid_map),
                (self.has_mask,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    @property
    def n_node_tiles(self):
        return self.node_table.shape[0]

    @property
    def n_leaf_tiles(self):
        return self.leaf_table.shape[0]

    @property
    def n_tiles(self):
        return self.node_table.shape[0] + self.leaf_table.shape[0]


def _f32_bits(x_int):
    return jax.lax.bitcast_convert_type(x_int.astype(jnp.int32), jnp.float32)


def _bf16_bits_dir(x, toward_pos: bool):
    """Top-16 float bits of x rounded toward +inf (toward_pos) or -inf.

    Truncating the low 16 mantissa bits rounds toward zero; when that moves
    the value the wrong way, bump the magnitude by one bf16 ulp (int bits
    + 0x10000 — exponent carries work out in ieee bit order)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    frac = (b & 0xFFFF) != 0
    t = b & ~jnp.int32(0xFFFF)
    neg = b < 0
    # truncation rounds toward zero: wrong direction for positives when
    # rounding up and for negatives when rounding down -> bump magnitude
    bump = frac & (neg != toward_pos)
    t = jnp.where(bump, t + jnp.int32(0x10000), t)
    return (t >> 16) & 0xFFFF


def pack(bvh8: BVH, n_wide: int, tri_v0, tri_v1, tri_v2, geom_mask_per_prim,
         leaf_size: int = LEAF_WIDTH, has_mask: bool = True) -> PackedScene:
    """Pack the first n_wide wide nodes + their leaves into record tables.

    n_wide must be a host int (concrete); shapes derived from it are static.
    has_mask must be a host bool (static kernel specialization).
    """
    assert bvh8.width == 8
    assert leaf_size <= LEAF_WIDTH
    W = 8
    child = bvh8.node_child[:n_wide]          # (n_wide, 8)
    lo = bvh8.node_lower[:n_wide]             # (n_wide, 8, 3)
    up = bvh8.node_upper[:n_wide]

    # --- record numbering: leaf records ordered by (node, slot), which keeps
    # sibling leaves adjacent for coherent ray blocks ---
    leaf_mask2 = np.asarray(is_leaf(child))                      # (n_wide, 8)
    leaf_mask = leaf_mask2.reshape(-1)
    n_leaf = int(leaf_mask.sum())
    leaf_ids_flat = np.cumsum(leaf_mask) - leaf_mask

    # child refs in packed encoding
    flat_child = np.asarray(child).reshape(-1)
    packed_ref = np.where(
        flat_child == int(INVALID_NODE), INVALID_REC,
        np.where(leaf_mask, -leaf_ids_flat - 1, flat_child)).astype(np.int32)
    packed_ref = jnp.asarray(packed_ref.reshape(n_wide, W))

    GN = max(1, -(-n_wide // LANE))
    GL = max(1, -(-max(n_leaf, 1) // LANE))
    leaf_rows = LEAF_ROWS_MASK if has_mask else LEAF_ROWS_NOMASK

    # --- internal records (int32) ---
    internal = jnp.zeros((n_wide, NODE_ROWS), jnp.int32)
    internal = internal.at[:, 0:8].set(packed_ref)
    for d in range(3):
        lo16 = _bf16_bits_dir(lo[..., d], toward_pos=False)   # (n_wide, 8)
        hi16 = _bf16_bits_dir(up[..., d], toward_pos=True)
        row = lo16 | (hi16 << 16)                             # (n_wide, 8)
        internal = internal.at[:, 8 + 8 * d:16 + 8 * d].set(row)

    node_recs = jnp.full((GN * LANE, NODE_ROWS), 0, jnp.int32)
    node_recs = node_recs.at[:, 0:8].set(INVALID_REC)     # inert padding
    node_recs = node_recs.at[:n_wide].set(internal)
    node_table = node_recs.reshape(GN, LANE, NODE_ROWS).transpose(0, 2, 1)

    # --- leaf records (float32) ---
    starts, counts = decode_leaf(child)
    starts = jnp.asarray(np.asarray(starts).reshape(-1)[leaf_mask])   # (n_leaf,)
    counts = jnp.asarray(np.asarray(counts).reshape(-1)[leaf_mask])

    slot = starts[:, None] + jnp.arange(LEAF_WIDTH)[None, :]       # (n_leaf, 8)
    valid = jnp.arange(LEAF_WIDTH)[None, :] < counts[:, None]
    slot = jnp.clip(slot, 0, bvh8.n_prims - 1)
    prim = bvh8.prim_order[slot]                                   # original ids
    # empty slots: zero v0/e1/e2 -> det == 0 -> can never hit
    v0 = jnp.where(valid[..., None], tri_v0[prim], 0.0)
    e1 = jnp.where(valid[..., None], tri_v1[prim] - tri_v0[prim], 0.0)
    e2 = jnp.where(valid[..., None], tri_v2[prim] - tri_v0[prim], 0.0)

    leaf = jnp.zeros((max(n_leaf, 1), leaf_rows), jnp.float32)
    leaf = leaf.at[:, 0:8].set(v0[..., 0])
    leaf = leaf.at[:, 8:16].set(v0[..., 1])
    leaf = leaf.at[:, 16:24].set(v0[..., 2])
    leaf = leaf.at[:, 24:32].set(e1[..., 0])
    leaf = leaf.at[:, 32:40].set(e1[..., 1])
    leaf = leaf.at[:, 40:48].set(e1[..., 2])
    leaf = leaf.at[:, 48:56].set(e2[..., 0])
    leaf = leaf.at[:, 56:64].set(e2[..., 1])
    leaf = leaf.at[:, 64:72].set(e2[..., 2])
    if has_mask:
        pmask = jnp.where(valid, geom_mask_per_prim[prim].astype(jnp.int32), 0)
        leaf = leaf.at[:, 72:80].set(_f32_bits(pmask))

    leaf_recs = jnp.zeros((GL * LANE, leaf_rows), jnp.float32)
    leaf_recs = leaf_recs.at[:max(n_leaf, 1)].set(leaf)
    leaf_table = leaf_recs.reshape(GL, LANE, leaf_rows).transpose(0, 2, 1)

    # --- slot -> original prim id map (padded slots/records -> -1) ---
    pid = jnp.where(valid, prim.astype(jnp.int32), -1)             # (n_leaf, 8)
    pid_map = jnp.full((GL * LANE, LEAF_WIDTH), -1, jnp.int32)
    if n_leaf:
        pid_map = pid_map.at[:n_leaf].set(pid)
    pid_map = pid_map.reshape(GL * LANE * LEAF_WIDTH)

    return PackedScene(node_table=node_table, leaf_table=leaf_table,
                       pid_map=pid_map, has_mask=has_mask)
