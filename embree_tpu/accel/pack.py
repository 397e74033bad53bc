"""Pack a BVH8 + triangle SoA into the two record tables the Pallas
traversal kernel consumes.

Layout rationale (TPU-first): the kernel fetches one record per ray per step
with a lane-dimension dynamic gather (tpu.dynamic_gather along lanes), so
records live along LANES (128 per tile) and record features along SUBLANES.
Lane gathers move one (8,128) register per op and are the kernel's dominant
latency (~30 cycles each, measured), so records are kept as SMALL as
possible: internal nodes store child bounds as conservatively-rounded
bfloat16 PAIRS (two children per int32 row), shrinking a node record to 32
rows = 4 gather registers — the TPU analog of Embree's QuantizedNode
(kernels/bvh/bvh_node_qaabb.h). Leaf triangles stay exact f32 (watertightness
lives in the leaf test, the node test only needs to be conservative).

Internal record (node_table, int32, 32 rows):
  row 0..7     : child refs (>=0: node record id; <0: leaf record ref
                 = -(leaf id)-1; INVALID_REC: empty slot)
  row 8+8d+c   : dim d (x,y,z) of child c: lo as the LOW 16 bits (bf16
                 pattern, decode = bits<<16), hi as the HIGH 16 bits
                 (decode = bits & 0xFFFF0000); lo rounded toward -inf, hi
                 toward +inf (boxes only grow). Row index == child slot, so
                 the fetched (8,128) register needs NO sublane expansion
                 gather in the kernel — decode is two shifts + bitcasts.

Leaf record (leaf_table, float32, 48 rows; <= 4 triangles, TriangleM
precomputed-edge layout analog, kernels/geometry/triangle.h:14):
  row 0      : count (int32 bitcast)
  row 1..4   : global prim ids (int32 bitcast, original pre-sort indices)
  row 8..11  : v0.x    12..15: v0.y    16..19: v0.z
  row 20..23 : e1.x    24..27: e1.y    28..31: e1.z
  row 32..35 : e2.x    36..39: e2.y    40..43: e2.z
  row 44..47 : geometry mask (int32 bitcast)

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
LEAF_ROWS = 48
LANE = 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedScene:
    """Device-resident packed traversable for the Pallas kernel."""
    node_table: jnp.ndarray    # (GN, 32, 128) int32
    leaf_table: jnp.ndarray    # (GL, 48, 128) float32

    def tree_flatten(self):
        return (self.node_table, self.leaf_table), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

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
         leaf_size: int = 4) -> PackedScene:
    """Pack the first n_wide wide nodes + their leaves into record tables.

    n_wide must be a host int (concrete); shapes derived from it are static.
    """
    assert bvh8.width == 8
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

    slot = starts[:, None] + jnp.arange(leaf_size)[None, :]           # (n_leaf, 4)
    valid = jnp.arange(leaf_size)[None, :] < counts[:, None]
    slot = jnp.clip(slot, 0, bvh8.n_prims - 1)
    prim = bvh8.prim_order[slot]                                       # original ids
    v0 = jnp.where(valid[..., None], tri_v0[prim], 0.0)
    e1 = jnp.where(valid[..., None], tri_v1[prim] - tri_v0[prim], 0.0)
    e2 = jnp.where(valid[..., None], tri_v2[prim] - tri_v0[prim], 0.0)
    pmask = jnp.where(valid, geom_mask_per_prim[prim].astype(jnp.int32), 0)

    leaf = jnp.zeros((max(n_leaf, 1), LEAF_ROWS), jnp.float32)
    leaf = leaf.at[:, 0].set(_f32_bits(counts))
    leaf = leaf.at[:, 1:1 + leaf_size].set(
        _f32_bits(jnp.where(valid, prim, 0)))
    leaf = leaf.at[:, 8:12].set(v0[..., 0])
    leaf = leaf.at[:, 12:16].set(v0[..., 1])
    leaf = leaf.at[:, 16:20].set(v0[..., 2])
    leaf = leaf.at[:, 20:24].set(e1[..., 0])
    leaf = leaf.at[:, 24:28].set(e1[..., 1])
    leaf = leaf.at[:, 28:32].set(e1[..., 2])
    leaf = leaf.at[:, 32:36].set(e2[..., 0])
    leaf = leaf.at[:, 36:40].set(e2[..., 1])
    leaf = leaf.at[:, 40:44].set(e2[..., 2])
    leaf = leaf.at[:, 44:48].set(_f32_bits(pmask))

    leaf_recs = jnp.zeros((GL * LANE, LEAF_ROWS), jnp.float32)
    leaf_recs = leaf_recs.at[:max(n_leaf, 1)].set(leaf)
    leaf_table = leaf_recs.reshape(GL, LANE, LEAF_ROWS).transpose(0, 2, 1)

    return PackedScene(node_table=node_table, leaf_table=leaf_table)
