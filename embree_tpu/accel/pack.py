"""Pack a BVH8 + triangle SoA into the unified record table the Pallas
traversal kernel consumes.

Layout rationale (TPU-first): the kernel fetches one record per ray per step
with a lane-dimension dynamic gather (tpu.dynamic_gather along lanes), so
records live along LANES (128 per tile) and record features along SUBLANES
(64 rows). Features are arranged so per-child/per-triangle math lands on
(8,128)/(4,128) sublane blocks — full-width VPU ops, no transposes:

Internal record (wide node):
  row 0..7   : child refs, int32 bitcast   (>=0: record id; <0: leaf record
               ref = -(id)-1; INVALID_REC: empty slot)
  row 8..15  : child lower.x   row 16..23: lower.y   row 24..31: lower.z
  row 32..39 : child upper.x   row 40..47: upper.y   row 48..55: upper.z

Leaf record (<= 4 triangles, TriangleM precomputed-edge layout analog,
kernels/geometry/triangle.h:14):
  row 0      : count (int32 bitcast)
  row 1..4   : global prim ids (int32 bitcast, original pre-sort indices)
  row 8..11  : v0.x    12..15: v0.y    16..19: v0.z
  row 20..23 : e1.x    24..27: e1.y    28..31: e1.z
  row 32..35 : e2.x    36..39: e2.y    40..43: e2.z
  row 44..47 : geometry mask (int32 bitcast)

Record 0 is the root. Table shape: (G, 64, 128) float32, G = ceil(records/128).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH, INVALID_NODE, decode_leaf, is_leaf

INVALID_REC = np.int32(0x40000000)  # empty child slot in packed records
D_ROWS = 64
LANE = 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedScene:
    """Device-resident packed traversable for the Pallas kernel."""
    table: jnp.ndarray     # (G, 64, 128) float32
    n_node_tiles: int = 1  # static: tiles [0, n_node_tiles) hold internal records

    def tree_flatten(self):
        return (self.table,), (self.n_node_tiles,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def n_tiles(self):
        return self.table.shape[0]


def _f32_bits(x_int):
    return jax.lax.bitcast_convert_type(x_int.astype(jnp.int32), jnp.float32)


def pack(bvh8: BVH, n_wide: int, tri_v0, tri_v1, tri_v2, geom_mask_per_prim,
         leaf_size: int = 4) -> PackedScene:
    """Pack the first n_wide wide nodes + their leaves into a record table.

    n_wide must be a host int (concrete); shapes derived from it are static.
    """
    assert bvh8.width == 8
    W = 8
    child = bvh8.node_child[:n_wide]          # (n_wide, 8)
    lo = bvh8.node_lower[:n_wide]
    up = bvh8.node_upper[:n_wide]

    # --- record numbering: two pools, [internal 0..n_wide) | leaves] — the
    # kernel fetches node records and leaf records with SEPARATE span-limited
    # scans, so each pool must be contiguous. Leaf records are ordered by
    # (node, slot), which keeps sibling leaves adjacent for coherent blocks ---
    leaf_mask2 = np.asarray(is_leaf(child))                      # (n_wide, 8)
    leaf_mask = leaf_mask2.reshape(-1)
    n_leaf = int(leaf_mask.sum())
    leaf_ids_flat = np.cumsum(leaf_mask) - leaf_mask
    node_pos = np.arange(n_wide, dtype=np.int64)
    # leaf records start at the first tile boundary after the internal pool
    leaf_base = -(-n_wide // LANE) * LANE
    leaf_pos = (leaf_base + leaf_ids_flat).astype(np.int64)

    # child refs in packed encoding
    flat_child = np.asarray(child).reshape(-1)
    packed_ref = np.where(
        flat_child == int(INVALID_NODE), INVALID_REC,
        np.where(leaf_mask, -leaf_pos - 1, flat_child)).astype(np.int32)
    packed_ref = jnp.asarray(packed_ref.reshape(n_wide, W))

    n_rec = leaf_base + n_leaf
    G = max(1, -(-n_rec // LANE))
    G_NODE = max(1, -(-n_wide // LANE))   # tiles holding internal records
    total = G * LANE

    # --- internal records ---
    internal = jnp.zeros((n_wide, D_ROWS), jnp.float32)
    internal = internal.at[:, 0:8].set(_f32_bits(packed_ref))
    internal = internal.at[:, 8:16].set(lo[..., 0])
    internal = internal.at[:, 16:24].set(lo[..., 1])
    internal = internal.at[:, 24:32].set(lo[..., 2])
    internal = internal.at[:, 32:40].set(up[..., 0])
    internal = internal.at[:, 40:48].set(up[..., 1])
    internal = internal.at[:, 48:56].set(up[..., 2])

    # --- leaf records ---
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

    leaf = jnp.zeros((max(n_leaf, 1), D_ROWS), jnp.float32)
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
    leaf = leaf[:n_leaf]

    # scatter internal/leaf records into their pool positions
    records = jnp.zeros((total, D_ROWS), jnp.float32)
    records = records.at[:, 0:8].set(
        _f32_bits(jnp.full((total, 8), INVALID_REC, jnp.int32)))  # inert padding
    records = records.at[jnp.asarray(node_pos)].set(internal)
    if n_leaf:
        records = records.at[jnp.asarray(leaf_pos[leaf_mask])].set(leaf)

    # (total, 64) -> (G, 64, 128): record r -> tile r//128, lane r%128
    table = records.reshape(G, LANE, D_ROWS).transpose(0, 2, 1)
    return PackedScene(table=table, n_node_tiles=G_NODE)
