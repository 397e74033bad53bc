"""Pack a BVH8 + the merged primitive table into the UNIFIED record table the
Pallas traversal kernel consumes.

Layout rationale (TPU-first): the kernel fetches one record per ray per step
with a lane-dimension dynamic gather (tpu.dynamic_gather along lanes), so
records live along LANES (128 per tile) and record features along SUBLANES.
Record features are grouped in 8-ROW REGISTER-ALIGNED fields so the
tile-parallel kernel (traverse_pallas.py) can consume each field as a whole
(UGRP*8, 128) register block with zero sub-register slicing. Lane gathers
move one (8,128) register per op, so records are kept SMALL: internal nodes
store child bounds as conservatively-rounded bfloat16 PAIRS (two bounds per
int32 row) — the TPU analog of Embree's QuantizedNode
(kernels/bvh/bvh_node_qaabb.h). Leaf primitives stay exact f32.

v12: internal and leaf records live in ONE table (node tiles first, then
leaf tiles, all padded to the same row count), so a traversal step runs a
SINGLE fetch phase serving node-lanes and leaf-lanes together — halving the
serve-loop machinery that dominated the r4 step time (NOTES_r4 perf model:
two fetch phases at 44% of the step). A lane's current ref encodes the kind
(>=0 node record, <0 leaf record) and maps to tile GN + rec//128 for leaves.

Internal record (int32, first 32 rows of its tile; rest zero padding):
  row 0..7     : child refs (>=0: node record id; <0: leaf record ref
                 = -(leaf id)-1; INVALID_REC: empty slot)
  row 8+8d+c   : dim d (x,y,z) of child c: lo as the LOW 16 bits (bf16
                 pattern, decode = bits<<16), hi as the HIGH 16 bits
                 (decode = bits & 0xFFFF0000); lo rounded toward -inf, hi
                 toward +inf (boxes only grow).

Leaf record (float32 bit patterns, 8 primitive SLOTS per record; slot s of
field k lives at row 8*k + s). Every primitive kind is encoded into 9 generic
fields (the per-type layouts of kernels/geometry/{triangle,sphere,disc,
coneline}_intersector.h collapsed into one record shape):
  triangle / quad-half : v0(3) e1(3) e2(3)
  sphere / disc        : center(3) radius
  oriented disc        : center(3) radius normal(3)
  round / flat line    : p0(3) r0 p1(3) r1
Chunk order (each chunk = 8 rows):
  fields A (9 chunks) | fields B (9, 2-step motion only) | geom mask (1,
  masked scenes only, int32 bitcast) | kind tag (1, heterogeneous scenes
  only, int32 bitcast; quads pack as two triangle slots tagged 0).
All layout variants are STATIC kernel specializations (the RTCFeatureFlags
analog). Empty/padding slots are kind 0 with zero fields: Möller det == 0
can never report a hit. Slot identity is implicit (8*record+slot), mapped
back to the merged prim table through pid_map post-kernel.

Record 0 (tile 0) is the root. Table shape: (GN+GL, ltab_rows, 128) int32.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH, INVALID_NODE, decode_leaf, is_leaf

INVALID_REC = np.int32(0x40000000)  # empty child slot in packed records
NODE_ROWS = 32
LEAF_WIDTH = 8               # primitive slots per leaf record (== node width)
LANE = 128
N_FIELDS = 9


def ltab_rows(has_mask: bool, has_motion: bool = False,
              has_kinds: bool = False, has_win: bool = False,
              nf: int = N_FIELDS) -> int:
    return 8 * (nf * (2 if has_motion else 1)
                + (1 if has_mask else 0) + (1 if has_kinds else 0)
                + (2 if has_win else 0))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedScene:
    """Device-resident packed traversable for the Pallas kernel."""
    table: jnp.ndarray         # (GN+GL, ltab_rows, 128) int32 unified table
    pid_map: jnp.ndarray       # (GL*128*8,) int32: slot -> merged prim index
    gn: int = 1                # static: node tiles (table prefix)
    gl: int = 1                # static: leaf tiles (table suffix)
    has_mask: bool = False     # static: leaf records carry a mask chunk
    has_motion: bool = False   # static: leaf records carry B-step fields
    has_kinds: bool = False    # static: leaf records carry a kind-tag chunk
    kind_classes: tuple = (0,)  # static: which kind tags occur
    tri_attrs: bool = False    # static: pure-triangle scene (no quad slots):
    #                            kernel can emit exact u/v/Ng hit attributes
    has_win: bool = False      # static: leaf records carry per-slot [t0,t1]
    #                            time-window chunks (multi-step motion)
    nf: int = N_FIELDS         # static: generic fields per slot (16 when
    #                            native curve kinds store 4x(xyz+r) CPs)
    curve_rate: int = 4        # static: ribbon/tessellation sub-segments

    def tree_flatten(self):
        return ((self.table, self.pid_map),
                (self.gn, self.gl, self.has_mask, self.has_motion,
                 self.has_kinds, self.kind_classes, self.tri_attrs,
                 self.has_win, self.nf, self.curve_rate))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def n_node_tiles(self):
        return self.gn

    @property
    def n_leaf_tiles(self):
        return self.gl

    @property
    def n_tiles(self):
        return self.gn + self.gl


def _f32_bits(x_int):
    return np.asarray(x_int, np.int32).view(np.float32)


def _dfs_positions(child, n_wide):
    """Preorder (DFS) position of every wide node — vectorized, no Python
    recursion: O(depth) numpy passes (levels -> subtree sizes bottom-up ->
    preorder offsets top-down).

    The level-synchronous builder emits nodes in BFS order, which scatters a
    subtree's nodes (and its leaves, numbered from the node order) across
    the record table by DEPTH. The traversal kernel's fetch cost is
    proportional to DISTINCT 128-record tiles touched per 128-ray group per
    step, and coherent rays descend a common subtree — DFS order makes
    subtrees contiguous so those lanes land in the same tiles (the
    cache-friendly relayout role of the reference's layoutLargeNodes,
    kernels/bvh/bvh.h:108)."""
    internal = (child >= 0) & (child < n_wide)
    ch = np.where(internal, child, 0)
    depth = np.full(n_wide, -1, np.int64)
    depth[0] = 0
    levels = [np.array([0])]
    while True:
        lev = levels[-1]
        kids = ch[lev][internal[lev]]
        kids = kids[depth[kids] < 0]       # guard against corrupt cycles
        if kids.size == 0:
            break
        depth[kids] = len(levels)
        levels.append(kids)
    size = np.ones(n_wide, np.int64)
    for lev in levels[::-1]:
        m = internal[lev]
        size[lev] += np.where(m, size[ch[lev]], 0).sum(axis=1)
    pos = np.zeros(n_wide, np.int64)
    nxt = int(size[0])                     # first position after the tree
    for lev in levels:
        m = internal[lev]
        sub = np.where(m, size[ch[lev]], 0)
        prefix = np.cumsum(sub, axis=1) - sub
        childpos = pos[lev][:, None] + 1 + prefix
        pos[ch[lev][m]] = childpos[m]
    unreached = depth < 0
    if unreached.any():                    # padding/detached nodes -> tail
        pos[unreached] = nxt + np.arange(int(unreached.sum()))
    return pos


def _bf16_bits_dir(x, toward_pos: bool):
    """Top-16 float bits of x rounded toward +inf (toward_pos) or -inf.

    Truncating the low 16 mantissa bits rounds toward zero; when that moves
    the value the wrong way, bump the magnitude by one bf16 ulp (int bits
    + 0x10000 — exponent carries work out in ieee bit order)."""
    b = np.asarray(x, np.float32).view(np.int32)
    frac = (b & 0xFFFF) != 0
    t = b & ~np.int32(0xFFFF)
    neg = b < 0
    bump = frac & (neg != toward_pos)
    t = np.where(bump, t + np.int32(0x10000), t)
    return (t >> 16) & 0xFFFF


def pack(bvh8: BVH, n_wide: int, slot_fields_a, slot_fields_b, slot_kind,
         slot_mask, slot_pid, slot_factor: int = 1, has_mask: bool = True,
         has_motion: bool = False, has_kinds: bool = False,
         kind_classes=(0,), slot_t01=None, curve_rate: int = 4) -> PackedScene:
    """Pack the first n_wide wide nodes + their leaves into record tables.

    slot_* arrays index SLOTS: merged prim p owns slots
    p*slot_factor .. p*slot_factor+slot_factor-1 (factor 2 when quads are
    present — each quad becomes two triangle slots). slot_pid < 0 marks an
    unused expansion slot. n_wide / flags must be host values (static).
    """
    assert bvh8.width == 8
    W = 8
    leaf_prims = LEAF_WIDTH // slot_factor
    # host numpy throughout: packing is gather/reshape bound and must not
    # trip eager device dispatch (the axon TPU tunnel makes per-op dispatch
    # seconds-slow) nor pay jit compiles per scene shape
    child = np.asarray(bvh8.node_child[:n_wide])          # (n_wide, 8)
    lo = np.asarray(bvh8.node_lower[:n_wide])             # (n_wide, 8, 3)
    up = np.asarray(bvh8.node_upper[:n_wide])

    # DFS-relayout wide nodes (subtree-contiguous records; see
    # _dfs_positions). Internal child refs are remapped; leaf refs are
    # renumbered implicitly below from the permuted flat order.
    if n_wide > 1:
        pos = _dfs_positions(child, n_wide)
        internal2 = (child >= 0) & (child < n_wide)
        child = np.where(internal2, pos[np.where(internal2, child, 0)], child)
        child2 = np.empty_like(child)
        lo2 = np.empty_like(lo)
        up2 = np.empty_like(up)
        child2[pos] = child
        lo2[pos] = lo
        up2[pos] = up
        child, lo, up = child2, lo2, up2

    # --- record numbering: leaf records ordered by (node, slot), which keeps
    # sibling leaves adjacent for coherent ray blocks ---
    leaf_mask2 = np.asarray(is_leaf(child))                      # (n_wide, 8)
    leaf_mask = leaf_mask2.reshape(-1)
    n_leaf = int(leaf_mask.sum())
    leaf_ids_flat = np.cumsum(leaf_mask) - leaf_mask

    flat_child = child.reshape(-1)
    packed_ref = np.where(
        flat_child == int(INVALID_NODE), INVALID_REC,
        np.where(leaf_mask, -leaf_ids_flat - 1, flat_child)).astype(np.int32)
    packed_ref = packed_ref.reshape(n_wide, W)

    has_win = slot_t01 is not None
    nf = int(np.asarray(slot_fields_a).shape[1])
    GN = max(1, -(-n_wide // LANE))
    GL = max(1, -(-max(n_leaf, 1) // LANE))
    leaf_rows = ltab_rows(has_mask, has_motion, has_kinds, has_win, nf)

    # --- internal records (int32), padded to the unified tile row count ---
    assert leaf_rows >= NODE_ROWS
    internal = np.zeros((n_wide, NODE_ROWS), np.int32)
    internal[:, 0:8] = packed_ref
    for d in range(3):
        lo16 = _bf16_bits_dir(lo[..., d], toward_pos=False)   # (n_wide, 8)
        hi16 = _bf16_bits_dir(up[..., d], toward_pos=True)
        internal[:, 8 + 8 * d:16 + 8 * d] = lo16 | (hi16 << 16)

    node_recs = np.zeros((GN * LANE, leaf_rows), np.int32)
    node_recs[:, 0:8] = INVALID_REC                       # inert padding
    node_recs[:n_wide, :NODE_ROWS] = internal

    # --- leaf records (float32) ---
    starts, counts = decode_leaf(child)
    starts = np.asarray(starts).reshape(-1)[leaf_mask]
    counts = np.asarray(counts).reshape(-1)[leaf_mask]

    pslot = starts[:, None] + np.arange(leaf_prims)[None, :]   # (n_leaf, P)
    pvalid = np.arange(leaf_prims)[None, :] < counts[:, None]
    pslot = np.clip(pslot, 0, bvh8.n_prims - 1)
    prim = np.asarray(bvh8.prim_order)[pslot]                  # merged indices
    # expand prims to slots: (n_leaf, P, factor) -> (n_leaf, 8)
    slots = (prim[:, :, None] * slot_factor
             + np.arange(slot_factor)[None, None, :]).reshape(-1, LEAF_WIDTH)
    valid = np.broadcast_to(pvalid[:, :, None],
                            pvalid.shape + (slot_factor,)).reshape(
                                -1, LEAF_WIDTH)
    slot_fields_a = np.asarray(slot_fields_a, np.float32)
    slots = np.clip(slots, 0, slot_fields_a.shape[0] - 1)
    pid = np.asarray(slot_pid)[slots]
    valid = valid & (pid >= 0)

    fa = np.where(valid[..., None], slot_fields_a[slots], 0.0)
    chunks = [fa]                                   # each (n_leaf, 8, 9)
    if has_motion:
        fb = np.where(valid[..., None],
                      np.asarray(slot_fields_b, np.float32)[slots], 0.0)
        chunks.append(fb)
    leaf_cols = [c.transpose(0, 2, 1).reshape(-1, LEAF_WIDTH * c.shape[-1])
                 for c in chunks]
    if has_mask:
        m = np.where(valid, np.asarray(slot_mask, np.int32)[slots], 0)
        leaf_cols.append(_f32_bits(m))
    if has_kinds:
        k = np.where(valid, np.asarray(slot_kind, np.int32)[slots], 0)
        leaf_cols.append(_f32_bits(k))
    if has_win:
        t01 = np.asarray(slot_t01, np.float32)[slots]         # (n_leaf, 8, 2)
        # padding slots: window [0,1] (never rejects; fields are inert anyway)
        leaf_cols.append(np.where(valid, t01[..., 0], 0.0))
        leaf_cols.append(np.where(valid, t01[..., 1], 1.0))
    leaf = np.concatenate(leaf_cols, axis=1).astype(np.float32)
    if n_leaf == 0:
        leaf = np.zeros((1, leaf_rows), np.float32)

    leaf_recs = np.zeros((GL * LANE, leaf_rows), np.float32)
    leaf_recs[:leaf.shape[0]] = leaf
    # unified table: node tiles first, leaf tiles after (all int32 bits)
    recs = np.concatenate([node_recs, leaf_recs.view(np.int32)], axis=0)
    table = np.ascontiguousarray(
        recs.reshape(GN + GL, LANE, leaf_rows).transpose(0, 2, 1))

    # --- slot -> merged prim index map (padded slots/records -> -1) ---
    pid_tab = np.where(valid, pid.astype(np.int32), -1)
    pid_map = np.full((GL * LANE, LEAF_WIDTH), -1, np.int32)
    if n_leaf:
        pid_map[:n_leaf] = pid_tab
    pid_map = pid_map.reshape(GL * LANE * LEAF_WIDTH)

    return PackedScene(table=table, pid_map=pid_map,
                       gn=GN, gl=GL, has_mask=has_mask,
                       has_motion=has_motion, has_kinds=has_kinds,
                       kind_classes=tuple(kind_classes),
                       tri_attrs=(tuple(kind_classes) == (0,)
                                  and slot_factor == 1),
                       has_win=has_win, nf=nf, curve_rate=curve_rate)
