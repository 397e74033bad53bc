"""Pallas TPU wavefront traversal kernel over the packed record table.

The TPU replacement for the reference's per-ray stack machine
(kernels/bvh/bvh_intersector1.cpp:31: TravRay precompute -> stack loop ->
N-wide slab test -> distance-sorted descent -> Möller leaf test). Design:

- 128 rays per grid program, one ray per VPU LANE. All per-ray state is a
  (8,128) row-consistent tile; per-child / per-triangle math runs on
  (8,128)/(4,128) sublane blocks at full VPU width (the packed record layout in
  pack.py is arranged exactly for this).
- Node/leaf fetch: one record per ray per step via tpu.dynamic_gather along
  lanes, tiled over the (G, 64, 128) table with masked selects (G static).
- Traversal state (cur/sp/tfar/best/active) lives in VMEM scratch refs; the
  lax.while_loop carries only scalars (Mosaic cannot yield sub-tile, i1, or
  layout-mismatched vector carries).
- Per-lane short stacks in VMEM scratch (STACK_ROWS,128); pushes are masked
  row-selects, pops use the 8-sublane dynamic gather per stack block.
- Ordered descent: per-lane child ranks from pairwise distance comparisons
  (the (8,8,128) analog of bvh_traverser1.h:58 sorting networks); children are
  pushed farthest-first so the nearest is visited next.
- Lockstep is per-128-ray block, not global: blocks retire independently, so
  the long-tail cost of incoherent rays is bounded per block.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import INVALID_REC, PackedScene

LANE = 128
STACK_ROWS = 64          # max pushed refs per ray (depth*(W-1) bound analog)
MAX_STEPS = 200_000      # runaway guard

# Per-block step counts of the last traverse_packed call (observability — the
# stat.h traversal-counter analog). May hold a traced value under jit.
LAST_STEPS = [None]


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _kernel(table_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tnear_ref, tfar_ref, mask_ref,
            out_t_ref, out_prim_ref, out_steps_ref,
            stack_ref, cur_ref, sp_ref, tf_ref, best_ref, act_ref, rec_ref,
            *, G, G_NODE, occlusion):
    INF = jnp.float32(np.inf)
    # per-component (1,128) ray rows: separate inputs keep XLA from feeding
    # the kernel a column-major bitcast whose per-block DMA is pathologically
    # strided (measured 85us/block vs 0.1us with clean layouts)
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tnear = tnear_ref[0]      # (1, 128)
    tfar0 = tfar_ref[0]
    rmask = mask_ref[0]       # (1, 128) int32

    eps = jnp.float32(1e-18)

    def rcp_safe(x):
        return 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)

    rdx, rdy, rdz = rcp_safe(dx), rcp_safe(dy), rcp_safe(dz)

    row4 = jax.lax.broadcasted_iota(jnp.int32, (4, LANE), 0)
    rowS = jax.lax.broadcasted_iota(jnp.int32, (STACK_ROWS, LANE), 0)
    zero8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0) * 0  # non-replicated 0

    def b8(row):   # (1,128) -> (8,128)
        return jnp.broadcast_to(row, (8, LANE))

    def b4(row):
        return jnp.broadcast_to(row, (4, LANE))

    def fetch(rec_id_row, node_row, leaf_row):
        """Gather one 64-row record per lane from the tiled table.

        Internal and leaf records live in separate pools (pack.py); each pool
        is scanned over the dynamic tile span of the lanes that need it, and a
        pool with no takers this step is skipped entirely (pl.when) — with
        morton-sorted coherent blocks both spans are small.
        """
        grp = rec_id_row // LANE                   # (1,128)
        lane = rec_id_row % LANE
        li = jnp.broadcast_to(lane, (64, LANE))
        rec_ref[:] = jnp.zeros((64, LANE), jnp.float32)

        def scan(sel_row, lo_tile, hi_tile):
            gmin = jnp.min(jnp.where(sel_row, grp, jnp.int32(hi_tile - 1)))
            gmax = jnp.max(jnp.where(sel_row, grp, jnp.int32(lo_tile)))

            def gbody(g, _):
                got = jnp.take_along_axis(table_ref[g], li, axis=1)
                rec_ref[:] = jnp.where(jnp.broadcast_to(grp == g, (64, LANE)),
                                       got, rec_ref[:])
                return 0

            jax.lax.fori_loop(gmin, gmax + 1, gbody, 0)

        GN = min(G_NODE, G)

        @pl.when(jnp.any(node_row))
        def _():
            scan(node_row, 0, GN)

        @pl.when(jnp.any(leaf_row))
        def _():
            scan(leaf_row, GN if GN < G else 0, G)

        return rec_ref[:]

    def body(state):
        it, _ = state
        active = act_ref[:] > 0                    # (8,128) bool
        cur = cur_ref[:]
        sp = sp_ref[:]
        t_far = tf_ref[:]
        best = best_ref[:]

        is_leaf = active & (cur < 0)
        is_node = active & (cur >= 0)
        rec_id = jnp.where(cur >= 0, cur, -cur - 1)
        rec_id = jnp.where(active, rec_id, 0)
        rec = fetch(rec_id[0:1], is_node[0:1], is_leaf[0:1])

        # ---------------- internal: 8-wide slab test ----------------
        crefs = _i32(rec[0:8])                     # (8,128)
        tx0 = (rec[8:16] - b8(ox)) * b8(rdx)
        tx1 = (rec[32:40] - b8(ox)) * b8(rdx)
        ty0 = (rec[16:24] - b8(oy)) * b8(rdy)
        ty1 = (rec[40:48] - b8(oy)) * b8(rdy)
        tz0 = (rec[24:32] - b8(oz)) * b8(rdz)
        tz1 = (rec[48:56] - b8(oz)) * b8(rdz)
        tent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.maximum(jnp.minimum(tz0, tz1), b8(tnear)))
        tex = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.minimum(jnp.maximum(tz0, tz1), t_far))
        hit = (tent <= tex) & (crefs != INVALID_REC) & is_node
        dist = jnp.where(hit, tent, INF)

        # per-lane ranks across the child (sublane) axis
        d_i = dist[:, None, :]                     # (8,1,128)
        d_j = dist[None, :, :]                     # (1,8,128)
        j_lt_i = (jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1)
                  < jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 0))
        less = ((d_j < d_i) | ((d_j == d_i) & j_lt_i)) & hit[None, :, :]
        rank = jnp.sum(less.astype(jnp.int32), axis=1)   # (8,128)
        num_hits = zero8 + jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)

        sel0 = hit & (rank == 0)
        next_ref = zero8 + jnp.sum(jnp.where(sel0, crefs, 0), axis=0,
                                   keepdims=True)

        # push ranks 7..1 (farthest first)
        new_sp = sp
        for r in range(7, 0, -1):
            selr = hit & (rank == r)
            refr = jnp.sum(jnp.where(selr, crefs, 0), axis=0, keepdims=True)
            pushed = jnp.sum(selr.astype(jnp.int32), axis=0, keepdims=True)
            push = (zero8 + pushed > 0) & (new_sp < STACK_ROWS)

            @pl.when(jnp.any(push))
            def _():
                rowsel = (rowS == jnp.broadcast_to(new_sp[0:1],
                                                   (STACK_ROWS, LANE))) \
                    & jnp.broadcast_to(push[0:1], (STACK_ROWS, LANE))
                stack_ref[:] = jnp.where(
                    rowsel, jnp.broadcast_to(refr, (STACK_ROWS, LANE)),
                    stack_ref[:])

            new_sp = jnp.where(push, new_sp + 1, new_sp)

        # ---------------- leaf: 4 Möller tests ----------------
        cnt = _i32(rec[0:1])                       # (1,128)
        pids = _i32(rec[1:5])                      # (4,128)
        v0x, v0y, v0z = rec[8:12], rec[12:16], rec[16:20]
        e1x, e1y, e1z = rec[20:24], rec[24:28], rec[28:32]
        e2x, e2y, e2z = rec[32:36], rec[36:40], rec[40:44]
        pmask = _i32(rec[44:48])

        bdx, bdy, bdz = b4(dx), b4(dy), b4(dz)
        pvx = bdy * e2z - bdz * e2y
        pvy = bdz * e2x - bdx * e2z
        pvz = bdx * e2y - bdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-24, 1.0 / det, 0.0)
        tvx = b4(ox) - v0x
        tvy = b4(oy) - v0y
        tvz = b4(oz) - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (bdx * qvx + bdy * qvy + bdz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        kvalid = ((row4 < b4(cnt)) & is_leaf[0:4]
                  & (jnp.abs(det) > 1e-24)
                  & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                  & (t >= b4(tnear)) & (t <= t_far[0:4])
                  & ((pmask & b4(rmask)) != 0))
        tl = jnp.where(kvalid, t, INF)
        tmin = jnp.min(tl, axis=0, keepdims=True)          # (1,128)
        tmin8 = zero8.astype(jnp.float32) + tmin
        found = is_leaf & (tmin8 < t_far)
        eqmin = kvalid & (tl == b4(tmin))
        m0 = eqmin[0:1]
        m1 = eqmin[1:2] & ~m0
        m2 = eqmin[2:3] & ~(m0 | m1)
        m3 = eqmin[3:4] & ~(m0 | m1 | m2)
        pid_sel = (jnp.where(m0, pids[0:1], 0) + jnp.where(m1, pids[1:2], 0)
                   + jnp.where(m2, pids[2:3], 0) + jnp.where(m3, pids[3:4], 0))
        pid8 = zero8 + pid_sel

        t_far = jnp.where(found, tmin8, t_far)
        best = jnp.where(found, pid8, best)

        # ---------------- advance ----------------
        need_pop = is_leaf | (is_node & (num_hits == 0))
        has_stack = new_sp > 0
        top = jnp.maximum(new_sp - 1, 0)
        popped = zero8
        for bblk in range(STACK_ROWS // 8):
            blk = stack_ref[8 * bblk:8 * bblk + 8]
            idx8 = jnp.clip(top - 8 * bblk, 0, 7)
            got = jnp.take_along_axis(blk, idx8, axis=0)
            selb = (top // 8) == bblk
            popped = jnp.where(selb, got, popped)

        do_pop = need_pop & has_stack
        cur = jnp.where(need_pop, jnp.where(do_pop, popped, cur),
                        jnp.where(is_node, next_ref, cur))
        sp = jnp.where(do_pop, new_sp - 1, new_sp)
        active = active & (~need_pop | do_pop)
        if occlusion:
            active = active & (best < 0)

        act_i = jnp.where(active, 1, 0).astype(jnp.int32)
        cur_ref[:] = cur
        sp_ref[:] = sp
        tf_ref[:] = t_far
        best_ref[:] = best
        act_ref[:] = act_i
        n_active = jnp.sum(act_i[0:1])
        return it + 1, n_active

    def cond(state):
        it, n_active = state
        return (n_active > 0) & (it < MAX_STEPS)

    # init state refs (zero8 keeps layouts non-replicated for Mosaic)
    act_ref[:] = zero8 + jnp.where(tnear <= tfar0, 1, 0).astype(jnp.int32)
    cur_ref[:] = zero8
    sp_ref[:] = zero8
    tf_ref[:] = zero8.astype(jnp.float32) + tfar0
    best_ref[:] = zero8 - 1
    stack_ref[:] = jnp.zeros((STACK_ROWS, LANE), jnp.int32)

    it_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

    out_t_ref[0] = tf_ref[0:1]
    out_prim_ref[0] = best_ref[0:1]
    out_steps_ref[0] = zero8[0:1] + it_final


def _coherence_key(org, dir):
    """Sort key grouping rays by direction octant then origin locality
    (the queue-sorting analog of the reference's coherent/incoherent split,
    SURVEY.md §2.8 P2/P3). 30-bit: octant(3) | origin-morton(27)."""
    from ..core.math import morton_code
    lo = jnp.min(org, axis=0)
    up = jnp.max(org, axis=0)
    q = (org - lo) / jnp.maximum(up - lo, 1e-20)
    m27 = (morton_code(q) >> 3).astype(jnp.int32)
    octant = ((dir[:, 0] < 0).astype(jnp.int32)
              | ((dir[:, 1] < 0).astype(jnp.int32) << 1)
              | ((dir[:, 2] < 0).astype(jnp.int32) << 2))
    return (octant << 27) | m27


def traverse_packed(packed: PackedScene, org, dir, tnear, tfar, ray_mask,
                    occlusion: bool = False, interpret: bool = False,
                    sort_rays: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace R rays against a packed scene. Returns (t, best_prim) with
    best_prim = -1 for miss. Inputs are flat (R, 3)/(R,) arrays.

    sort_rays: reorder rays by a coherence key so each 128-ray block touches
    few table tiles (fetch gating); results are returned in original order.
    """
    R = org.shape[0]
    ridx = None
    if sort_rays and R > LANE:
        key = _coherence_key(org, dir)
        idx0 = jnp.arange(R, dtype=jnp.int32)
        (key, ox_, oy_, oz_, dx_, dy_, dz_, tnear, tfar, ray_mask, ridx) = \
            jax.lax.sort((key, org[:, 0], org[:, 1], org[:, 2],
                          dir[:, 0], dir[:, 1], dir[:, 2],
                          tnear, tfar, ray_mask, idx0), num_keys=1)
        org = jnp.stack([ox_, oy_, oz_], axis=-1)
        dir = jnp.stack([dx_, dy_, dz_], axis=-1)
    B = -(-R // LANE)
    pad = B * LANE - R

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) \
            if pad else x
        return x.reshape(B, 1, LANE)

    org = org.astype(jnp.float32)
    dir = dir.astype(jnp.float32)
    oxp = prep(org[:, 0], 0); oyp = prep(org[:, 1], 0); ozp = prep(org[:, 2], 0)
    dxp = prep(dir[:, 0], 1); dyp = prep(dir[:, 1], 1); dzp = prep(dir[:, 2], 1)
    tnearp = prep(tnear.astype(jnp.float32), 1)
    tfarp = prep(tfar.astype(jnp.float32), 0)   # pad rays: tnear(1) > tfar(0) -> inactive
    maskp = prep(ray_mask.astype(jnp.int32), 0)

    G = packed.n_tiles
    kernel = functools.partial(_kernel, G=G, G_NODE=packed.n_node_tiles,
                               occlusion=occlusion)

    ray_spec = lambda rows: pl.BlockSpec((1, rows, LANE), lambda b: (b, 0, 0),
                                         memory_space=pltpu.VMEM)
    t_out, prim_out, steps_out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # constant block index -> Pallas keeps the table resident in VMEM
            # across grid steps instead of re-DMAing it per ray block
            pl.BlockSpec((G, 64, LANE), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [ray_spec(1)] * 9,
        out_specs=[ray_spec(1), ray_spec(1), ray_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((STACK_ROWS, LANE), jnp.int32),   # stack
            pltpu.VMEM((8, LANE), jnp.int32),            # cur
            pltpu.VMEM((8, LANE), jnp.int32),            # sp
            pltpu.VMEM((8, LANE), jnp.float32),          # t_far
            pltpu.VMEM((8, LANE), jnp.int32),            # best
            pltpu.VMEM((8, LANE), jnp.int32),            # active
            pltpu.VMEM((64, LANE), jnp.float32),         # fetched record
        ],
        interpret=interpret,
    )(packed.table, oxp, oyp, ozp, dxp, dyp, dzp, tnearp, tfarp, maskp)

    LAST_STEPS[0] = steps_out
    t_flat = t_out.reshape(B * LANE)[:R]
    prim_flat = prim_out.reshape(B * LANE)[:R]
    if ridx is not None:
        _, t_flat, prim_flat = jax.lax.sort(
            (ridx, t_flat, prim_flat), num_keys=1)
    return t_flat, prim_flat
