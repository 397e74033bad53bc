"""Pallas TPU wavefront traversal kernel over the packed record table.

The TPU replacement for the reference's per-ray stack machine
(kernels/bvh/bvh_intersector1.cpp:31: TravRay precompute -> stack loop ->
N-wide slab test -> distance-sorted descent -> Möller leaf test). Design:

- U=8 ray groups x 128 rays per grid program, one ray per VPU LANE. Per-child
  and per-triangle math runs on (8,128)/(4,128) sublane blocks at full VPU
  width (the packed record layout in pack.py is arranged exactly for this).
- The traversal step is a SERIAL dependency chain (fetch -> slab -> sort ->
  stack -> advance) of VMEM gathers whose latency cannot be hidden within one
  chain: measured 2.2us/step for a single 128-ray group even though the
  summed throughput cost of the pieces is <0.2us. Running U=8 independent
  groups per program gives the VLIW scheduler 8 overlapping chains, hiding
  the latency (the TPU analog of GPU persistent-threads occupancy).
- Per-group state lives as ROWS of (8,128) VMEM scratch tiles (row u = group
  u), so one tile load serves all groups; the lax.while_loop carries only
  scalars (Mosaic cannot yield sub-tile, i1, or layout-mismatched carries).
- Node/leaf fetch: one record per ray per step via tpu.dynamic_gather along
  lanes. A single fetch loop serves ALL groups one DISTINCT table tile per
  iteration (min over outstanding tiles) — with morton-sorted coherent blocks
  the union of tiles across the 8 adjacent groups stays small.
- Ordered descent via a 6-stage bitonic sort of the 8 (distance,childref)
  pairs along the sublane axis (the (8,128) analog of bvh_traverser1.h:58
  sorting networks). Distance keys are bitcast-to-int with the low 3 bits
  replaced by the child slot, so keys are distinct and ties break cleanly.
- Per-lane short stacks in VMEM scratch (STACK_ROWS,128) per group. Pushes
  rotate the sorted far-to-near suffix into stack alignment with ONE sublane
  gather and write with masked per-block selects; pops gather the top entry
  per 8-row block from the PRE-push stack image (lanes that push never pop in
  the same step), so push and pop run in parallel off one set of loads.
  Everything is branchless: no pl.when / jnp.any scalar synchronization in
  the step body.
- Lockstep is per-1024-ray program, not global: programs retire
  independently, bounding the long-tail cost of incoherent rays.
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
UGRP = 16                # independent 128-ray groups interleaved per program
STACK_ROWS = 64          # max pushed refs per ray ((W-1)*depth bound analog)
MAX_STEPS = 200_000      # runaway guard

# Per-program step counts of the last traverse_packed call (observability —
# the stat.h traversal-counter analog). May hold a traced value under jit.
LAST_STEPS = [None]

# Bitonic network for 8 elements: (k, j) compare-exchange stages.
_SORT_STAGES = ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1))


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _kernel(ntab_ref, ltab_ref, org_ref, dir_ref, tnear_ref, tfar_ref,
            mask_ref,
            out_t_ref, out_prim_ref, out_steps_ref,
            stack_ref, cur_ref, sp_ref, tf_ref, best_ref, act_ref,
            nrec_ref, lrec_ref, need_ref,
            *, GN, GL, occlusion):
    INF = jnp.float32(np.inf)
    # ray components as (8,128) tiles: row u = group u
    ox, oy, oz = org_ref[0, 0], org_ref[0, 1], org_ref[0, 2]   # (8,128)
    dx, dy, dz = dir_ref[0, 0], dir_ref[0, 1], dir_ref[0, 2]
    tnear = tnear_ref[0]      # (8,128): row u = group u
    tfar0 = tfar_ref[0]
    rmask = mask_ref[0]

    eps = jnp.float32(1e-18)

    def rcp_safe(x):
        return 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)

    rdx, rdy, rdz = rcp_safe(dx), rcp_safe(dy), rcp_safe(dz)

    row4 = jax.lax.broadcasted_iota(jnp.int32, (4, LANE), 0)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    zero8 = row8 * 0  # non-replicated 0
    zeroU = jax.lax.broadcasted_iota(jnp.int32, (UGRP, LANE), 0) * 0

    def b8(row):   # (1,128) -> (8,128)
        return jnp.broadcast_to(row, (8, LANE))

    def b4(row):
        return jnp.broadcast_to(row, (4, LANE))

    def fetch(tab_ref, out_ref, rows, Gp, need_ref, rec_id_all, need_all):
        """Gather one rows-row record per lane per group from one pool. One
        fetch loop serves all groups, one DISTINCT table tile per iteration
        (trip count = number of distinct tiles needed by the union of the
        groups; zero iterations when no lane is in this pool this step).

        Gathers are issued in (8,128) chunks: Mosaic's lane-gather is ~1.6ns
        for an 8-row operand but falls off a 125x cliff above 32 rows
        (measured, perf/micro_ops.py). One scalar reduction per iteration:
        the loop carries the next tile id (min over remaining); Gp means
        done. Returns (need_all, trip_count)."""
        # clamp: corrupt refs must not become out-of-bounds tile reads (the
        # GarbageGeometryTest analog — a bad BVH may misreport, never fault)
        grp = jnp.clip(rec_id_all // LANE, 0, Gp - 1)  # (U,128) row u = group
        lane = rec_id_all % LANE
        need_ref[:] = jnp.where(need_all, 1, 0) + zeroU

        def body(state):
            g, trips = state
            need = need_ref[:] > 0                 # (U,128)
            tile = tab_ref[g]                      # (rows,128)
            sel = need & (grp == g)
            for u in range(UGRP):
                li = jnp.broadcast_to(lane[u:u + 1], (8, LANE))
                selu = jnp.broadcast_to(sel[u:u + 1], (8, LANE))
                for r in range(0, rows, 8):
                    got = jnp.take_along_axis(tile[r:r + 8], li, axis=1)
                    out_ref[u, r:r + 8] = jnp.where(selu, got,
                                                    out_ref[u, r:r + 8])
            left = need & ~sel
            need_ref[:] = jnp.where(left, 1, 0) + zeroU * 0
            return jnp.min(jnp.where(left, grp, jnp.int32(Gp))), trips + 1

        g0 = jnp.min(jnp.where(need_ref[:] > 0, grp, jnp.int32(Gp)))
        _, trips = jax.lax.while_loop(
            lambda s: s[0] < Gp, body, (g0, jnp.int32(0)))
        return need_all, trips

    def body(state):
        it, _, ntrips, ltrips = state
        active_all = act_ref[:] > 0                # (8,128) row u = group u
        cur_all = cur_ref[:]
        sp_all = sp_ref[:]
        tf_all = tf_ref[:]
        best_all = best_ref[:]

        at_node_all = active_all & (cur_all >= 0)
        at_leaf_all = active_all & (cur_all < 0)
        # stack blocks live in [0, bmax): bound by the deepest stack across
        # all groups (+7 for this step's pushes). ONE scalar reduction per
        # step; typical depth <= 16 so the loop visits 2-3 of the 8 blocks.
        bmax = jnp.minimum(jnp.max(sp_all) + 14, STACK_ROWS) // 8 + 1
        is_node_all, nt = fetch(ntab_ref, nrec_ref, 32, GN, need_ref,
                                jnp.where(at_node_all, cur_all, 0),
                                at_node_all)
        is_leaf_all, lt = fetch(ltab_ref, lrec_ref, 48, GL, need_ref,
                                jnp.where(at_leaf_all, -cur_all - 1, 0),
                                at_leaf_all)
        stall_all = active_all & ~(is_node_all | is_leaf_all)

        new_cur, new_sp_rows, new_tf, new_best, new_act = [], [], [], [], []
        for u in range(UGRP):
            active = active_all[u:u + 1]           # (1,128) bool
            cur = cur_all[u:u + 1]
            sp = b8(sp_all[u:u + 1])               # (8,128) for stack math
            t_far = tf_all[u:u + 1]
            best = best_all[u:u + 1]
            is_leaf = is_leaf_all[u:u + 1]
            is_node = is_node_all[u:u + 1]

            nrec = nrec_ref[u]                     # (32,128) int32
            lrec = lrec_ref[u]                     # (48,128) float32
            oxu, oyu, ozu = ox[u:u + 1], oy[u:u + 1], oz[u:u + 1]
            dxu, dyu, dzu = dx[u:u + 1], dy[u:u + 1], dz[u:u + 1]
            rdxu, rdyu, rdzu = rdx[u:u + 1], rdy[u:u + 1], rdz[u:u + 1]
            tnearu = tnear[u:u + 1]
            rmasku = rmask[u:u + 1]

            # ---------------- internal: 8-wide slab test ----------------
            crefs = nrec[0:8]                      # (8,128) child refs
            # decode packed lo|hi bf16 rows (row == child slot, no gather):
            # lo = bits<<16, hi = bits & 0xFFFF0000

            def bnd(d):
                bits = nrec[8 + 8 * d:16 + 8 * d]
                lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
                hi = jax.lax.bitcast_convert_type(
                    bits & ~jnp.int32(0xFFFF), jnp.float32)
                return lo, hi

            (lox, hix), (loy, hiy), (loz, hiz) = (bnd(d) for d in range(3))
            tx0 = (lox - b8(oxu)) * b8(rdxu)
            tx1 = (hix - b8(oxu)) * b8(rdxu)
            ty0 = (loy - b8(oyu)) * b8(rdyu)
            ty1 = (hiy - b8(oyu)) * b8(rdyu)
            tz0 = (loz - b8(ozu)) * b8(rdzu)
            tz1 = (hiz - b8(ozu)) * b8(rdzu)
            tent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.maximum(jnp.minimum(tz0, tz1), b8(tnearu)))
            tex = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.minimum(jnp.maximum(tz0, tz1), b8(t_far)))
            hit = (tent <= tex) & (crefs != INVALID_REC) & b8(is_node)

            # sort keys: distance bits (>=0 so monotonic as int) with the low
            # 3 bits replaced by the child slot -> distinct keys, clean
            # tie-breaks; misses sort to the end as +inf
            kd = _i32(jnp.maximum(tent, 0.0))
            key = jnp.where(hit, (kd & ~jnp.int32(7)) | row8,
                            jnp.int32(0x7F800000) | row8)
            ref = crefs
            for k, j in _SORT_STAGES:
                perm8 = row8 ^ j
                keepmin = ((row8 & k) == 0) == ((row8 & j) == 0)
                key_p = jnp.take_along_axis(key, perm8, axis=0)
                ref_p = jnp.take_along_axis(ref, perm8, axis=0)
                # keys distinct, so (>=) == (>): keepmin lanes swap when the
                # partner is smaller, the others when it is larger
                swap = (key_p < key) == keepmin
                key = jnp.where(swap, key_p, key)
                ref = jnp.where(swap, ref_p, ref)

            h = jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)  # (1,128)
            h8 = b8(h)
            next_ref = ref[0:1]

            # -------- stack: read blocks once; pop from the pre-push image
            # (pushing lanes never pop in the same step), merge pushes in --
            npush = jnp.where(b8(is_node), jnp.maximum(h8 - 1, 0), 0)
            items = jnp.take_along_axis(ref, jnp.clip(h8 - 1 - row8, 0, 7),
                                        axis=0)
            aligned = jnp.take_along_axis(items, (row8 - sp) & 7, axis=0)
            new_sp = sp + npush
            top = new_sp - 1

            def stack_blk(b, popped):
                blk = stack_ref[u, pl.ds(8 * b, 8)]
                localp = top - 8 * b
                selb = (localp >= 0) & (localp < 8)
                got = jnp.take_along_axis(blk, jnp.clip(localp, 0, 7), axis=0)
                popped = jnp.where(selb, got, popped)
                local = row8 + (8 * b) - sp
                inr = (local >= 0) & (local < npush)
                stack_ref[u, pl.ds(8 * b, 8)] = jnp.where(inr, aligned, blk)
                return popped

            popped = jax.lax.fori_loop(0, bmax, stack_blk, zero8)

            # ---------------- leaf: 4 Möller tests ----------------
            cnt = _i32(lrec[0:1])                  # (1,128)
            pids = _i32(lrec[1:5])                 # (4,128)
            v0x, v0y, v0z = lrec[8:12], lrec[12:16], lrec[16:20]
            e1x, e1y, e1z = lrec[20:24], lrec[24:28], lrec[28:32]
            e2x, e2y, e2z = lrec[32:36], lrec[36:40], lrec[40:44]
            pmask = _i32(lrec[44:48])

            bdx, bdy, bdz = b4(dxu), b4(dyu), b4(dzu)
            pvx = bdy * e2z - bdz * e2y
            pvy = bdz * e2x - bdx * e2z
            pvz = bdx * e2y - bdy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) > 1e-24, 1.0 / det, 0.0)
            tvx = b4(oxu) - v0x
            tvy = b4(oyu) - v0y
            tvz = b4(ozu) - v0z
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = (bdx * qvx + bdy * qvy + bdz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

            kvalid = ((row4 < b4(cnt)) & b4(is_leaf)
                      & (jnp.abs(det) > 1e-24)
                      & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt >= b4(tnearu)) & (tt <= b4(t_far))
                      & ((pmask & b4(rmasku)) != 0))
            tl = jnp.where(kvalid, tt, INF)
            tmin = jnp.min(tl, axis=0, keepdims=True)      # (1,128)
            found = is_leaf & (tmin < t_far)
            eqmin = kvalid & (tl == b4(tmin))
            m0 = eqmin[0:1]
            m1 = eqmin[1:2] & ~m0
            m2 = eqmin[2:3] & ~(m0 | m1)
            m3 = eqmin[3:4] & ~(m0 | m1 | m2)
            pid_sel = (jnp.where(m0, pids[0:1], 0)
                       + jnp.where(m1, pids[1:2], 0)
                       + jnp.where(m2, pids[2:3], 0)
                       + jnp.where(m3, pids[3:4], 0))

            t_far = jnp.where(found, tmin, t_far)
            best = jnp.where(found, pid_sel, best)

            # ---------------- advance (stalled lanes keep their state) ----
            has_next = is_node & (h[0:1] > 0)
            need_pop = (is_node | is_leaf) & ~has_next
            sp_row = new_sp[0:1]
            do_pop = need_pop & (sp_row > 0)
            cur = jnp.where(has_next, next_ref,
                            jnp.where(do_pop, popped[0:1], cur))
            sp_row = jnp.where(do_pop, sp_row - 1, sp_row)
            active = has_next | do_pop | stall_all[u:u + 1]
            if occlusion:
                active = active & (best < 0)

            new_cur.append(cur)
            new_sp_rows.append(sp_row)
            new_tf.append(t_far)
            new_best.append(best)
            new_act.append(jnp.where(active, 1, 0).astype(jnp.int32))

        cur_ref[:] = jnp.concatenate(new_cur, axis=0)
        sp_ref[:] = jnp.concatenate(new_sp_rows, axis=0)
        tf_ref[:] = jnp.concatenate(new_tf, axis=0)
        best_ref[:] = jnp.concatenate(new_best, axis=0)
        act = jnp.concatenate(new_act, axis=0)
        act_ref[:] = act
        n_active = jnp.sum(act)
        return it + 1, n_active, ntrips + nt, ltrips + lt

    def cond(state):
        return (state[1] > 0) & (state[0] < MAX_STEPS)

    # init state refs (zeroU keeps layouts non-replicated for Mosaic)
    act_ref[:] = zeroU + jnp.where(tnear <= tfar0, 1, 0).astype(jnp.int32)
    cur_ref[:] = zeroU
    sp_ref[:] = zeroU
    tf_ref[:] = zeroU.astype(jnp.float32) + tfar0
    best_ref[:] = zeroU - 1
    stack_ref[:] = jnp.zeros((UGRP, STACK_ROWS, LANE), jnp.int32)
    nrec_ref[:] = jnp.zeros((UGRP, 32, LANE), jnp.int32)
    lrec_ref[:] = jnp.zeros((UGRP, 48, LANE), jnp.float32)

    it_final, _, ntrips, ltrips = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0), jnp.int32(0)))

    out_t_ref[0] = tf_ref[:]
    out_prim_ref[0] = best_ref[:]
    # row 0: step count; row 1: node fetch-loop trips; row 2: leaf trips
    out_steps_ref[0] = zeroU + it_final
    out_steps_ref[0, 1:2] = jnp.broadcast_to(ntrips, (1, LANE))
    out_steps_ref[0, 2:3] = jnp.broadcast_to(ltrips, (1, LANE))


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

    sort_rays: reorder rays by a coherence key so each program touches few
    table tiles (fetch gating); results are returned in original order.
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

    PROG = UGRP * LANE
    B = -(-R // PROG)
    pad = B * PROG - R

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) \
            if pad else x
        return x.reshape(B, UGRP, LANE)

    org = org.astype(jnp.float32)
    dir = dir.astype(jnp.float32)
    # (B, 3, UGRP, LANE): component-major keeps each (8,128) tile one DMA row
    orgp = jnp.stack([prep(org[:, 0], 0), prep(org[:, 1], 0),
                      prep(org[:, 2], 0)], axis=1)
    dirp = jnp.stack([prep(dir[:, 0], 1), prep(dir[:, 1], 1),
                      prep(dir[:, 2], 1)], axis=1)
    tnearp = prep(tnear.astype(jnp.float32), 1)
    tfarp = prep(tfar.astype(jnp.float32), 0)   # pad rays: tnear(1) > tfar(0) -> inactive
    maskp = prep(ray_mask.astype(jnp.int32), 0)

    GN = packed.n_node_tiles
    GL = packed.n_leaf_tiles
    kernel = functools.partial(_kernel, GN=GN, GL=GL, occlusion=occlusion)

    ray3_spec = pl.BlockSpec((1, 3, UGRP, LANE), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, UGRP, LANE), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    t_out, prim_out, steps_out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # constant block index -> Pallas keeps the tables resident in
            # VMEM across grid steps instead of re-DMAing them per ray block
            pl.BlockSpec((GN, 32, LANE), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GL, 48, LANE), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            ray3_spec, ray3_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=[ray_spec, ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, UGRP, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, UGRP, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, UGRP, LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((UGRP, STACK_ROWS, LANE), jnp.int32),   # stacks
            pltpu.VMEM((UGRP, LANE), jnp.int32),         # cur   (row=group)
            pltpu.VMEM((UGRP, LANE), jnp.int32),         # sp
            pltpu.VMEM((UGRP, LANE), jnp.float32),       # t_far
            pltpu.VMEM((UGRP, LANE), jnp.int32),         # best
            pltpu.VMEM((UGRP, LANE), jnp.int32),         # active
            pltpu.VMEM((UGRP, 32, LANE), jnp.int32),     # fetched node recs
            pltpu.VMEM((UGRP, 48, LANE), jnp.float32),   # fetched leaf recs
            pltpu.VMEM((UGRP, LANE), jnp.int32),         # fetch outstanding
        ],
        interpret=interpret,
    )(packed.node_table, packed.leaf_table, orgp, dirp, tnearp, tfarp, maskp)

    LAST_STEPS[0] = steps_out
    t_flat = t_out.reshape(B * PROG)[:R]
    prim_flat = prim_out.reshape(B * PROG)[:R]
    if ridx is not None:
        _, t_flat, prim_flat = jax.lax.sort(
            (ridx, t_flat, prim_flat), num_keys=1)
    return t_flat, prim_flat
