"""Pallas TPU wavefront traversal kernel over the packed record table.

The TPU replacement for the reference's per-ray stack machine
(kernels/bvh/bvh_intersector1.cpp:31: TravRay precompute -> stack loop ->
N-wide slab test -> distance-sorted descent -> Möller leaf test).

v7 design — TILE-PARALLEL: all U ray groups are processed by single wide
vector ops instead of a per-group Python-unrolled body. Earlier versions
unrolled 16 copies of the step body over (8,128) tiles; measured primitive
costs (perf/micro_ops.py) showed a (U*8,128) elementwise op costs ~6.6
cycles — i.e. the VPU eats all U groups in one issue slot sequence — while
the unrolled body paid per-group slicing, broadcasting, and register-spill
overhead ~3x that. Everything below therefore lives in (ROWS=U*8, 128)
arrays, where row = 8*u + c: group u, child/triangle slot c.

Key layout/compute devices:
- Per-block (8-row) shuffles, reductions, broadcasts and barrel rotates are
  built from pltpu.roll with STATIC shifts + masked selects ("butterfly"
  form), because Mosaic supports neither 3D dynamic gathers nor sub-register
  strided slices efficiently. All 8-element bitonic sort stages (the
  bvh_traverser1.h:58 sorting-network analog), hit-count reductions, stack
  rotations and pops compile to a handful of full-width register ops.
- State (cur, sp, t_far, best, active) is carried BLOCK-BROADCAST: every row
  of a group's 8-row block holds the same value. All update math keeps this
  invariant (butterfly results are naturally block-broadcast), so no per-step
  expand/extract between (U,128) and (U,8,128) shapes is ever needed.
- Records are fetched into per-field (ROWS,128) scratch buffers — one
  gatherable 8-row chunk per field — so the compute phase reads whole
  register blocks (zero repacking). Nodes use the first 4 chunks of the
  UNIFIED record layout, leaves all of them (mask-free scenes skip the mask
  chunk — static specialization, the RTCFeatureFlags analog).
- Fetch (v12): node and leaf records live in ONE unified table (pack.py), so
  each step runs a SINGLE fetch phase over all active lanes. For resident
  tables the fetch is LOOP-FREE: FETCH_TILES distinct tiles are served per
  group per step (full-width masked-min chain + per-group lane-gathers
  merged in registers); lanes beyond that STALL — they keep their state and
  retry next step. This removes the two per-step `while_loop`s whose
  ~0.75 µs scalar-sync floor dominated the r4 step time. HBM-streamed
  tables keep one while loop (DMA misses need it) with the node-tile prefix
  of the table pinned resident. Leaf identity is implicit (8*record+slot,
  remapped to prim ids post-kernel via pid_map).
- Leaves hold 8 triangles (LEAF_WIDTH == node width) so the Möller test
  rides the exact same (ROWS,128) register layout as the node slab test.
- Lockstep is per-(U*128)-ray program: programs retire independently,
  bounding the long-tail cost of incoherent rays.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import INVALID_REC, LEAF_WIDTH, N_FIELDS, PackedScene, ltab_rows

import os as _os_tune
LANE = 128
# independent 128-ray groups interleaved per program (sweepable for tuning)
UGRP = int(_os_tune.environ.get("EMBREE_TPU_UGRP", 16))
ROWS = UGRP * 8
STACK_BLOCKS = 8         # stack capacity = 64 refs/ray ((W-1)*depth analog)
STACK_HOT = int(_os_tune.environ.get("EMBREE_TPU_STACK_HOT", 2))
UNROLL = int(_os_tune.environ.get("EMBREE_TPU_UNROLL", 1))
# distinct table tiles served per group per step on the loop-free resident
# fetch path; lanes in further tiles stall to the next step
FETCH_TILES = int(_os_tune.environ.get("EMBREE_TPU_FETCH_TILES", 5))
# 1: serve straggler tiles with a while loop each step instead of stalling
# (pays the ~0.75us loop scalar-sync floor every step — off by default)
FETCH_FINISH = int(_os_tune.environ.get("EMBREE_TPU_FETCH_FINISH", 0))
# resident tables with <= this many tiles are served by unconditional
# all-tile gathers (no fetch loop); see fetch() small path
SMALL_TILES = int(_os_tune.environ.get("EMBREE_TPU_SMALL_TILES", 6))
MAX_STEPS = 200_000      # runaway guard

# Residency policy (v5e: 128 MiB VMEM/core). Tables within the budget stay
# pinned in VMEM; beyond it they live in HBM and stream (see _kernel).
VMEM_RESIDENT_BUDGET = 80 << 20
VMEM_HARD_LIMIT = 100 << 20

# Per-program step counts of the last traverse_packed call (observability —
# the stat.h traversal-counter analog). May hold a traced value under jit.
LAST_STEPS = [None]

# phase-ablation toggles for perf work (EMBREE_TPU_ABLATE=pin24,nosort,...):
# pinned-step-count timing with phases removed; results are garbage
import os as _os_mod
_ABLATE = set(filter(None, _os_mod.environ.get(
    "EMBREE_TPU_ABLATE", "").split(",")))
_SORT_IMPL = _os_mod.environ.get("EMBREE_TPU_SORTIMPL", "pergroup")
_EXPAND_IMPL = _os_mod.environ.get("EMBREE_TPU_EXPAND", "bcast")

# Bitonic network for 8 elements: (k, j) compare-exchange stages.
_SORT_STAGES = ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1))


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _kernel(ntab_ref, atab_ref, org_ref, dir_ref, tnear_ref, tfar_ref,
            mask_ref, time_ref,
            out_t_ref, out_prim_ref, out_steps_ref, out_attr_ref,
            stack_ref, cur_ref, sp_ref, tf_ref, best_ref, act_ref,
            need_ref, pacc_ref, msp_ref, ray_ref, ubuf_ref,
            attr_ref, *rest,
            GN, GT, GNR, occlusion, has_mask, stream,
            robust=False, has_motion=False, has_kinds=False,
            kind_classes=(0,), want_attrs=False, has_win=False,
            NSL=0, NSL_N=0, NF=N_FIELDS, CURVE_RATE=4):
    # ntab_ref: the resident prefix of the unified table (GNR tiles — the
    # whole table when it fits VMEM, else the node tiles; GNR >= 1 so the
    # root tile is always resident). atab_ref: the full table in HBM, read
    # only on the streamed path (tile >= GNR).
    # leaf chunk layout (pack.py):
    # fields A | [fields B] | [mask] | [kind] | [t0 | t1]
    CH_MASK = NF * (2 if has_motion else 1)
    CH_KIND = CH_MASK + (1 if has_mask else 0)
    CH_T0 = CH_KIND + (1 if has_kinds else 0)
    LCH = CH_T0 + (2 if has_win else 0)
    # expanded-ray scratch rows: org(3) dir(3) rdir(3) tnear | [time] |
    # [mask] | [curve ray frame vx(3) vy(3) vz*ds(3) ds]
    RAY_TIME = 10
    RAY_MASK = 10 + (1 if has_motion else 0)
    has_curves = (8 in kind_classes) or (9 in kind_classes)
    RAY_FRAME = RAY_MASK + (1 if has_mask else 0)
    INF_BITS = jnp.int32(0x7F800000)

    # --- streamed-table refs (HBM-resident table, breaking the VMEM scene
    # cap — the device-resident-accel role of the reference's AccelBuffer,
    # kernels/sycl/rthwif_embree_builder.h:81). The streamed suffix gets a
    # shared direct-mapped VMEM tile cache (slot = tile % NSL) + SMEM tags;
    # tags and staged tiles PERSIST across grid programs, so coherence-
    # sorted neighbouring programs re-use each other's tiles. ---
    if stream:
        (stage_ref, tag_ref, sem, started_ref, dmacnt_ref, claim_ref,
         claimw_ref, okf_ref) = rest
        dmacnt_ref[0] = 0

        @pl.when(pl.program_id(0) == 0)
        def _init_tags():
            def bn(i, c):
                tag_ref[i] = -1
                return c
            jax.lax.fori_loop(0, NSL, bn, 0)

    rowall = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 0)
    rowc = rowall & 7                # child/tri slot within the 8-row block
    zeroR = rowall * 0
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    zeroU = jax.lax.broadcasted_iota(jnp.int32, (UGRP, LANE), 0) * 0

    # ---- one-time per program: expand ray components to block-broadcast ----
    if _EXPAND_IMPL == "repeat":
        def expand(x):   # (U,128) -> (ROWS,128) with row 8u+c = x[u]
            return jnp.repeat(x, 8, axis=0, total_repeat_length=ROWS)
    else:
        def expand(x):
            return jnp.broadcast_to(
                x.reshape(UGRP, 1, LANE), (UGRP, 8, LANE)).reshape(ROWS, LANE)

    def b8u(x, u):   # compact group-row -> (8,128) block broadcast
        return jnp.broadcast_to(x[u:u + 1], (8, LANE))

    eps = jnp.float32(1e-18)

    def rcp_safe(x):
        return 1.0 / jnp.where(jnp.abs(x) < eps,
                               jnp.where(x >= 0, eps, -eps), x)

    dx0 = expand(dir_ref[0, 0])
    dy0 = expand(dir_ref[0, 1])
    dz0 = expand(dir_ref[0, 2])
    tnear8 = expand(tnear_ref[0])
    ray_ref[0] = expand(org_ref[0, 0])
    ray_ref[1] = expand(org_ref[0, 1])
    ray_ref[2] = expand(org_ref[0, 2])
    ray_ref[3], ray_ref[4], ray_ref[5] = dx0, dy0, dz0
    ray_ref[6] = rcp_safe(dx0)
    ray_ref[7] = rcp_safe(dy0)
    ray_ref[8] = rcp_safe(dz0)
    ray_ref[9] = tnear8
    if has_motion:
        ray_ref[RAY_TIME] = expand(time_ref[0])
    if has_mask:
        ray_ref[RAY_MASK] = _f32(expand(mask_ref[0]))
    if has_curves:
        # curve-intersector ray space (ops/curve.py _ray_frame;
        # curve_intersector_precalculations.h depth_scale + frame rows)
        d2f = dx0 * dx0 + dy0 * dy0 + dz0 * dz0
        dsf = 1.0 / jnp.sqrt(jnp.maximum(d2f, 1e-36))
        nx, ny, nz = dx0 * dsf, dy0 * dsf, dz0 * dsf
        pickf = (nz * nz + ny * ny) > (nz * nz + nx * nx)
        fx0 = jnp.where(pickf, 0.0, -nz)
        fx1 = jnp.where(pickf, nz, 0.0)
        fx2 = jnp.where(pickf, -ny, nx)
        fl = 1.0 / jnp.sqrt(jnp.maximum(fx0 * fx0 + fx1 * fx1 + fx2 * fx2,
                                        1e-36))
        fx0, fx1, fx2 = fx0 * fl, fx1 * fl, fx2 * fl
        fy0 = ny * fx2 - nz * fx1
        fy1 = nz * fx0 - nx * fx2
        fy2 = nx * fx1 - ny * fx0
        fyl = 1.0 / jnp.sqrt(jnp.maximum(fy0 * fy0 + fy1 * fy1 + fy2 * fy2,
                                         1e-36))
        ray_ref[RAY_FRAME + 0] = fx0
        ray_ref[RAY_FRAME + 1] = fx1
        ray_ref[RAY_FRAME + 2] = fx2
        ray_ref[RAY_FRAME + 3] = fy0 * fyl
        ray_ref[RAY_FRAME + 4] = fy1 * fyl
        ray_ref[RAY_FRAME + 5] = fy2 * fyl
        ray_ref[RAY_FRAME + 6] = nx * dsf
        ray_ref[RAY_FRAME + 7] = ny * dsf
        ray_ref[RAY_FRAME + 8] = nz * dsf
        ray_ref[RAY_FRAME + 9] = dsf

    def fetch_all(act8, cur8):
        """Gather every active lane's current record (node or leaf — one
        unified table) into per-field chunk buffers ubuf_ref[k] (each
        (ROWS,128), 8-row block u = group u's record field). Returns
        (servedU, trips): lanes NOT served this step stall — they keep
        their traversal state and retry next step.

        Resident path: LOOP-FREE. The FETCH_TILES distinct smallest tiles
        per group are selected by a full-width masked-min chain, then each
        group runs one lane-gather per selected tile with register-merged
        results and a single buffer store per chunk (a 72-row gather costs
        the same as an 8-row one, perf/micro_ops.py). Branchless: groups
        with nothing left re-gather a clamped tile with an all-false select
        (a pl.when gate measured 1.75x slower).

        Streamed path (tile >= GNR): per trip of one while loop, every
        group whose cache slot misses its wanted tile starts an async DMA
        (HBM tile -> shared VMEM slot); ALL misses start before any wait so
        up to UGRP copies are in flight at once, then gathers read the
        slots. Two groups wanting the same tile share one DMA; a slot
        COLLISION (same slot, different tile) defers the later group to the
        next trip."""
        # clamp: corrupt refs must not become out-of-bounds tile reads (the
        # GarbageGeometryTest analog — a bad BVH may misreport, never fault).
        # Selection runs FULL-WIDTH (ROWS,LANE): the strided extract to a
        # compact (UGRP,LANE) form and the expand back both cost more than
        # the 8x-redundant reductions (measured — same lesson as the state
        # layout).
        rec8 = jnp.maximum(jnp.where(cur8 >= 0, cur8, -cur8 - 1), 0)
        lane8 = rec8 & (LANE - 1)
        tile8 = jnp.clip(jnp.where(cur8 >= 0, rec8 // LANE,
                                   GN + rec8 // LANE), 0, GT - 1)
        idxs = [jnp.concatenate([lane8[8 * u:8 * u + 8]] * LCH, axis=0)
                for u in range(UGRP)]

        if (not stream) and GT <= SMALL_TILES:
            # tiny resident table: serve EVERY tile unconditionally — no
            # cross-lane min reductions, no dynamic slices
            for u in range(UGRP):
                gu = tile8[8 * u:8 * u + 1]            # (1,LANE) block-bcast
                acc = jnp.take_along_axis(ntab_ref[0][:8 * LCH], idxs[u],
                                          axis=1)
                for g in range(1, GT):
                    got = jnp.take_along_axis(ntab_ref[g][:8 * LCH],
                                              idxs[u], axis=1)
                    selg = jnp.broadcast_to(gu == g, (8 * LCH, LANE))
                    acc = jnp.where(selg, got, acc)
                for k in range(LCH):
                    ubuf_ref[k, 8 * u:8 * u + 8] = acc[8 * k:8 * k + 8]
            return act8, jnp.int32(1)

        # --- resident prefix: static tile serves, no loop (in stream mode
        # this is the node-lane path; node stragglers stall) ---
        res_rem0 = (act8 & (tile8 < GNR)) if stream else act8
        n_res = min(FETCH_TILES, GNR)
        # in stream mode the static path serves NODE lanes only (the
        # resident prefix is the node tiles): gather just the 4 node chunks
        # — leaf-chunk rows hold stale values the ok-masks gate out
        chs = 4 if stream else LCH
        rem = res_rem0
        gsafes, sels = [], []
        for i in range(n_res):
            gcur = jnp.min(jnp.where(rem, tile8, jnp.int32(GT)),
                           axis=1, keepdims=True)      # (ROWS,1)
            gsafes.append(jnp.minimum(gcur, GNR - 1))
            sel = rem & (tile8 == jnp.broadcast_to(gcur, (ROWS, LANE)))
            sels.append(sel)
            rem = rem & ~sel
        for u in range(UGRP):
            accs = None
            for i in range(n_res):
                tl = ntab_ref[gsafes[i][8 * u, 0]]     # (rows,128) dyn slice
                got = jnp.take_along_axis(tl[:8 * chs], idxs[u][:8 * chs],
                                          axis=1)
                if accs is None:
                    # first serve writes unconditionally: unserved lanes get
                    # garbage that the ok-masks gate out of the compute phase
                    accs = [got[8 * k:8 * k + 8] for k in range(chs)]
                else:
                    su = sels[i][8 * u:8 * u + 8]
                    accs = [jnp.where(su, got[8 * k:8 * k + 8], accs[k])
                            for k in range(chs)]
            for k in range(chs):
                ubuf_ref[k, 8 * u:8 * u + 8] = accs[k]
        served_static = res_rem0 & ~rem
        trips = jnp.int32(n_res)
        if not stream and not FETCH_FINISH:
            # stall mode (default): lanes beyond FETCH_TILES distinct tiles
            # keep their state and retry next step — no loop machinery at all
            return served_static, trips
        if not stream:
            # finish loop: the rare lanes spanning more than FETCH_TILES
            # distinct tiles are served by a short while loop (merge writes
            # into the buffers) instead of stalling them to the next step.
            # (the remaining-mask is carried through need_ref: Mosaic cannot
            # legalize i1 vector while-loop carries)
            need_ref[:] = jnp.where(rem, 1, 0) + zeroR

            def rbody(state):
                _, t = state
                rrem = need_ref[:] > 0
                gcur = jnp.min(jnp.where(rrem, tile8, jnp.int32(GT)),
                               axis=1, keepdims=True)
                gsafe = jnp.minimum(gcur, GNR - 1)
                sel = rrem & (tile8 == jnp.broadcast_to(gcur, (ROWS, LANE)))
                for u in range(UGRP):
                    tl = ntab_ref[gsafe[8 * u, 0]]
                    got = jnp.take_along_axis(tl[:8 * LCH], idxs[u], axis=1)
                    su = sel[8 * u:8 * u + 8]
                    for k in range(LCH):
                        ubuf_ref[k, 8 * u:8 * u + 8] = jnp.where(
                            su, got[8 * k:8 * k + 8],
                            ubuf_ref[k, 8 * u:8 * u + 8])
                left = rrem & ~sel
                need_ref[:] = jnp.where(left, 1, 0) + zeroR * 0
                return (jnp.min(jnp.where(left, tile8, jnp.int32(GT))),
                        t + 1)

            _, extra = jax.lax.while_loop(
                lambda s: s[0] < GT, rbody,
                (jnp.min(jnp.where(rem, tile8, jnp.int32(GT))),
                 jnp.int32(0)))
            return res_rem0, trips + extra

        # --- streamed suffix: while loop over the shared tile cache (the
        # remaining-mask rides in need_ref — no i1 vector loop carries).
        # The cache is PARTITIONED: node tiles (tile < GN, the hot tree top)
        # map to their own slot range — with NSL_N >= GN they become
        # resident after first touch — while leaf tiles share the rest. ---
        def _slot_of(want):
            return jnp.where(
                want < GN, jax.lax.rem(want, jnp.int32(max(NSL_N, 1))),
                NSL_N + jax.lax.rem(want - GN,
                                    jnp.int32(max(NSL - NSL_N, 1))))

        def serve_stream(strem):
            gcur = jnp.min(jnp.where(strem, tile8, jnp.int32(GT)),
                           axis=1, keepdims=True)
            gsafe = jnp.minimum(gcur, GT - 1)
            sel = strem & (tile8 == jnp.broadcast_to(gcur, (ROWS, LANE)))
            for u in range(UGRP):
                want = gsafe[8 * u, 0]
                active = gcur[8 * u, 0] < GT
                slot = _slot_of(want)
                coll = active & False
                for v in range(u):
                    coll = coll | ((claim_ref[v] == slot)
                                   & (claimw_ref[v] != want))
                ok_u = active & ~coll
                claim_ref[u] = jnp.where(ok_u, slot, -1)
                claimw_ref[u] = want
                okf_ref[u] = jnp.where(ok_u, 1, 0)
                miss = ok_u & (tag_ref[slot] != want)
                started_ref[u] = jnp.where(miss, 1, 0)

                @pl.when(miss)
                def _(u=u, want=want, slot=slot):
                    pltpu.make_async_copy(
                        atab_ref.at[want], stage_ref.at[slot],
                        sem.at[u]).start()
                    tag_ref[slot] = want
                    dmacnt_ref[0] = dmacnt_ref[0] + 1
            for u in range(UGRP):
                @pl.when(started_ref[u] == 1)
                def _(u=u):
                    pltpu.make_async_copy(
                        atab_ref.at[claimw_ref[u]],
                        stage_ref.at[claim_ref[u]],
                        sem.at[u]).wait()
            # deferred groups keep their lanes outstanding
            gate = jnp.concatenate(
                [jnp.broadcast_to((okf_ref[u] == 1).reshape(1, 1),
                                  (8, LANE)) for u in range(UGRP)],
                axis=0)
            sel = sel & gate
            for u in range(UGRP):
                slot = _slot_of(gsafe[8 * u, 0])
                tile = stage_ref[slot]                 # staged (rows,128)
                got = jnp.take_along_axis(tile[:8 * LCH], idxs[u], axis=1)
                su = sel[8 * u:8 * u + 8]
                for k in range(LCH):
                    ubuf_ref[k, 8 * u:8 * u + 8] = jnp.where(
                        su, got[8 * k:8 * k + 8],
                        ubuf_ref[k, 8 * u:8 * u + 8])
            left = strem & ~sel
            need_ref[:] = jnp.where(left, 1, 0) + zeroR * 0
            return jnp.min(jnp.where(left, tile8, jnp.int32(GT)))

        strem0 = act8 & (tile8 >= GNR)
        need_ref[:] = jnp.where(strem0, 1, 0) + zeroR

        def sbody(state):
            _, st = state
            gmin = serve_stream(need_ref[:] > 0)
            return gmin, st + 1

        _, st = jax.lax.while_loop(
            lambda s: s[0] < GT, sbody,
            (jnp.min(jnp.where(strem0, tile8, jnp.int32(GT))),
             jnp.int32(0)))
        # the streamed loop runs to completion: every streamed lane is
        # served; resident-prefix lanes beyond the static serves stall
        return served_static | strem0, trips + st

    def step(ftrips):
        # scalar per-ray state is carried BLOCK-BROADCAST (every row of a
        # group's 8-row block holds the same value): measured faster than a
        # compact (UGRP,LANE) layout — the expand()/strided-extract at the
        # 8-row use sites cost more than the 8x-redundant updates save.
        act8 = act_ref[:] > 0
        cur8 = cur_ref[:]
        sp8 = sp_ref[:]
        tf8 = tf_ref[:]
        best8 = best_ref[:]
        ox, oy, oz = ray_ref[0], ray_ref[1], ray_ref[2]
        dx, dy, dz = ray_ref[3], ray_ref[4], ray_ref[5]
        rdx, rdy, rdz = ray_ref[6], ray_ref[7], ray_ref[8]
        tnear8 = ray_ref[9]

        at_node8 = act8 & (cur8 >= 0)
        at_leaf8 = act8 & (cur8 < 0)
        if _ABLATE & {"nofetch", "nofetchn", "nofetchl"}:
            served8, ft = at_node8 | at_leaf8, jnp.int32(0)
        else:
            served8, ft = fetch_all(act8, cur8)
        node_ok8 = served8 & at_node8
        leaf_ok8 = served8 & at_leaf8
        stall8 = act8 & ~served8

        # ======== tile-parallel elementwise phases: ALL groups at once =====
        # ---------------- internal: 8-wide slab test ----------------
        crefs = ubuf_ref[0]                                # (ROWS,128)

        def bnd(d):
            bits = ubuf_ref[1 + d]
            lo = _f32(bits << 16)
            hi = _f32(bits & ~jnp.int32(0xFFFF))
            return lo, hi

        (lox, hix), (loy, hiy), (loz, hiz) = (bnd(d) for d in range(3))
        tx0 = (lox - ox) * rdx
        tx1 = (hix - ox) * rdx
        ty0 = (loy - oy) * rdy
        ty1 = (hiy - oy) * rdy
        tz0 = (loz - oz) * rdz
        tz1 = (hiz - oz) * rdz
        if robust:
            # ±3-ulp widened slabs (node_intersector1.h:106-110 robust mode)
            rdn = jnp.float32(1.0 - 3.0 * 1.19209290e-07)
            rup = jnp.float32(1.0 + 3.0 * 1.19209290e-07)
            tent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1) * rdn,
                                           jnp.minimum(ty0, ty1) * rdn),
                               jnp.maximum(jnp.minimum(tz0, tz1) * rdn,
                                           tnear8))
            tex = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1) * rup,
                                          jnp.maximum(ty0, ty1) * rup),
                              jnp.minimum(jnp.maximum(tz0, tz1) * rup, tf8))
        else:
            tent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.maximum(jnp.minimum(tz0, tz1), tnear8))
            tex = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.minimum(jnp.maximum(tz0, tz1), tf8))
        hit = (tent <= tex) & (crefs != INVALID_REC) & node_ok8

        # sort keys: distance bits (>=0 so monotonic as int) with the low 3
        # bits replaced by the child slot -> distinct keys, clean tie-breaks;
        # misses sort to the end as +inf
        kd = _i32(jnp.maximum(tent, 0.0))
        keyR = jnp.where(hit, (kd & ~jnp.int32(7)) | rowc, INF_BITS | rowc)
        hR = jnp.sum(hit.reshape(UGRP, 8, LANE).astype(jnp.int32), axis=1)

        # ---------------- leaf: 8 per-kind primitive tests ----------------
        # each slot carries 9 generic fields (pack.py layout); 2-step motion
        # scenes lerp A->B fields by ray time; heterogeneous scenes select
        # the per-slot result by the kind-tag chunk. All branches are STATIC
        # specializations per scene shape (acceln per-type dispatch analog,
        # kernels/common/acceln.cpp:44, collapsed into one record test).
        if has_motion:
            time8 = ray_ref[RAY_TIME]
            if has_win:
                # time-sliced multi-step motion: lerp weight is the window-
                # local time; hits outside the slot's window are rejected
                # below (the MSMBlur itime selection, done per slot)
                wt0 = _f32(ubuf_ref[CH_T0])
                wt1 = _f32(ubuf_ref[CH_T0 + 1])
                wl8 = jnp.clip((time8 - wt0)
                               / jnp.maximum(wt1 - wt0, 1e-9), 0.0, 1.0)
            else:
                wl8 = time8

            def lf(k):
                a = _f32(ubuf_ref[k])
                return a + wl8 * (_f32(ubuf_ref[NF + k]) - a)
        else:
            def lf(k):
                return _f32(ubuf_ref[k])

        class_results = []   # (kind_tag, valid, t)
        slot_attrs = None    # (u, v, ngx, ngy, ngz) per slot, pure-tri only

        if 0 in kind_classes:      # triangles (quads ride as two tri slots)
            v0x, v0y, v0z = lf(0), lf(1), lf(2)
            e1x, e1y, e1z = lf(3), lf(4), lf(5)
            e2x, e2y, e2z = lf(6), lf(7), lf(8)
            if robust:
                # watertight Plücker edge-consistent test (the robust leaf
                # variant, triangle_intersector_pluecker.h; matches
                # ops/triangle.py)
                ax = v0x - ox; ay = v0y - oy; az = v0z - oz
                bx = ax + e1x; by = ay + e1y; bz = az + e1z
                cx = ax + e2x; cy = ay + e2y; cz = az + e2z
                Up = dx * (cy * bz - cz * by) + dy * (cz * bx - cx * bz) \
                    + dz * (cx * by - cy * bx)
                Vp = dx * (ay * cz - az * cy) + dy * (az * cx - ax * cz) \
                    + dz * (ax * cy - ay * cx)
                Wp = dx * (by * az - bz * ay) + dy * (bz * ax - bx * az) \
                    + dz * (bx * ay - by * ax)
                minUVW = jnp.minimum(jnp.minimum(Up, Vp), Wp)
                maxUVW = jnp.maximum(jnp.maximum(Up, Vp), Wp)
                ngx = e1y * e2z - e1z * e2y
                ngy = e1z * e2x - e1x * e2z
                ngz = e1x * e2y - e1y * e2x
                den = ngx * dx + ngy * dy + ngz * dz
                inv_den = jnp.where(jnp.abs(den) > 1e-30, 1.0 / den, 0.0)
                tt0 = (ngx * ax + ngy * ay + ngz * az) * inv_den
                tvalid = (((minUVW >= 0.0) | (maxUVW <= 0.0))
                          & (jnp.abs(den) > 1e-30)
                          & (tt0 >= tnear8) & (tt0 <= tf8))
                if want_attrs:
                    S = Up + Vp + Wp
                    rcpS = jnp.where(jnp.abs(S) > 1e-30, 1.0 / S, 0.0)
                    slot_attrs = (Up * rcpS, Vp * rcpS, ngx, ngy, ngz)
            else:
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-24, 1.0 / det, 0.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt0 = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                tvalid = ((jnp.abs(det) > 1e-24)
                          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (tt0 >= tnear8) & (tt0 <= tf8))
                if want_attrs:
                    slot_attrs = (uu, vv,
                                  e1y * e2z - e1z * e2y,
                                  e1z * e2x - e1x * e2z,
                                  e1x * e2y - e1y * e2x)
            class_results.append((0, tvalid, tt0))

        if (2 in kind_classes) or (5 in kind_classes):
            ddot = dx * dx + dy * dy + dz * dz          # |dir|^2

        if 2 in kind_classes:      # KIND_SPHERE (ops/point.py parity)
            ocx = ox - lf(0); ocy = oy - lf(1); ocz = oz - lf(2)
            r = lf(3)
            bq = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = bq * bq - 4.0 * ddot * cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv2a = 1.0 / jnp.maximum(2.0 * ddot, 1e-30)
            st0 = (-bq - sq) * inv2a
            st1 = (-bq + sq) * inv2a
            ok = disc >= 0.0
            v_0 = ok & (st0 >= tnear8) & (st0 <= tf8)
            v_1 = ok & (st1 >= tnear8) & (st1 <= tf8)
            class_results.append((2, v_0 | v_1, jnp.where(v_0, st0, st1)))

        if 3 in kind_classes:      # KIND_DISC: ray-facing disc
            cmox = lf(0) - ox; cmoy = lf(1) - oy; cmoz = lf(2) - oz
            r = lf(3)
            d2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)
            td = (cmox * dx + cmoy * dy + cmoz * dz) / d2
            px = td * dx - cmox; py = td * dy - cmoy; pz = td * dz - cmoz
            r2 = px * px + py * py + pz * pz
            class_results.append(
                (3, (td >= tnear8) & (td <= tf8) & (r2 <= r * r), td))

        if 4 in kind_classes:      # KIND_ORIENTED_DISC
            cmox = lf(0) - ox; cmoy = lf(1) - oy; cmoz = lf(2) - oz
            r = lf(3)
            nx, ny, nz = lf(4), lf(5), lf(6)
            dn = dx * nx + dy * ny + dz * nz
            ok = jnp.abs(dn) > 1e-12
            td = (cmox * nx + cmoy * ny + cmoz * nz) / jnp.where(ok, dn, 1.0)
            px = td * dx - cmox; py = td * dy - cmoy; pz = td * dz - cmoz
            r2 = px * px + py * py + pz * pz
            class_results.append(
                (4, ok & (td >= tnear8) & (td <= tf8) & (r2 <= r * r), td))

        if 5 in kind_classes:      # KIND_ROUND_LINE: tangent cone-sphere
            # exact mirror of ops/line.py intersect_round_line
            # (roundline_intersector.h cone_sphere CSG)
            p0x, p0y, p0z, r0 = lf(0), lf(1), lf(2), lf(3)
            p1x, p1y, p1z, r1 = lf(4), lf(5), lf(6), lf(7)
            rcpdd = 1.0 / jnp.maximum(ddot, 1e-30)
            ccx = 0.5 * (p0x + p1x); ccy = 0.5 * (p0y + p1y)
            ccz = 0.5 * (p0z + p1z)
            dtl = ((ccx - ox) * dx + (ccy - oy) * dy + (ccz - oz) * dz) * rcpdd
            o2x = ox + dtl * dx; o2y = oy + dtl * dy; o2z = oz + dtl * dz
            dPx = p1x - p0x; dPy = p1y - p0y; dPz = p1z - p0z
            dPdP = dPx * dPx + dPy * dPy + dPz * dPz
            drr = r1 - r0
            r0dr = r0 * drr
            gco = dPdP - drr * drr
            Oxx = o2x - p0x; Oyy = o2y - p0y; Ozz = o2z - p0z
            OdP = Oxx * dPx + Oyy * dPy + Ozz * dPz
            dOdP = dx * dPx + dy * dPy + dz * dPz
            ypc = OdP + r0dr
            OO = Oxx * Oxx + Oyy * Oyy + Ozz * Ozz
            OdO = dx * Oxx + dy * Oyy + dz * Ozz
            Ac = gco * ddot - dOdP * dOdP
            Bc = 2.0 * (gco * OdO - dOdP * ypc)
            Cc = gco * OO - OdP * OdP - r0 * r0 * dPdP - 2.0 * r0dr * OdP
            Dc = Bc * Bc - 4.0 * Ac * Cc
            cone_ok = (Dc >= 0.0) & (gco > 0.0) & (jnp.abs(Ac) > 1e-18)
            Qc = jnp.sqrt(jnp.maximum(Dc, 0.0))
            rc2A = 1.0 / jnp.where(cone_ok, 2.0 * Ac, 1.0)
            tcf = (-Bc - Qc) * rc2A
            tcb = (-Bc + Qc) * rc2A
            ycf = ypc + tcf * dOdP
            ycb = ypc + tcb * dOdP
            ulp1 = jnp.float32(1.19209290e-07)
            cf_ok = cone_ok & (ycf > -ulp1) & (ycf <= gco)
            cb_ok = cone_ok & (ycb > -ulp1) & (ycb <= gco)

            def lsph(cx_, cy_, cz_, cr):
                O1x = o2x - cx_; O1y = o2y - cy_; O1z = o2z - cz_
                O1dO = O1x * dx + O1y * dy + O1z * dz
                h2 = O1dO * O1dO - ddot * (
                    O1x * O1x + O1y * O1y + O1z * O1z - cr * cr)
                okq = h2 >= 0.0
                rt = jnp.sqrt(jnp.maximum(h2, 0.0))
                return okq, (-O1dO - rt) * rcpdd, (-O1dO + rt) * rcpdd

            s0ok, ts0f, ts0b = lsph(p0x, p0y, p0z, r0)
            s1ok, ts1f, ts1b = lsph(p1x, p1y, p1z, r1)
            # interior connection caps belong to the previous segment's end
            # sphere (field 8 flag; ops/line.py begin_cap)
            s0ok = s0ok & (lf(8) < 0.5)
            s0f = s0ok & (ypc + ts0f * dOdP < 0.0)
            s0b = s0ok & (ypc + ts0b * dOdP < 0.0)
            # y > gco clip applies even when the cone is degenerate
            # (gco <= 0): shrinking degenerates must drop end-sphere hits
            # buried inside the fat begin sphere (ops/line.py rls_9 note)
            s1f = s1ok & (ypc + ts1f * dOdP > gco)
            s1b = s1ok & (ypc + ts1b * dOdP > gco)
            BIG = jnp.float32(3e38)
            t_lo = jnp.minimum(jnp.where(cf_ok, tcf, BIG),
                               jnp.minimum(jnp.where(s0f, ts0f, BIG),
                                           jnp.where(s1f, ts1f, BIG)))
            t_up = jnp.maximum(jnp.where(cb_ok, tcb, -BIG),
                               jnp.maximum(jnp.where(s0b, ts0b, -BIG),
                                           jnp.where(s1b, ts1b, -BIG)))
            lo_ok = ((tnear8 <= dtl + t_lo) & (dtl + t_lo <= tf8)
                     & (t_lo < BIG))
            up_ok = ((tnear8 <= dtl + t_up) & (dtl + t_up <= tf8)
                     & (t_up > -BIG))
            t_line = dtl + jnp.where(lo_ok, t_lo, t_up)
            class_results.append((5, lo_ok | up_ok, t_line))

        if 6 in kind_classes:      # KIND_FLAT_LINE: ray-facing flat segment
            # exact mirror of ops/line.py intersect_flat_line
            # (line_intersector.h 2D ray-space closest approach)
            p0x, p0y, p0z, r0 = lf(0), lf(1), lf(2), lf(3)
            p1x, p1y, p1z, r1 = lf(4), lf(5), lf(6), lf(7)
            vx_ = p1x - p0x; vy_ = p1y - p0y; vz_ = p1z - p0z
            wx = p0x - ox; wy = p0y - oy; wz = p0z - oz
            invdd = 1.0 / jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)
            wd = wx * dx + wy * dy + wz * dz
            vd = vx_ * dx + vy_ * dy + vz_ * dz
            wv = (wx * vx_ + wy * vy_ + wz * vz_) - wd * vd * invdd
            vv2 = (vx_ * vx_ + vy_ * vy_ + vz_ * vz_) - vd * vd * invdd
            okf = vv2 > 1e-20
            sf = jnp.clip(jnp.where(okf, -wv / jnp.where(okf, vv2, 1.0), 0.0),
                          0.0, 1.0)
            mx = wx + sf * vx_; my = wy + sf * vy_; mz = wz + sf * vz_
            md = mx * dx + my * dy + mz * dz
            tl = md * invdd
            d2f = mx * mx + my * my + mz * mz - md * md * invdd
            rr = r0 + sf * (r1 - r0)
            fok = ((d2f <= rr * rr) & (tl >= tnear8) & (tl <= tf8)
                   & (tl > 2.0 * rr * jax.lax.rsqrt(
                       jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)))
                   & ((vx_ != 0.0) | (vy_ != 0.0) | (vz_ != 0.0)))
            class_results.append((6, fok, tl))

        if has_curves:
            # shared curve state: ray-space frame + the 16 CP planes
            fvx = [ray_ref[RAY_FRAME + i] for i in range(3)]
            fvy = [ray_ref[RAY_FRAME + 3 + i] for i in range(3)]
            fvz = [ray_ref[RAY_FRAME + 6 + i] for i in range(3)]
            fds = ray_ref[RAY_FRAME + 9]
            cpx = [lf(4 * j + 0) for j in range(4)]
            cpy = [lf(4 * j + 1) for j in range(4)]
            cpz = [lf(4 * j + 2) for j in range(4)]
            cpr = [lf(4 * j + 3) for j in range(4)]

            def bezw(t):   # python-float Bernstein weights
                sm = 1.0 - t
                return (sm * sm * sm, 3 * sm * sm * t, 3 * sm * t * t,
                        t * t * t)

            def bez2w(t):  # quadratic basis (derivative combination)
                sm = 1.0 - t
                return (sm * sm, 2 * sm * t, t * t)

        if 8 in kind_classes:   # KIND_CURVE_FLAT: ribbon intersector
            # exact per-plane port of ops/curve.py intersect_ribbon
            # (curve_intersector_ribbon.h:73-177): CPs into ray space,
            # CURVE_RATE ruled quads between the +-r offset curves,
            # backface-culling 2D quad tests, nearest accepted t per slot
            R = CURVE_RATE
            c2x, c2y, c2z = [], [], []
            for j in range(4):
                rx = cpx[j] - ox
                ry = cpy[j] - oy
                rz = cpz[j] - oz
                c2x.append(rx * fvx[0] + ry * fvx[1] + rz * fvx[2])
                c2y.append(rx * fvy[0] + ry * fvy[1] + rz * fvy[2])
                c2z.append(rx * fvz[0] + ry * fvz[1] + rz * fvz[2])
            amax = jnp.zeros_like(ox)
            for j in range(4):
                amax = jnp.maximum(amax, jnp.abs(c2x[j]))
                amax = jnp.maximum(amax, jnp.abs(c2y[j]))
                amax = jnp.maximum(amax, jnp.abs(c2z[j]))
                amax = jnp.maximum(amax, jnp.abs(cpr[j]))
            epsr = jnp.float32(4.0 * 1.19209290e-07) * amax
            # knot evals (static weights)
            pkx, pky, pkz, pkr, dkx, dky, dkz, ksm = \
                [], [], [], [], [], [], [], []
            for k in range(R + 1):
                w = bezw(k / R)
                pkx.append(w[0] * c2x[0] + w[1] * c2x[1]
                           + w[2] * c2x[2] + w[3] * c2x[3])
                pky.append(w[0] * c2y[0] + w[1] * c2y[1]
                           + w[2] * c2y[2] + w[3] * c2y[3])
                pkz.append(w[0] * c2z[0] + w[1] * c2z[1]
                           + w[2] * c2z[2] + w[3] * c2z[3])
                pkr.append(w[0] * cpr[0] + w[1] * cpr[1]
                           + w[2] * cpr[2] + w[3] * cpr[3])
                w2 = bez2w(k / R)
                dkx.append(3.0 * (w2[0] * (c2x[1] - c2x[0])
                                  + w2[1] * (c2x[2] - c2x[1])
                                  + w2[2] * (c2x[3] - c2x[2])))
                dky.append(3.0 * (w2[0] * (c2y[1] - c2y[0])
                                  + w2[1] * (c2y[2] - c2y[1])
                                  + w2[2] * (c2y[3] - c2y[2])))
                dkz.append(3.0 * (w2[0] * (c2z[1] - c2z[0])
                                  + w2[1] * (c2z[2] - c2z[1])
                                  + w2[2] * (c2z[3] - c2z[2])))
                ksm.append(jnp.maximum(jnp.maximum(jnp.abs(dkx[-1]),
                                                   jnp.abs(dky[-1])),
                                       jnp.abs(dkz[-1])) < epsr)
            BIGF = jnp.float32(jnp.inf)
            rib_t = jnp.full_like(ox, BIGF)
            rib_hit = jnp.zeros_like(ox, bool)
            for i in range(R):
                sdx = pkx[i + 1] - pkx[i]
                sdy = pky[i + 1] - pky[i]
                sdz = pkz[i + 1] - pkz[i]
                d0x = jnp.where(ksm[i], sdx, dkx[i])
                d0y = jnp.where(ksm[i], sdy, dky[i])
                d1x = jnp.where(ksm[i + 1], sdx, dkx[i + 1])
                d1y = jnp.where(ksm[i + 1], sdy, dky[i + 1])
                # cylinder culling vs the 2D origin (ribbon.h:66-71)
                num = sdx * pky[i] - sdy * pkx[i]
                den2 = sdx * sdx + sdy * sdy
                rmax = jnp.maximum(pkr[i], pkr[i + 1])
                vseg = num * num <= rmax * rmax * den2
                n0l = 1.0 / jnp.sqrt(jnp.maximum(d0y * d0y + d0x * d0x,
                                                 1e-36))
                n1l = 1.0 / jnp.sqrt(jnp.maximum(d1y * d1y + d1x * d1x,
                                                 1e-36))
                n0x, n0y = d0y * n0l, -d0x * n0l
                n1x, n1y = d1y * n1l, -d1x * n1l
                lp0x = pkx[i] + pkr[i] * n0x
                lp0y = pky[i] + pkr[i] * n0y
                up0x = pkx[i] - pkr[i] * n0x
                up0y = pky[i] - pkr[i] * n0y
                lp1x = pkx[i + 1] + pkr[i + 1] * n1x
                lp1y = pky[i + 1] + pkr[i + 1] * n1y
                up1x = pkx[i + 1] - pkr[i + 1] * n1x
                up1y = pky[i + 1] - pkr[i + 1] * n1y
                # quad (lp0, lp1, up1, up0), backface-culled 2D variant
                # (quad_intersector.h:15-74); z rides along for t
                vax, vay, vaz = lp0x, lp0y, pkz[i]
                vbx, vby, vbz = lp1x, lp1y, pkz[i + 1]
                vcx, vcy, vcz = up1x, up1y, pkz[i + 1]
                vdx, vdy, vdz = up0x, up0y, pkz[i]
                edbx = vbx - vdx
                edby = vby - vdy
                WW = vdx * edby - vdy * edbx
                selq = WW <= 0.0
                v0x = jnp.where(selq, vax, vcx)
                v0y = jnp.where(selq, vay, vcy)
                v0z = jnp.where(selq, vaz, vcz)
                v1x = jnp.where(selq, vbx, vdx)
                v1y = jnp.where(selq, vby, vdy)
                v1z = jnp.where(selq, vbz, vdz)
                v2x = jnp.where(selq, vdx, vbx)
                v2y = jnp.where(selq, vdy, vby)
                v2z = jnp.where(selq, vdz, vbz)
                e0x, e0y, e0z = v2x - v0x, v2y - v0y, v2z - v0z
                e1x, e1y, e1z = v0x - v1x, v0y - v1y, v0z - v1z
                Uq = v0x * e0y - v0y * e0x
                Vq = v1x * e1y - v1y * e1x
                vseg = vseg & (jnp.maximum(Uq, Vq) <= 0.0)
                ngx_ = e1y * e0z - e1z * e0y
                ngy_ = e1z * e0x - e1x * e0z
                ngz_ = e1x * e0y - e1y * e0x
                denq = ngz_
                rden = jnp.where(denq != 0.0,
                                 1.0 / jnp.where(denq == 0.0, 1.0, denq), 0.0)
                tq = rden * (v0x * ngx_ + v0y * ngy_ + v0z * ngz_)
                vseg = vseg & (tnear8 <= tq) & (tq <= tf8) & (denq != 0.0)
                uq = Uq * rden
                uq = jnp.where(selq, uq, 1.0 - uq)
                r_at = pkr[i] * (1.0 - uq) + pkr[i + 1] * uq
                # self-intersection avoidance (ribbon.h:117-120)
                vseg = vseg & (tq > 2.0 * r_at * fds)
                take = vseg & (tq < rib_t)
                rib_t = jnp.where(take, tq, rib_t)
                rib_hit = rib_hit | vseg
            class_results.append((8, rib_hit, rib_t))

        if 9 in kind_classes:   # KIND_CURVE_ROUND: swept circle
            # TPU-first two-phase: CURVE_RATE cone-segment candidates (the
            # tangent cone-sphere test of the round-line kind) seed a short
            # Jacobian-Newton polish of the exact sweep equations
            # (curve_intersector_sweep.h:59-141; ops/curve.py
            # intersect_sweep). Converged roots replace the candidate t;
            # diverged candidates keep the tessellated t (conservative).
            R = max(CURVE_RATE, 8)
            ddot_c = dx * dx + dy * dy + dz * dz
            rcpdd_c = 1.0 / jnp.maximum(ddot_c, 1e-30)
            qkx, qky, qkz, qkr = [], [], [], []
            for k in range(R + 1):
                w = bezw(k / R)
                qkx.append(w[0] * cpx[0] + w[1] * cpx[1]
                           + w[2] * cpx[2] + w[3] * cpx[3])
                qky.append(w[0] * cpy[0] + w[1] * cpy[1]
                           + w[2] * cpy[2] + w[3] * cpy[3])
                qkz.append(w[0] * cpz[0] + w[1] * cpz[1]
                           + w[2] * cpz[2] + w[3] * cpz[3])
                qkr.append(w[0] * cpr[0] + w[1] * cpr[1]
                           + w[2] * cpr[2] + w[3] * cpr[3])
            BIGR = jnp.float32(3e38)
            seg_cands = []        # per-segment (hit, t, u) Newton seeds
            cand_hit = jnp.zeros_like(ox, bool)
            for i in range(R):
                p0x_, p0y_, p0z_, r0_ = qkx[i], qky[i], qkz[i], qkr[i]
                p1x_, p1y_, p1z_, r1_ = (qkx[i + 1], qky[i + 1],
                                         qkz[i + 1], qkr[i + 1])
                ccx = 0.5 * (p0x_ + p1x_)
                ccy = 0.5 * (p0y_ + p1y_)
                ccz = 0.5 * (p0z_ + p1z_)
                dtl = ((ccx - ox) * dx + (ccy - oy) * dy
                       + (ccz - oz) * dz) * rcpdd_c
                o2x = ox + dtl * dx
                o2y = oy + dtl * dy
                o2z = oz + dtl * dz
                dPx = p1x_ - p0x_
                dPy = p1y_ - p0y_
                dPz = p1z_ - p0z_
                dPdP = dPx * dPx + dPy * dPy + dPz * dPz
                drr = r1_ - r0_
                r0dr = r0_ * drr
                gco = dPdP - drr * drr
                Oxx = o2x - p0x_
                Oyy = o2y - p0y_
                Ozz = o2z - p0z_
                OdP = Oxx * dPx + Oyy * dPy + Ozz * dPz
                dOdP = dx * dPx + dy * dPy + dz * dPz
                ypc = OdP + r0dr
                OO = Oxx * Oxx + Oyy * Oyy + Ozz * Ozz
                OdO = dx * Oxx + dy * Oyy + dz * Ozz
                Ac = gco * ddot_c - dOdP * dOdP
                Bc = 2.0 * (gco * OdO - dOdP * ypc)
                Cc = (gco * OO - OdP * OdP - r0_ * r0_ * dPdP
                      - 2.0 * r0dr * OdP)
                Dc = Bc * Bc - 4.0 * Ac * Cc
                cone_ok = (Dc >= 0.0) & (gco > 0.0) & (jnp.abs(Ac) > 1e-18)
                Qc = jnp.sqrt(jnp.maximum(Dc, 0.0))
                rc2A = 1.0 / jnp.where(cone_ok, 2.0 * Ac, 1.0)
                tcf = (-Bc - Qc) * rc2A
                tcb = (-Bc + Qc) * rc2A
                ycf = ypc + tcf * dOdP
                ycb = ypc + tcb * dOdP
                cf_ok = cone_ok & (ycf > 0.0) & (ycf <= gco)
                cb_ok = cone_ok & (ycb > 0.0) & (ycb <= gco)
                tlo = jnp.where(cf_ok, tcf, BIGR)
                tup = jnp.where(cb_ok, tcb, -BIGR)
                lo_ok = ((tnear8 <= dtl + tlo) & (dtl + tlo <= tf8)
                         & (tlo < BIGR))
                up_ok = ((tnear8 <= dtl + tup) & (dtl + tup <= tf8)
                         & (tup > -BIGR))
                t_i = dtl + jnp.where(lo_ok, tlo, tup)
                y_i = jnp.where(lo_ok, ycf, ycb)
                hit_i = lo_ok | up_ok
                u_i = (i + jnp.clip(y_i
                                    / jnp.maximum(gco, 1e-30), 0.0, 1.0)) / R
                seg_cands.append((hit_i, t_i, u_i))
                cand_hit = cand_hit | hit_i
            # --- PER-SEGMENT Newton polish: every cone-segment candidate is
            # polished (not just the top-2 by cone t — cone-t ordering can
            # misrank overlapping hair roots, the r4 ~1.6% silhouette
            # nearest-prim divergence); nearest CONFIRMED root wins, exactly
            # the 32-seed jnp sweep's selection rule ---
            cenx = 0.25 * (cpx[0] + cpx[1] + cpx[2] + cpx[3])
            ceny = 0.25 * (cpy[0] + cpy[1] + cpy[2] + cpy[3])
            cenz = 0.25 * (cpz[0] + cpz[1] + cpz[2] + cpz[3])
            dtc = ((cenx - ox) * dx + (ceny - oy) * dy
                   + (cenz - oz) * dz) * rcpdd_c
            relx = [cpx[j] - (ox + dtc * dx) for j in range(4)]
            rely = [cpy[j] - (oy + dtc * dy) for j in range(4)]
            relz = [cpz[j] - (oz + dtc * dz) for j in range(4)]
            bmax = jnp.zeros_like(ox)
            for j in range(4):
                bmax = jnp.maximum(bmax, jnp.abs(relx[j]))
                bmax = jnp.maximum(bmax, jnp.abs(rely[j]))
                bmax = jnp.maximum(bmax, jnp.abs(relz[j]))
                bmax = jnp.maximum(bmax, jnp.abs(cpr[j]))
            P_err = jnp.float32(16.0 * 1.19209290e-07) * bmax
            len_dir = jnp.sqrt(jnp.maximum(ddot_c, 1e-36))
            def _newton_polish(u0, t0w):
                un = u0
                tn = t0w - dtc
                newt_ok = jnp.zeros_like(ox, bool)
                newt_t = t0w
                for _ in range(5):
                    sm = 1.0 - un
                    w0 = sm * sm * sm
                    w1 = 3.0 * sm * sm * un
                    w2 = 3.0 * sm * un * un
                    w3 = un * un * un
                    Px = w0 * relx[0] + w1 * relx[1] + w2 * relx[2] + w3 * relx[3]
                    Py = w0 * rely[0] + w1 * rely[1] + w2 * rely[2] + w3 * rely[3]
                    Pz = w0 * relz[0] + w1 * relz[1] + w2 * relz[2] + w3 * relz[3]
                    Pr = w0 * cpr[0] + w1 * cpr[1] + w2 * cpr[2] + w3 * cpr[3]
                    b0 = sm * sm
                    b1 = 2.0 * sm * un
                    b2 = un * un
                    dPx_ = 3.0 * (b0 * (relx[1] - relx[0])
                                  + b1 * (relx[2] - relx[1])
                                  + b2 * (relx[3] - relx[2]))
                    dPy_ = 3.0 * (b0 * (rely[1] - rely[0])
                                  + b1 * (rely[2] - rely[1])
                                  + b2 * (rely[3] - rely[2]))
                    dPz_ = 3.0 * (b0 * (relz[1] - relz[0])
                                  + b1 * (relz[2] - relz[1])
                                  + b2 * (relz[3] - relz[2]))
                    dPr_ = 3.0 * (b0 * (cpr[1] - cpr[0])
                                  + b1 * (cpr[2] - cpr[1])
                                  + b2 * (cpr[3] - cpr[2]))
                    ddPx = 6.0 * ((1.0 - un) * (relx[2] - 2 * relx[1] + relx[0])
                                  + un * (relx[3] - 2 * relx[2] + relx[1]))
                    ddPy = 6.0 * ((1.0 - un) * (rely[2] - 2 * rely[1] + rely[0])
                                  + un * (rely[3] - 2 * rely[2] + rely[1]))
                    ddPz = 6.0 * ((1.0 - un) * (relz[2] - 2 * relz[1] + relz[0])
                                  + un * (relz[3] - 2 * relz[2] + relz[1]))
                    Rx = tn * dx - Px
                    Ry = tn * dy - Py
                    Rz = tn * dz - Pz
                    len_R = jnp.sqrt(jnp.maximum(
                        Rx * Rx + Ry * Ry + Rz * Rz, 0.0))
                    Q_err = jnp.float32(16.0 * 1.19209290e-07) * len_dir * tn
                    R_err = jnp.maximum(Q_err, P_err)
                    dP2 = dPx_ * dPx_ + dPy_ * dPy_ + dPz_ * dPz_
                    rl = 1.0 / jnp.sqrt(jnp.maximum(dP2, 1e-36))
                    Tx, Ty, Tz = dPx_ * rl, dPy_ * rl, dPz_ * rl
                    dd = dPx_ * ddPx + dPy_ * ddPy + dPz_ * ddPz
                    rl3 = rl * rl * rl
                    dTx = (ddPx * dP2 - dPx_ * dd) * rl3
                    dTy = (ddPy * dP2 - dPy_ * dd) * rl3
                    dTz = (ddPz * dP2 - dPz_ * dd) * rl3
                    cos_err = P_err * rl
                    fv = Rx * Tx + Ry * Ty + Rz * Tz
                    f_err = len_R * P_err + R_err + cos_err * (1.0 + len_R)
                    dfdu = (-dPx_ * Tx - dPy_ * Ty - dPz_ * Tz
                            + Rx * dTx + Ry * dTy + Rz * dTz)
                    dfdt = dx * Tx + dy * Ty + dz * Tz
                    K = jnp.maximum(Rx * Rx + Ry * Ry + Rz * Rz - fv * fv, 0.0)
                    dKdu = (-Rx * dPx_ - Ry * dPy_ - Rz * dPz_) - fv * dfdu
                    dKdt = (Rx * dx + Ry * dy + Rz * dz) - fv * dfdt
                    rsK = 1.0 / jnp.sqrt(jnp.maximum(K, 1e-36))
                    gv = jnp.sqrt(K) - Pr
                    g_err = (R_err + f_err
                             + jnp.float32(16.0 * 1.19209290e-07) * bmax)
                    dgdu = dKdu * rsK - dPr_
                    dgdt = dKdt * rsK
                    det = dfdu * dgdt - dfdt * dgdu
                    rdet = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
                    du_ = (dgdt * fv - dfdt * gv) * rdet
                    dt_ = (-dgdu * fv + dfdu * gv) * rdet
                    conv = (jnp.abs(fv) < f_err) & (jnp.abs(gv) < g_err)
                    tw = tn + dtc
                    okn = (conv & (tnear8 <= tw) & (tw <= tf8)
                           & (un >= 0.0) & (un <= 1.0))
                    newt_t = jnp.where(okn & ~newt_ok, tw, newt_t)
                    newt_ok = newt_ok | okn
                    un = jnp.where(newt_ok, un, un - du_)
                    tn = jnp.where(newt_ok, tn, tn - dt_)
                return newt_ok, newt_t

            newt_ok = jnp.zeros_like(ox, bool)
            newt_t = jnp.full_like(ox, jnp.inf)
            for hit_i, t_i, u_i in seg_cands:
                # non-candidate lanes seed at the curve center (finite math;
                # their converged results are masked out by hit_i)
                ok_i, t_p = _newton_polish(u_i, jnp.where(hit_i, t_i, dtc))
                okh = ok_i & hit_i
                newt_t = jnp.minimum(newt_t, jnp.where(okh, t_p, jnp.inf))
                newt_ok = newt_ok | okh
            class_results.append((9, cand_hit & newt_ok, newt_t))

        if has_kinds:
            ktag = ubuf_ref[CH_KIND]
            kvalid = jnp.zeros((ROWS, LANE), bool)
            tt = jnp.zeros((ROWS, LANE), jnp.float32)
            for tag, v_k, t_k in class_results:
                sel = ktag == tag
                kvalid = kvalid | (sel & v_k)
                tt = jnp.where(sel, t_k, tt)
        else:
            _, kvalid, tt = class_results[0]
        kvalid = kvalid & leaf_ok8
        if has_win:
            kvalid = kvalid & (time8 >= wt0) & (time8 <= wt1)
        if has_mask:
            kvalid = kvalid & (
                (ubuf_ref[CH_MASK] & _i32(ray_ref[RAY_MASK])) != 0)
        tb = _i32(jnp.maximum(tt, 0.0))                  # monotonic bits
        # per-group best-slot key: t bits with slot in the low 3 bits
        lkeyR = jnp.where(kvalid, (tb & ~jnp.int32(7)) | rowc,
                          INF_BITS | rowc)
        lminR = jnp.min(lkeyR.reshape(UGRP, 8, LANE), axis=1)   # (U,128)

        # ======== ordered descent + push-image prep: FULL-WIDTH ===========
        # v10: the former 16 per-group bitonic sorts + 2-gather alignments
        # are single-issue full-width butterfly ops. Partner exchange
        # x[i ^ j] within every 8-row block = two static pltpu.rolls + one
        # select (block boundaries never crossed: bit j of i is clear
        # exactly when i+j stays in-block); the push-image gather becomes a
        # static block-reversal (XOR 7 = three butterflies) followed by a
        # per-lane VARIABLE block-rotation done in 3 conditional-roll steps.
        def bfly(x, j):    # x[i ^ j] per row, full width
            # shifts must be non-negative: -j mod ROWS
            return jnp.where((rowall & j) != 0,
                             pltpu.roll(x, shift=j, axis=0),
                             pltpu.roll(x, shift=ROWS - j, axis=0))

        def brot(x, s):    # x[block, (i - s) & 7]: static in-block rotation
            return jnp.where(rowc >= s,
                             pltpu.roll(x, shift=s, axis=0),
                             pltpu.roll(x, shift=ROWS + s - 8, axis=0))

        h8 = expand(hR)
        if _SORT_IMPL == "pergroup":
            # v11 form: 16 independent per-group (8,128) bitonic KEY-ONLY
            # sorts. The child slot rides in the key's low 3 bits, so the
            # ref permutation is reconstructed afterwards with ONE gather
            # (crefs[key & 7]) instead of co-sorting refs through all 6
            # stages — halves the sort phase's gather+select count.
            sorted_rows = []
            aligned_rows = []
            for u in range(UGRP):
                sl = slice(8 * u, 8 * u + 8)
                key = keyR[sl]
                for k, j in (() if "nosort" in _ABLATE else _SORT_STAGES):
                    perm8 = row8 ^ j
                    keepmin = ((row8 & k) == 0) == ((row8 & j) == 0)
                    key_p = jnp.take_along_axis(key, perm8, axis=0)
                    swap = (key_p < key) == keepmin
                    key = jnp.where(swap, key_p, key)
                ref = jnp.take_along_axis(crefs[sl], key & 7, axis=0)
                sorted_rows.append(ref)
                h8u = h8[sl]
                items = jnp.take_along_axis(
                    ref, jnp.clip(h8u - 1 - row8, 0, 7), axis=0)
                aligned_rows.append(jnp.take_along_axis(
                    items, (row8 - sp8[sl]) & 7, axis=0))
            refS = jnp.concatenate(sorted_rows, axis=0)   # (ROWS,128)
            alignedR = jnp.concatenate(aligned_rows, axis=0)
        else:
            key = keyR
            ref = crefs
            for k, j in (() if "nosort" in _ABLATE else _SORT_STAGES):
                key_p = bfly(key, j)
                ref_p = bfly(ref, j)
                # direction/partner bits come from the BLOCK-LOCAL row
                # (rowc): the k=8 stage's direction bit is global-row bit 3,
                # which alternates per block and would sort odd blocks
                # descending
                keepmin = ((rowc & k) == 0) == ((rowc & j) == 0)
                # keys distinct, so (>=) == (>): keepmin lanes swap when the
                # partner is smaller, the others when it is larger
                swap = (key_p < key) == keepmin
                key = jnp.where(swap, key_p, key)
                ref = jnp.where(swap, ref_p, ref)
            refS = ref                                    # (ROWS,128)

            # aligned[c] = sorted[(h - 1 - ((c - sp) & 7)) & 7]
            #            = rot(reverse(sorted), (h + sp) & 7) (farthest
            # pushed first so the 2nd-nearest ends on top; rows outside the
            # push range carry garbage the range mask below never reads)
            rev = bfly(bfly(bfly(refS, 1), 2), 4)         # x[i ^ 7]
            amt = (h8 + sp8) & 7                          # per-lane rotation
            alignedR = rev
            for bit in (4, 2, 1):
                alignedR = jnp.where((amt & bit) != 0, brot(alignedR, bit),
                                     alignedR)

        def bbc(x):   # block-reduce a one-hot/row-0 image -> block-broadcast
            return expand(jnp.sum(x.reshape(UGRP, 8, LANE), axis=1))

        next8 = bbc(jnp.where(rowc == 0, refS, 0))

        # ======== stack: tile-parallel static-block push/pop ==============
        # Stack entry e of group u lives at stack_ref[e//8, 8u + e%8, lane]:
        # every block is a statically-indexed (ROWS,128) image shared by all
        # groups. The pop is a one-hot select + block-sum instead of a
        # dynamic sublane gather; pushes merge via per-element range masks.
        # Blocks >= STACK_HOT (depth > 16) are gated behind one scalar
        # branch — rare at typical BVH8 depths. Pop reads the PRE-push image
        # (pushing lanes never pop in the same step).
        npush8 = jnp.where(node_ok8, jnp.maximum(h8 - 1, 0), 0)
        new_sp8 = sp8 + npush8
        top8 = new_sp8 - 1
        pacc_ref[:] = zeroR

        def blk_ops(b):
            blk = stack_ref[b]
            pm = (top8 - 8 * b) == rowc
            pacc_ref[:] = pacc_ref[:] + jnp.where(pm, blk, 0)
            local = rowc + (8 * b) - sp8
            inr = (local >= 0) & (local < npush8)
            stack_ref[b] = jnp.where(inr, alignedR, blk)

        for b in range(0 if "nostack" in _ABLATE else STACK_HOT):
            blk_ops(b)
        if STACK_HOT < STACK_BLOCKS:
            @pl.when(jnp.max(new_sp8) > 8 * STACK_HOT)
            def _deep():
                for b in range(STACK_HOT, STACK_BLOCKS):
                    blk_ops(b)
        popped8 = bbc(pacc_ref[:])

        # -------- leaf result: winning slot + exact t recovery ------------
        lmin8 = expand(lminR)
        slot8 = lmin8 & 7
        # exact t: one-hot select the winning slot's full-precision bits
        texact8 = bbc(jnp.where(rowc == slot8, tb, 0))
        t_new = _f32(texact8)
        found8 = leaf_ok8 & (lmin8 < INF_BITS) & (t_new < tf8)
        tf_n = jnp.where(found8, t_new, tf8)
        best_n = jnp.where(found8, (-cur8 - 1) * 8 + slot8, best8)
        if want_attrs:
            # record the winning slot's u/v/Ng alongside the best hit
            onehot = rowc == slot8
            for i, a in enumerate(slot_attrs):
                attr_ref[i] = jnp.where(
                    found8, bbc(jnp.where(onehot, a, 0.0)), attr_ref[i])

        # ---------------- advance (stalled lanes keep their state) --------
        has_next8 = node_ok8 & (h8 > 0)
        need_pop8 = (node_ok8 | leaf_ok8) & ~has_next8
        do_pop8 = need_pop8 & (new_sp8 > 0)
        cur_n = jnp.where(has_next8, next8,
                          jnp.where(do_pop8, popped8, cur8))
        sp_n = jnp.where(do_pop8, new_sp8 - 1, new_sp8)
        active8 = has_next8 | do_pop8 | stall8
        if occlusion:
            active8 = active8 & (best_n < 0)

        cur_ref[:] = cur_n
        sp_ref[:] = sp_n
        tf_ref[:] = tf_n
        best_ref[:] = best_n
        act_ref[:] = jnp.where(active8, 1, 0)
        # stack-overflow surveillance: reduced to one count after the loop
        # (must stay 0 — bvh.h:71 analog)
        msp_ref[:] = jnp.maximum(msp_ref[:], new_sp8)
        return ftrips + ft

    def body(state):
        it, _, ftrips = state
        # UNROLL steps per while iteration amortize the loop fixed costs
        # (cond reduction + scalar round-trip); inactive lanes no-op.
        for _ in range(UNROLL):
            ftrips = step(ftrips)
        n_active = jnp.sum(act_ref[:])
        return it + UNROLL, n_active, ftrips

    def cond(state):
        if "pin24" in _ABLATE:
            return state[0] < 24
        return (state[1] > 0) & (state[0] < MAX_STEPS)

    live0 = tnear8 <= expand(tfar_ref[0])
    if not has_mask:
        # all geometry masks are default (-1): (pmask & rmask) != 0 reduces
        # to rmask != 0, folded into ray activation instead of a leaf chunk
        live0 = live0 & (expand(mask_ref[0]) != 0)
    act_ref[:] = zeroR + jnp.where(live0, 1, 0)
    cur_ref[:] = zeroR
    sp_ref[:] = zeroR
    tf_ref[:] = zeroR.astype(jnp.float32) + expand(tfar_ref[0])
    best_ref[:] = zeroR - 1
    msp_ref[:] = zeroR
    if want_attrs:
        attr_ref[:] = jnp.zeros((5, ROWS, LANE), jnp.float32)
    stack_ref[:] = jnp.zeros((STACK_BLOCKS, ROWS, LANE), jnp.int32)
    ubuf_ref[:] = jnp.zeros((LCH, ROWS, LANE), jnp.int32)

    it_final, _, ftrips = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0)))
    ovf = jnp.sum(jnp.where(msp_ref[:] > 8 * STACK_BLOCKS, 1, 0))

    # extract block-broadcast state rows c=0 back to (U,128)
    out_t_ref[0] = tf_ref[:].reshape(UGRP, 8, LANE)[:, 0, :]
    out_prim_ref[0] = best_ref[:].reshape(UGRP, 8, LANE)[:, 0, :]
    # row 0: step count; row 1: fetch tile-serve trips (static + streamed);
    # row 3: DMA-miss count (streamed tables only)
    out_steps_ref[0] = zeroU + it_final
    out_steps_ref[0, 1:2] = jnp.broadcast_to(ftrips, (1, LANE))
    if stream:
        out_steps_ref[0, 3:4] = jnp.broadcast_to(dmacnt_ref[0], (1, LANE))
    # row 5: stack-overflow lane-steps (must be 0)
    out_steps_ref[0, 5:6] = jnp.broadcast_to(ovf, (1, LANE))
    if want_attrs:
        for i in range(5):
            out_attr_ref[0, i] = attr_ref[i].reshape(
                UGRP, 8, LANE)[:, 0, :]


def _coherence_key(org, dir, tnear=None, tfar=None):
    """Sort key grouping rays by direction octant then origin locality
    (the queue-sorting analog of the reference's coherent/incoherent split,
    SURVEY.md §2.8 P2/P3). 31-bit: dead(1) | octant(3) | origin-morton(27).

    The dead bit is the wavefront COMPACTION device: inert rays
    (tnear > tfar — terminated pathtracer lanes) sort to the tail, packing
    themselves into all-dead programs that retire after a single step
    instead of dragging dead lanes through live programs (SURVEY §2.8 P2)."""
    from ..core.math import morton_code
    lo = jnp.min(org, axis=0)
    up = jnp.max(org, axis=0)
    q = (org - lo) / jnp.maximum(up - lo, 1e-20)
    m27 = (morton_code(q) >> 3).astype(jnp.int32)
    octant = ((dir[:, 0] < 0).astype(jnp.int32)
              | ((dir[:, 1] < 0).astype(jnp.int32) << 1)
              | ((dir[:, 2] < 0).astype(jnp.int32) << 2))
    key = (octant << 27) | m27
    if tnear is not None:
        dead = (tnear > tfar).astype(jnp.int32)
        key = key | (dead << 30)
    return key


def _residency(packed: PackedScene):
    """Residency policy: tables small enough stay pinned in VMEM (zero DMA
    cost); bigger tables live in HBM and their leaf-tile suffix streams
    through a shared direct-mapped VMEM tile cache. The reference's analog
    is the compact/HW-resident accel (kernels/sycl/rthwif_embree_builder.h:
    81): accel size is bounded by device main memory, never by on-chip SRAM.

    Returns (stream, GNR, NSL, vmem_limit, lrows, LCH, NR) where GNR is the
    resident prefix tile count (whole table when it fits, else the node
    tiles, else just the root tile) and NSL the streamed-cache slot count."""
    GN, GL = packed.gn, packed.gl
    GT = GN + GL
    has_mask, has_motion = packed.has_mask, packed.has_motion
    has_kinds, has_win = packed.has_kinds, packed.has_win
    nf = packed.nf
    has_curves = bool(set(packed.kind_classes) & {8, 9})
    LCH = (nf * (2 if has_motion else 1) + (1 if has_mask else 0)
           + (1 if has_kinds else 0) + (2 if has_win else 0))
    NR = (10 + (1 if has_motion else 0) + (1 if has_mask else 0)
          + (10 if has_curves else 0))
    lrows = ltab_rows(has_mask, has_motion, has_kinds, has_win, nf)
    tile_b = lrows * LANE * 4
    scratch_bytes = (STACK_BLOCKS * ROWS * LANE * 4
                     + (8 + NR + LCH) * ROWS * LANE * 4)
    budget = VMEM_RESIDENT_BUDGET - scratch_bytes
    stream = GT * tile_b > budget
    NSL = NSL_N = 0
    if not stream:
        GNR = GT
    else:
        # node tiles (the hot tree top) stay resident when they fit —
        # served by the loop-free static path; the leaf suffix streams
        # through a shared direct-mapped tile cache in one while loop.
        # (Serving node tiles through the cache loop too was measured
        # slower: a loop iteration costs ~2x a static serve.)
        GNR = GN if GN * tile_b <= budget - UGRP * tile_b else 1
        avail = budget - GNR * tile_b
        NSL = int(min(max(avail // tile_b, UGRP), 4096))
        NSL_N = 0 if GNR == GN else min(GN, (2 * NSL) // 3)
    resident = GNR * tile_b + NSL * tile_b
    # generous slack: the compiler's scoped stack (fusion temporaries of the
    # curve leaf math) exceeded a tight bound on hair scenes — 24 MiB extra
    # plus 2x the scratch estimate keeps the limit comfortably above Mosaic's
    # true demand while still far under the 128 MiB core budget
    vmem_limit = min(int(resident * 1.2 + scratch_bytes * 2) + (24 << 20),
                     VMEM_HARD_LIMIT)
    return stream, GNR, NSL, NSL_N, vmem_limit, lrows, LCH, NR


def traverse_packed(packed: PackedScene, org, dir, tnear, tfar, ray_mask,
                    occlusion: bool = False, interpret: bool = False,
                    sort_rays: bool = True, robust: bool = False,
                    time=None, want_attrs: bool = False,
                    id_tables=()) -> Tuple[jnp.ndarray, ...]:
    """Trace R rays against a packed scene. Returns (t, best_prim) with
    best_prim = merged prim index, -1 for miss. Inputs are flat (R,3)/(R,).

    sort_rays: reorder rays by a coherence key so each program touches few
    table tiles (fetch gating); results are returned in original order.
    time: (R,) ray times for 2-step motion scenes (ignored otherwise).

    want_attrs: for pure-triangle scenes (packed.tri_attrs) the kernel also
    emits the winning hit's exact u/v/Ng, and this returns
    (t, best_prim, attrs) with attrs = dict(u, v, ng (R,3), ids tuple) —
    the fast non-differentiable hit path that skips the re-intersection
    gathers entirely. id_tables: per-merged-prim 1D arrays to gather by
    best_prim and carry through the single unsorting pass (misses gather
    entry 0 — mask by best_prim >= 0). For non-tri_attrs scenes attrs
    is None and callers fall back to re-intersection.
    """
    R = org.shape[0]
    R0 = R
    PROG = UGRP * LANE
    if time is None:
        time = jnp.zeros(R, jnp.float32)
    (stream, GNR, NSL, NSL_N, vmem_limit, lrows, LCH,
     NR) = _residency(packed)
    ridx = None
    # Reorder scope: the global multi-operand sort costs ~0.1 ms at 1M rays
    # on an idle chip (perf/sort_tax.py — earlier 25 ms readings were
    # contention artifacts), and global coherence both groups programs for
    # the streaming cache AND evens per-program retirement tails, so it is
    # always preferred. The per-program batched variant (sort_local) is kept
    # for experiments via EMBREE_TPU_SORT_SCOPE=local.
    import os as _os
    _scope = _os.environ.get("EMBREE_TPU_SORT_SCOPE", "global")
    sort_global = sort_rays and R > LANE and _scope != "local"
    sort_local = sort_rays and R > LANE and not sort_global
    if sort_global:
        # multi-operand sort: carrying all ray fields as sort operands beats
        # a 2-operand key/index sort + jnp.take gathers ~1.5x on 1M rays
        # (TPU sorts vectorize across lanes; arbitrary gathers do not)
        key = _coherence_key(org, dir, tnear, tfar)
        idx0 = jnp.arange(R, dtype=jnp.int32)
        (key, ox_, oy_, oz_, dx_, dy_, dz_, tnear, tfar, ray_mask, time,
         ridx) = jax.lax.sort(
             (key, org[:, 0], org[:, 1], org[:, 2],
              dir[:, 0], dir[:, 1], dir[:, 2],
              tnear, tfar, ray_mask, time, idx0), num_keys=1)
        org = jnp.stack([ox_, oy_, oz_], axis=-1)
        dir = jnp.stack([dx_, dy_, dz_], axis=-1)

    B = -(-R // PROG)
    pad = B * PROG - R
    if sort_local:
        key = _coherence_key(org, dir, tnear, tfar)
        idx0 = jnp.arange(R, dtype=jnp.int32)
        padk = jnp.iinfo(jnp.int32).max

        def p2(x, fill):
            return (jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
                if pad else x).reshape(B, PROG)

        (key, ox_, oy_, oz_, dx_, dy_, dz_, tnear, tfar, ray_mask, time,
         ridx) = jax.lax.sort(
             (p2(key, padk), p2(org[:, 0], 0), p2(org[:, 1], 0),
              p2(org[:, 2], 0), p2(dir[:, 0], 1), p2(dir[:, 1], 1),
              p2(dir[:, 2], 1), p2(tnear, 1), p2(tfar, 0),
              p2(ray_mask, 0), p2(time, 0), p2(idx0, jnp.int32(R))),
             dimension=1, num_keys=1)
        flat2 = lambda x: x.reshape(B * PROG)[: B * PROG]
        org = jnp.stack([flat2(ox_), flat2(oy_), flat2(oz_)], axis=-1)
        dir = jnp.stack([flat2(dx_), flat2(dy_), flat2(dz_)], axis=-1)
        tnear, tfar = flat2(tnear), flat2(tfar)
        ray_mask, time, ridx = flat2(ray_mask), flat2(time), flat2(ridx)
        R = B * PROG           # pad rays now ride along (inactive)
        pad = 0

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) \
            if pad else x
        return x.reshape(B, UGRP, LANE)

    org = org.astype(jnp.float32)
    dir = dir.astype(jnp.float32)
    # (B, 3, UGRP, LANE): component-major keeps each (U,128) tile one DMA row
    orgp = jnp.stack([prep(org[:, 0], 0), prep(org[:, 1], 0),
                      prep(org[:, 2], 0)], axis=1)
    dirp = jnp.stack([prep(dir[:, 0], 1), prep(dir[:, 1], 1),
                      prep(dir[:, 2], 1)], axis=1)
    tnearp = prep(tnear.astype(jnp.float32), 1)
    tfarp = prep(tfar.astype(jnp.float32), 0)   # pad rays: tnear(1) > tfar(0) -> inactive
    maskp = prep(ray_mask.astype(jnp.int32), 0)
    timep = prep(time.astype(jnp.float32), 0)

    GN = packed.gn
    GT = packed.gn + packed.gl
    has_mask = packed.has_mask
    has_motion = packed.has_motion
    has_kinds = packed.has_kinds
    kind_classes = packed.kind_classes
    has_win = packed.has_win

    emit_attrs = want_attrs and packed.tri_attrs
    kernel = functools.partial(_kernel, GN=GN, GT=GT, GNR=GNR,
                               occlusion=occlusion,
                               has_mask=has_mask, stream=stream,
                               robust=robust,
                               has_motion=has_motion, has_kinds=has_kinds,
                               kind_classes=kind_classes,
                               want_attrs=emit_attrs, has_win=has_win,
                               NSL=NSL, NSL_N=NSL_N, NF=packed.nf,
                               CURVE_RATE=packed.curve_rate)

    ray3_spec = pl.BlockSpec((1, 3, UGRP, LANE), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, UGRP, LANE), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    # resident prefix: constant block index -> Pallas keeps the first GNR
    # tiles resident in VMEM across grid steps instead of re-DMAing per ray
    # block. The full table rides along as a second (HBM/ANY) view of the
    # SAME array for the streamed suffix — no copy is made.
    nspec = pl.BlockSpec((GNR, lrows, LANE), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)

    scratch = [
        pltpu.VMEM((STACK_BLOCKS, ROWS, LANE), jnp.int32),  # stacks
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # cur
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # sp
        pltpu.VMEM((ROWS, LANE), jnp.float32),      # t_far
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # best
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # active
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # fetch outstanding
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # pop accumulator
        pltpu.VMEM((ROWS, LANE), jnp.int32),        # max sp watermark
        pltpu.VMEM((NR, ROWS, LANE), jnp.float32),  # expanded ray const
        pltpu.VMEM((LCH, ROWS, LANE), jnp.int32),   # unified field chunks
    ]
    nattr = 5 if emit_attrs else 1
    scratch += [pltpu.VMEM((nattr, ROWS, LANE), jnp.float32)]  # attr
    if stream:
        scratch += [pltpu.VMEM((NSL, lrows, LANE), jnp.int32),  # tile cache
                    pltpu.SMEM((NSL,), jnp.int32),              # slot tags
                    pltpu.SemaphoreType.DMA((UGRP,)),
                    pltpu.SMEM((UGRP,), jnp.int32),   # DMA-started flags
                    pltpu.SMEM((2,), jnp.int32),      # DMA miss counter
                    pltpu.SMEM((UGRP,), jnp.int32),   # slot claims
                    pltpu.SMEM((UGRP,), jnp.int32),   # claimed tiles
                    pltpu.SMEM((UGRP,), jnp.int32)]   # serve-ok flags

    attr_spec = pl.BlockSpec((1, nattr, UGRP, LANE), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    t_out, prim_out, steps_out, attr_out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[nspec, aspec,
                  ray3_spec, ray3_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec],
        out_specs=[ray_spec, ray_spec, ray_spec, attr_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, UGRP, LANE), jnp.float32),
            jax.ShapeDtypeStruct((B, UGRP, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, UGRP, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, nattr, UGRP, LANE), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(packed.table, packed.table, orgp, dirp, tnearp, tfarp, maskp,
      timep)

    LAST_STEPS[0] = steps_out
    t_flat = t_out.reshape(B * PROG)[:R]
    enc_flat = prim_out.reshape(B * PROG)[:R]
    # implicit leaf slot -> original prim id
    prim_flat = jnp.where(enc_flat >= 0,
                          packed.pid_map[jnp.clip(enc_flat, 0, None)], -1)

    def unsort(*ops):
        """Restore original ray order. Local-scope sorts moved rays only
        within their program, so the inverse is a per-program (B, PROG)
        batched sort by original index; sentinel-index pad rays sort last
        within their program and fall off the [:R0] slice."""
        if ridx is None:
            return tuple(o[:R0] for o in ops)
        if sort_local:
            res = jax.lax.sort(
                (ridx.reshape(B, PROG),)
                + tuple(o.reshape(B, PROG) for o in ops),
                dimension=1, num_keys=1)
            return tuple(r.reshape(B * PROG)[:R0] for r in res[1:])
        res = jax.lax.sort((ridx,) + ops, num_keys=1)
        return res[1:]

    if not want_attrs:
        return unsort(t_flat, prim_flat)
    if not emit_attrs:
        return unsort(t_flat, prim_flat) + (None,)
    # fast hit path: gather ids while still in sorted order (small-table
    # gathers), then restore original ray order for EVERYTHING in one
    # multi-operand sorting pass (cheaper than per-field jnp.take)
    av = [attr_out[:, i].reshape(B * PROG)[:R] for i in range(5)]
    pclamp = jnp.clip(prim_flat, 0, None)
    ids = [jnp.asarray(tab)[pclamp].astype(jnp.int32) for tab in id_tables]
    res = unsort(t_flat, prim_flat, *av, *ids)
    t_flat, prim_flat = res[0], res[1]
    av = list(res[2:7])
    ids = list(res[7:])
    attrs = {"u": av[0], "v": av[1],
             "ng": jnp.stack(av[2:5], axis=-1), "ids": tuple(ids)}
    return t_flat, prim_flat, attrs
