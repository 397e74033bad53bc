"""Ablate the v5 traversal kernel: which phase costs what.

Variants (env ABLATE): full | nofetch | nosort | nostack | noleaf | nonode
and UGRP sweep (env AUGRP). Measures time/step on the bench scene.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import embree_tpu as et
from embree_tpu.accel.pack import INVALID_REC
from embree_tpu.accel import traverse_pallas as tp

LANE = 128
STACK_ROWS = 64
_SORT_STAGES = ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1))


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def make_kernel(UGRP, GN, GL, *, do_fetch=True, do_sort=True, do_stack=True,
                do_leaf=True, do_node=True, max_steps=None):
    def _kernel(ntab_ref, ltab_ref, org_ref, dir_ref, tnear_ref, tfar_ref,
                mask_ref, out_t_ref, out_prim_ref, out_steps_ref,
                stack_ref, cur_ref, sp_ref, tf_ref, best_ref, act_ref,
                nrec_ref, lrec_ref, need_ref):
        INF = jnp.float32(np.inf)
        ox, oy, oz = org_ref[0, 0], org_ref[0, 1], org_ref[0, 2]
        dx, dy, dz = dir_ref[0, 0], dir_ref[0, 1], dir_ref[0, 2]
        tnear = tnear_ref[0]
        tfar0 = tfar_ref[0]
        rmask = mask_ref[0]
        eps = jnp.float32(1e-18)

        def rcp_safe(x):
            return 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)

        rdx, rdy, rdz = rcp_safe(dx), rcp_safe(dy), rcp_safe(dz)
        row4 = jax.lax.broadcasted_iota(jnp.int32, (4, LANE), 0)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        zero8 = row8 * 0
        zeroU = jax.lax.broadcasted_iota(jnp.int32, (UGRP, LANE), 0) * 0

        def b8(row):
            return jnp.broadcast_to(row, (8, LANE))

        def b4(row):
            return jnp.broadcast_to(row, (4, LANE))

        def fetch(tab_ref, out_ref, rows, Gp, need_ref, rec_id_all, need_all):
            grp = jnp.clip(rec_id_all // LANE, 0, Gp - 1)
            lane = rec_id_all % LANE
            need_ref[:] = jnp.where(need_all, 1, 0) + zeroU

            def body(state):
                g, trips = state
                need = need_ref[:] > 0
                tile = tab_ref[g]
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
            active_all = act_ref[:] > 0
            cur_all = cur_ref[:]
            sp_all = sp_ref[:]
            tf_all = tf_ref[:]
            best_all = best_ref[:]
            at_node_all = active_all & (cur_all >= 0)
            at_leaf_all = active_all & (cur_all < 0)
            bmax = jnp.minimum(jnp.max(sp_all) + 14, STACK_ROWS) // 8 + 1
            nt = jnp.int32(0)
            lt = jnp.int32(0)
            if do_fetch:
                is_node_all, nt = fetch(ntab_ref, nrec_ref, 32, GN, need_ref,
                                        jnp.where(at_node_all, cur_all, 0),
                                        at_node_all)
                is_leaf_all, lt = fetch(ltab_ref, lrec_ref, 48, GL, need_ref,
                                        jnp.where(at_leaf_all, -cur_all - 1, 0),
                                        at_leaf_all)
            else:
                is_node_all, is_leaf_all = at_node_all, at_leaf_all
            stall_all = active_all & ~(is_node_all | is_leaf_all)

            new_cur, new_sp_rows, new_tf, new_best, new_act = [], [], [], [], []
            for u in range(UGRP):
                active = active_all[u:u + 1]
                cur = cur_all[u:u + 1]
                sp = b8(sp_all[u:u + 1])
                t_far = tf_all[u:u + 1]
                best = best_all[u:u + 1]
                is_leaf = is_leaf_all[u:u + 1]
                is_node = is_node_all[u:u + 1]
                nrec = nrec_ref[u]
                lrec = lrec_ref[u]
                oxu, oyu, ozu = ox[u:u + 1], oy[u:u + 1], oz[u:u + 1]
                dxu, dyu, dzu = dx[u:u + 1], dy[u:u + 1], dz[u:u + 1]
                rdxu, rdyu, rdzu = rdx[u:u + 1], rdy[u:u + 1], rdz[u:u + 1]
                tnearu = tnear[u:u + 1]
                rmasku = rmask[u:u + 1]

                if do_node:
                    crefs = nrec[0:8]

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
                    kd = _i32(jnp.maximum(tent, 0.0))
                    key = jnp.where(hit, (kd & ~jnp.int32(7)) | row8,
                                    jnp.int32(0x7F800000) | row8)
                    ref = crefs
                    if do_sort:
                        for k, j in _SORT_STAGES:
                            perm8 = row8 ^ j
                            keepmin = ((row8 & k) == 0) == ((row8 & j) == 0)
                            key_p = jnp.take_along_axis(key, perm8, axis=0)
                            ref_p = jnp.take_along_axis(ref, perm8, axis=0)
                            swap = (key_p < key) == keepmin
                            key = jnp.where(swap, key_p, key)
                            ref = jnp.where(swap, ref_p, ref)
                    h = jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)
                    h8 = b8(h)
                    next_ref = ref[0:1]
                else:
                    h = jnp.sum((nrec[0:8] != INVALID_REC).astype(jnp.int32),
                                axis=0, keepdims=True) * 0
                    h8 = b8(h)
                    ref = nrec[0:8]
                    next_ref = ref[0:1]

                npush = jnp.where(b8(is_node), jnp.maximum(h8 - 1, 0), 0)
                items = jnp.take_along_axis(ref, jnp.clip(h8 - 1 - row8, 0, 7),
                                            axis=0)
                aligned = jnp.take_along_axis(items, (row8 - sp) & 7, axis=0)
                new_sp = sp + npush
                top = new_sp - 1
                if do_stack:
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
                else:
                    popped = zero8

                if do_leaf:
                    cnt = _i32(lrec[0:1])
                    pids = _i32(lrec[1:5])
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
                    tmin = jnp.min(tl, axis=0, keepdims=True)
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

                has_next = is_node & (h[0:1] > 0)
                need_pop = (is_node | is_leaf) & ~has_next
                sp_row = new_sp[0:1]
                do_pop = need_pop & (sp_row > 0)
                cur = jnp.where(has_next, next_ref,
                                jnp.where(do_pop, popped[0:1], cur))
                sp_row = jnp.where(do_pop, sp_row - 1, sp_row)
                active = has_next | do_pop | stall_all[u:u + 1]
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
            if max_steps is not None:
                return state[0] < max_steps
            return (state[1] > 0) & (state[0] < tp.MAX_STEPS)

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
        out_steps_ref[0] = zeroU + it_final
        out_steps_ref[0, 1:2] = jnp.broadcast_to(ntrips, (1, LANE))
        out_steps_ref[0, 2:3] = jnp.broadcast_to(ltrips, (1, LANE))
    return _kernel


def traverse(packed, org, dir, tnear, tfar, mask, UGRP, **flags):
    R = org.shape[0]
    PROG = UGRP * LANE
    B = -(-R // PROG)
    pad = B * PROG - R

    def prep(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) \
            if pad else x
        return x.reshape(B, UGRP, LANE)

    org = org.astype(jnp.float32)
    dir = dir.astype(jnp.float32)
    orgp = jnp.stack([prep(org[:, 0], 0), prep(org[:, 1], 0),
                      prep(org[:, 2], 0)], axis=1)
    dirp = jnp.stack([prep(dir[:, 0], 1), prep(dir[:, 1], 1),
                      prep(dir[:, 2], 1)], axis=1)
    tnearp = prep(tnear, 1)
    tfarp = prep(tfar, 0)
    maskp = prep(mask, 0)
    GN = packed.n_node_tiles
    GL = packed.n_leaf_tiles
    kernel = make_kernel(UGRP, GN, GL, **flags)
    ray3_spec = pl.BlockSpec((1, 3, UGRP, LANE), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, UGRP, LANE), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    t_out, prim_out, steps_out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
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
            pltpu.VMEM((UGRP, STACK_ROWS, LANE), jnp.int32),
            pltpu.VMEM((UGRP, LANE), jnp.int32),
            pltpu.VMEM((UGRP, LANE), jnp.int32),
            pltpu.VMEM((UGRP, LANE), jnp.float32),
            pltpu.VMEM((UGRP, LANE), jnp.int32),
            pltpu.VMEM((UGRP, LANE), jnp.int32),
            pltpu.VMEM((UGRP, 32, LANE), jnp.int32),
            pltpu.VMEM((UGRP, 48, LANE), jnp.float32),
            pltpu.VMEM((UGRP, LANE), jnp.int32),
        ],
    )(packed.node_table, packed.leaf_table, orgp, dirp, tnearp, tfarp, maskp)
    return t_out, prim_out, steps_out


def sphere_mesh(n_theta=64, n_phi=128, radius=1.0):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    t, p = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack([radius*np.sin(t)*np.cos(p), radius*np.sin(t)*np.sin(p),
                      radius*np.cos(t)], axis=-1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i*n_phi+j; b = i*n_phi+(j+1)%n_phi
            c = (i+1)*n_phi+j; d = (i+1)*n_phi+(j+1)%n_phi
            idx.append([a, b, d]); idx.append([a, d, c])
    return verts, np.asarray(idx, np.int32)


def main():
    n_rays = 1 << 20
    verts, idx = sphere_mesh()
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()
    packed = cs.packed

    rng = np.random.default_rng(0)
    org = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    key = tp._coherence_key(org, d)
    perm = jnp.argsort(key)
    org, d = org[perm], d[perm]
    tnear = jnp.zeros((n_rays,), jnp.float32)
    tfar = jnp.full((n_rays,), np.inf, jnp.float32)
    mask = jnp.full((n_rays,), -1, jnp.int32)

    variants = [
        ("full U16", dict(UGRP=16)),
        ("full U8", dict(UGRP=8)),
        ("full U4", dict(UGRP=4)),
        ("nofetch U16", dict(UGRP=16, do_fetch=False, max_steps=40)),
        ("nonode U16", dict(UGRP=16, do_node=False, max_steps=40)),
        ("noleaf U16", dict(UGRP=16, do_leaf=False, max_steps=40)),
        ("nostack U16", dict(UGRP=16, do_stack=False, max_steps=40)),
        ("nosort U16", dict(UGRP=16, do_sort=False)),
        ("fetchonly U16", dict(UGRP=16, do_node=False, do_leaf=False,
                               do_stack=False, max_steps=40)),
    ]
    for name, kw in variants:
        try:
            f = jax.jit(functools.partial(traverse, packed, UGRP=kw.pop("UGRP"),
                                          **kw))
            r = jax.block_until_ready(f(org, d, tnear, tfar, mask))
            t0 = time.perf_counter()
            r = jax.block_until_ready(f(org, d, tnear, tfar, mask))
            el = time.perf_counter() - t0
            arr = np.asarray(r[2])
            steps = arr[:, 0, 0].sum()
            print(f"{name:16s} {el*1e3:7.1f} ms  {n_rays/el/1e6:6.2f} Mrays/s "
                  f"steps {steps}  {el/steps*1e9:7.0f} ns/step")
        except Exception as e:
            print(f"{name:16s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
