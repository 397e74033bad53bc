"""Ablate the v7 traversal kernel phase by phase (pinned step count).

Variants toggle: node fetch, leaf fetch, node math (slab+key), leaf math
(Moller), per-group sort, per-group stack. All variants run max_steps=24
so ns/step is comparable; results are garbage, only timing matters.
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
UGRP = 16
ROWS = UGRP * 8
STACK_BLOCKS = 8
_SORT_STAGES = ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1))


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def make_kernel(GN, GL, *, f_node=True, f_leaf=True, m_node=True,
                m_leaf=True, sort=True, stack=True, one_trip=False,
                max_steps=24):
    def _kernel(ntab_ref, ltab_ref, org_ref, dir_ref, tnear_ref, tfar_ref,
                mask_ref, out_t_ref, out_prim_ref, out_steps_ref,
                stack_ref, cur_ref, sp_ref, tf_ref, best_ref, act_ref,
                need_ref, ray_ref, nbuf_ref, lbuf_ref):
        LCH = 9
        INF_BITS = jnp.int32(0x7F800000)
        rowall = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 0)
        rowc = rowall & 7
        zeroR = rowall * 0
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        zero8 = row8 * 0

        def b8(row):
            return jnp.broadcast_to(row, (8, LANE))

        def expand(x):
            return jnp.broadcast_to(
                x.reshape(UGRP, 1, LANE), (UGRP, 8, LANE)).reshape(ROWS, LANE)

        eps = jnp.float32(1e-18)

        def rcp_safe(x):
            return 1.0 / jnp.where(jnp.abs(x) < eps,
                                   jnp.where(x >= 0, eps, -eps), x)

        dx0 = expand(dir_ref[0, 0])
        dy0 = expand(dir_ref[0, 1])
        dz0 = expand(dir_ref[0, 2])
        tnear8 = expand(tnear_ref[0])
        tfar8 = expand(tfar_ref[0])
        ray_ref[0] = expand(org_ref[0, 0])
        ray_ref[1] = expand(org_ref[0, 1])
        ray_ref[2] = expand(org_ref[0, 2])
        ray_ref[3], ray_ref[4], ray_ref[5] = dx0, dy0, dz0
        ray_ref[6] = rcp_safe(dx0)
        ray_ref[7] = rcp_safe(dy0)
        ray_ref[8] = rcp_safe(dz0)
        ray_ref[9] = tnear8

        def fetch(tab_ref, buf_ref, chunks, Gp, rec8, need8):
            grp = jnp.clip(rec8 // LANE, 0, Gp - 1)
            lane = rec8 % LANE
            need_ref[:] = jnp.where(need8, 1, 0) + zeroR

            def body(state):
                _, trips = state
                need = need_ref[:] > 0
                gcur = jnp.min(jnp.where(need, grp, jnp.int32(Gp)),
                               axis=1, keepdims=True)
                gsafe = jnp.minimum(gcur, Gp - 1)
                sel = need & (grp == jnp.broadcast_to(gcur, (ROWS, LANE)))
                for u in range(UGRP):
                    tile = tab_ref[gsafe[8 * u, 0]]
                    li = lane[8 * u:8 * u + 8]
                    selu = sel[8 * u:8 * u + 8]
                    for k in range(chunks):
                        got = jnp.take_along_axis(tile[8 * k:8 * k + 8], li,
                                                  axis=1)
                        buf_ref[k, 8 * u:8 * u + 8] = jnp.where(
                            selu, got, buf_ref[k, 8 * u:8 * u + 8])
                left = need & ~sel
                need_ref[:] = jnp.where(left, 1, 0) + zeroR * 0
                return jnp.min(jnp.where(left, grp, jnp.int32(Gp))), trips + 1

            if one_trip:
                body((jnp.int32(0), jnp.int32(0)))
                return need8, jnp.int32(1)
            g0 = jnp.min(jnp.where(need8, grp, jnp.int32(Gp)))
            _, trips = jax.lax.while_loop(
                lambda s: s[0] < Gp, body, (g0, jnp.int32(0)))
            return need8, trips

        def body(state):
            it, _, ntrips, ltrips = state
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
            bsup = jnp.minimum(jnp.max(sp8) + 14, 8 * STACK_BLOCKS) // 8 + 1
            nt = jnp.int32(0)
            lt = jnp.int32(0)
            if f_node:
                node_ok8, nt = fetch(ntab_ref, nbuf_ref, 4, GN,
                                     jnp.where(at_node8, cur8, 0), at_node8)
            else:
                node_ok8 = at_node8
            if f_leaf:
                leaf_ok8, lt = fetch(ltab_ref, lbuf_ref, LCH, GL,
                                     jnp.where(at_leaf8, -cur8 - 1, 0),
                                     at_leaf8)
            else:
                leaf_ok8 = at_leaf8
            stall8 = act8 & ~(node_ok8 | leaf_ok8)

            crefs = nbuf_ref[0]
            if m_node:
                def bnd(d):
                    bits = nbuf_ref[1 + d]
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
                tent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.maximum(jnp.minimum(tz0, tz1), tnear8))
                tex = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                              jnp.maximum(ty0, ty1)),
                                  jnp.minimum(jnp.maximum(tz0, tz1), tf8))
                hit = (tent <= tex) & (crefs != INVALID_REC) & node_ok8
                kd = _i32(jnp.maximum(tent, 0.0))
                keyR = jnp.where(hit, (kd & ~jnp.int32(7)) | rowc,
                                 INF_BITS | rowc)
            else:
                hit = (crefs != INVALID_REC) & node_ok8
                keyR = jnp.where(hit, rowc, INF_BITS | rowc)
            hR = jnp.sum(hit.reshape(UGRP, 8, LANE).astype(jnp.int32), axis=1)

            if m_leaf:
                v0x, v0y, v0z = lbuf_ref[0], lbuf_ref[1], lbuf_ref[2]
                e1x, e1y, e1z = lbuf_ref[3], lbuf_ref[4], lbuf_ref[5]
                e2x, e2y, e2z = lbuf_ref[6], lbuf_ref[7], lbuf_ref[8]
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
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                kvalid = (leaf_ok8
                          & (jnp.abs(det) > 1e-24)
                          & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (tt >= tnear8) & (tt <= tf8))
                tb = _i32(jnp.maximum(tt, 0.0))
                lkeyR = jnp.where(kvalid, (tb & ~jnp.int32(7)) | rowc,
                                  INF_BITS | rowc)
            else:
                tb = _i32(lbuf_ref[0])
                lkeyR = INF_BITS | rowc
            lminR = jnp.min(lkeyR.reshape(UGRP, 8, LANE), axis=1)

            for u in range(UGRP):
                sl = slice(8 * u, 8 * u + 8)
                is_node = node_ok8[8 * u:8 * u + 1]
                is_leaf = leaf_ok8[8 * u:8 * u + 1]
                cur = cur8[8 * u:8 * u + 1]
                sp = sp8[8 * u:8 * u + 1]
                t_far = tf8[8 * u:8 * u + 1]
                best = best8[8 * u:8 * u + 1]
                h = hR[u:u + 1]

                key = keyR[sl]
                ref = crefs[sl]
                if sort:
                    for k, j in _SORT_STAGES:
                        perm8 = row8 ^ j
                        keepmin = ((row8 & k) == 0) == ((row8 & j) == 0)
                        key_p = jnp.take_along_axis(key, perm8, axis=0)
                        ref_p = jnp.take_along_axis(ref, perm8, axis=0)
                        swap = (key_p < key) == keepmin
                        key = jnp.where(swap, key_p, key)
                        ref = jnp.where(swap, ref_p, ref)
                next_ref = ref[0:1]
                h8u = b8(h)
                sp8u = b8(sp)

                npush = jnp.where(b8(is_node), jnp.maximum(h8u - 1, 0), 0)
                items = jnp.take_along_axis(ref,
                                            jnp.clip(h8u - 1 - row8, 0, 7),
                                            axis=0)
                aligned = jnp.take_along_axis(items, (row8 - sp8u) & 7, axis=0)
                new_sp = sp8u + npush
                top = new_sp - 1

                if stack:
                    def stack_blk(b, popped, u=u, top=top, sp8u=sp8u,
                                  npush=npush, aligned=aligned):
                        blk = stack_ref[u, pl.ds(8 * b, 8)]
                        localp = top - 8 * b
                        selb = (localp >= 0) & (localp < 8)
                        got = jnp.take_along_axis(blk, jnp.clip(localp, 0, 7),
                                                  axis=0)
                        popped = jnp.where(selb, got, popped)
                        local = row8 + (8 * b) - sp8u
                        inr = (local >= 0) & (local < npush)
                        stack_ref[u, pl.ds(8 * b, 8)] = jnp.where(
                            inr, aligned, blk)
                        return popped

                    popped = jax.lax.fori_loop(0, bsup, stack_blk, zero8)
                else:
                    popped = zero8

                lmin = lminR[u:u + 1]
                found = is_leaf & (lmin < INF_BITS)
                slot = lmin & 7
                texact = jnp.take_along_axis(tb[sl], b8(slot), axis=0)[0:1]
                t_new = _f32(texact)
                found = found & (t_new < t_far)
                t_far = jnp.where(found, t_new, t_far)
                best = jnp.where(found, (-cur - 1) * 8 + slot, best)

                has_next = is_node & (h > 0)
                need_pop = (is_node | is_leaf) & ~has_next
                sp_row = new_sp[0:1]
                do_pop = need_pop & (sp_row > 0)
                cur = jnp.where(has_next, next_ref,
                                jnp.where(do_pop, popped[0:1], cur))
                sp_row = jnp.where(do_pop, sp_row - 1, sp_row)
                active = has_next | do_pop | stall8[8 * u:8 * u + 1]

                cur_ref[sl] = b8(cur)
                sp_ref[sl] = b8(sp_row)
                tf_ref[sl] = b8(t_far)
                best_ref[sl] = b8(best)
                act_ref[sl] = b8(jnp.where(active, 1, 0))

            n_active = jnp.sum(act_ref[:])
            return it + 1, n_active, ntrips + nt, ltrips + lt

        def cond(state):
            return state[0] < max_steps

        live0 = tnear8 <= tfar8
        act_ref[:] = zeroR + jnp.where(live0, 1, 0)
        cur_ref[:] = zeroR
        sp_ref[:] = zeroR
        tf_ref[:] = zeroR.astype(jnp.float32) + tfar8
        best_ref[:] = zeroR - 1
        stack_ref[:] = jnp.zeros((UGRP, 8 * STACK_BLOCKS, LANE), jnp.int32)
        nbuf_ref[:] = jnp.zeros((4, ROWS, LANE), jnp.int32)
        lbuf_ref[:] = jnp.zeros((9, ROWS, LANE), jnp.float32)

        it_final, _, ntrips, ltrips = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(1), jnp.int32(0), jnp.int32(0)))
        out_t_ref[0] = tf_ref[:].reshape(UGRP, 8, LANE)[:, 0, :]
        out_prim_ref[0] = best_ref[:].reshape(UGRP, 8, LANE)[:, 0, :]
        zu = jax.lax.broadcasted_iota(jnp.int32, (UGRP, LANE), 0) * 0
        out_steps_ref[0] = zu + it_final
        out_steps_ref[0, 1:2] = jnp.broadcast_to(ntrips, (1, LANE))
        out_steps_ref[0, 2:3] = jnp.broadcast_to(ltrips, (1, LANE))

    return _kernel


def traverse(packed, org, dir, tnear, tfar, mask, **flags):
    R = org.shape[0]
    PROG = UGRP * LANE
    B = -(-R // PROG)
    pad = B * PROG - R

    def prep(x, fill):
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x
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
    kernel = make_kernel(GN, GL, **flags)
    ray3_spec = pl.BlockSpec((1, 3, UGRP, LANE), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, UGRP, LANE), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((GN, 32, LANE), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GL, 72, LANE), lambda b: (0, 0, 0),
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
            pltpu.VMEM((UGRP, 8 * STACK_BLOCKS, LANE), jnp.int32),
            pltpu.VMEM((ROWS, LANE), jnp.int32),
            pltpu.VMEM((ROWS, LANE), jnp.int32),
            pltpu.VMEM((ROWS, LANE), jnp.float32),
            pltpu.VMEM((ROWS, LANE), jnp.int32),
            pltpu.VMEM((ROWS, LANE), jnp.int32),
            pltpu.VMEM((ROWS, LANE), jnp.int32),
            pltpu.VMEM((11, ROWS, LANE), jnp.float32),
            pltpu.VMEM((4, ROWS, LANE), jnp.int32),
            pltpu.VMEM((9, ROWS, LANE), jnp.float32),
        ],
    )(packed.node_table, packed.leaf_table, orgp, dirp, tnearp, tfarp, maskp)


def main():
    n_rays = 1 << 20
    verts, idx = tp and __import__("perf.profile_steps", fromlist=["sphere_mesh"]).sphere_mesh()
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()
    packed = cs.packed
    assert not packed.has_mask

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
        ("full", dict()),
        ("one_trip", dict(one_trip=True)),
        ("no node fetch", dict(f_node=False)),
        ("no leaf fetch", dict(f_leaf=False)),
        ("no fetch", dict(f_node=False, f_leaf=False)),
        ("no node math", dict(m_node=False)),
        ("no leaf math", dict(m_leaf=False)),
        ("no sort", dict(sort=False)),
        ("no stack", dict(stack=False)),
        ("fetch only", dict(m_node=False, m_leaf=False, sort=False,
                            stack=False)),
        ("compute only", dict(f_node=False, f_leaf=False)),
        ("bare", dict(f_node=False, f_leaf=False, m_node=False,
                      m_leaf=False, sort=False, stack=False)),
    ]
    for name, kw in variants:
        try:
            f = jax.jit(functools.partial(traverse, packed, **kw))
            r = jax.block_until_ready(f(org, d, tnear, tfar, mask))
            t0 = time.perf_counter()
            r = jax.block_until_ready(f(org, d, tnear, tfar, mask))
            el = time.perf_counter() - t0
            arr = np.asarray(r[2])
            steps = arr[:, 0, 0].sum()
            print(f"{name:16s} {el*1e3:7.1f} ms  steps {steps}  "
                  f"{el/steps*1e9:7.0f} ns/step")
        except Exception as e:
            print(f"{name:16s} FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    main()
