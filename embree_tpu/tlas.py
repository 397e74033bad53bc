"""Two-level TLAS/BLAS instancing.

Role parity with the reference's two-level acceleration
(kernels/bvh/bvh_builder_twolevel.h:25, instance leaf traversal
kernels/geometry/instance_intersector.cpp:25-60): each child scene commits
ONCE into a shared BLAS (a CommittedScene); the top level is a BVH over
instance world bounds. At an instance leaf the ray is transformed into
object space and traverses the BLAS, so BLAS memory is shared between
instances, transform updates never rebuild BLASes, and non-uniform scales
are exact for round primitives (the flattening path's documented
limitation, scene.py _xf_scale).

TPU-first divergence: instead of the reference's recursive per-ray
descent into the BLAS at instance leaves (a nested stack machine), the
TLAS pass COLLECTS up to C overlapping instances per ray (bounded, with an
overflow counter), then each distinct child scene batch-traverses all its
candidate rays at once in object space — dense SPMD per BLAS, the batched
TLAS/BLAS strategy of SURVEY.md §2.8 P5. Hits merge by t; instID reports
the instance geometry id (instance_stack.h semantics, depth 1).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .accel import traverse as trav_mod
from .accel.bvh import BVH, INVALID_NODE
from .accel.sah import build_sah
from .accel.collapse import collapse
from .core.ray import INVALID_ID, HitBatch, RayBatch
from .geometry import InstanceArrayGeometry, InstanceGeometry
from .scene import CommittedScene, Scene, intersect as scene_intersect, occluded as scene_occluded

MAX_CANDIDATES = 8   # per-ray bounded instance overlap (overflow counted)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TwoLevelScene:
    """TLAS over instances + shared child BLASes (device pytree).

    inst_l2w holds S motion steps per instance (S=1 static; padded to the
    max step count by repeating the last step) sampled at ray time in the
    BLAS pass — the reference's motion-blurred instancing
    (scene_instance.cpp getWorld2Local time interpolation)."""
    children: Tuple[CommittedScene, ...]   # distinct BLASes (pytree children)
    tlas: BVH                              # BVH over instance world bounds
    inst_l2w: jnp.ndarray                  # (N, S, 3, 4) local->world steps
    inst_w2l: jnp.ndarray                  # (N, 3, 4) world->local at t=0
    inst_lo: jnp.ndarray                   # (N, 3) world bounds (all steps)
    inst_up: jnp.ndarray
    inst_gid: jnp.ndarray                  # (N,) instance geometry id
    inst_mask: jnp.ndarray                 # (N,) uint32
    inst_child_arr: jnp.ndarray            # (N,) int32 child index
    inst_child: Tuple[int, ...] = dataclasses.field(default=(), metadata={"static": True})
    has_motion: bool = dataclasses.field(default=False, metadata={"static": True})

    def tree_flatten(self):
        return ((self.children, self.tlas, self.inst_l2w, self.inst_w2l,
                 self.inst_lo, self.inst_up, self.inst_gid, self.inst_mask,
                 self.inst_child_arr), (self.inst_child, self.has_motion))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, inst_child=aux[0], has_motion=aux[1])

    @property
    def num_instances(self):
        return self.inst_gid.shape[0]

    @property
    def n_children(self):
        return len(self.children)


def _invert_affine(xf):
    inv = np.linalg.inv(xf[:, :3])
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = inv
    out[:, 3] = -inv @ xf[:, 3]
    return out


def _scene_bounds(cs: CommittedScene):
    """World bounds of a committed scene from its BVH root node."""
    valid = np.asarray(cs.bvh.node_child[0]) != int(INVALID_NODE)
    lo = np.asarray(cs.bvh.node_lower[0])[valid].min(0)
    up = np.asarray(cs.bvh.node_upper[0])[valid].max(0)
    return lo, up


def build_two_level(scene: Scene,
                    reuse_blas: TwoLevelScene = None) -> TwoLevelScene:
    """Commit a scene of Instance/InstanceArray geometries into a two-level
    structure. Child scenes sharing the same Scene object share one BLAS.
    Non-instance geometries are grouped into an implicit identity instance.
    reuse_blas: a previous TwoLevelScene with identical topology — its
    committed BLASes are reused so only transforms + TLAS rebuild.
    """
    blas_cache = {}
    children = []

    def blas_of(child_scene) -> int:
        key = id(child_scene)
        if key not in blas_cache:
            idx = len(children)
            if reuse_blas is not None:
                cs = reuse_blas.children[idx]
            else:
                cs = (child_scene if isinstance(child_scene, CommittedScene)
                      else child_scene.commit())
            blas_cache[key] = idx
            children.append(cs)
        return blas_cache[key]

    inst_xf, inst_child, inst_gid, inst_mask = [], [], [], []
    plain = Scene()
    has_plain = False
    for gid, g in sorted(scene._geoms.items()):
        if not getattr(g, "enabled", True):
            continue
        if isinstance(g, InstanceGeometry):
            from .geometry import instance_transform_steps
            xfs = instance_transform_steps(g)
            inst_xf.append(xfs if xfs.ndim == 3 else xfs[None])
            inst_child.append(blas_of(g.scene))
            inst_gid.append(gid)
            inst_mask.append(g.mask)
        elif isinstance(g, InstanceArrayGeometry):
            c = blas_of(g.scene)
            for xf in np.asarray(g.transforms, np.float32):
                inst_xf.append(xf[None])
                inst_child.append(c)
                inst_gid.append(gid)
                inst_mask.append(g.mask)
        else:
            plain.attach(g)
            has_plain = True
    if has_plain:
        c = blas_of(plain)
        inst_xf.append(np.hstack([np.eye(3), np.zeros((3, 1))])
                       .astype(np.float32)[None])
        inst_child.append(c)
        inst_gid.append(_INV)
        inst_mask.append(0xFFFFFFFF)

    N = len(inst_xf)
    if N == 0:
        raise ValueError("two-level commit on a scene without geometry")
    S = max(x.shape[0] for x in inst_xf)
    has_motion = S > 1
    # pad each instance's step stack to S by repeating the last step
    l2w = np.stack([
        np.concatenate([x, np.repeat(x[-1:], S - x.shape[0], axis=0)])
        if x.shape[0] < S else x for x in inst_xf])           # (N, S, 3, 4)
    w2l = np.stack([_invert_affine(x[0]) for x in l2w])

    # instance world bounds: transform the 8 BLAS bound corners at EVERY
    # motion step and union (conservative linear-motion bounds; vectorized
    # over all instances — the InstanceArray 10k-transform path must not
    # loop per instance)
    corners = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                        for i in range(8)], np.float32)
    cb = np.stack([np.concatenate(_scene_bounds(c)) for c in children])
    child_arr = np.asarray(inst_child, np.int32)
    blo, bup = cb[child_arr, :3], cb[child_arr, 3:]            # (N, 3)
    pts = blo[:, None, :] + corners[None] * (bup - blo)[:, None, :]  # (N,8,3)
    w = np.einsum("nsij,nkj->nski", l2w[:, :, :, :3], pts) \
        + l2w[:, :, None, :, 3]                               # (N,S,8,3)
    lo = w.min((1, 2)).astype(np.float32)
    up = w.max((1, 2)).astype(np.float32)

    # TLAS: binned-SAH over instance AABBs (CPU backend, small)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        bvh2 = jax.jit(lambda a, b: build_sah(a, b, leaf_size=4))(
            jax.device_put(lo, cpu), jax.device_put(up, cpu))
        tlas, _ = jax.jit(lambda b: collapse(b, width=8))(bvh2)

    default = jax.devices()[0]
    put = lambda a: jax.device_put(jnp.asarray(a), default)
    return TwoLevelScene(
        children=(tuple(children) if reuse_blas is not None
                  else tuple(jax.device_put(c, default) for c in children)),
        tlas=jax.device_put(tlas, default),
        inst_l2w=put(l2w), inst_w2l=put(w2l),
        inst_lo=put(lo), inst_up=put(up),
        inst_gid=put(np.asarray(inst_gid, np.uint32)),
        inst_mask=put(np.asarray(inst_mask, np.uint32)),
        inst_child_arr=put(np.asarray(inst_child, np.int32)),
        inst_child=tuple(inst_child), has_motion=has_motion)


_INV = int(INVALID_ID)


def update_transforms(tl: TwoLevelScene, scene: Scene) -> TwoLevelScene:
    """Refresh instance transforms + TLAS WITHOUT touching any BLAS — the
    dynamic-instance path (reference: TLAS rebuilds per commit while BLASes
    are cached, bvh_builder_twolevel.h)."""
    new = build_two_level(scene, reuse_blas=tl)
    assert new.inst_child == tl.inst_child, "topology changed; full rebuild"
    return new


def _lex_gt(t1, i1, t2, i2):
    """Lexicographic (entry_t, inst_id) order — the total order that makes
    the wave watermark exact even when instance bounds tie."""
    return (t1 > t2) | ((t1 == t2) & (i1 > i2))


def _collect_loop(tl: TwoLevelScene, rays: RayBatch, C: int,
                  wm_t=None, wm_i=None, best_t=None):
    """Lockstep TLAS walk carrying the candidate list in loop state.

    Collects per ray the C lex-smallest (entry_t, inst) candidates STRICTLY
    ABOVE the watermark (wm_t, wm_i) whose entry_t can still beat best_t.
    Returns (cand_ids (R,C), cand_ts (R,C), overflow (R,) bool) where
    overflow marks rays with qualifying candidates left uncollected — the
    wave driver (intersect_two_level) advances the watermark and re-walks,
    so bounded C never loses hits (fixes the silently-discarded overflow
    counter flagged in round 2)."""
    bvh = tl.tlas
    org, dir, tnear, tfar = rays.org, rays.dir, rays.tnear, rays.tfar
    R = org.shape[0]
    W = bvh.width
    rdir = 1.0 / jnp.where(jnp.abs(dir) < 1e-20,
                           jnp.where(dir >= 0, 1e-20, -1e-20), dir)
    if wm_t is None:
        wm_t = jnp.full(R, -jnp.inf)
    if wm_i is None:
        wm_i = jnp.full(R, -1, jnp.int32)
    if best_t is None:
        best_t = jnp.full(R, jnp.inf)

    STACK = 32
    state = (
        jnp.ones(R, bool), jnp.zeros(R, jnp.int32),           # active, cur
        jnp.zeros((R, STACK), jnp.int32), jnp.zeros(R, jnp.int32),  # stack, sp
        jnp.full((R, C), jnp.inf), jnp.full((R, C), -1, jnp.int32),  # cands
        jnp.zeros(R, bool),                                    # overflow
    )
    ray_idx = jnp.arange(R)
    arangeC = jnp.arange(C)

    def cond(s):
        return jnp.any(s[0])

    def body(s):
        active, cur, stack, sp, ct, cid, ovf = s
        is_node = active & (cur >= 0)
        is_leaf = active & (cur < 0) & (cur != INVALID_NODE)

        node = jnp.where(is_node, cur, 0)
        child = bvh.node_child[node]
        hit, t_entry = trav_mod.slab_test(
            bvh.node_lower[node], bvh.node_upper[node], org, rdir,
            tnear, tfar)
        hit = hit & (child != INVALID_NODE) & is_node[:, None]
        dist = jnp.where(hit, t_entry, jnp.inf)
        order = jnp.argsort(dist, axis=-1)
        child_sorted = jnp.take_along_axis(child, order, axis=-1)
        hit_sorted = jnp.take_along_axis(hit, order, axis=-1)
        nhits = jnp.sum(hit, axis=-1)

        new_stack, new_sp = stack, sp
        for k in range(W - 1, 0, -1):
            do_push = is_node & hit_sorted[:, k] & (new_sp < STACK)
            slot = jnp.where(do_push, new_sp, 0)
            val = jnp.where(do_push, child_sorted[:, k],
                            new_stack[ray_idx, slot])
            new_stack = new_stack.at[ray_idx, slot].set(val)
            new_sp = jnp.where(do_push, new_sp + 1, new_sp)
        node_next = jnp.where(nhits > 0, child_sorted[:, 0], INVALID_NODE)

        # leaf: insert each instance into the bounded candidate list,
        # keeping the C lex-smallest qualifying (entry_t, inst) pairs
        packed = jnp.where(is_leaf, -(cur + 1), 0)
        start = packed >> 4
        count = packed & 0xF
        for k in range(4):           # TLAS leaf_size = 4
            validk = is_leaf & (k < count)
            slot = jnp.clip(start + k, 0, bvh.n_prims - 1)
            inst = bvh.prim_order[slot].astype(jnp.int32)
            ih, it = trav_mod.slab_test(
                tl.inst_lo[inst][:, None, :], tl.inst_up[inst][:, None, :],
                org, rdir, tnear, tfar)
            te = it[:, 0]
            ok = (validk & ih[:, 0]
                  & ((rays.mask & tl.inst_mask[inst]) != 0)
                  & _lex_gt(te, inst, wm_t, wm_i)   # above the watermark
                  & (te <= best_t))                 # can still beat the hit
            # lex-worst kept entry (empty slots are (inf, -1): evicted first)
            w_t, w_i = ct[:, 0], cid[:, 0]
            w_k = jnp.zeros(R, jnp.int32)
            for c in range(1, C):
                gt = _lex_gt(ct[:, c], cid[:, c], w_t, w_i)
                w_t = jnp.where(gt, ct[:, c], w_t)
                w_i = jnp.where(gt, cid[:, c], w_i)
                w_k = jnp.where(gt, c, w_k)
            do = ok & _lex_gt(w_t, w_i, te, inst)
            # overflow: a qualifying candidate was rejected, or a held real
            # candidate got evicted — the next wave must re-walk
            ovf = ovf | (ok & ~do) | (do & jnp.isfinite(w_t))
            selc = do[:, None] & (arangeC[None, :] == w_k[:, None])
            ct = jnp.where(selc, te[:, None], ct)
            cid = jnp.where(selc, inst[:, None], cid)

        need_pop = is_leaf | (is_node & (nhits == 0))
        pop_cur, pop_sp, pop_active = trav_mod._pop(new_stack, new_sp, active)
        cur = jnp.where(need_pop, pop_cur,
                        jnp.where(is_node, node_next, cur))
        sp = jnp.where(need_pop, pop_sp, new_sp)
        active = jnp.where(need_pop, pop_active, active)
        return active, cur, new_stack, sp, ct, cid, ovf

    (_, _, _, _, ct, cid, ovf) = jax.lax.while_loop(cond, body, state)
    return cid, ct, ovf


def _xf_rays(w2l, rays_org, rays_dir):
    o = jnp.einsum("nij,nj->ni", w2l[..., :3], rays_org, precision="highest") + w2l[..., 3]
    d = jnp.einsum("nij,nj->ni", w2l[..., :3], rays_dir, precision="highest")
    return o, d


def _affine_inv_jnp(m):
    """Batched (…,3,4) affine inverse on device."""
    A = m[..., :3]
    b = m[..., 3]
    inv = jnp.linalg.inv(A)
    t = -jnp.einsum("...ij,...j->...i", inv, b, precision="highest")
    return jnp.concatenate([inv, t[..., None]], axis=-1)


def _l2w_at(tl: TwoLevelScene, inst, time):
    """Per-candidate local->world sampled at ray time (S-step lerp)."""
    steps = tl.inst_l2w[inst]                      # (..., S, 3, 4)
    S = tl.inst_l2w.shape[1]
    if S == 1:
        return steps[..., 0, :, :]
    x = jnp.clip(time, 0.0, 1.0) * (S - 1)
    k = jnp.clip(x.astype(jnp.int32), 0, S - 2)
    w = (x - k.astype(jnp.float32))[..., None, None]
    kk = jnp.broadcast_to(k[..., None, None, None], k.shape + (1, 3, 4))
    a = jnp.take_along_axis(steps, kk, axis=-3)[..., 0, :, :]
    b = jnp.take_along_axis(steps, kk + 1, axis=-3)[..., 0, :, :]
    return (1.0 - w) * a + w * b


def _blas_pass(tl: TwoLevelScene, flat: RayBatch, cand, best, C):
    """Batch-intersect every candidate lane against its BLAS and merge by t.
    best = (t, u, v, ng, prim, geom, instgid, valid)."""
    R = flat.org.shape[0]
    live = cand >= 0
    candc = jnp.clip(cand, 0, tl.num_instances - 1)
    flat_inst = candc.reshape(-1)
    time_rep = jnp.repeat(flat.time, C)
    l2w_t = _l2w_at(tl, flat_inst, time_rep)           # (R*C, 3, 4)
    if tl.has_motion:
        w2l = _affine_inv_jnp(l2w_t)
    else:
        w2l = tl.inst_w2l[flat_inst]
    o = jnp.repeat(flat.org, C, axis=0)
    d = jnp.repeat(flat.dir, C, axis=0)
    oo, od = _xf_rays(w2l, o, d)
    tnear = jnp.repeat(flat.tnear, C)
    tfar = jnp.where(live.reshape(-1), jnp.repeat(flat.tfar, C), -jnp.inf)
    obj_rays = RayBatch(org=oo, dir=od, tnear=tnear, tfar=tfar,
                        time=time_rep, mask=jnp.repeat(flat.mask, C))

    (best_t, best_u, best_v, best_ng, best_prim, best_geom, best_inst,
     best_valid) = best
    childv = tl.inst_child_arr[candc]                  # (R, C)
    for c, child in enumerate(tl.children):
        sel = (childv == c) & live                     # (R, C)
        # deactivate other lanes: tnear > tfar
        rr = RayBatch(org=obj_rays.org, dir=obj_rays.dir,
                      tnear=obj_rays.tnear,
                      tfar=jnp.where(sel.reshape(-1), obj_rays.tfar, -jnp.inf),
                      time=obj_rays.time, mask=obj_rays.mask)
        h = scene_intersect(child, rr)                 # (R*C,) HitBatch
        tv = jnp.where(h.valid & sel.reshape(-1), h.t, jnp.inf).reshape(R, C)
        lane = jnp.argmin(tv, axis=1)
        tmin = jnp.take_along_axis(tv, lane[:, None], 1)[:, 0]
        upd = tmin < best_t

        def pick(field, h=h, lane=lane):
            a = getattr(h, field).reshape((R, C) + getattr(h, field).shape[1:])
            return jnp.take_along_axis(
                a, lane.reshape((R, 1) + (1,) * (a.ndim - 2)), 1)[:, 0]

        inst_lane = jnp.take_along_axis(candc, lane[:, None], 1)[:, 0]
        l2w_lane = _l2w_at(tl, inst_lane, flat.time)
        ng_w = jnp.einsum("nij,nj->ni", l2w_lane[:, :, :3], pick("ng"), precision="highest")
        upd3 = upd[:, None]
        best_u = jnp.where(upd, pick("u"), best_u)
        best_v = jnp.where(upd, pick("v"), best_v)
        best_ng = jnp.where(upd3, ng_w, best_ng)
        best_prim = jnp.where(upd, pick("prim_id"), best_prim)
        best_geom = jnp.where(upd, pick("geom_id"), best_geom)
        best_inst = jnp.where(upd, tl.inst_gid[inst_lane], best_inst)
        best_valid = best_valid | upd
        best_t = jnp.where(upd, tmin, best_t)
    return (best_t, best_u, best_v, best_ng, best_prim, best_geom,
            best_inst, best_valid)


def intersect_two_level(tl: TwoLevelScene, rays: RayBatch,
                        C: int = MAX_CANDIDATES) -> HitBatch:
    """Closest hit through the two-level structure. Ray t is preserved by the
    object-space transform (direction NOT renormalized — reference instance
    semantics, instance_intersector.cpp:25-44).

    Runs collect+BLAS WAVES: each wave processes the C lex-nearest
    unprocessed instances per ray, then the watermark advances; rays whose
    candidate list overflowed re-walk for the next C. Bounded memory, exact
    for any overlap count (the per-ray nested recursion of the reference
    replaced by bounded batched passes)."""
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)) if shape else 1)
    R = flat.org.shape[0]

    best0 = (jnp.full((R,), jnp.inf), jnp.zeros((R,)), jnp.zeros((R,)),
             jnp.zeros((R, 3)), jnp.zeros((R,), jnp.uint32),
             jnp.zeros((R,), jnp.uint32), jnp.zeros((R,), jnp.uint32),
             jnp.zeros((R,), bool))

    def wave(wm_t, wm_i, best):
        cand, ct, ovf = _collect_loop(tl, flat, C, wm_t, wm_i, best[0])
        best = _blas_pass(tl, flat, cand, best, C)
        # watermark: lex-max over collected (finite) candidates
        new_t, new_i = wm_t, wm_i
        for c in range(C):
            fin = jnp.isfinite(ct[:, c]) & (cand[:, c] >= 0)
            gt = fin & _lex_gt(ct[:, c], cand[:, c], new_t, new_i)
            new_t = jnp.where(gt, ct[:, c], new_t)
            new_i = jnp.where(gt, cand[:, c], new_i)
        return new_t, new_i, ovf, best

    wm_t = jnp.full(R, -jnp.inf)
    wm_i = jnp.full(R, -1, jnp.int32)
    wm_t, wm_i, ovf, best = wave(wm_t, wm_i, best0)

    if tl.num_instances > C:
        # rare continuation waves (adversarial overlap counts) — a while
        # loop over the same wave body; pruned once the watermark passes
        # the current best hit
        def cond(s):
            wm_t, _, ovf, best = s
            return jnp.any(ovf & (wm_t <= best[0]))

        def body(s):
            wm_t, wm_i, _, best = s
            return wave(wm_t, wm_i, best)

        wm_t, wm_i, ovf, best = jax.lax.while_loop(
            cond, body, (wm_t, wm_i, ovf, best))

    (best_t, best_u, best_v, best_ng, best_prim, best_geom, best_inst,
     best_valid) = best
    inst_stack = jnp.stack([best_inst.astype(jnp.uint32),
                            jnp.full((R,), INVALID_ID, jnp.uint32)], -1)
    hits = HitBatch(
        t=jnp.where(best_valid, best_t, jnp.inf),
        u=best_u, v=best_v, ng=best_ng,
        prim_id=jnp.where(best_valid, best_prim, INVALID_ID),
        geom_id=jnp.where(best_valid, best_geom, INVALID_ID),
        inst_id=jnp.where(best_valid[:, None], inst_stack, INVALID_ID))
    return jax.tree.map(lambda a: a.reshape(shape + a.shape[1:]), hits)


def occluded_two_level(tl: TwoLevelScene, rays: RayBatch,
                       C: int = MAX_CANDIDATES) -> jnp.ndarray:
    h = intersect_two_level(tl, rays, C=C)
    return h.valid
