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
    """TLAS over instances + shared child BLASes (device pytree)."""
    children: Tuple[CommittedScene, ...]   # distinct BLASes (pytree children)
    tlas: BVH                              # BVH over instance world bounds
    inst_l2w: jnp.ndarray                  # (N, 3, 4) local->world
    inst_w2l: jnp.ndarray                  # (N, 3, 4) world->local
    inst_lo: jnp.ndarray                   # (N, 3) world bounds
    inst_up: jnp.ndarray
    inst_gid: jnp.ndarray                  # (N,) instance geometry id
    inst_mask: jnp.ndarray                 # (N,) uint32
    inst_child_arr: jnp.ndarray            # (N,) int32 child index
    inst_child: Tuple[int, ...] = dataclasses.field(default=(), metadata={"static": True})

    def tree_flatten(self):
        return ((self.children, self.tlas, self.inst_l2w, self.inst_w2l,
                 self.inst_lo, self.inst_up, self.inst_gid, self.inst_mask,
                 self.inst_child_arr), (self.inst_child,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, inst_child=aux[0])

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
            xfs = np.asarray(g.transform, np.float32)
            xf = xfs[0] if xfs.ndim == 3 else xfs
            inst_xf.append(xf)
            inst_child.append(blas_of(g.scene))
            inst_gid.append(gid)
            inst_mask.append(g.mask)
        elif isinstance(g, InstanceArrayGeometry):
            c = blas_of(g.scene)
            for xf in np.asarray(g.transforms, np.float32):
                inst_xf.append(xf)
                inst_child.append(c)
                inst_gid.append(gid)
                inst_mask.append(g.mask)
        else:
            plain.attach(g)
            has_plain = True
    if has_plain:
        c = blas_of(plain)
        inst_xf.append(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32))
        inst_child.append(c)
        inst_gid.append(_INV)
        inst_mask.append(0xFFFFFFFF)

    N = len(inst_xf)
    if N == 0:
        raise ValueError("two-level commit on a scene without geometry")
    l2w = np.stack(inst_xf)
    w2l = np.stack([_invert_affine(x) for x in l2w])

    # instance world bounds: transform the 8 BLAS bound corners (vectorized
    # over all instances — the InstanceArray 10k-transform path must not
    # loop per instance)
    corners = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                        for i in range(8)], np.float32)
    cb = np.stack([np.concatenate(_scene_bounds(c)) for c in children])
    child_arr = np.asarray(inst_child, np.int32)
    blo, bup = cb[child_arr, :3], cb[child_arr, 3:]            # (N, 3)
    pts = blo[:, None, :] + corners[None] * (bup - blo)[:, None, :]  # (N,8,3)
    w = np.einsum("nij,nkj->nki", l2w[:, :, :3], pts) + l2w[:, None, :, 3]
    lo = w.min(1).astype(np.float32)
    up = w.max(1).astype(np.float32)

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
        inst_child=tuple(inst_child))


_INV = int(INVALID_ID)


def update_transforms(tl: TwoLevelScene, scene: Scene) -> TwoLevelScene:
    """Refresh instance transforms + TLAS WITHOUT touching any BLAS — the
    dynamic-instance path (reference: TLAS rebuilds per commit while BLASes
    are cached, bvh_builder_twolevel.h)."""
    new = build_two_level(scene, reuse_blas=tl)
    assert new.inst_child == tl.inst_child, "topology changed; full rebuild"
    return new


def _collect_loop(tl: TwoLevelScene, rays: RayBatch, C: int):
    """Lockstep TLAS walk carrying the candidate list in loop state."""
    bvh = tl.tlas
    org, dir, tnear, tfar = rays.org, rays.dir, rays.tnear, rays.tfar
    R = org.shape[0]
    W = bvh.width
    rdir = 1.0 / jnp.where(jnp.abs(dir) < 1e-20,
                           jnp.where(dir >= 0, 1e-20, -1e-20), dir)

    STACK = 32
    state = (
        jnp.ones(R, bool), jnp.zeros(R, jnp.int32),           # active, cur
        jnp.zeros((R, STACK), jnp.int32), jnp.zeros(R, jnp.int32),  # stack, sp
        jnp.full((R, C), jnp.inf), jnp.full((R, C), -1, jnp.int32),  # cands
        jnp.int32(0),                                          # overflow
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

        # leaf: insert each instance into the bounded candidate list
        packed = jnp.where(is_leaf, -(cur + 1), 0)
        start = packed >> 4
        count = packed & 0xF
        for k in range(4):           # TLAS leaf_size = 4
            validk = is_leaf & (k < count)
            slot = jnp.clip(start + k, 0, bvh.n_prims - 1)
            inst = bvh.prim_order[slot]
            ih, it = trav_mod.slab_test(
                tl.inst_lo[inst][:, None, :], tl.inst_up[inst][:, None, :],
                org, rdir, tnear, tfar)
            ok = validk & ih[:, 0] & ((rays.mask & tl.inst_mask[inst]) != 0)
            te = it[:, 0]
            worst = jnp.argmax(ct, axis=1)
            worst_t = jnp.take_along_axis(ct, worst[:, None], 1)[:, 0]
            do = ok & (te < worst_t)
            # overflow: an instance overlapped but all C slots held nearer
            # entries, or a held candidate got evicted — either way the
            # bounded list lost coverage (must be 0 for exactness)
            ovf = ovf + jnp.sum((ok & ~do).astype(jnp.int32)) \
                + jnp.sum((do & jnp.isfinite(worst_t)).astype(jnp.int32))
            selc = do[:, None] & (arangeC[None, :] == worst[:, None])
            ct = jnp.where(selc, te[:, None], ct)
            cid = jnp.where(selc, inst[:, None].astype(jnp.int32), cid)

        need_pop = is_leaf | (is_node & (nhits == 0))
        pop_cur, pop_sp, pop_active = trav_mod._pop(new_stack, new_sp, active)
        cur = jnp.where(need_pop, pop_cur,
                        jnp.where(is_node, node_next, cur))
        sp = jnp.where(need_pop, pop_sp, new_sp)
        active = jnp.where(need_pop, pop_active, active)
        return active, cur, new_stack, sp, ct, cid, ovf

    (_, _, _, _, ct, cid, ovf) = jax.lax.while_loop(cond, body, state)
    return cid, ovf


def _xf_rays(w2l, rays_org, rays_dir):
    o = jnp.einsum("nij,nj->ni", w2l[..., :3], rays_org) + w2l[..., 3]
    d = jnp.einsum("nij,nj->ni", w2l[..., :3], rays_dir)
    return o, d


def intersect_two_level(tl: TwoLevelScene, rays: RayBatch,
                        C: int = MAX_CANDIDATES) -> HitBatch:
    """Closest hit through the two-level structure. Ray t is preserved by the
    object-space transform (direction NOT renormalized — reference instance
    semantics, instance_intersector.cpp:25-44)."""
    shape = rays.shape
    flat = rays.reshape(int(np.prod(shape)) if shape else 1)
    R = flat.org.shape[0]

    cand, _ = _collect_loop(tl, flat, C)               # (R, C)
    live = cand >= 0
    candc = jnp.clip(cand, 0, tl.num_instances - 1)

    # object-space rays for every candidate lane
    w2l = tl.inst_w2l[candc.reshape(-1)]               # (R*C, 3, 4)
    o = jnp.repeat(flat.org, C, axis=0)
    d = jnp.repeat(flat.dir, C, axis=0)
    oo, od = _xf_rays(w2l, o, d)
    tnear = jnp.repeat(flat.tnear, C)
    tfar = jnp.where(live.reshape(-1), jnp.repeat(flat.tfar, C), -jnp.inf)
    obj_rays = RayBatch(org=oo, dir=od, tnear=tnear, tfar=tfar,
                        time=jnp.repeat(flat.time, C),
                        mask=jnp.repeat(flat.mask, C))

    best_t = jnp.full((R,), jnp.inf)
    best = None
    best_valid = jnp.zeros((R,), bool)
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
        l2w = tl.inst_l2w[inst_lane]
        ng_w = jnp.einsum("nij,nj->ni", l2w[:, :, :3], pick("ng"))
        cur = dict(t=tmin, u=pick("u"), v=pick("v"), ng=ng_w,
                   prim_id=pick("prim_id"), geom_id=pick("geom_id"),
                   inst=tl.inst_gid[inst_lane])
        if best is None:
            best = cur
        else:
            for k in cur:
                w = upd.reshape((R,) + (1,) * (cur[k].ndim - 1))
                best[k] = jnp.where(w, cur[k], best[k])
        best_valid = best_valid | upd
        best_t = jnp.where(upd, tmin, best_t)

    inst_stack = jnp.stack([best["inst"].astype(jnp.uint32),
                            jnp.full((R,), INVALID_ID, jnp.uint32)], -1)
    hits = HitBatch(
        t=jnp.where(best_valid, best_t, jnp.inf),
        u=best["u"], v=best["v"], ng=best["ng"],
        prim_id=jnp.where(best_valid, best["prim_id"], INVALID_ID),
        geom_id=jnp.where(best_valid, best["geom_id"], INVALID_ID),
        inst_id=jnp.where(best_valid[:, None], inst_stack, INVALID_ID))
    return jax.tree.map(lambda a: a.reshape(shape + a.shape[1:]), hits)


def occluded_two_level(tl: TwoLevelScene, rays: RayBatch,
                       C: int = MAX_CANDIDATES) -> jnp.ndarray:
    h = intersect_two_level(tl, rays, C=C)
    return h.valid
