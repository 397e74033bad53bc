"""Traversable serialization — checkpoint/resume for committed scenes.

New capability vs the reference (SURVEY.md §5.4: RTCTraversable is not
serializable in Embree; here the traversable is just arrays). Scenes with
host callbacks (filters / user geometry) serialize their arrays; callbacks
must be re-attached by the loader (documented limitation, like pickling).
"""
from __future__ import annotations

import json

import jax
import numpy as np

from ..scene import CommittedScene


def save_scene(path: str, scene: CommittedScene):
    """Serialize a CommittedScene to an .npz archive."""
    arrays = {}
    children, aux = scene.tree_flatten()
    flat, treedef = jax.tree.flatten(children)
    for i, leaf in enumerate(flat):
        arrays[f"leaf_{i}"] = np.asarray(leaf)
    kinds_present, has_motion, filters, user_fns, robust = aux
    if filters or user_fns:
        raise ValueError(
            "scenes with filter/user callbacks cannot be serialized; "
            "re-commit without callbacks or re-attach them after load")
    meta = dict(kinds_present=list(kinds_present), has_motion=bool(has_motion),
                robust=bool(robust),
                n_leaves=len(flat), has_packed=scene.packed is not None,
                packed_aux=list(scene.packed.tree_flatten()[1][:3])
                + [list(scene.packed.kind_classes)]
                if scene.packed is not None else None)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    # keep treedef structure implicitly: CommittedScene has a fixed layout


def load_scene(path: str) -> CommittedScene:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    # rebuild the children tuple with the same static structure used by flatten
    pa = meta.get("packed_aux")
    packed_aux = (pa[0], pa[1], pa[2], tuple(pa[3])) if pa else None
    ref_treedef = _scene_treedef(meta["has_packed"], packed_aux)
    children = jax.tree.unflatten(ref_treedef, flat)
    aux = (tuple(meta["kinds_present"]), bool(meta["has_motion"]), (), (),
           bool(meta.get("robust", False)))
    return CommittedScene.tree_unflatten(aux, children)


def _scene_treedef(has_packed: bool, packed_aux=None):
    """Treedef of CommittedScene children (BVH is a nested pytree; packed may
    be None — normalized to PackedScene-with-table in save)."""
    import jax.numpy as jnp
    from ..accel.bvh import BVH
    from ..accel.pack import PackedScene
    z = jnp.zeros(())
    dummy_children = []
    for f in CommittedScene._ARRAY_FIELDS:
        if f == "bvh":
            dummy_children.append(BVH(z, z, z, z))
        elif f == "packed":
            dummy_children.append(
                PackedScene(z, z, z, *(packed_aux or (False, False, False,
                                                      (0,))))
                if has_packed else None)
        else:
            dummy_children.append(z)
    return jax.tree.structure(tuple(dummy_children))
