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

# static fields that are python callables and cannot be serialized
_CALLABLE_FIELDS = ("filters", "user_fns")

# archive format version; bump whenever the CommittedScene array layout or
# static-field set changes (pre-versioning archives predate round 3)
FORMAT_VERSION = 8   # r5: + strand-aligned leaf-OBB hair-tier tables


def save_scene(path: str, scene: CommittedScene):
    """Serialize a CommittedScene to an .npz archive."""
    arrays = {}
    children, aux = scene.tree_flatten()
    flat, _ = jax.tree.flatten(children)
    for i, leaf in enumerate(flat):
        arrays[f"leaf_{i}"] = np.asarray(leaf)
    statics = dict(zip(CommittedScene._STATIC_FIELDS, aux))
    for f in _CALLABLE_FIELDS:
        if statics.get(f):
            raise ValueError(
                "scenes with filter/user callbacks cannot be serialized; "
                "re-commit without callbacks or re-attach them after load")
        statics[f] = []
    statics = {k: (list(v) if isinstance(v, tuple) else v)
               for k, v in statics.items()}
    meta = dict(version=FORMAT_VERSION, statics=statics,
                n_leaves=len(flat), has_packed=scene.packed is not None,
                packed_aux=_packed_aux_json(scene.packed))
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    # keep treedef structure implicitly: CommittedScene has a fixed layout


def _packed_aux_json(packed):
    if packed is None:
        return None
    aux = packed.tree_flatten()[1]
    return [list(a) if isinstance(a, tuple) else a for a in aux]


def load_scene(path: str) -> CommittedScene:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    ver = meta.get("version", 0)
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path!r} has format version {ver}, this build reads "
            f"version {FORMAT_VERSION}; re-commit the scene and save again "
            "(archives are not migrated across layout changes)")
    flat = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    # rebuild the children tuple with the same static structure used by flatten
    pa = meta.get("packed_aux")
    packed_aux = tuple(tuple(a) if isinstance(a, list) else a for a in pa) \
        if pa else None
    ref_treedef = _scene_treedef(meta["has_packed"], packed_aux)
    children = jax.tree.unflatten(ref_treedef, flat)
    statics = meta["statics"]
    aux = tuple(
        tuple(statics[f]) if isinstance(statics[f], list) else statics[f]
        for f in CommittedScene._STATIC_FIELDS)
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
                PackedScene(z, z, *(packed_aux or ()))
                if has_packed else None)
        else:
            dummy_children.append(z)
    return jax.tree.structure(tuple(dummy_children))
