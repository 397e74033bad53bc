"""Device-mesh parallelism: ray/tile sharding + replicated scene.

The reference is single-node (SURVEY.md §5.8: no MPI/NCCL anywhere); this is the
new distributed component the TPU build adds (§2.8 P8):

- one `jax.sharding.Mesh` over the slice; axis "rays" = data parallelism over rays
  (image tiles / ray batches), the ray-tracing analog of DP.
- the committed scene (BVH + primitive SoA) is small relative to HBM and is
  *replicated*; gradients w.r.t. scene parameters are all-reduced over ICI by XLA
  (psum inserted automatically under jit with sharded inputs).
- spatial scene partitioning + ray forwarding (the ring/ICI design for
  HBM-exceeding scenes) is a later milestone (§5.7).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ray import RayBatch
from ..scene import CommittedScene, intersect


def make_mesh(n_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_rays(rays: RayBatch, mesh: Mesh, axis: str = "rays") -> RayBatch:
    """Place a flat RayBatch with its leading dim sharded across the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, rays)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def render_depth(scene: CommittedScene, rays: RayBatch) -> jnp.ndarray:
    """Flagship differentiable forward: per-ray inverse depth (0 for miss)."""
    hits = intersect(scene, rays)
    return jnp.where(hits.valid, 1.0 / jnp.maximum(hits.t, 1e-6), 0.0)


def depth_loss(tri_v0, tri_v1, tri_v2, scene: CommittedScene, rays: RayBatch,
               target: jnp.ndarray) -> jnp.ndarray:
    """MSE between rendered inverse depth and a target; differentiable w.r.t.
    the vertex arrays (gradient flows through the re-intersection pass)."""
    import dataclasses
    s = dataclasses.replace(scene, tri_v0=tri_v0, tri_v1=tri_v1, tri_v2=tri_v2)
    img = render_depth(s, rays)
    return jnp.mean((img - target) ** 2)


def make_train_step(mesh: Mesh, lr: float = 1e-2, axis: str = "rays"):
    """One SGD step on vertex positions from sharded rays.

    Rays/target sharded over `axis`; scene replicated. XLA inserts the psum for
    the vertex gradient all-reduce over ICI.
    """
    ray_spec = P(axis)

    def step(scene: CommittedScene, rays: RayBatch, target):
        grads = jax.grad(depth_loss, argnums=(0, 1, 2))(
            scene.tri_v0, scene.tri_v1, scene.tri_v2, scene, rays, target)
        import dataclasses
        new = dataclasses.replace(
            scene,
            tri_v0=scene.tri_v0 - lr * grads[0],
            tri_v1=scene.tri_v1 - lr * grads[1],
            tri_v2=scene.tri_v2 - lr * grads[2],
        )
        loss = depth_loss(scene.tri_v0, scene.tri_v1, scene.tri_v2, scene, rays, target)
        return new, loss

    scene_sharding = NamedSharding(mesh, P())
    ray_sharding = NamedSharding(mesh, ray_spec)

    def ray_shardings(rays_tree):
        return jax.tree.map(
            lambda x: NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))),
            rays_tree)

    return step
