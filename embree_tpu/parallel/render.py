"""Distributed rendering: ray/tile sharding over a device mesh.

The new distributed component the reference lacks (SURVEY.md §5.8): one
jax.sharding.Mesh over the slice, rays/tiles sharded along the "rays" axis
(data parallelism over rays), the committed scene replicated (BVHs are small
vs HBM), image/gradient reductions left to XLA collectives over ICI.

Multi-host: call init_distributed() on every host (jax.distributed over DCN),
then the same code runs SPMD — the analog of rtcJoinCommitScene's cooperative
entry (SURVEY.md §2.8 P6), except it's the *render* that is cooperative; the
build stays per-host deterministic.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ray import RayBatch
from ..models.camera import Camera
from ..scene import CommittedScene, intersect


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """jax.distributed bring-up over DCN (multi-host pod slice)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def _global_put(x, mesh: Mesh, spec: P):
    """Place a host value under a (possibly multi-process) mesh sharding.

    Single process: plain device_put. Multi-process: every process holds
    the full value and contributes only its addressable shards
    (make_array_from_callback) — no cross-host transfers needed, matching
    the per-host-deterministic-build model."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    h = np.asarray(x)
    return jax.make_array_from_callback(h.shape, sharding,
                                        lambda idx: h[idx])


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: _global_put(x, mesh, P()), tree)


def shard_rays(rays: RayBatch, mesh: Mesh, axis: str = "rays") -> RayBatch:
    """Place a flat RayBatch with its leading dim sharded across the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return _global_put(x, mesh, spec)
    return jax.tree.map(put, rays)


def render_image_sharded(scene: CommittedScene, camera: Camera,
                         height: int, width: int, mesh: Mesh,
                         shader: str = "eyelight", backend=None):
    """Render with rows sharded across the mesh (tile decomposition analog:
    the reference's 8x8-tile parallel_for becomes row-block sharding; XLA
    inserts the gather-free all-to-nothing — each device shades its rows)."""
    from ..models.viewer import SHADERS

    rays = camera.rays(height, width)
    flat = jax.tree.map(lambda x: x.reshape((height * width,) + x.shape[2:]), rays)
    flat = shard_rays(flat, mesh)
    scene_r = replicate(scene, mesh)

    @jax.jit
    def run(scene, rays_flat):
        hits = intersect(scene, rays_flat, backend=backend)
        rays2 = jax.tree.map(
            lambda x: x.reshape((height, width) + x.shape[1:]), rays_flat)
        hits2 = jax.tree.map(
            lambda x: x.reshape((height, width) + x.shape[1:]), hits)
        return SHADERS[shader](scene, rays2, hits2)

    return run(scene_r, flat)


def measure_scaling(scene: CommittedScene, rays_flat: RayBatch,
                    device_counts, backend=None, iters: int = 3):
    """Rays/s at several mesh sizes -> scaling efficiency table
    (the 1-chip / n-chip north-star measurement, BASELINE.md)."""
    import time

    results = {}
    n_rays = rays_flat.shape[0]
    for n in device_counts:
        mesh = make_mesh(n)
        sharded = shard_rays(rays_flat, mesh)
        scene_r = replicate(scene, mesh)
        run = jax.jit(lambda s, r: intersect(s, r, backend=backend).t)
        jax.block_until_ready(run(scene_r, sharded))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(run(scene_r, sharded))
            times.append(time.perf_counter() - t0)
        results[n] = n_rays / min(times)
    base = results[min(results)] / min(results)
    return {n: dict(rays_per_s=v, efficiency=v / (n * base))
            for n, v in results.items()}


def measure_scaling_weak(scene: CommittedScene, rays_flat: RayBatch,
                         device_counts, backend=None, iters: int = 3):
    """Weak scaling: the per-device ray batch is held CONSTANT (total rays
    = n x base) by replicating the same batch onto every device — load is
    uniform by construction. On a shared-silicon virtual mesh total work
    grows with n on fixed hardware, so ideal throughput is FLAT at T(1);
    any drop below it is pure sharding/collective machinery, isolated from
    the load-balance tail effects that confound the fixed-total (strong)
    measurement (VERDICT r4 weak-point 5: the unexplained n=8 slope)."""
    import time

    per = rays_flat.shape[0]
    results = {}
    for n in device_counts:
        mesh = make_mesh(n)
        reps = jax.tree.map(
            lambda x: jnp.concatenate([x] * n, axis=0), rays_flat)
        sharded = shard_rays(reps, mesh)
        scene_r = replicate(scene, mesh)
        run = jax.jit(lambda s, r: intersect(s, r, backend=backend).t)
        jax.block_until_ready(run(scene_r, sharded))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(run(scene_r, sharded))
            times.append(time.perf_counter() - t0)
        results[n] = per * n / min(times)
    t1 = results[min(results)]
    return {n: dict(rays_per_s=v, flat_retention=v / t1)
            for n, v in results.items()}
