"""Headline benchmark: incoherent rays/s on a procedural sphere scene.

Analog of the reference IncoherentRaysBenchmark (tutorials/verify/verify.cpp:5923:
16M random rays vs procedural sphere geometry, reported as Mrays/s). Prints ONE
JSON line; vs_baseline is measured against the 1e8 rays/s/chip north-star target
(BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def sphere_mesh(n_theta=64, n_phi=128, radius=1.0):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    t, p = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack([
        radius * np.sin(t) * np.cos(p),
        radius * np.sin(t) * np.sin(p),
        radius * np.cos(t)], axis=-1).reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            idx.append([a, b, d])
            idx.append([a, d, c])
    return verts, np.asarray(idx, np.int32)


def big_scene_bench(et, jax, jnp):
    """Crown-class workload: >=2M tris through the HBM-streaming kernel with
    16M incoherent rays (the reference IncoherentRaysBenchmark ray count,
    verify.cpp:5933). Rays are generated on-device; the committed scene is
    cached on disk so driver re-runs skip the build."""
    import numpy as _np
    from embree_tpu.utils.checkpoint import load_scene, save_scene

    n_rays = int(os.environ.get("BENCH_BIG_RAYS", 1 << 24))
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".benchscene_big.npz")
    cs = None
    if os.path.exists(cache):
        try:
            cs = load_scene(cache)
        except Exception:
            cs = None
    if cs is None:
        verts, idx = sphere_mesh(1024, 1024)          # 2.1M tris
        scene = et.Scene()
        scene.attach(et.TriangleGeometry(jnp.asarray(verts),
                                         jnp.asarray(idx)))
        cs = scene.commit()
        try:
            save_scene(cache, cs)
        except Exception:
            pass

    @jax.jit
    def run(cs, seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        org = jax.random.uniform(k1, (n_rays, 3), jnp.float32, -2.0, 2.0)
        d = jax.random.normal(k2, (n_rays, 3), jnp.float32)
        rays = et.make_rays(org, d)
        return et.intersect(cs, rays, differentiable=False).t

    jax.block_until_ready(run(cs, 0))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(cs, 0))
        times.append(time.perf_counter() - t0)
    incoh = n_rays / min(times) / 1e6

    # coherent companion (CoherentRaysBenchmark analog, verify.cpp:5757:
    # 4096x4096 primary grid): same scene, camera bundle rays
    from embree_tpu.models.viewer import ispc_camera_rays
    side = int(os.environ.get("BENCH_COH_SIDE", 4096))

    @jax.jit
    def run_coh(cs):
        rays = ispc_camera_rays(_np.array([0.0, 0.0, 3.5]), _np.zeros(3),
                                _np.array([0.0, 1.0, 0.0]), 90.0, side, side)
        flat = jax.tree.map(lambda x: x.reshape((side * side,) + x.shape[2:]),
                            rays)
        return et.intersect(cs, flat, differentiable=False).t

    jax.block_until_ready(run_coh(cs))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run_coh(cs))
        times.append(time.perf_counter() - t0)
    coh = side * side / min(times) / 1e6
    return incoh, coh, cs.num_prims


def main():
    import jax
    import jax.numpy as jnp
    import embree_tpu as et

    n_rays = int(os.environ.get("BENCH_RAYS", 1 << 20))
    verts, idx = sphere_mesh()

    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()

    rng = np.random.default_rng(0)
    org = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(d))

    # differentiable=False: the apples-to-apples configuration vs the
    # reference (rtcIntersect1 fills t/u/v/Ng/ids and has no gradient path)
    run = jax.jit(lambda cs, rays: et.intersect(
        cs, rays, differentiable=False).t)
    t = jax.block_until_ready(run(cs, rays))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(cs, rays))
        times.append(time.perf_counter() - t0)
    best = min(times)
    mrays = n_rays / best / 1e6
    # per-machine score DB with regression detection (the verify.cpp:453-517
    # benchmark-database analog); a regression never lowers the stored bar
    from embree_tpu.tools.benchdb import record
    verdict = record("incoherent_rays", mrays, unit="Mrays/s")
    out = {
        "metric": "incoherent_rays",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "best": round(verdict["best"], 3),
        "regression": verdict["regression"],
    }
    if os.environ.get("BENCH_BIG", "1") != "0":
        try:
            big_mrays, coh_mrays, big_prims = big_scene_bench(et, jax, jnp)
            record("incoherent_rays_big", big_mrays, unit="Mrays/s")
            record("coherent_rays_big", coh_mrays, unit="Mrays/s")
            out["big_scene_mrays"] = round(big_mrays, 3)
            out["big_scene_coherent_mrays"] = round(coh_mrays, 3)
            out["big_scene_prims"] = int(big_prims)
            out["big_scene_rays"] = int(
                os.environ.get("BENCH_BIG_RAYS", 1 << 24))
        except Exception as e:  # noqa: BLE001 — headline metric must print
            out["big_scene_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
