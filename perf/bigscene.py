"""Big-scene benchmark experiment: >=1M-tri scene through the HBM-streaming
kernel path on real TPU hardware (the Crown-class workload,
/root/reference/tutorials/models/trace.bench:1-11 analog; 16M incoherent rays
matching tutorials/verify/verify.cpp:5933).

Usage: python perf/bigscene.py [n_theta n_phi n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sphere_mesh(n_theta, n_phi, radius=1.0):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    t, p = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack([
        radius * np.sin(t) * np.cos(p),
        radius * np.sin(t) * np.sin(p),
        radius * np.cos(t)], axis=-1).reshape(-1, 3).astype(np.float32)
    i = np.arange(n_theta)[:, None]
    j = np.arange(n_phi)[None, :]
    a = (i * n_phi + j).ravel()
    b = (i * n_phi + (j + 1) % n_phi).ravel()
    c = ((i + 1) * n_phi + j).ravel()
    d = ((i + 1) * n_phi + (j + 1) % n_phi).ravel()
    idx = np.concatenate([np.stack([a, b, d], -1), np.stack([a, d, c], -1)])
    return verts, idx.astype(np.int32)


def main():
    n_theta = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_phi = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_rays = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 22)

    import jax
    import jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.accel import traverse_pallas as tp

    print("devices:", jax.devices())
    verts, idx = sphere_mesh(n_theta, n_phi)
    print(f"tris={len(idx):,} verts={len(verts):,}")

    t0 = time.perf_counter()
    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = scene.commit()
    print(f"commit: {time.perf_counter()-t0:.2f}s")
    pk = cs.packed
    if pk is not None:
        nb = pk.n_node_tiles * 32 * 128 * 4
        from embree_tpu.accel.pack import ltab_rows
        lr = ltab_rows(pk.has_mask, pk.has_motion, pk.has_kinds, pk.has_win)
        lb = pk.n_leaf_tiles * lr * 128 * 4
        print(f"node table: {nb/2**20:.1f} MiB ({pk.n_node_tiles} tiles), "
              f"leaf table: {lb/2**20:.1f} MiB ({pk.n_leaf_tiles} tiles)")

    rng = np.random.default_rng(0)
    org = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(d))

    def _run(cs, rays):
        t = et.intersect(cs, rays, differentiable=False).t
        # LAST_STEPS is filled with the traced steps output during this
        # trace; returning it makes the counters concrete
        return t, tp.LAST_STEPS[0]

    run0 = jax.jit(_run)
    run = lambda cs, rays: run0(cs, rays)[0]
    t0 = time.perf_counter()
    t = jax.block_until_ready(run(cs, rays))
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s "
          f"hit-rate={float(jnp.mean(jnp.isfinite(t))):.3f}")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(cs, rays))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"times: {[f'{x:.3f}' for x in times]}")
    print(f"=> {n_rays/best/1e6:.2f} Mrays/s")
    steps = run0(cs, rays)[1]
    try:
        s = np.asarray(steps)
        print(f"steps/program mean={s[:,0,0].mean():.0f} max={s[:,0,0].max()} "
              f"ntrips={s[:,1,0].sum()} ltrips={s[:,2,0].sum()} "
              f"ndma={s[:,3,0].sum()} ldma={s[:,4,0].sum()}")
    except Exception:
        pass


if __name__ == "__main__":
    main()
