"""buildbench analog: BVH build-performance benchmark.

Mirrors the reference's buildbench tool (tutorials/buildbench/buildbench.cpp
:27-39 build modes): static create, dynamic update (re-commit with deformed
vertices), refit, and the LOW/MEDIUM/HIGH quality tiers, over procedural
scenes of several sizes. Results print as Mprims/s and record into the
per-machine benchmark score DB (tools/benchdb.py).

Usage: python -m embree_tpu.tools.buildbench [--sizes 10000,100000]
       [--iters 3] [--cpu] [--no-db]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def make_mesh(n_tris: int, seed: int = 0):
    """Procedural triangle soup with locality (grid of perturbed quads)."""
    rng = np.random.default_rng(seed)
    side = max(int(np.sqrt(n_tris / 2)), 1)
    xs, ys = np.meshgrid(np.arange(side + 1), np.arange(side + 1),
                         indexing="ij")
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    verts = (verts + rng.normal(0, 0.2, verts.shape)).astype(np.float32)
    idx = []
    for i in range(side):
        for j in range(side):
            a = i * (side + 1) + j
            b = a + 1
            c = a + side + 1
            d = c + 1
            idx.append([a, b, d])
            idx.append([a, d, c])
    return verts, np.asarray(idx[:n_tris], np.int32)


def bench_scene(n_tris: int, quality, iters: int):
    import jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.scene import BuildQuality

    verts, idx = make_mesh(n_tris)
    results = {}

    # static create (build from scratch each time)
    ts = []
    for _ in range(iters):
        s = et.Scene(quality=quality)
        s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
        t0 = time.perf_counter()
        s.commit()
        ts.append(time.perf_counter() - t0)
    results["create"] = n_tris / min(ts) / 1e6

    # dynamic update: deform vertices, full re-commit on the same Scene
    s = et.Scene(quality=quality)
    gid = s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    s.commit()
    ts = []
    for k in range(iters):
        moved = verts + np.float32(0.01 * (k + 1))
        s.get(gid).vertices = jnp.asarray(moved)
        t0 = time.perf_counter()
        s.commit()
        ts.append(time.perf_counter() - t0)
    results["update"] = n_tris / min(ts) / 1e6

    # refit: keep topology, refresh bounds
    s = et.Scene(quality=BuildQuality.REFIT)
    gid = s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    s.commit()
    ts = []
    for k in range(iters):
        moved = verts + np.float32(0.01 * (k + 1))
        s.get(gid).vertices = jnp.asarray(moved)
        t0 = time.perf_counter()
        s.commit()
        ts.append(time.perf_counter() - t0)
    results["refit"] = n_tris / min(ts) / 1e6
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-db", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from embree_tpu.scene import BuildQuality
    from .benchdb import record

    sizes = [int(x) for x in args.sizes.split(",")]
    qualities = [("low", BuildQuality.LOW), ("medium", BuildQuality.MEDIUM),
                 ("high", BuildQuality.HIGH)]
    print(f"{'scene':>12s} {'quality':>8s} {'create':>10s} {'update':>10s} "
          f"{'refit':>10s}   (Mprims/s)")
    for n in sizes:
        for qname, q in qualities:
            r = bench_scene(n, q, args.iters)
            print(f"{n:>10d}tri {qname:>8s} {r['create']:>10.3f} "
                  f"{r['update']:>10.3f} {r['refit']:>10.3f}")
            if not args.no_db:
                for mode, v in r.items():
                    record(f"build_{mode}_{qname}_{n}", v, unit="Mprims/s")


if __name__ == "__main__":
    main()
