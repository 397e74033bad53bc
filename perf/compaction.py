"""Wavefront compaction payoff measurement (SURVEY §2.8 P2).

The pathtracer's bounce loop leaves terminated rays inert (tnear > tfar).
The coherence sort's dead bit packs them into all-dead programs that retire
after one kernel step. This script measures intersect() throughput on ray
populations with 0/50/75/90% dead lanes — the compacted cost should track
the LIVE fraction, not the total ray count.

Run on TPU: python perf/compaction.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from profile_steps import sphere_mesh


def main():
    verts, idx = sphere_mesh()
    s = et.Scene()
    s.attach(et.TriangleGeometry(jnp.asarray(verts), jnp.asarray(idx)))
    cs = s.commit()
    n = 1 << 20
    rng = np.random.default_rng(0)
    org = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    run = jax.jit(lambda c, r: et.intersect(c, r, differentiable=False).t)
    base = None
    for frac in (0.0, 0.5, 0.75, 0.9):
        dead = jnp.asarray(rng.uniform(size=n) < frac)
        tfar = jnp.where(dead, -1.0, jnp.inf)    # inert lanes
        rays = et.make_rays(org, d, tfar=tfar)
        jax.block_until_ready(run(cs, rays))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(cs, rays))
            ts.append(time.perf_counter() - t0)
        el = min(ts)
        if base is None:
            base = el
        live = 1.0 - frac
        print(f"dead={frac:.0%}: {el*1e3:7.1f} ms  vs-all-live {el/base:5.2f} "
              f"(ideal {max(live, 0.02):4.2f})")


if __name__ == "__main__":
    main()
