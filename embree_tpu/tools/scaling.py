"""Record the multi-device scaling table -> SCALING.json.

The P8 north-star artifact (BASELINE.md: >=0.85 efficiency at 2 devices).
Runs measure_scaling on the 8-device virtual CPU mesh (the fake-cluster
testing model, SURVEY.md §4) — the same code path a real pod slice takes,
with XLA inserting the collectives over the mesh.

Usage: python -m embree_tpu.tools.scaling [--out SCALING.json] [--rays N]
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--rays", type=int, default=1 << 17)
    ap.add_argument("--counts", default="1,2,4,8")
    args = ap.parse_args(argv)

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import embree_tpu as et
    from embree_tpu.parallel.render import measure_scaling

    rng = np.random.default_rng(0)
    th = np.linspace(0, np.pi, 33)
    ph = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    t, p = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                      np.cos(t)], -1).reshape(-1, 3).astype(np.float32)
    i = np.arange(32)[:, None]
    j = np.arange(64)[None, :]
    a = (i * 64 + j).ravel()
    b = (i * 64 + (j + 1) % 64).ravel()
    c = ((i + 1) * 64 + j).ravel()
    d = ((i + 1) * 64 + (j + 1) % 64).ravel()
    idx = np.concatenate([np.stack([a, b, d], -1),
                          np.stack([a, d, c], -1)]).astype(np.int32)
    s = et.Scene()
    s.attach(et.TriangleGeometry(verts, idx))
    cs = s.commit()

    org = rng.uniform(-2, 2, (args.rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(args.rays, 3)).astype(np.float32)
    rays = et.make_rays(org, dirs)

    counts = [int(x) for x in args.counts.split(",")]
    from embree_tpu.parallel.render import measure_scaling_weak
    per_dev = args.rays // 8
    rays_w = et.make_rays(org[:per_dev], dirs[:per_dev])
    weak = measure_scaling_weak(cs, rays_w, counts, backend="jnp")
    table = measure_scaling(cs, rays, counts, backend="jnp")
    # The 8 virtual devices SHARE one physical CPU, so per-device speedup is
    # unobservable here; the meaningful number is THROUGHPUT RETENTION
    # T_n / T_1 — how much the sharding/collective machinery costs when the
    # same silicon is split n ways (1.0 = sharding overhead-free; the real
    # >=0.85-at-2-hosts check needs 2 real hosts, BASELINE.md).
    t1 = table[min(table)]["rays_per_s"]
    for n in table:
        table[n]["throughput_retention"] = table[n]["rays_per_s"] / t1
    out = {"backend": "cpu-virtual-mesh-shared-silicon", "n_rays": args.rays,
           "metric_note": ("virtual devices share one CPU: "
                           "throughput_retention (T_n/T_1) is the sharding-"
                           "overhead measure; 'efficiency' (T_n/(n*T_1)) "
                           "only applies on real multi-chip hardware"),
           "devices": {str(k): v for k, v in table.items()},
           "weak_scaling": {
               "note": ("per-device batch constant (total = n x base), "
                        "identical batches -> uniform load: flat_retention "
                        "(T_weak(n)/T_weak(1), ideal 1.0 on shared silicon)"
                        " isolates sharding/collective machinery from "
                        "load-balance tails"),
               "rays_per_device": per_dev,
               "devices": {str(k): v for k, v in weak.items()}}}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for n, row in table.items():
        print(f"n={n}: {row['rays_per_s']/1e6:.3f} Mrays/s "
              f"retention={row['throughput_retention']:.3f} "
              f"weak_flat={weak[n]['flat_retention']:.3f}")
    r2 = table.get(2, {}).get("throughput_retention", 0)
    print(f"-> {args.out}; 2-device throughput retention {r2:.3f} "
          f"(sharding overhead {100*(1-r2):.0f}%)")


if __name__ == "__main__":
    main()
