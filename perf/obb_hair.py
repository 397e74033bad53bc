"""Hair-tier OBB payoff measurement (VERDICT r4 #3 'Done' evidence).

For each hair model scene, commits twice (EMBREE_TPU_HAIR_OBB on/off) and
measures, through the jnp engine on camera rays:
  - lockstep traversal step count (TraversalResult.steps),
  - wall time per frame,
  - hit-image equality (conservativeness check).

Usage: python perf/obb_hair.py [--size 256] [--out perf/obb_hair.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = [
    "/root/reference/tests/models/curves/hair0.ecs",
    "/root/reference/tests/models/curves/hair1.ecs",
    "/root/reference/tests/models/furball/furball_bezier_normaloriented.ecs",
    "/root/reference/tests/models/furball/furball_bezier_round.ecs",
]


def measure(ecs, size):
    import jax
    import jax.numpy as jnp

    from embree_tpu import scene as scene_mod
    from embree_tpu.scene import _make_prim_test, _scene_leaf_obb
    from embree_tpu.accel import traverse as trav_mod
    from embree_tpu.models.viewer import ispc_camera_rays
    from embree_tpu.tools.parity_models import parse_ecs
    from embree_tpu.utils.xml_scene import load_xml, to_scene

    cfg = parse_ecs(ecs)
    xs = load_xml(cfg["xml"])
    cam = (xs.cameras.get(cfg["camera"]) if cfg["camera"] else None) \
        or xs.camera or {}
    vp = cfg["vp"] or tuple(cam.get("from_", (0.0001, 0.0001, -3.0)))
    vi = cfg["vi"] or tuple(cam.get("to", (0.0, 0.0, 0.0)))
    rays = ispc_camera_rays(np.asarray(vp), np.asarray(vi),
                            np.asarray(cfg["vu"]), cfg["fov"], size, size)
    rays = jax.tree.map(lambda x: x.reshape((size * size,) + x.shape[2:]),
                        rays)

    out = {}
    for enabled in (True, False):
        os.environ["EMBREE_TPU_HAIR_OBB"] = "1" if enabled else "0"
        cs = to_scene(xs).commit()
        obb = _scene_leaf_obb(cs)

        # leaf_obb rides the jit ARGUMENTS (closure capture would bake the
        # tables into the HLO as constants — oversized remote-compile bodies
        # on the tunnel backend)
        def run(cs, rays, obb):
            return trav_mod.traverse(
                cs.bvh, _make_prim_test(cs, rays), rays.org, rays.dir,
                rays.tnear, rays.tfar, occlusion=False,
                max_leaf_size=scene_mod.LEAF_SIZE, robust=cs.robust,
                leaf_obb=obb)

        runj = jax.jit(run, static_argnames=()) if obb is not None \
            else jax.jit(lambda cs, rays, _o: run(cs, rays, None))
        r = jax.block_until_ready(runj(cs, rays, obb))     # warm compile
        t0 = time.perf_counter()
        r = jax.block_until_ready(runj(cs, rays, obb))
        dt = time.perf_counter() - t0
        key = "on" if enabled else "off"
        out[f"steps_{key}"] = int(r.steps)
        out[f"sec_{key}"] = round(dt, 4)
        out[f"tier_active_{key}"] = bool(obb is not None)
        out[f"best_{key}"] = np.asarray(r.best_prim)
        out[f"tfar_{key}"] = np.asarray(r.tfar)
    os.environ.pop("EMBREE_TPU_HAIR_OBB", None)

    out["hits_equal"] = bool(
        np.array_equal(out.pop("best_on"), out.pop("best_off"))
        and np.array_equal(out.pop("tfar_on"), out.pop("tfar_off")))
    out["step_reduction"] = round(
        1.0 - out["steps_on"] / max(out["steps_off"], 1), 4)
    out["speedup"] = round(out["sec_off"] / max(out["sec_on"], 1e-9), 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "obb_hair.json"))
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    args = ap.parse_args()

    results = {}
    for ecs in args.scenes:
        name = os.path.basename(ecs).replace(".ecs", "")
        try:
            results[name] = measure(ecs, args.size)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, json.dumps(results[name]), flush=True)

    import jax
    results["_meta"] = dict(size=args.size,
                            platform=jax.devices()[0].platform)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
