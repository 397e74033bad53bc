"""embree_viewer analog: render a scene (OBJ or built-in procedural) with a
chosen shader, benchmark it, or compare against a golden image.

Usage:
  python -m embree_tpu.tools.viewer --scene cube --shader eyelight --size 256 \
      --out /tmp/out.png [--golden ref.pfm --compare-threshold 55] [--benchmark]

Parity: tutorials/viewer (shader modes viewer_device.cpp:45-54), the CTest
image-regression flow (tests/CMakeLists.txt + tutorial.cpp:646 compare), and
the --benchmark timing mode (tutorial/benchmark.h).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_scene(name: str, et):
    import numpy as np
    if name.endswith(".obj"):
        from ..utils.obj import load_obj
        meshes, _ = load_obj(name)
        s = et.Scene()
        for m in meshes:
            s.attach(et.TriangleGeometry(m.vertices, m.indices))
        return s, (3.0, 2.0, 3.0)
    if name == "cube":
        v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                     np.float32)
        i = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                      [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                      [1, 5, 7], [1, 7, 3]], np.int32)
        s = et.Scene()
        s.attach(et.TriangleGeometry(v, i))
        p = np.array([[-6, -1.01, -6], [6, -1.01, -6], [6, -1.01, 6],
                      [-6, -1.01, 6]], np.float32)
        s.attach(et.TriangleGeometry(p, np.array([[0, 1, 2], [0, 2, 3]], np.int32)))
        return s, (3.0, 2.5, 3.5)
    if name == "sphere":
        th = np.linspace(0, np.pi, 33)
        ph = np.linspace(0, 2 * np.pi, 64, endpoint=False)
        t, p = np.meshgrid(th, ph, indexing="ij")
        verts = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                          np.cos(t)], -1).reshape(-1, 3).astype(np.float32)
        idx = []
        for i in range(32):
            for j in range(64):
                a = i * 64 + j
                b = i * 64 + (j + 1) % 64
                c = (i + 1) * 64 + j
                d = (i + 1) * 64 + (j + 1) % 64
                idx += [[a, b, d], [a, d, c]]
        s = et.Scene()
        s.attach(et.TriangleGeometry(verts, np.asarray(idx, np.int32)))
        return s, (0.0, 0.8, 3.0)
    if name == "mixed":
        s = et.Scene()
        s.attach(et.QuadGeometry(
            np.array([[-4, -1, -4], [4, -1, -4], [4, -1, 4], [-4, -1, 4]], np.float32),
            np.array([[0, 1, 2, 3]], np.int32)))
        s.attach(et.PointGeometry(
            np.array([[-1, 0, 0, 0.5], [1, 0, 0.5, 0.4]], np.float32), kind="sphere"))
        s.attach(et.CurveGeometry(
            np.array([[-1, 0.5, 0, 0.06], [-0.4, 1.4, 0, 0.06],
                      [0.4, 1.4, 0, 0.06], [1, 0.5, 0.5, 0.06]], np.float32),
            np.array([0], np.int32), basis="bezier", kind="round",
            tessellation_rate=12))
        return s, (0.0, 1.5, 4.5)
    raise SystemExit(f"unknown scene '{name}'")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cube")
    ap.add_argument("--shader", default="eyelight",
                    choices=["eyelight", "uv", "Ng", "primID", "geomID", "occlusion"])
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--out", default=None)
    ap.add_argument("--golden", default=None,
                    help="golden .pfm to compare against")
    ap.add_argument("--compare-threshold", type=float, default=55,
                    help="max wrong pixels (reference CTest default)")
    ap.add_argument("--save-golden", default=None)
    ap.add_argument("--benchmark", type=int, default=0, metavar="N",
                    help="time N repetitions")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import embree_tpu as et
    from ..models.camera import Camera
    from ..models.viewer import render
    from ..utils.image import compare_images, load_pfm, save_pfm, save_png

    scene, eye = build_scene(args.scene, et)
    cs = scene.commit()
    cam = Camera(from_point=np.asarray(eye, np.float32),
                 to_point=np.zeros(3, np.float32),
                 up=np.array([0, 1, 0], np.float32))

    H = W = args.size
    run = jax.jit(lambda c: render(c, cam, H, W, shader=args.shader))
    img = np.asarray(jax.block_until_ready(run(cs)))

    if args.benchmark:
        times = []
        for _ in range(args.benchmark):
            t0 = time.perf_counter()
            jax.block_until_ready(run(cs))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"BENCHMARK {args.scene}/{args.shader}: {best*1e3:.2f} ms/frame "
              f"({H*W/best/1e6:.2f} Mrays/s primary)")

    if args.out:
        if args.out.endswith(".pfm"):
            save_pfm(args.out, img)
        else:
            save_png(args.out, img)
        print("wrote", args.out)
    if args.save_golden:
        save_pfm(args.save_golden, img)
        print("wrote golden", args.save_golden)
    if args.golden:
        ref = load_pfm(args.golden)
        wrong = compare_images(img, ref)
        status = "PASS" if wrong <= args.compare_threshold else "FAIL"
        print(f"COMPARE {status}: {wrong} wrong pixels "
              f"(threshold {args.compare_threshold})")
        return 0 if wrong <= args.compare_threshold else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
