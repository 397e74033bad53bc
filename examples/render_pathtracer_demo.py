"""Cornell-box-style pathtracer demo (reference: tutorials/pathtracer/).

Renders with NEE + BRDF sampling; writes PNG + PFM.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--size", type=int, default=128)
parser.add_argument("--spp", type=int, default=8)
parser.add_argument("--out", default="/tmp/et_pathtracer")
args = parser.parse_args()

import jax  # noqa: E402
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import embree_tpu as et  # noqa: E402
from embree_tpu.models.camera import Camera  # noqa: E402
from embree_tpu.models.lights import LightSetBuilder  # noqa: E402
from embree_tpu.models.materials import (EMISSIVE, MATTE, MIRROR,  # noqa: E402
                                         make_materials)
from embree_tpu.models.pathtracer import render_pathtracer  # noqa: E402
from embree_tpu.utils.image import save_pfm, save_png  # noqa: E402


def quad(p0, p1, p2, p3):
    return (np.array([p0, p1, p2, p3], np.float32),
            np.array([[0, 1, 2], [0, 2, 3]], np.int32))


def main():
    s = et.Scene()
    mats = {}

    def wall(p0, p1, p2, p3, mat):
        v, i = quad(p0, p1, p2, p3)
        gid = s.attach(et.TriangleGeometry(v, i))
        mats[gid] = mat
        return gid

    white = (MATTE, (0.73, 0.73, 0.73), 0.0)
    # box: floor/ceiling/back/left(red)/right(green)
    wall([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1], white)
    wall([-1, 2, 1], [1, 2, 1], [1, 2, -1], [-1, 2, -1], white)
    wall([-1, 0, -1], [-1, 2, -1], [1, 2, -1], [1, 0, -1], white)
    wall([-1, 0, 1], [-1, 2, 1], [-1, 2, -1], [-1, 0, -1],
         (MATTE, (0.65, 0.05, 0.05), 0.0))
    wall([1, 0, -1], [1, 2, -1], [1, 2, 1], [1, 0, 1],
         (MATTE, (0.12, 0.45, 0.15), 0.0))
    # mirror sphere + matte tall box stand-in (sphere point)
    gid_ball = s.attach(et.PointGeometry(
        np.array([[-0.35, 0.4, -0.3, 0.4]], np.float32), kind="sphere"))
    mats[gid_ball] = (MIRROR, (0.9, 0.9, 0.9), 0.0)
    gid_ball2 = s.attach(et.PointGeometry(
        np.array([[0.45, 0.3, 0.35, 0.3]], np.float32), kind="sphere"))
    mats[gid_ball2] = (MATTE, (0.3, 0.3, 0.8), 0.0)
    # emissive ceiling panel
    v, i = quad([-0.4, 1.99, -0.4], [0.4, 1.99, -0.4], [0.4, 1.99, 0.4], [-0.4, 1.99, 0.4])
    gid_light = s.attach(et.TriangleGeometry(v, i))
    mats[gid_light] = (EMISSIVE, (6.0, 6.0, 6.0), 0.0)

    cs = s.commit()
    mset = make_materials(s._next_id, mats)
    lights = (LightSetBuilder()
              .quad([-0.4, 1.98, -0.4], [0.8, 0, 0], [0, 0, 0.8], (6, 6, 6))
              .build())

    cam = Camera(from_point=np.array([0, 1.0, 3.6], np.float32),
                 to_point=np.array([0, 0.9, 0], np.float32),
                 up=np.array([0, 1, 0], np.float32), fov_deg=40)

    H = W = args.size
    render = jax.jit(lambda c, m, l: render_pathtracer(
        c, m, l, cam, H, W, spp=args.spp, max_depth=4))
    t0 = time.time()
    img = jax.block_until_ready(render(cs, mset, lights))
    t_first = time.time() - t0
    t0 = time.time()
    img = jax.block_until_ready(render(cs, mset, lights))
    t_run = time.time() - t0
    n_rays = H * W * args.spp * 4 * 2
    print(f"pathtracer: {H}x{W}x{args.spp}spp compile+run {t_first:.1f}s "
          f"steady {t_run*1e3:.0f}ms (~{n_rays/t_run/1e6:.2f} Mrays/s)")

    img_t = np.asarray(jnp.clip(img / (1 + img), 0, 1)) ** (1 / 2.2)  # tonemap
    save_png(args.out + ".png", img_t)
    save_pfm(args.out + ".pfm", np.asarray(img))
    print("wrote", args.out + ".png")


if __name__ == "__main__":
    main()
