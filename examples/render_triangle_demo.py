"""triangle_geometry tutorial analog (reference: tutorials/triangle_geometry/):
cube + ground plane, primary rays + hard shadows, written to a PPM image.

Runs on whatever backend jax selects (TPU if available). Pass --cpu to force CPU.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true", help="force CPU backend")
parser.add_argument("--size", type=int, default=96)
parser.add_argument("--out", default="/tmp/et_render.ppm")
args = parser.parse_args()

import jax  # noqa: E402
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import embree_tpu as et  # noqa: E402


def main():
    cube_v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float32)
    cube_i = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
                       [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    plane_v = np.array([[-6, -1.01, -6], [6, -1.01, -6], [6, -1.01, 6], [-6, -1.01, 6]], np.float32)
    plane_i = np.array([[0, 1, 2], [0, 2, 3]], np.int32)

    scene = et.Scene()
    scene.attach(et.TriangleGeometry(jnp.asarray(cube_v), jnp.asarray(cube_i)))
    scene.attach(et.TriangleGeometry(jnp.asarray(plane_v), jnp.asarray(plane_i)))
    cs = scene.commit()
    print(f"committed: prims={cs.num_prims} bvh_nodes={cs.bvh.n_nodes}")

    W = H = args.size
    eye = jnp.array([3.0, 2.5, 3.5])
    look = jnp.array([0.0, 0.0, 0.0])
    up = jnp.array([0.0, 1.0, 0.0])
    w = (look - eye) / jnp.linalg.norm(look - eye)
    u = jnp.cross(w, up); u = u / jnp.linalg.norm(u)
    v = jnp.cross(u, w)
    px = (jnp.arange(W) + 0.5) / W * 2 - 1
    py = (jnp.arange(H) + 0.5) / H * 2 - 1
    d = px[None, :, None] * u - py[:, None, None] * v + 1.8 * w
    org = jnp.broadcast_to(eye, (H, W, 3))
    lightp = jnp.array([4.0, 6.0, 2.0])

    @jax.jit
    def render(cs):
        rays = et.make_rays(org, d)
        hits = et.intersect(cs, rays)
        p = org + rays.dir * hits.t[..., None]
        ng = hits.ng / jnp.maximum(jnp.linalg.norm(hits.ng, axis=-1, keepdims=True), 1e-9)
        tolight = lightp - p
        dist = jnp.linalg.norm(tolight, axis=-1)
        ldir = tolight / dist[..., None]
        offs = ng * 1e-3 * jnp.sign(jnp.sum(ng * ldir, -1, keepdims=True))
        srays = et.make_rays(p + offs, ldir, tnear=1e-3, tfar=dist - 1e-2)
        shadow = et.occluded(cs, srays)
        ndotl = jnp.abs(jnp.sum(ng * ldir, -1))
        col = jnp.where(hits.valid, 0.1 + 0.9 * ndotl * (~shadow), 0.0)
        return col, hits.valid, shadow

    t0 = time.time()
    col, valid, shadow = jax.block_until_ready(render(cs))
    t_compile = time.time() - t0
    t0 = time.time()
    col, valid, shadow = jax.block_until_ready(render(cs))
    t_run = time.time() - t0
    print(f"hit fraction: {float(jnp.mean(valid)):.4f}  "
          f"shadowed: {float(jnp.mean(shadow & valid)):.4f}")
    print(f"compile {t_compile:.1f}s  render {t_run*1e3:.1f}ms "
          f"({2*H*W/t_run/1e6:.2f} Mrays/s incl shadow)")

    img = np.asarray(jnp.clip(col, 0, 1) * 255).astype(np.uint8)
    with open(args.out, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (W, H))
        f.write(img.tobytes())
    print("wrote", args.out)


if __name__ == "__main__":
    main()
