"""Models-tier image parity vs /root/reference/tests/models goldens.

The reference renders each .ecs command file (camera + scene XML) through
embree_viewer's DEFAULT shader (viewer_device.cpp:204 renderPixelStandard:
color = material Kd * dot(-dir, faceforward(Ns)); background black; motion
scenes sample a per-pixel random time with the MurmurHash3+LCG
RandomSampler, random_sampler.h) and checks in `<name>.ecs.embree_viewer.exr`
goldens at 512x512. This tool does the same against OUR renderer.

Usage:
  python -m embree_tpu.tools.parity_models [--glob PAT] [--out models_parity.json]
"""
from __future__ import annotations

import argparse
import glob as globmod
import json
import os
import time

import numpy as np

MODELDIR = "/root/reference/tests/models"


def parse_ecs(path):
    """Parse the .ecs command file: -i scene.xml + camera flags."""
    toks = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("#"):
                continue
            toks += line.split()
    out = dict(xml=None, vp=None, vi=None, vu=(0.0, 1.0, 0.0), fov=90.0,
               lefthanded=False, shader="default", camera=None,
               min_width=0.0, max_radius_scale=1.0, point_spheres=[],
               prim_spheres=[])
    i = 0
    while i < len(toks):
        t = toks[i].lstrip("-")
        if t == "i":
            out["xml"] = os.path.join(os.path.dirname(path), toks[i + 1])
            i += 2
        elif t in ("vp", "vi", "vu"):
            out[t] = tuple(float(x) for x in toks[i + 1:i + 4])
            i += 4
        elif t == "fov":
            out["fov"] = float(toks[i + 1])
            i += 2
        elif t == "shader":
            out["shader"] = toks[i + 1]
            i += 2
        elif t == "camera":
            out["camera"] = toks[i + 1]
            i += 2
        elif t == "lefthanded":
            out["lefthanded"] = True
            i += 1
        elif t == "min-width":
            out["min_width"] = float(toks[i + 1])
            out["max_radius_scale"] = float(toks[i + 2])
            i += 3
        elif t in ("point-sphere", "disc-sphere", "oriented-disc-sphere"):
            kind = {"point-sphere": "sphere", "disc-sphere": "disc",
                    "oriented-disc-sphere": "oriented_disc"}[t]
            vals = [float(x) for x in toks[i + 1:i + 7]]
            out["point_spheres"].append((kind, vals[:3], vals[3], vals[4],
                                         int(vals[5])))
            i += 7
        elif t in ("triangle-sphere", "quad-sphere", "grid-sphere"):
            vals = [float(x) for x in toks[i + 1:i + 6]]
            out["prim_spheres"].append((t.split("-")[0], vals[:3], vals[3],
                                        int(vals[4])))
            i += 6
        else:
            i += 1
    return out


def _point_sphere(kind, center, radius, point_r, num_phi):
    """Procedural sphere-of-points (geometry_creation.cpp:361
    createPointSphere): numPhi x 2*numPhi grid of point prims."""
    from ..geometry import PointGeometry
    n_phi = int(num_phi)
    n_theta = 2 * n_phi
    phi = np.arange(n_phi + 1)[:, None] * np.pi / n_phi
    theta = np.arange(n_theta)[None, :] * 2.0 * np.pi / n_theta
    c = np.asarray(center, np.float32)
    x = c[0] + radius * np.sin(phi) * np.sin(theta)
    y = (c[1] + radius * np.cos(phi)) * np.ones_like(theta)
    z = c[2] + radius * np.sin(phi) * np.cos(theta)
    pos = np.stack([x, y, z, np.full_like(x, point_r)], -1).reshape(-1, 4)
    pos = pos.astype(np.float32)
    normals = None
    if kind == "oriented_disc":
        nrm = (pos[:, :3] - c)
        normals = (nrm / np.maximum(
            np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
        ).astype(np.float32)
    return PointGeometry(pos, kind=kind, normals=normals)


def _prim_sphere(shape, center, radius, num_phi):
    """Procedural triangle/quad/grid spheres (geometry_creation.cpp
    createTriangleSphere:?/createQuadSphere/createGridSphere) — exact
    vertex layout and index quirks reproduced (the pole bands reference
    arbitrary coincident pole-row vertices)."""
    from ..geometry import GridGeometry, QuadGeometry, TriangleGeometry
    c = np.asarray(center, np.float32)
    if shape == "grid":
        N = int(num_phi)
        gs = (N + 1) * (N + 1)
        frames = [  # p0, dx, dy per cube face (createGridSphere)
            ((-0.5, -0.5, -0.5), (1, 0, 0), (0, 1, 0)),
            ((+0.5, -0.5, -0.5), (0, 0, 1), (0, 1, 0)),
            ((+0.5, -0.5, +0.5), (-1, 0, 0), (0, 1, 0)),
            ((-0.5, -0.5, +0.5), (0, 0, -1), (0, 1, 0)),
            ((-0.5, -0.5, -0.5), (0, 0, 1), (1, 0, 0)),
            ((-0.5, +0.5, -0.5), (1, 0, 0), (0, 0, 1)),
        ]
        pos = np.zeros((6 * gs, 3), np.float32)
        grids = []
        t = np.arange(N + 1, dtype=np.float32) / N
        for i, (p0, dx, dy) in enumerate(frames):
            p = (np.asarray(p0, np.float32)
                 + t[None, :, None] * np.asarray(dx, np.float32)
                 + t[:, None, None] * np.asarray(dy, np.float32))
            p = p / np.linalg.norm(p, axis=-1, keepdims=True)
            pos[i * gs:(i + 1) * gs] = (c + radius * p).reshape(-1, 3)
            grids.append([i * gs, N + 1, N + 1, N + 1])
        return GridGeometry(pos, np.asarray(grids, np.int32))
    n_phi = int(num_phi)
    n_theta = 2 * n_phi
    phi = np.arange(n_phi + 1)[:, None] * np.pi / n_phi
    theta = np.arange(n_theta)[None, :] * 2.0 * np.pi / n_theta
    x = c[0] + radius * np.sin(phi) * np.sin(theta)
    y = (c[1] + radius * np.cos(phi)) * np.ones_like(theta)
    z = c[2] + radius * np.sin(phi) * np.cos(theta)
    pos = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    prims = []
    for p in range(1, n_phi + 1):
        for th in range(1, n_theta + 1):
            p00 = (p - 1) * n_theta + th - 1
            p01 = (p - 1) * n_theta + th % n_theta
            p10 = p * n_theta + th - 1
            p11 = p * n_theta + th % n_theta
            if p == 1:
                a, b, d = p10, n_theta - 1, p11     # pole-row quirk
                prims.append([a, b, d, d] if shape == "quad" else [a, b, d])
            elif p == n_phi:
                a, b, d = n_phi * n_theta, p00, p01
                prims.append([a, b, d, d] if shape == "quad" else [a, b, d])
            elif shape == "quad":
                prims.append([p10, p00, p01, p11])
            else:
                prims.append([p10, p00, p11])
                prims.append([p01, p11, p00])
    idx = np.asarray(prims, np.int32)
    if shape == "quad":
        return QuadGeometry(pos, idx)
    return TriangleGeometry(pos, idx)


def _pixel_times(width, height):
    """Per-pixel ray time for motion scenes: RandomSampler_init(x,y,0) then
    get1D (random_sampler.h MurmurHash3 + LCG) — bit-exact."""
    x = np.arange(width, dtype=np.uint32)[None, :]
    y = np.arange(height, dtype=np.uint32)[:, None]
    pixel_id = (x | (y << np.uint32(16))).astype(np.uint32)

    def mix(h, k):
        k = (k * np.uint32(0xcc9e2d51)).astype(np.uint32)
        k = ((k << np.uint32(15)) | (k >> np.uint32(17))).astype(np.uint32)
        k = (k * np.uint32(0x1b873593)).astype(np.uint32)
        h = (h ^ k).astype(np.uint32)
        h = (((h << np.uint32(13)) | (h >> np.uint32(19))).astype(np.uint32)
             * np.uint32(5) + np.uint32(0xe6546b64)).astype(np.uint32)
        return h

    def fin(h):
        h = (h ^ (h >> np.uint32(16))).astype(np.uint32)
        h = (h * np.uint32(0x85ebca6b)).astype(np.uint32)
        h = (h ^ (h >> np.uint32(13))).astype(np.uint32)
        h = (h * np.uint32(0xc2b2ae35)).astype(np.uint32)
        return (h ^ (h >> np.uint32(16))).astype(np.uint32)

    with np.errstate(over="ignore"):
        s = fin(mix(mix(np.uint32(0), pixel_id), np.uint32(0)))
        s = (s * np.uint32(1664525) + np.uint32(1013904223)).astype(np.uint32)
    return ((s >> np.uint32(1)).astype(np.float32)
            * np.float32(4.656612873077392578125e-10))


def run_ecs(ecs_path, size=512):
    import jax
    import jax.numpy as jnp

    from ..models.viewer import ispc_camera_rays
    from ..scene import intersect
    from ..utils.xml_scene import load_xml, to_scene

    cfg = parse_ecs(ecs_path)
    if cfg["xml"] is not None:
        xs = load_xml(cfg["xml"])
    else:
        from ..utils.xml_scene import XMLScene
        xs = XMLScene()
    for kind, c, r, pr, nphi in cfg["point_spheres"]:
        xs.geometries.append(_point_sphere(kind, c, r, pr, nphi))
        # OBJMaterial default Kd is white (measured vs goldens)
        xs.kd.append(np.array([1.0, 1.0, 1.0], np.float32))
    for shape, c, r, nphi in cfg["prim_spheres"]:
        xs.geometries.append(_prim_sphere(shape, c, r, nphi))
        xs.kd.append(np.array([1.0, 1.0, 1.0], np.float32))
    if not xs.geometries:
        raise ValueError("no geometries parsed")
    kw = {}
    if cfg["min_width"] > 0.0:
        # viewer: args.minWidthDistanceFactor = 0.5*min_width/width
        kw = dict(min_width_factor=0.5 * cfg["min_width"] / size,
                  max_radius_scale=cfg["max_radius_scale"])
    cs = to_scene(xs, **kw).commit()
    cam = (xs.cameras.get(cfg["camera"]) if cfg["camera"] else None) \
        or xs.camera or {}
    vp = cfg["vp"] or tuple(cam.get("from_", (0.0001, 0.0001, -3.0)))
    vi = cfg["vi"] or tuple(cam.get("to", (0.0, 0.0, 0.0)))
    if cfg["vp"] is None and "up" in cam:
        cfg = dict(cfg, vu=tuple(cam["up"]), fov=cam["fov"])
    kd = jnp.asarray(np.stack(xs.kd).astype(np.float32))
    has_motion = getattr(cs, "has_motion", False)
    times = jnp.asarray(_pixel_times(size, size)) if has_motion else 0.0

    from ..models.viewer import SHADERS
    rows_chunk = int(os.environ.get("PARITY_CHUNK_ROWS", 64))

    # texcoords / texcoords-grid shaders (viewer_device_debug.cpp:268-285):
    # the texcoord ATTRIBUTE is itself Catmull-Clark subdivided with its
    # own topology and boundary mode (scene_subdiv_mesh.h vertex
    # attributes; subdiv_mode= on texcoord_indices): refine the texcoord
    # mesh in parallel with the positions (final quad k of face f
    # corresponds 1:1) and scatter per-quad st corners into a per-face
    # (res+1)^2 grid over face uv using the quad uv frames
    tc_tabs = None
    if cfg["shader"] in ("texcoords", "texcoords-grid"):
        from ..ops.subdiv import catmull_clark
        tabs = []
        maxf, maxr = 1, 2
        for g in xs.geometries:
            tcs = getattr(g, "texcoords", None)
            tci = getattr(g, "texcoord_indices", None)
            fcs = getattr(g, "face_counts", None)
            if tcs is None or tci is None or fcs is None:
                tabs.append(None)
                continue
            tcs3 = np.concatenate([np.asarray(tcs, np.float32),
                                   np.zeros((len(tcs), 1), np.float32)], -1)
            mode = getattr(g, "texcoord_mode", None) or "smooth"
            fcs64 = np.asarray(fcs, np.int64)
            tci64 = np.asarray(tci, np.int64)
            tv, tq, tqb, tquvm = catmull_clark(
                tcs3, fcs64, tci64, levels=g.levels + 2,
                to_limit=False, boundary_mode=mode,
                boundary_interpolation=(mode != "no_boundary"))
            F = len(np.asarray(fcs))
            res = int(round(np.sqrt(max(int((tqb == 0).sum()), 1))))
            grid = np.zeros((F, res + 1, res + 1, 2), np.float32)
            corners = tv[tq][..., :2]                     # (Q, 4, 2)
            # refinement ROTATES child quads (each child's v0 is the parent
            # corner), so scatter every corner by its own uv from the quad
            # frame: uv0=(m0,m1), uv1=uv0+(m2,m3), uv3=uv0+(m4,m5),
            # uv2=uv1+uv3-uv0 (cells are axis-aligned parallelograms)
            u0 = tquvm[:, 0:2]
            u1 = u0 + tquvm[:, 2:4]
            u3 = u0 + tquvm[:, 4:6]
            u2 = u1 + u3 - u0
            for c, uvc in enumerate((u0, u1, u2, u3)):
                ii = np.clip(np.round(uvc[:, 0] * res).astype(int), 0, res)
                jj = np.clip(np.round(uvc[:, 1] * res).astype(int), 0, res)
                grid[tqb, jj, ii] = corners[:, c]
            tabs.append(grid)
            maxf = max(maxf, F)
            maxr = max(maxr, res + 1)
        tc_tabs = np.zeros((len(tabs), maxf, maxr, maxr, 2), np.float32)
        tc_res = np.ones(len(tabs), np.float32)
        tc_has = np.zeros(len(tabs), bool)
        for gi, tab in enumerate(tabs):
            if tab is not None:
                tc_tabs[gi, :tab.shape[0], :tab.shape[1], :tab.shape[2]] = tab
                tc_res[gi] = tab.shape[1] - 1
                tc_has[gi] = True
        tc_tabs = jnp.asarray(tc_tabs)
        tc_res = jnp.asarray(tc_res)
        tc_has = jnp.asarray(tc_has)

    def render_chunk(cs, y0):
        rays_full = ispc_camera_rays(np.asarray(vp), np.asarray(vi),
                                     np.asarray(cfg["vu"]), cfg["fov"],
                                     size, size, time=times)
        rays = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, y0, rows_chunk, 0),
            rays_full)
        if cfg["shader"] in ("texcoords", "texcoords-grid"):
            hits = intersect(cs, rays)
            gid = jnp.clip(hits.geom_id, 0,
                           tc_tabs.shape[0] - 1).astype(jnp.int32)
            fid = jnp.clip(hits.prim_id, 0,
                           tc_tabs.shape[1] - 1).astype(jnp.int32)
            res = tc_res[gid]
            xg = jnp.clip(hits.u, 0.0, 1.0) * res
            yg = jnp.clip(hits.v, 0.0, 1.0) * res
            x0 = jnp.clip(jnp.floor(xg), 0, res - 1).astype(jnp.int32)
            y0 = jnp.clip(jnp.floor(yg), 0, res - 1).astype(jnp.int32)
            fx = (xg - x0)[..., None]
            fy = (yg - y0)[..., None]
            g00 = tc_tabs[gid, fid, y0, x0]
            g01 = tc_tabs[gid, fid, y0, x0 + 1]
            g10 = tc_tabs[gid, fid, y0 + 1, x0]
            g11 = tc_tabs[gid, fid, y0 + 1, x0 + 1]
            st = ((1 - fy) * ((1 - fx) * g00 + fx * g01)
                  + fy * ((1 - fx) * g10 + fx * g11))
            has = tc_has[gid]
            if cfg["shader"] == "texcoords":
                col = jnp.stack([st[..., 0], st[..., 1],
                                 jnp.zeros_like(st[..., 0])], -1)
            else:
                # ((int)(10*s)+(int)(10*t)) % 2: C int cast truncates to 0
                a = jnp.trunc(10.0 * st[..., 0]).astype(jnp.int32)
                b = jnp.trunc(10.0 * st[..., 1]).astype(jnp.int32)
                red = ((a + b) % 2) == 0
                col = jnp.where(red[..., None],
                                jnp.array([1.0, 0.0, 0.0]),
                                jnp.array([0.0, 1.0, 0.0]))
            col = jnp.where(has[..., None], col, 1.0)  # no attrs -> white
            return jnp.where(hits.valid[..., None], col,
                             jnp.array([0.0, 0.0, 1.0]))   # miss -> blue
        if cfg["shader"] != "default":
            hits = intersect(cs, rays)
            return SHADERS[cfg["shader"]](cs, rays, hits)
        hits = intersect(cs, rays)
        # default shader: Kd * dot(-dir, faceforward(normalize(Ng)))
        ng = hits.ng
        ng = ng * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(ng * ng, -1, keepdims=True), 1e-30))
        cosv = jnp.sum(-rays.dir * ng, -1)
        shade = jnp.abs(cosv)                  # face_forward then dot(-d, Ns)
        gid = jnp.clip(hits.geom_id, 0, kd.shape[0] - 1).astype(jnp.int32)
        col = kd[gid] * shade[..., None]
        return jnp.where(hits.valid[..., None], col, 0.0)

    # row-chunked rendering: oriented/sweep curve leaf math allocates per
    # (ray, segment) temporaries; a full 512^2 frame in one jit overflows
    # the 16 GB TPU HBM on curve-heavy scenes. Same compiled fn per chunk.
    import jax.numpy as _jnp
    out = np.zeros((size, size, 3), np.float32)
    rfn = jax.jit(render_chunk)
    for y0 in range(0, size, rows_chunk):
        out[y0:y0 + rows_chunk] = np.asarray(rfn(cs, _jnp.int32(y0)))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default=os.path.join(MODELDIR, "*", "*.ecs"))
    ap.add_argument("--out", default="models_parity.json")
    ap.add_argument("--threshold", type=float, default=55.0)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ..utils.exr import compare_images, quantize8, read_exr

    results = {}
    n_pass = n_fail = 0
    ecss = sorted(globmod.glob(args.glob))
    if args.limit:
        ecss = ecss[:args.limit]
    n_skip = 0
    for ecs in ecss:
        name = os.path.relpath(ecs, MODELDIR)
        t0 = time.time()
        pc = parse_ecs(ecs)
        if (pc["xml"] is None and not pc["point_spheres"]
                and not pc["prim_spheres"]):
            results[name] = "SKIP: no scene input"
            n_skip += 1
            print(f"{name}: SKIP (no scene input)", flush=True)
            continue
        has_gold = os.path.exists(ecs + ".embree_viewer.exr")
        try:
            img = run_ecs(ecs)
            if has_gold:
                gold = read_exr(ecs + ".embree_viewer.exr")
                err = compare_images(quantize8(img), gold)
                ok = err <= args.threshold
                results[name] = round(err, 2)
            else:
                # the reference ships no golden for this scene (incl. the
                # bad_*/tri_bad_* garbage-input robustness pair): the test
                # is that it renders without crashing to a finite image
                finite = bool(np.isfinite(img).all())
                cover = float(np.mean(img.sum(-1) > 0))
                ok = finite
                results[name] = (f"SMOKE {'ok' if finite else 'NONFINITE'}:"
                                 f" cover={cover:.3f}")
            n_pass += ok
            n_fail += not ok
            print(f"{name}: {results[name]} [{time.time()-t0:.0f}s] "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
        except FileNotFoundError as e:
            # scene references an asset the reference tree does not ship
            # (e.g. subdiv/cornell_box.obj) — unrunnable for the reference
            # viewer too: a skip, not a failure
            results[name] = f"SKIP: missing input ({e.filename})"
            n_skip += 1
            print(f"{name}: SKIP missing input {e.filename}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR {type(e).__name__}: {e}"
            n_fail += 1
            print(f"{name}: ERROR {e}", flush=True)
        # incremental dump: long runs survive round/driver cutoffs
        with open(args.out, "w") as f:
            json.dump({"pass": n_pass, "fail": n_fail, "skip": n_skip,
                       "partial": True, "threshold": args.threshold,
                       "results": results}, f, indent=1)
    with open(args.out, "w") as f:
        json.dump({"pass": n_pass, "fail": n_fail, "skip": n_skip,
                   "threshold": args.threshold, "results": results}, f,
                  indent=1)
    print(f"\n{n_pass}/{n_pass+n_fail} model goldens within "
          f"{args.threshold} ({n_skip} skipped); -> {args.out}")


if __name__ == "__main__":
    main()
