"""Commit-mutation stress suite (SURVEY §5.2 — the race-detection tier).

The reference stress-tests concurrent scene mutation + commits
(RegressionTest in verify.cpp: random attach/detach/enable/disable/deform
across threads). The TPU-native analog is sequential-but-adversarial: a
randomized walk of scene mutations with a commit + full brute-force
equivalence check after every step — every committed snapshot must exactly
match an independently constructed fresh scene with the same geometry.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.scene import Scene, intersect, intersect_brute


def _random_mesh(rng, n):
    v = rng.uniform(-1, 1, (3 * n, 3)).astype(np.float32)
    i = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return v, i


def _rays(rng, R=64):
    org = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    return et.make_rays(jnp.asarray(org), jnp.asarray(d))


@pytest.mark.parametrize("seed", [0, 1])
def test_commit_mutation_walk(seed):
    rng = np.random.default_rng(seed)
    s = Scene()
    live = {}           # gid -> (verts, idx)

    # seed geometry
    for _ in range(2):
        v, i = _random_mesh(rng, 8)
        gid = s.attach(et.TriangleGeometry(jnp.asarray(v), jnp.asarray(i)))
        live[gid] = (v, i)

    rays = _rays(rng)
    for step in range(8):
        op = rng.integers(0, 4)
        if op == 0 or not live:                      # attach
            v, i = _random_mesh(rng, int(rng.integers(4, 16)))
            gid = s.attach(et.TriangleGeometry(jnp.asarray(v),
                                               jnp.asarray(i)))
            live[gid] = (v, i)
        elif op == 1 and len(live) > 1:              # detach
            gid = int(rng.choice(list(live)))
            s.detach(gid)
            del live[gid]
        elif op == 2:                                # deform in place
            gid = int(rng.choice(list(live)))
            v, i = live[gid]
            v = v + rng.normal(0, 0.05, v.shape).astype(np.float32)
            s.get(gid).vertices = jnp.asarray(v)
            live[gid] = (v, i)
        else:                                        # toggle enable
            gid = int(rng.choice(list(live)))
            g = s.get(gid)
            g.enabled = not g.enabled

        if not any(s.get(g).enabled for g in live):
            s.get(next(iter(live))).enabled = True

        cs = s.commit()
        h = jax.jit(intersect)(cs, rays)
        hb = jax.jit(intersect_brute)(cs, rays)
        np.testing.assert_array_equal(np.asarray(h.valid),
                                      np.asarray(hb.valid),
                                      err_msg=f"step {step}")
        m = np.asarray(hb.valid)
        np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(hb.t)[m],
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"step {step}")

        # committed snapshot equals a freshly-built identical scene
        fresh = Scene()
        for gid in sorted(live):
            if s.get(gid).enabled:
                v, i = live[gid]
                fresh.attach(et.TriangleGeometry(jnp.asarray(v),
                                                 jnp.asarray(i)))
        if fresh._geoms:
            cf = fresh.commit()
            hf = jax.jit(intersect)(cf, rays)
            np.testing.assert_array_equal(np.asarray(h.valid),
                                          np.asarray(hf.valid))
            np.testing.assert_allclose(
                np.where(m, np.asarray(h.t), 0.0),
                np.where(m, np.asarray(hf.t), 0.0), rtol=1e-5, atol=1e-5)


def test_multikind_mutation_walk():
    """IntensiveRegressionTest analog (verify.cpp:5298) scaled up: a
    randomized walk over ALL geometry families — attach/detach, enable/
    disable, deform, time-range retarget, refit-vs-rebuild quality — with a
    commit + BVH-vs-brute-force equivalence check (random ray times) after
    every step. This walk exercises the window-clipping path that the r3
    empty-commit crash hid behind."""
    rng = np.random.default_rng(7)
    s = Scene()
    live = {}     # gid -> factory() rebuilding an identical geometry

    def mk_tri():
        v, i = _random_mesh(rng, int(rng.integers(4, 10)))
        return lambda: et.TriangleGeometry(v, i)

    def mk_tri_motion():
        v, i = _random_mesh(rng, 6)
        S = int(rng.integers(2, 5))
        steps = np.stack([v + k * np.array([0, 0, 0.2], np.float32)
                          for k in range(S)])
        tr = (float(rng.uniform(-0.3, 0.2)), float(rng.uniform(0.8, 1.3)))
        return lambda: et.TriangleGeometry(steps, i, time_range=tr)

    def mk_quad():
        q = rng.uniform(-1, 1, (3, 4, 3)).astype(np.float32)
        base = rng.uniform(-1, 1, (3, 1, 3)).astype(np.float32)
        v = (0.3 * q + base).reshape(-1, 3)
        i = np.arange(12, dtype=np.int32).reshape(3, 4)
        return lambda: et.QuadGeometry(v, i)

    def mk_points():
        kind = rng.choice(["sphere", "disc"])
        p = rng.uniform(-1, 1, (8, 4)).astype(np.float32)
        p[:, 3] = rng.uniform(0.05, 0.3, 8)
        return lambda: et.PointGeometry(p, kind=str(kind))

    def mk_lines():
        v = rng.uniform(-1, 1, (10, 4)).astype(np.float32)
        v[:, 3] = rng.uniform(0.02, 0.15, 10)
        i = np.arange(0, 8, 2, dtype=np.int32)
        kind = rng.choice(["round", "flat"])
        return lambda: et.LineSegmentsGeometry(v, i, kind=str(kind))

    def mk_grid():
        v = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
        g = np.array([[0, 4, 4, 3]], np.int32)   # start, stride, w, h
        return lambda: et.GridGeometry(v, g)

    makers = [mk_tri, mk_tri_motion, mk_quad, mk_points, mk_lines, mk_grid]

    for _ in range(2):
        f = makers[int(rng.integers(len(makers)))]()
        live[s.attach(f())] = f

    R = 48
    org = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    times = rng.uniform(0, 1, R).astype(np.float32)
    rays = et.make_rays(jnp.asarray(org), jnp.asarray(d),
                        time=jnp.asarray(times))

    for step in range(20):
        op = rng.integers(0, 4)
        if op == 0 or not live:
            f = makers[int(rng.integers(len(makers)))]()
            live[s.attach(f())] = f
        elif op == 1 and len(live) > 1:
            gid = int(rng.choice(list(live)))
            s.detach(gid)
            del live[gid]
        elif op == 2:
            gid = int(rng.choice(list(live)))
            f = live[gid]
            s._geoms[gid] = f()          # rebuild-in-place (deform analog)
        else:
            gid = int(rng.choice(list(live)))
            g = s.get(gid)
            g.enabled = not g.enabled

        enabled = [g for g in live if s.get(g).enabled]
        if not enabled:
            # all disabled: commit must raise the reference's empty-scene
            # error and leave the scene recommittable (the r3 crash class)
            with pytest.raises(ValueError):
                s.commit()
            s.get(next(iter(live))).enabled = True

        s.quality = int(rng.integers(0, 2))  # LOW / MEDIUM alternation
        cs = s.commit()
        h = jax.jit(intersect)(cs, rays)
        hb = jax.jit(intersect_brute)(cs, rays)
        np.testing.assert_array_equal(np.asarray(h.valid),
                                      np.asarray(hb.valid),
                                      err_msg=f"step {step}")
        m = np.asarray(hb.valid)
        np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(hb.t)[m],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"step {step}")
