"""Microbenchmarks for the v8 kernel building blocks: (128,128) tile ops,
static XOR shuffles, block-local rolls, big record gathers, expansions.
All iotas built inside the kernel; no .at[].set (Mosaic has no scatter)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 128
ITERS = 20000


def run(name, body_fn, rows_in=512):
    def kernel(x_ref, o_ref):
        def body(it, acc):
            return body_fn(acc, it, x_ref)
        acc = jax.lax.fori_loop(0, ITERS, body, x_ref[0:ROWS] * 1)
        o_ref[:] = acc

    x = jnp.arange(rows_in * LANE, dtype=jnp.int32).reshape(rows_in, LANE) & 127
    try:
        f = jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        r = jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(x))
        el = time.perf_counter() - t0
        print(f"{name:58s} {el/ITERS*1e9:8.1f} ns/iter")
        return el / ITERS
    except Exception as e:
        print(f"{name:58s} FAILED: {str(e)[:90]}")
        return None


def _rowall():
    return jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 0)


def main():
    base = run("base (add only) (128,128)", lambda acc, it, x: acc + 1)

    run("elementwise 10 op chain (128,128)",
        lambda acc, it, x: acc + ((acc * 3 + 1) ^ (acc >> 2)) * ((acc | 1) + it))

    run("select (128,128)",
        lambda acc, it, x: jnp.where(acc > it, acc + 1, acc - 1))

    def static_xor_gather(acc, it, x):
        perm = _rowall() ^ 4
        return acc + jnp.take_along_axis(acc, perm, axis=0)
    run("static XOR-4 take_along_axis ax0 (128,128)", static_xor_gather)

    def dyn_block_gather(acc, it, x):
        rowall = _rowall()
        idx = (rowall & ~7) | ((rowall ^ (acc & 7)) & 7)
        return acc + jnp.take_along_axis(acc, idx, axis=0)
    run("dynamic block-local sublane gather (128,128)", dyn_block_gather)

    def blockxor_roll(acc, it, x):
        rc = _rowall() & 7
        up = pltpu.roll(acc, shift=ROWS - 4, axis=0)
        dn = pltpu.roll(acc, shift=4, axis=0)
        return acc + jnp.where((rc & 4) == 0, up, dn)
    run("block-XOR-4 via 2 rolls + select (128,128)", blockxor_roll)

    def blocksum(acc, it, x):
        rc = _rowall() & 7
        a = acc
        for s in (1, 2, 4):
            up = pltpu.roll(a, shift=ROWS - s, axis=0)
            dn = pltpu.roll(a, shift=s, axis=0)
            a = a + jnp.where((rc & s) == 0, up, dn)
        return acc + a
    run("block-sum butterfly 3x(2roll+sel+add) (128,128)", blocksum)

    def expand16(acc, it, x):
        c = acc[0:16]
        e = jnp.broadcast_to(c.reshape(16, 1, LANE), (16, 8, LANE)).reshape(ROWS, LANE)
        return acc + e
    run("expand (16,128)->(128,128) block-broadcast", expand16)

    def reduce_rows(acc, it, x):
        r = jnp.sum(acc.reshape(16, 8, LANE), axis=1)
        return acc + jnp.broadcast_to(r.reshape(16, 1, LANE),
                                      (16, 8, LANE)).reshape(ROWS, LANE)
    run("block-reduce (128,128)->(16,128) + re-expand", reduce_rows)

    def gather72(acc, it, x):
        idx = jnp.broadcast_to(acc[0:1] & 127, (72, LANE))
        g = jnp.take_along_axis(x[0:72], idx, axis=1)
        return acc + jnp.concatenate([g, g[0:56]], axis=0)
    run("lane gather (72,128) broadcast idx", gather72)

    def dynslice_gather72(acc, it, x):
        g = jnp.sum(acc[0:1, 0:1]) & 3
        tile = x[pl.ds(g * 72, 72)]
        idx = jnp.broadcast_to(acc[0:1] & 127, (72, LANE))
        got = jnp.take_along_axis(tile, idx, axis=1)
        return acc + jnp.concatenate([got, got[0:56]], axis=0)
    run("dynslice (72,128) + lane gather", dynslice_gather72)

    def dynslice_gather32(acc, it, x):
        g = jnp.sum(acc[0:1, 0:1]) & 7
        tile = x[pl.ds(g * 32, 32)]
        idx = jnp.broadcast_to(acc[0:1] & 127, (32, LANE))
        got = jnp.take_along_axis(tile, idx, axis=1)
        return acc + jnp.concatenate([got, got, got, got], axis=0)
    run("dynslice (32,128) + lane gather", dynslice_gather32)

    def merge72(acc, it, x):
        idx = jnp.broadcast_to(acc[0:1] & 127, (72, LANE))
        g = jnp.take_along_axis(x[0:72], idx, axis=1)
        m = jnp.broadcast_to((acc[0:1] & 1) > 0, (72, LANE))
        merged = jnp.where(m, g, x[72:144])
        return acc + jnp.concatenate([merged, merged[0:56]], axis=0)
    run("gather72 + select72 merge", merge72)

    def gather8x9(acc, it, x):
        li = acc[0:8] & 127
        parts = []
        for k in range(9):
            parts.append(jnp.take_along_axis(x[8 * k:8 * k + 8], li, axis=1))
        g = jnp.concatenate(parts, axis=0)
        return acc + jnp.concatenate([g, g[0:56]], axis=0)
    run("9x lane gather (8,128) [v7 style]", gather8x9)

    def compact_ops(acc, it, x):
        c = acc[0:16]
        c = jnp.where(c > it, c + 1, c - 1) * 3 + (c >> 1)
        return acc + jnp.concatenate([c] * 8, axis=0)
    run("compact (16,128) 5-op chain + concat x8", compact_ops)

    def bitonic_tp_gather(acc, it, x):
        rowall = _rowall()
        rc = rowall & 7
        key = acc
        for k, j in ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1)):
            key_p = jnp.take_along_axis(key, rowall ^ j, axis=0)
            keepmin = ((rc & k) == 0) == ((rc & j) == 0)
            swap = (key_p < key) == keepmin
            key = jnp.where(swap, key_p, key)
        return key + 1
    run("tile-parallel bitonic6 gather-form key-only (128,128)",
        bitonic_tp_gather)

    def bitonic_tp_roll(acc, it, x):
        rc = _rowall() & 7
        key = acc
        for k, j in ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1)):
            up = pltpu.roll(key, shift=ROWS - j, axis=0)
            dn = pltpu.roll(key, shift=j, axis=0)
            key_p = jnp.where((rc & j) == 0, up, dn)
            keepmin = ((rc & k) == 0) == ((rc & j) == 0)
            swap = (key_p < key) == keepmin
            key = jnp.where(swap, key_p, key)
        return key + 1
    run("tile-parallel bitonic6 roll-form key-only (128,128)", bitonic_tp_roll)

    def bitonic_tp_2arr(acc, it, x):
        rowall = _rowall()
        rc = rowall & 7
        key = acc
        ref = acc ^ 12345
        for k, j in ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1)):
            perm = rowall ^ j
            key_p = jnp.take_along_axis(key, perm, axis=0)
            ref_p = jnp.take_along_axis(ref, perm, axis=0)
            keepmin = ((rc & k) == 0) == ((rc & j) == 0)
            swap = (key_p < key) == keepmin
            key = jnp.where(swap, key_p, key)
            ref = jnp.where(swap, ref_p, ref)
        return key + ref
    run("tile-parallel bitonic6 gather-form key+ref (128,128)",
        bitonic_tp_2arr)

    def bitonic_grp(acc, it, x):
        out = []
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        for u in range(16):
            key = acc[8 * u:8 * u + 8] + 0
            ref = key ^ 12345
            for k, j in ((2, 1), (4, 2), (4, 1), (8, 4), (8, 2), (8, 1)):
                perm = row8 ^ j
                key_p = jnp.take_along_axis(key, perm, axis=0)
                ref_p = jnp.take_along_axis(ref, perm, axis=0)
                keepmin = ((row8 & k) == 0) == ((row8 & j) == 0)
                swap = (key_p < key) == keepmin
                key = jnp.where(swap, key_p, key)
                ref = jnp.where(swap, ref_p, ref)
            out.append(key + ref)
        return jnp.concatenate(out, axis=0)
    run("per-group bitonic6 x16 key+ref (8,128) [v7 style]", bitonic_grp)


if __name__ == "__main__":
    main()
