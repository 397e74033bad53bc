"""Microbenchmark Mosaic primitive costs on the real TPU: lane gathers of
various operand heights, sublane gathers, dynamic-slice tile loads, rolls,
scalar reductions. Grounds the traversal-kernel redesign in measured costs."""
import functools
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
ITERS = 20000


def timed(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    r = jax.block_until_ready(fn(*args))
    el = time.perf_counter() - t0
    print(f"{name:55s} {el/ITERS*1e9:8.1f} ns/iter")
    return el / ITERS


def make_loop_kernel(body_fn, n_scratch_rows=8):
    """Kernel that runs body_fn(acc, it) ITERS times with a carried (8,128)."""
    def kernel(x_ref, o_ref):
        def body(it, acc):
            return body_fn(acc, it, x_ref)
        acc = jax.lax.fori_loop(0, ITERS, body, x_ref[0:8] * 1)
        o_ref[0:8] = acc

    return kernel


def run(name, body_fn, rows_in=512):
    kernel = make_loop_kernel(body_fn)
    x = jnp.arange(rows_in * LANE, dtype=jnp.int32).reshape(rows_in, LANE) & 127
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    return timed(name, f, x)


def main():
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)

    base = run("loop overhead (add only)",
               lambda acc, it, x: acc + 1)

    run("lane gather (8,128) take_along_axis ax1",
        lambda acc, it, x: acc + jnp.take_along_axis(x[0:8], acc & 127, axis=1))

    def g32(acc, it, x):
        idx = jnp.broadcast_to(acc[0:1] & 127, (32, LANE))
        g = jnp.take_along_axis(x[0:32], idx, axis=1)
        return acc + g[0:8] + g[8:16] + g[16:24] + g[24:32]
    run("lane gather (32,128)", g32)

    def g48(acc, it, x):
        idx = jnp.broadcast_to(acc[0:1] & 127, (48, LANE))
        g = jnp.take_along_axis(x[0:48], idx, axis=1)
        return acc + g[0:8] + g[40:48]
    run("lane gather (48,128)", g48)

    def g256(acc, it, x):
        idx = jnp.broadcast_to(acc[0:1] & 127, (256, LANE))
        g = jnp.take_along_axis(x[0:256], idx, axis=1)
        return acc + g[0:8] + g[248:256]
    try:
        run("lane gather (256,128)", g256)
    except Exception as e:
        print("lane gather (256,128) FAILED:", str(e)[:100])

    def sub8(acc, it, x):
        return acc + jnp.take_along_axis(x[0:8], acc & 7, axis=0)
    run("sublane gather (8,128) ax0", sub8)

    def sub32(acc, it, x):
        idx = acc & 31
        return acc + jnp.take_along_axis(x[0:32], idx, axis=0)[0:8]
    try:
        run("sublane gather (32,128) ax0 (8 idx rows)", sub32)
    except Exception as e:
        print("sublane gather (32,128) FAILED:", str(e)[:100])

    def roll_op(acc, it, x):
        return acc + pltpu.roll(acc, shift=1, axis=0)
    run("pltpu.roll sublane", roll_op)

    def dynslice(acc, it, x):
        g = jnp.sum(acc[0:1, 0:1]) & 15
        t = x[pl.ds(g * 32, 32)]
        return acc + t[0:8]
    run("scalar-extract + dyn-slice (32,128) load", dynslice)

    def scalar_red(acc, it, x):
        s = jnp.min(acc)
        return acc + s
    run("scalar min-reduction (8,128)", scalar_red)

    def row_red(acc, it, x):
        return acc + jnp.min(acc, axis=1, keepdims=True)
    run("row min-reduction (8,128)->(8,1)", row_red)

    def select_op(acc, it, x):
        return jnp.where(acc > it, acc + 1, acc)
    run("select (8,128)", select_op)

    # fp32 mul-add chain for reference
    def vpu(acc, it, x):
        a = acc.astype(jnp.float32)
        for _ in range(10):
            a = a * 1.000001 + 0.5
        return acc + a.astype(jnp.int32)
    run("10x f32 FMA (8,128)", vpu)

    # dynamic-trip inner while loop overhead
    def inner_while(acc, it, x):
        def cond(c):
            return c[0] < 4
        def body(c):
            i, a = c
            return i + 1, a + jnp.take_along_axis(x[0:8], a & 127, axis=1)
        _, a = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
        return a
    run("inner while 4x (cond+gather body)", inner_while)


if __name__ == "__main__":
    main()
