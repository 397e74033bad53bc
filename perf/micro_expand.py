"""Measure the compact-vs-broadcast state primitives on the real TPU:
expand (U,128)->(8U,128), pltpu.repeat expand, full-width vs compact
masked-min (axis=1), full-width vs compact select chains, per-group gather.
Grounds the r5 kernel state-layout decision."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
U = 16
ROWS = U * 8
ITERS = 3000


def bench(name, body_fn, rows_in=ROWS):
    def kernel(x_ref, o_ref):
        def body(it, acc):
            return body_fn(acc, x_ref, it)
        acc = jax.lax.fori_loop(0, ITERS, body, x_ref[0:8] * 1)
        o_ref[0:8] = acc

    x = jnp.arange(rows_in * LANE, dtype=jnp.int32).reshape(rows_in, LANE) & 63
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    jax.block_until_ready(f(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best/ITERS*1e9:8.1f} ns/iter")
    return best / ITERS


def main():
    def expandR(xu):   # (U,128) -> (ROWS,128) row r = xu[r>>3]
        return jnp.broadcast_to(
            xu.reshape(U, 1, LANE), (U, 8, LANE)).reshape(ROWS, LANE)

    base = bench("baseline (acc+1 only)", lambda acc, x, it: acc + 1)

    def mk_u(x, it):
        return x[0:U] + it          # fresh (U,128) per iter

    def mk_r(x, it):
        return x[0:ROWS] + it       # fresh (ROWS,128) per iter

    bench("expand reshape-bcast (16,128)->(128,128)",
          lambda acc, x, it: acc + expandR(mk_u(x, it))[0:8])
    bench("expand pltpu.repeat (16,128)->(128,128)",
          lambda acc, x, it: acc + pltpu.repeat(mk_u(x, it), 8, 0)[0:8])
    bench("strided extract (128,128)->(16,128) [::8]",
          lambda acc, x, it: acc + mk_r(x, it).reshape(U, 8, LANE)[:, 0, :][0:8])
    bench("masked-min axis=1 (128,128)",
          lambda acc, x, it: acc + jnp.min(
              jnp.where(mk_r(x, it) > 0, mk_r(x, it), 999),
              axis=1, keepdims=True)[0:8])
    bench("masked-min axis=1 (16,128)",
          lambda acc, x, it: acc + jnp.min(
              jnp.where(mk_u(x, it) > 0, mk_u(x, it), 999),
              axis=1, keepdims=True)[0:8])
    bench("select (128,128)",
          lambda acc, x, it: acc + jnp.where(
              mk_r(x, it) > 32, mk_r(x, it), mk_r(x, it) + 1)[0:8])
    bench("select (16,128)",
          lambda acc, x, it: acc + jnp.where(
              mk_u(x, it) > 32, mk_u(x, it), mk_u(x, it) + 1)[0:8])
    bench("10x add (128,128)",
          lambda acc, x, it: acc + sum(
              [mk_r(x, it) + k for k in range(10)])[0:8] * 0 + acc * 0 + 1)
    bench("block-sum (128,128)->(16,128)",
          lambda acc, x, it: acc + jnp.sum(
              mk_r(x, it).reshape(U, 8, LANE), axis=1)[0:8])
    bench("take_along_axis 72 rows ax1 (one group gather)",
          lambda acc, x, it: acc + jnp.take_along_axis(
              mk_r(x, it)[0:72], jnp.broadcast_to(
                  (mk_u(x, it)[0:1]) & 127, (72, LANE)), axis=1)[0:8])
    bench("16x take_along_axis 72 rows ax1",
          lambda acc, x, it: acc + sum(
              jnp.take_along_axis(
                  mk_r(x, it)[0:72], jnp.broadcast_to(
                      (mk_u(x, it)[u:u + 1]) & 127, (72, LANE)),
                  axis=1)[0:8] for u in range(16)))


if __name__ == "__main__":
    main()
