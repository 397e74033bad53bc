"""Measure the ray-reorder (sort) tax and candidate replacements on TPU.

The traversal pipeline pays two multi-operand lax.sorts per launch
(coherence sort + unsort). This measures alternatives at 1M rays:
  a) 12-operand lax.sort (status quo)
  b) 2-op sort (key, idx) + per-field jnp.take
  c) 2-op sort + ONE row-gather of a stacked (R, 12) matrix
  d) argsort + row-gather
  e) 16-bucket cumsum-rank permutation + row-gather
  f) 12-op sort with 8-bit key (does key width matter?)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    fn_j = jax.jit(fn)
    r = jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    R = 1 << 20
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, R, dtype=np.int32))
    ops = [jnp.asarray(rng.normal(size=R).astype(np.float32))
           for _ in range(10)]
    idx0 = jnp.arange(R, dtype=jnp.int32)

    def full_sort(key, *ops):
        return jax.lax.sort((key,) + ops + (idx0,), num_keys=1)

    t, _ = timeit(full_sort, key, *ops)
    print(f"a) 12-op sort:            {t*1e3:8.2f} ms")

    def sort2_take(key, *ops):
        k2, perm = jax.lax.sort((key, idx0), num_keys=1)
        return [o[perm] for o in ops]

    t, _ = timeit(sort2_take, key, *ops)
    print(f"b) 2-op sort + 10 takes:  {t*1e3:8.2f} ms")

    def sort2_rowgather(key, *ops):
        k2, perm = jax.lax.sort((key, idx0), num_keys=1)
        m = jnp.stack(ops, axis=-1)        # (R, 10)
        return m[perm]

    t, _ = timeit(sort2_rowgather, key, *ops)
    print(f"c) 2-op sort + row-gather:{t*1e3:8.2f} ms")

    def argsort_rowgather(key, *ops):
        perm = jnp.argsort(key)
        m = jnp.stack(ops, axis=-1)
        return m[perm]

    t, _ = timeit(argsort_rowgather, key, *ops)
    print(f"d) argsort + row-gather:  {t*1e3:8.2f} ms")

    def bucket_perm(key, *ops):
        b = key >> 26                       # 16 buckets
        onehot = (b[:, None] == jnp.arange(16)[None, :]).astype(jnp.int32)
        within = jnp.cumsum(onehot, axis=0) - onehot       # rank in bucket
        counts = jnp.sum(onehot, axis=0)
        start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        pos = jnp.sum(onehot * (start[None, :] + within), axis=1)
        # inverse perm via scatter, then row-gather
        inv = jnp.zeros(R, jnp.int32).at[pos].set(idx0)
        m = jnp.stack(ops, axis=-1)
        return m[inv]

    t, _ = timeit(bucket_perm, key, *ops)
    print(f"e) 16-bucket rank + gath: {t*1e3:8.2f} ms")

    key8 = (key >> 22).astype(jnp.int32)

    def full_sort8(key, *ops):
        return jax.lax.sort((key,) + ops + (idx0,), num_keys=1)

    t, _ = timeit(full_sort8, key8, *ops)
    print(f"f) 12-op sort, 8b key:    {t*1e3:8.2f} ms")

    # g) scatter-apply: position computed, scatter each op directly
    def sort2_scatter(key, *ops):
        k2, perm = jax.lax.sort((key, idx0), num_keys=1)
        m = jnp.stack(ops, axis=-1)
        out = jnp.zeros_like(m).at[perm].set(m)   # unsort-style scatter
        return out

    t, _ = timeit(sort2_scatter, key, *ops)
    print(f"g) 2-op sort + row-scat:  {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
