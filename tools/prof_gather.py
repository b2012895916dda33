#!/usr/bin/env python
"""Microbench: XLA TPU gather cost — separate column gathers vs packed row
gathers, at wavefront scale (640k lanes)."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

def timeit(fn, args, n=16, name=""):
    f = jax.jit(fn)
    r = f(*args); float(np.asarray(jax.tree_util.tree_leaves(r)[0].sum()))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            r = f(*args)
            s = jax.tree_util.tree_leaves(r)[0].sum().astype(jnp.float32)
            acc = s if acc is None else acc + s
        float(np.asarray(acc))
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:46s} {sorted(ts)[1]*1e3:8.2f} ms")

def main():
    n = 640 * 1024
    key = jax.random.PRNGKey(0)
    order = jax.random.permutation(key, n)
    o = jax.random.normal(key, (n, 3), jnp.float32)
    d = jax.random.normal(key, (n, 3), jnp.float32)
    t = jax.random.uniform(key, (n,), jnp.float32)
    packed8 = jnp.concatenate([o, d, t[:, None], t[:, None]], axis=1)  # (n, 8)

    def sep(order, o, d, t):
        return o[order].sum() + d[order].sum() + t[order].sum()

    def packed(order, p8):
        return p8[order].sum()

    def packed_take(order, p8):
        return jnp.take(p8, order, axis=0).sum()

    def one_col(order, t):
        return t[order].sum()

    def four_unsort(order, t):
        a = t[order]; b = (t + 1)[order]; c = (t + 2)[order]; e = (t + 3)[order]
        return a.sum() + b.sum() + c.sum() + e.sum()

    def packed_unsort(order, t):
        m = jnp.stack([t, t + 1, t + 2, t + 3], axis=1)  # (n,4)
        return m[order].sum()

    timeit(sep, (order, o, d, t), name="separate o/d/t gathers (3 ops, 4.5M elem)")
    timeit(packed, (order, packed8), name="packed (n,8) row gather (5.1M elem)")
    timeit(packed_take, (order, packed8), name="packed (n,8) jnp.take")
    timeit(one_col, (order, t), name="single (n,) gather (0.64M elem)")
    timeit(four_unsort, (order, t), name="4 separate (n,) gathers")
    timeit(packed_unsort, (order, t), name="stack+(n,4) row gather")

if __name__ == "__main__":
    main()
