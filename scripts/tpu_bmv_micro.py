"""Micro-benchmark: batched tiny-block matvec formulations on TPU.

y[v,i,c] = sum_j D[v,i,j,c] x[v,j,c]   with v=8, i=j=15, c=38400 f32
(the columnwise apply_op inner op; D is ~276 MB -> light-speed ~0.4 ms)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    v, s, c = 8, 15, 38400
    key = jax.random.PRNGKey(0)
    D = jax.random.normal(key, (v, s, s, c), dtype=jnp.float32)
    x = jax.random.normal(key, (v, s, c), dtype=jnp.float32)
    Dl = jnp.transpose(D, (3, 0, 1, 2))    # [c, v, i, j] legacy layout
    xl = jnp.transpose(x, (2, 0, 1))       # [c, v, j]

    @jax.jit
    def bsum(D, x):
        return (D * x[:, None, :, :]).sum(2)

    @jax.jit
    def unroll(D, x):
        y = D[:, :, 0, :] * x[:, None, 0, :]
        for j in range(1, s):
            y = y + D[:, :, j, :] * x[:, None, j, :]
        return y

    @jax.jit
    def esum(D, x):
        return jnp.einsum("vijc,vjc->vic", D, x)

    @jax.jit
    def legacy(Dl, xl):
        return jnp.einsum("cvij,cvj->cvi", Dl, xl,
                          precision=jax.lax.Precision.HIGHEST)

    n_bytes = D.size * 4
    for name, fn, a in (("bcast-sum ", bsum, (D, x)),
                        ("unrolled  ", unroll, (D, x)),
                        ("einsum    ", esum, (D, x)),
                        ("legacy-blk", legacy, (Dl, xl))):
        ms = timeit(fn, *a)
        print(f"{name}: {ms:7.2f} ms   {n_bytes / ms / 1e6:.0f} GB/s eff",
              flush=True)

    # scan-latency probe: 16 sequential tiny steps like the Thomas sweeps
    M = jax.random.normal(key, (16, s, s, c), dtype=jnp.float32)

    @jax.jit
    def sweep(M, x0):
        def f(y, Mk):
            return (Mk * y[None, :, :]).sum(1), None
        y, _ = jax.lax.scan(f, x0, M)
        return y

    ms = timeit(sweep, M, x[0])
    print(f"16-step scan : {ms:7.2f} ms ({ms / 16:.2f} ms/step; operand "
          f"{M.size * 4 / 16 / 1e6:.0f} MB/step)", flush=True)


if __name__ == "__main__":
    main()
