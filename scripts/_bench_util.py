"""Shared timing helper for the perf scratchpad scripts."""
import time

import jax


def timeit(fn, *args, n=20, warm=3):
    """Mean wall ms per call after warmup (blocks on the full output)."""
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def titer(make_body, x0, k_lo=2, k_hi=12, reps=3):
    """Device-honest per-iteration ms: runs a loop-carried fori_loop of the
    op k times inside ONE jit and forces a scalar FETCH (block_until_ready
    does not actually block under the axon tunnel backend — only a host
    read does).  Returns (T(k_hi)-T(k_lo))/(k_hi-k_lo).

    make_body: () -> body(y) with y a pytree whose shape is preserved.
    x0: initial carry pytree.
    """
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    body = make_body()

    @partial(jax.jit, static_argnums=1)
    def runk(x, k):
        y = jax.lax.fori_loop(0, k, lambda i, y: body(y), x)
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l * 0.0) + l.ravel()[0] * 1e-30 for l in leaves)

    def t(k):
        float(runk(x0, k))          # compile+warm
        t0 = time.perf_counter()
        for _ in range(reps):
            float(runk(x0, k))
        return (time.perf_counter() - t0) / reps * 1e3

    return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)
