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
