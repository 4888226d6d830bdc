"""Capture an XLA profiler trace of one Held-Suarez RHS + per-piece timing.

Writes the trace under /tmp/rhs_trace; summarize with
scripts/summarize_trace.py (reads the .xplane.pb via tensorflow if present)
or inspect in xprof.  Not a test — a perf scratchpad.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def main():
    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)

    rhs = jax.jit(lambda q, aux: dg(q, aux, 0.0))
    out = rhs(q, aux)
    jax.block_until_ready(out)

    with jax.profiler.trace("/tmp/rhs_trace"):
        for _ in range(5):
            out = rhs(q, aux)
        jax.block_until_ready(out)
    print("trace written to /tmp/rhs_trace")


if __name__ == "__main__":
    main()
