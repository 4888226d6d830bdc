"""A/B: bf16-stored L/D/U operator blocks for the ARK implicit-tendency
matvec (apply_op_blocks) vs f32 — full IMEX step at bench scale,
back-to-back under identical host load, plus a 50-step finiteness run
with bf16 on (the round-3 implied-G lesson: measure stability, not just
speed)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def titer_args(fn, x0, extra, k_lo=1, k_hi=4, reps=3):
    import time
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def runk(x, a, k):
        y = jax.lax.fori_loop(0, k, lambda i, y: fn(y, a), x)
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l * 0.0) + l.ravel()[0] * 1e-30 for l in leaves)

    def t(k):
        float(runk(x0, extra, k))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(runk(x0, extra, k))
        return (time.perf_counter() - t0) / reps * 1e3

    return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        HeldSuarezStepFilter, held_suarez_config)
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.solve import to_internal

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    ark = IMEXSolverType().make(dg, q0, aux0, dt)
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    ark.post_step = hsf.apply_vm
    col = ark.solver
    qv, auxv = to_internal(ark, q0, aux0)
    factors = ark._factors()

    def step_fn(y, a):
        fac, op = a
        qq, aa = y
        return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)

    for dt_name, dt_arg in (("f32", None), ("bf16", jnp.bfloat16),
                            ("bf16", jnp.bfloat16), ("f32", None)):
        op_args = col.op_args(dt_arg)
        ms = titer_args(step_fn, (qv, auxv), (factors, op_args))
        print(f"[op={dt_name:4s}] IMEX step: {ms:7.2f} ms", flush=True)

    # stability + accuracy drift: 50 steps with bf16 op vs f32 op
    op32 = col.op_args(None)
    op16 = col.op_args(jnp.bfloat16)

    @jax.jit
    def run50(y, fac, op):
        def body(i, y):
            qq, aa = y
            return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)
        return jax.lax.fori_loop(0, 50, body, y)

    qa, _ = run50((qv, auxv), factors, op32)
    qb, _ = run50((qv, auxv), factors, op16)
    fin = bool(jnp.all(jnp.isfinite(qb)))
    rel = float(jnp.max(jnp.abs(qb - qa))
                / (jnp.max(jnp.abs(qa)) + 1e-30))
    print(f"bf16-op 50-step: finite={fin} max-rel-drift vs f32-op={rel:.3e}",
          flush=True)


if __name__ == "__main__":
    main()
