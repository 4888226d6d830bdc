"""Trace k IMEX steps; summarize device op self-times."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, functools, time

def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.solve import to_internal
    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4, dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    ark = IMEXSolverType().make(dg, q0, aux0, dt)
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    ark.post_step = hsf.apply_vm
    qv, auxv = to_internal(ark, q0, aux0)
    factors = ark._factors()
    op_args = ark.solver.op_args(None)

    @functools.partial(jax.jit, static_argnums=3)
    def runk(y, fac, op, k):
        def body(i, y):
            qq, aa = y
            return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)
        y = jax.lax.fori_loop(0, k, body, y)
        return jnp.sum(y[0]*0.0) + y[0].ravel()[0]*1e-30
    float(runk((qv, auxv), factors, op_args, 6))
    with jax.profiler.trace("/tmp/imex_trace"):
        t0 = time.perf_counter()
        float(runk((qv, auxv), factors, op_args, 6))
        print("6 steps:", (time.perf_counter()-t0)*1e3, "ms", flush=True)

if __name__ == "__main__":
    main()
