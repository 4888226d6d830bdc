"""Trace k explicit LSRK54 steps (vm path, pallas chain); summarize op
self-times — hunting layout-copy chains like the IMEX ones."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, functools, time

def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import ExplicitSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
    from climatemachine_tpu.mesh.grid import min_node_distance
    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4, dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    ex = ExplicitSolverType().make(dg, q0, aux0, dt)
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    ex.post_step = hsf.apply_vm
    qv, auxv = ex.vm.to_vm(q0), ex.vm.aux_to_vm(aux0)

    @functools.partial(jax.jit, static_argnums=1)
    def runk(y, k):
        def body(i, y):
            return ex.step(y[0], y[1], 0.0)
        y = jax.lax.fori_loop(0, k, body, y)
        return jnp.sum(y[0]*0.0) + y[0].ravel()[0]*1e-30
    float(runk((qv, auxv), 6))
    with jax.profiler.trace("/tmp/explicit_trace"):
        t0 = time.perf_counter()
        float(runk((qv, auxv), 6))
        print("6 steps:", (time.perf_counter()-t0)*1e3, "ms", flush=True)

if __name__ == "__main__":
    main()
