"""Full-IMEX-step A/B: pallas grid<->block converters vs XLA transpose
chains (both orders, 2 reps)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from tpu_bf16_op_ab import titer_args

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
    qv, auxv = to_internal(ark, q0, aux0)
    factors = ark._factors()
    op_args = ark.solver.op_args(None)
    lay = ark.solver.state_layout

    def step_fn(y, a):
        fac, op = a
        qq, aa = y
        return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)

    for rep in range(2):
        order = (True, False) if rep % 2 == 0 else (False, True)
        for use_p in order:
            lay._pallas = use_p
            ms = titer_args(step_fn, (qv, auxv), (factors, op_args))
            print(f"rep{rep} converters={'pallas' if use_p else 'xla'}: "
                  f"{ms:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
