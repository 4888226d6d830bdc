"""Full explicit-step A/B over chain_block_e (deferral active via ExplicitSolverType)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
from _bench_util import titer

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
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    for rep in range(2):
        bes = (16, 32, 64) if rep == 0 else (64, 32, 16)
        for be in bes:
            ex = ExplicitSolverType().make(dg, q0, aux0, dt)
            ex.vm.chain_block_e = be
            ex.post_step = hsf.apply_vm
            qv, auxv = ex.vm.to_vm(q0), ex.vm.aux_to_vm(aux0)
            def body(y):
                return ex.step(y[0], y[1], 0.0)
            ms = titer(lambda: body, (qv, auxv), k_lo=1, k_hi=4)
            print(f"rep{rep} chain_be={be:3d}: step {ms:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
