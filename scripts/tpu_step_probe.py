"""Minimal device-honest probe: LSRK54 step + full RHS at bench scale.
Usage: python scripts/tpu_step_probe.py [vm|generic]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "generic"
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0

    if mode == "vm":
        from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
        vm = VarMajorRHS(dg)
        q, aux = vm.to_vm(q), vm.aux_to_vm(aux)
        rhs = vm
    else:
        rhs = lambda a, b, t: dg(a, b, t)

    solver = LSRK54CarpenterKennedy(rhs, dt)

    def body_step():
        def body(y):
            qq, aa = y
            return solver.step(qq, aa, 0.0)
        return body

    ms = titer(body_step, (q, aux), k_lo=1, k_hi=5)
    print(f"[{mode}] LSRK54 step : {ms:7.2f} ms", flush=True)

    def body_rhs():
        def body(y):
            qq, aa = y
            tend, a2 = rhs(qq, aa, 0.0)
            return (qq + 1e-30 * tend, a2)
        return body

    ms = titer(body_rhs, (q, aux), k_lo=2, k_hi=8)
    print(f"[{mode}] full RHS    : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
