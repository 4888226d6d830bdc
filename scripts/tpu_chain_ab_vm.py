"""A/B: the fused Pallas chain (pallas_ldg.chain_vm) inside the
var-major RHS vs the per-pass XLA chain — full RHS and full LSRK54
step at bench scale, measured back-to-back under identical host load."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)

    for kern in ("xla", "pallas", "pallas", "xla"):
        vm = VarMajorRHS(dg, chain_kernel=kern)
        qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)

        def body_rhs():
            def body(y):
                qq, aa = y
                tend, a2 = vm(qq, aa, 0.0)
                return (qq + 1e-30 * tend, a2)
            return body
        ms = titer(body_rhs, (qv, auxv), k_lo=2, k_hi=8)
        print(f"[{kern:6s}] full RHS    : {ms:7.2f} ms", flush=True)

        sol = LSRK54CarpenterKennedy(vm, 1e-6)
        sol.post_step = hsf.apply_vm

        def body_step():
            def body(y):
                qq, aa = y
                return sol.step(qq, aa, 0.0)
            return body
        ms = titer(body_step, (qv, auxv), k_lo=1, k_hi=4)
        print(f"[{kern:6s}] LSRK54 step : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
