"""Why is the vm LSRK54 step slower than 5x its own RHS?  Dissect the
stage composition at bench scale: RHS alone, RHS+axpy, k-stage steps,
aux-threading variants."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)

    def meas(name, fn, x0, lo=1, hi=4):
        def make_body():
            def body(y):
                return fn(y)
            return body
        ms = titer(make_body, x0, k_lo=lo, k_hi=hi)
        print(f"{name:28s}: {ms:7.2f} ms", flush=True)

    # 1 RHS (same as tpu_step_probe body_rhs)
    def one_rhs(y):
        qq, aa = y
        tend, a2 = vm(qq, aa, 0.0)
        return (qq + 1e-30 * tend, a2)
    meas("1 RHS (+eps axpy)", one_rhs, (qv, auxv), 2, 8)

    # 1 RHS with the LSRK axpy pair (dq buffer carried)
    def one_stage(y):
        qq, aa, dq = y
        tend, a2 = vm(qq, aa, 0.0)
        dq = -0.5 * dq + tend
        return (qq + 0.1 * dq, a2, dq)
    meas("1 stage (dq carry)", one_stage,
         (qv, auxv, jnp.zeros_like(qv)), 2, 8)

    # k-stage partial steps
    for k in (1, 2, 3, 5):
        sol = LSRK54CarpenterKennedy(vm, 1e-6)

        def kstep(y, k=k):
            qq, aa = y
            dq = None
            for s in range(k):
                tend, aa = vm(qq, aa, 0.0)
                dq = tend if dq is None else sol.A[s] * dq + tend
                qq = qq + (sol.B[s] * sol.dt) * dq
            return (qq, aa)
        meas(f"{k}-stage step", kstep, (qv, auxv), 1, 4)

    # full solver.step for reference
    sol = LSRK54CarpenterKennedy(vm, 1e-6)

    def full(y):
        qq, aa = y
        return sol.step(qq, aa, 0.0)
    meas("solver.step", full, (qv, auxv), 1, 4)

    # variant: aux NOT threaded between stages (thermo writes dropped)
    def kstep_noaux(y):
        qq, aa = y
        dq = None
        for s in range(5):
            tend, _ = vm(qq, aa, 0.0)
            dq = tend if dq is None else sol.A[s] * dq + tend
            qq = qq + (sol.B[s] * sol.dt) * dq
        return (qq, aa)
    meas("5-stage, aux frozen", kstep_noaux, (qv, auxv), 1, 4)


if __name__ == "__main__":
    main()
