"""Device-honest dissection of the var-major IMEX step at bench scale:
full step, full RHS, columnwise solve, operator matvec, grid<->block
transposes — where do the ms beyond 3x RHS go?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402
from tpu_imex_profile import titer_args  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
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
    vm = ark.vm
    assert vm is not None
    qv, auxv = to_internal(ark, q0, aux0)
    lay = col.state_layout
    factors = ark._factors()
    op_args = col.op_args()
    gamma = float(ark.A_im[1, 1])

    def meas(name, fn, x0, lo=1, hi=4):
        # factors/op_args as jit ARGUMENTS (constants blow up the HLO:
        # 4.7 GB captured, rejected by the remote-compile tunnel)
        ms = titer_args(fn, x0, (factors, op_args), k_lo=lo, k_hi=hi)
        print(f"{name:26s}: {ms:7.2f} ms", flush=True)

    def full(y, a):
        fac, op = a
        qq, aa = y
        return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)
    meas("IMEX step (vm)", full, (qv, auxv))

    def rhs(y, a):
        qq, aa = y
        tend, a2 = vm(qq, aa, 0.0)
        return (qq + 1e-30 * tend, a2)
    meas("full RHS (x1)", rhs, (qv, auxv), 2, 8)

    qb0 = lay.to_blocks(qv)

    def slv(yb, a):
        fac = a[0][gamma]
        out = col.solve_blocks(yb, gamma * ark.dt, factors=fac)
        return out + 1e-30 * yb
    meas("solve_blocks (x1)", slv, qb0, 2, 8)

    def aop(yb, a):
        return col.apply_op_blocks(yb, a[1]) * 1e-30 + yb
    meas("apply_op_blocks (x1)", aop, qb0, 2, 8)

    def rt(y, a):
        qq, aa = y
        return (lay.from_blocks(lay.to_blocks(qq)) * 1.0000001, aa)
    meas("to+from_blocks (x1)", rt, (qv, auxv), 2, 8)

    def filt(y, a):
        qq, aa = y
        return (hsf.apply_vm(qq, aa), aa)
    meas("step filter (x1)", filt, (qv, auxv), 2, 8)


if __name__ == "__main__":
    main()
