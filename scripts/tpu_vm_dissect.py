"""Device-honest per-pass dissection of the var-major RHS at bench scale
(round-5 layout: thermo / chain / volume / surface / sources / full RHS /
LSRK54 step with the every-step filter)."""
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
    from climatemachine_tpu.driver.solver_types import ExplicitSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)

    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)

    def meas(name, body, x0, lo=2, hi=10):
        ms = titer(lambda: body, x0, k_lo=lo, k_hi=hi)
        print(f"{name:24s}: {ms:7.2f} ms", flush=True)
        return ms

    eps = 1e-12

    def b_thermo(y):
        T2, p2, c2, a2 = vm._thermo_update(y[0], y[1], 0.0)
        return (y[0] + eps * p2[:, None, :] * 0, a2)
    meas("thermo+aux", b_thermo, (qv, auxv))

    def b_chain(y):
        g2, n2 = vm._chain(y[0], auxv2, T, p, 0.0)
        return (y[0] * (1.0 + eps * jnp.mean(g2)),)
    meas("chain", b_chain, (qv,))

    def b_surface(y):
        s = vm._surface(y[0], auxv2, p, c_s, 0.0, hyper=(gl2, nu))
        return (y[0] + eps * s,)
    meas("surface(+hyper corr)", b_surface, (qv,))

    def b_sources(y):
        s = vm._sources(y[0], auxv2, T, p, 0.0)
        return (y[0] + eps * s,)
    meas("sources", b_sources, (qv,))

    def b_rhs(y):
        dq, a2 = vm(y[0], y[1], 0.0)
        return (y[0] + eps * dq, a2)
    meas("full RHS", b_rhs, (qv, auxv), lo=2, hi=8)

    # volume = RHS - (others); also measure directly via the kernel
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    dt = 0.3 * float(np.min(cfg.grid.dx_min)) if False else 0.5
    ex = ExplicitSolverType().make(dg, q, aux, dt)
    ex.post_step = hsf.apply_vm

    def b_step(y):
        return ex.step(y[0], y[1], 0.0)
    meas("LSRK54 step (+filter)", b_step, (qv, auxv), lo=1, hi=4)


if __name__ == "__main__":
    main()
