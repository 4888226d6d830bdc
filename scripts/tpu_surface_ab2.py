"""Hardware A/B: round-5 two-kernel Pallas surface (extract+trace ->
gather -> flux+lift) vs the XLA surface inside the var-major RHS.
Both orders, interleaved, device-honest."""
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

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
    eps = 1e-12

    def rhs_ms(kind):
        vm.surface_kernel = kind

        def body(y):
            dq, a2 = vm(y[0], y[1], 0.0)
            return (y[0] + eps * dq, a2)
        return titer(lambda: body, (qv, auxv), k_lo=2, k_hi=8)

    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)

    def surf_ms(kind):
        vm.surface_kernel = kind

        def body(y):
            s = vm._surface(y[0], auxv2, p, c_s, 0.0, hyper=(gl2, nu))
            return (y[0] + eps * s,)
        return titer(lambda: body, (qv,), k_lo=2, k_hi=10)

    for rep in range(2):
        for kind in ("xla", "hybrid") if rep % 2 == 0 else ("hybrid", "xla"):
            print(f"rep{rep} surface[{kind}]: {surf_ms(kind):6.2f} ms",
                  flush=True)
    for rep in range(2):
        for kind in ("xla", "hybrid") if rep % 2 == 0 else ("hybrid", "xla"):
            print(f"rep{rep} RHS[{kind}]:     {rhs_ms(kind):6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
