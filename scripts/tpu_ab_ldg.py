"""TPU A/B: rows-layout vs legacy LDG hyperdiffusion chain, and
generic vs var-major surface pass, measured on the full Held-Suarez p4
RHS + LSRK54 step.  One batch run (tunnel round trips are expensive)."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from _bench_util import timeit  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    q = aux = None

    for ldg in ("rows", "legacy"):
        for surf in ("xla", "varmajor"):
            try:
                dg = DGModel(cfg.model, cfg.grid, surface_kernel=surf,
                             ldg_kernel=ldg)
                if q is None:
                    q, aux = init_ode_state(dg)
                ms_chain = timeit(
                    jax.jit(lambda a, b: dg.hyperdiffusive_state(a, b, 0.0)),
                    q, aux)
                ms_rhs = timeit(jax.jit(lambda a, b: dg(a, b, 0.0)), q, aux)
                sol = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
                ms_step = timeit(jax.jit(sol.step), q, aux, 0.0, n=10)
                print(f"ldg={ldg:6s} surf={surf:8s}: chain {ms_chain:6.2f}  "
                      f"RHS {ms_rhs:6.2f}  step {ms_step:7.2f} ms",
                      flush=True)
            except Exception:
                traceback.print_exc()


if __name__ == "__main__":
    main()
