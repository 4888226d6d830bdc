"""A/B the var-major fast surface pass vs the generic path on TPU
(Held-Suarez p4).  Perf scratchpad; prints RHS and full-step times."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


from _bench_util import timeit  # noqa: E402


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    n_horz = 6 if on_cpu else 16
    n_vert = 4 if on_cpu else 8
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=4,
                             dtype=np.float32)
    q = aux = None
    for kind in ("xla", "varmajor"):
        dg = DGModel(cfg.model, cfg.grid, surface_kernel=kind)
        if kind == "varmajor":
            assert dg._fast_surface, "fast surface not supported?!"
        if q is None:
            q, aux = init_ode_state(dg)
        ms_rhs = timeit(jax.jit(lambda a, b: dg(a, b, 0.0)), q, aux)
        dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
        sol = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
        ms_step = timeit(jax.jit(sol.step), q, aux, 0.0, n=10)
        print(f"{kind:9s}: RHS {ms_rhs:7.2f} ms   step {ms_step:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
