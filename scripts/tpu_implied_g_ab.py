"""Step-level A/B of the ARK implicit-tendency modes at benchmark scale
on TPU f32: implied_g in {identity, op, dg}.  Reports per-step ms and
the 50-step finiteness/max|q| drift of each mode."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    ark = IMEXSolverType().make(dg, q0, aux0, dt)
    factors = ark._factors()
    op_args = ark.solver.op_args()

    for mode in ("identity", "op", "dg"):
        ark.solver.implied_g = mode
        ark._jit_impl = None        # re-trace with the new mode

        @partial(jax.jit, static_argnums=3)
        def runk(q, aux, a, k):
            fac, op = a
            def body(i, y):
                qq, aa = y
                return ark._step_impl(qq, aa, 0.0, ark.dt, fac, op)
            q, aux = jax.lax.fori_loop(0, k, body, (q, aux))
            return q.ravel()[0] * 1e-30 + jnp.sum(q * 0.0)

        def t(k):
            float(runk(q0, aux0, (factors, op_args), k))
            t0 = time.perf_counter()
            for _ in range(3):
                float(runk(q0, aux0, (factors, op_args), k))
            return (time.perf_counter() - t0) / 3 * 1e3

        ms = (t(4) - t(1)) / 3

        # 50-step stability drive
        q, aux, tt = q0, aux0, 0.0
        for _ in range(50):
            q, aux = ark.step(q, aux, tt)
            tt += dt
        mx = float(jnp.max(jnp.abs(q)))
        fin = bool(jnp.all(jnp.isfinite(q)))
        print(f"{mode:9s}: {ms:7.2f} ms/step   50-step max|q|={mx:.4e} "
              f"finite={fin}", flush=True)


if __name__ == "__main__":
    main()
