"""TPU A/B: var-major XLA chain vs fused Pallas chain (dg/pallas_ldg.py)
at the benchmark grid, plus the full step with each."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    q = aux = None

    for kern in ("varmajor", "pallas"):
        dg = DGModel(cfg.model, cfg.grid, ldg_kernel=kern)
        if q is None:
            q, aux = init_ode_state(dg)

        def body_chain(dg=dg):
            def body(y):
                h = dg.hyperdiffusive_state(y, aux, 0.0)
                red = jnp.sum(h, axis=tuple(range(2, h.ndim)))
                return y + 1e-30 * red[..., None]
            return body

        ms = titer(body_chain, q, k_lo=2, k_hi=10)
        print(f"chain  ({kern:9s}): {ms:7.2f} ms", flush=True)

        dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
        solver = LSRK54CarpenterKennedy(
            lambda a, b, t, dg=dg: dg(a, b, t), dt)

        def body_step(solver=solver):
            def body(y):
                qq, aa = y
                return solver.step(qq, aa, 0.0)
            return body

        ms = titer(body_step, (q, aux), k_lo=1, k_hi=5)
        print(f"step   ({kern:9s}): {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
