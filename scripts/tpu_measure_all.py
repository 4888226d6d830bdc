"""One-shot TPU measurement batch (tunnel round trips are expensive):
runs, in order, with progressive prints after each section —

1. surface A/B: generic vs var-major fast surface (RHS + step)
2. RHS phase profile (volume / hyper chain / surface / sources)
3. bench.py metric (Held-Suarez p4 grid-points/s, 100 steps)

Each section is wrapped so a mid-run tunnel failure still leaves the
earlier results on stdout."""
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


from _bench_util import timeit  # noqa: E402


def section(name):
    print(f"\n===== {name} =====", flush=True)


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    q = aux = None
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0

    try:
        section("surface A/B (RHS ms, step ms)")
        for kind in ("xla", "varmajor"):
            dg = DGModel(cfg.model, cfg.grid, surface_kernel=kind)
            if q is None:
                q, aux = init_ode_state(dg)
            ms_rhs = timeit(jax.jit(lambda a, b: dg(a, b, 0.0)), q, aux)
            sol = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
            ms_step = timeit(jax.jit(sol.step), q, aux, 0.0, n=10)
            print(f"{kind:9s}: RHS {ms_rhs:7.2f} ms   step {ms_step:7.2f} ms",
                  flush=True)
    except Exception:
        traceback.print_exc()

    try:
        section("RHS phases (generic path)")
        dg = DGModel(cfg.model, cfg.grid)
        if q is None:
            q, aux = init_ode_state(dg)
        bl, g = dg.balance_law, dg.grid
        aux2 = bl.update_auxiliary_state(g, q, aux, 0.0)
        print("update_aux  :",
              timeit(jax.jit(lambda a, b: bl.update_auxiliary_state(
                  g, a, b, 0.0)), q, aux), flush=True)
        print("hyper chain :",
              timeit(jax.jit(lambda a, b: dg.hyperdiffusive_state(
                  a, b, 0.0)), q, aux2), flush=True)
        from climatemachine_tpu.dg import pallas_volume as pv
        if dg._pallas_volume:
            print("pallas vol  :",
                  timeit(jax.jit(lambda a, b: pv.volume_tendency_from_grid(
                      dg, a, b)), q, aux2), flush=True)
        print("full RHS    :",
              timeit(jax.jit(lambda a, b: dg(a, b, 0.0)), q, aux),
              flush=True)
    except Exception:
        traceback.print_exc()

    try:
        section("bench.py")
        r = subprocess.run([sys.executable,
                            os.path.join(os.path.dirname(__file__), "..",
                                         "bench.py")],
                           capture_output=True, text=True, timeout=2400)
        print(r.stdout.strip()[-500:], flush=True)
        if r.returncode:
            print(r.stderr.strip()[-500:], flush=True)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
