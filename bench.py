"""Benchmark: Held-Suarez p4 DG grid-points/s per chip (BASELINE.md north
star).  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Runs on whatever backend JAX selects (real TPU under the driver; set
JAX_PLATFORMS=cpu for a local smoke run).  The reference publishes no
numbers (BASELINE.json "published": {}), so vs_baseline compares against
the value recorded in BENCH_BASELINE.json if present, else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # env var alone is not enough: the ambient axon plugin hooks
        # jax.devices() and blocks on the tunnel even for cpu — pin the
        # platform through the config API before any backend touch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    on_cpu = jax.devices()[0].platform == "cpu"
    # Held-Suarez p4 (BASELINE.md pins order 4); size chosen to fill a chip
    n_horz = 6 if on_cpu else 16
    n_vert = 4 if on_cpu else 8
    poly = 4
    nsteps = 20 if on_cpu else 100
    nwarm = 3 if on_cpu else 10

    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=poly,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)

    dt = 0.3 * min_node_distance(cfg.grid) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)

    t = 0.0
    for _ in range(nwarm):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    wall = time.perf_counter() - t0

    assert bool(jnp.all(jnp.isfinite(q))), "bench produced non-finite state"

    npoints = cfg.grid.nelem * cfg.grid.Np
    gps = npoints * nsteps / wall

    base = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            base = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            base = None
    vs = (gps / base) if base else 1.0

    print(json.dumps({
        "metric": "held_suarez_p4_gridpoints_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoints/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "n_horz": n_horz, "n_vert": n_vert, "poly": poly,
            "gridpoints": npoints, "steps": nsteps,
            "time_per_step_ms": round(1e3 * wall / nsteps, 3),
            "platform": jax.devices()[0].platform,
            "dtype": "float32",
        },
    }))


def _backend_ready():
    # probe in a subprocess: a failed in-process jax.devices() poisons
    # the backend cache for the rest of the process
    import subprocess
    r = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        capture_output=True, timeout=120)
    if r.returncode != 0:
        sys.stderr.write("backend not ready\n")
    return r.returncode == 0


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        main()
        sys.exit(0)
    # the axon TPU tunnel is occasionally unavailable; retry before
    # giving up so an unattended bench run survives transient outages
    for attempt in range(20):
        try:
            if _backend_ready():
                break
        except Exception as e:
            sys.stderr.write(f"probe failed: {e}\n")
        time.sleep(60)
    else:
        sys.stderr.write("TPU backend unavailable after 20 attempts\n")
        sys.exit(2)
    main()
