"""Benchmark: Held-Suarez p4 — the BASELINE.md north-star configuration.

North star (BASELINE.md, reference experiments/AtmosGCM/heldsuarez.jl:234-240):
IMEX ARK2GiraldoKellyConstantinescu + columnwise implicit solve, dt set by
the HORIZONTAL acoustic Courant number (CFL 0.1, reference heldsuarez.jl:242),
with the vertical acoustics handled implicitly by the block-tridiagonal
columnwise solver (reference ManyColumnLU).  The explicit LSRK54 step is
also measured for the time-compression comparison.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

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


def _fetch(x):
    """Force a host round-trip: under the axon tunnel
    ``block_until_ready`` does not actually block (PERF_NOTES.md), so a
    tiny device_get is the only honest sync point."""
    import jax
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def _measure(step, q, aux, dt, nwarm, nsteps, k=3):
    """Best-of-k batches of ``nsteps`` steps (device-honest: each batch
    ends in a forced fetch).  Host contention smears individual batches
    upward only, so min-over-batches recovers the idle-host figure
    (VERDICT r3 weak #4: the driver-captured 111.4 ms vs the idle-host
    104.2)."""
    t = 0.0
    for _ in range(nwarm):
        q, aux = step(q, aux, t)
        t += dt
    _fetch(q)
    best = float("inf")
    qb, auxb = q, aux
    for _ in range(k):
        qq, aa, tt = q, aux, t
        t0 = time.perf_counter()
        for _ in range(nsteps):
            qq, aa = step(qq, aa, tt)
            tt += dt
        _fetch(qq)
        wall = time.perf_counter() - t0
        if wall < best:
            best, qb, auxb = wall, qq, aa
    return best, qb, auxb


def _load_refstats():
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "refvals", "bench_heldsuarez_p4.py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("bench_refstats", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _precision_gate(cfg, imex, q_im, dt_im, on_cpu):
    """Correctness gate attached to the perf number (BASELINE.md): the
    f32 bench final state's per-field statistics must match the stored
    f64 CPU replay of the SAME trajectory (tests/refvals/
    bench_heldsuarez_p4.py, scripts/gen_bench_refstats.py) within the
    per-statistic budgets calibrated in tests/test_precision_gate.py.
    Every batch restarts from the post-warm state, so the best batch's
    final state equals warm+nsteps steps from init — deterministic."""
    mod = _load_refstats()
    if on_cpu or mod is None:
        return {"checked": False,
                "reason": "cpu smoke" if on_cpu else "no f64 table"}
    if abs(mod.dt - dt_im) > 1e-9 * dt_im:
        return {"checked": False, "reason": f"dt mismatch {mod.dt}"}
    from climatemachine_tpu.ode.solve import from_internal
    qg, _ = from_internal(imex, q_im, q_im)
    qn = np.asarray(qg, dtype=np.float64)
    # Budgets = measured TPU-vs-CPU-f64 envelope x ~3 (round 5,
    # scripts/tpu_precision_bisect.py: rho extremes 2.6e-3, rhou
    # extremes <=3.3e-2, rhoe <=2.8e-4; means <=2.4e-6, stds <=6.8e-4).
    # The envelope is ~150x the strict-f32 one (tests/
    # test_precision_gate.py anchors that on CPU) because TPU libm
    # lowering differs deterministically from CPU's by ~100 ulp and
    # Held-Suarez amplifies any perturbation at the baroclinic growth
    # rate in the pointwise EXTREMES; the drift is IDENTICAL across the
    # generic node-major, var-major-XLA and var-major-Pallas paths
    # (bisect log), so it is backend arithmetic, not a kernel bug.  The
    # tight mean/std budgets are the leak detectors: a bf16-typed
    # contraction measured 2.3e-2 drift in 50 steps
    # (scripts/tpu_bf16_op_ab.py) and fails them immediately.
    budgets = {"rho": (8e-3, 8e-3, 5e-6, 1e-5),
               "rhou": (1e-1, 1e-1, 1e-5, 2e-3),
               "rhoe": (1e-3, 1e-3, 1e-5, 5e-5)}
    worst, failures = 0.0, []
    names = list(cfg.model.prog_spec.flattened_names())
    for i, name in enumerate(names):
        base = name.split("[")[0].split(".")[-1]
        budget = budgets.get(base, budgets.get(name))
        if budget is None:
            continue
        ref = mod.stats[name]
        a = qn[..., i]
        got = [a.min(), a.max(), a.mean(), a.std(ddof=1)]
        scale = max(abs(ref[0]), abs(ref[1]), 1e-300)
        for stat, g, r, b in zip(("min", "max", "mean", "std"),
                                 got, ref, budget):
            rel = abs(g - r) / scale
            worst = max(worst, rel / b)
            if rel > b:
                failures.append((name, stat, rel, b))
    assert not failures, f"bench precision gate FAILED: {failures}"
    return {"checked": True, "worst_fraction_of_budget": round(worst, 3)}


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # env var alone is not enough: the ambient axon plugin hooks
        # jax.devices() and blocks on the tunnel even for cpu — pin the
        # platform through the config API before any backend touch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import (ExplicitSolverType,
                                                        IMEXSolverType)
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.utils.flops import budget, mfu_f32

    on_cpu = jax.devices()[0].platform == "cpu"
    # Held-Suarez p4 (BASELINE.md pins order 4); size chosen to fill a chip
    n_horz = 6 if on_cpu else 16
    n_vert = 4 if on_cpu else 8
    poly = 4
    nsteps_ex = 10 if on_cpu else 50
    nsteps_im = 3 if on_cpu else 25
    nbatch = 2 if on_cpu else 3
    nwarm = 3 if on_cpu else 10

    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=poly,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    npoints = cfg.grid.nelem * cfg.grid.Np
    flops = budget(n_horz, n_vert, poly)
    # the reference's every-step exponential filter on perturbations
    # (heldsuarez.jl:261-273) is part of the configuration — without it
    # the run is not long-term stable; it runs INSIDE the measured step
    from climatemachine_tpu.experiments.held_suarez import \
        HeldSuarezStepFilter
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)

    # --- explicit LSRK54 at the every-direction acoustic limit ------------
    dt_ex = 0.3 * min_node_distance(cfg.grid) / 350.0
    ex = ExplicitSolverType().make(dg, q0, aux0, dt_ex)
    ex.post_step = hsf.apply_vm if ex.vm is not None else hsf.apply
    qe, auxe = q0, aux0
    if ex.vm is not None:      # var-major fast path: convert once
        qe, auxe = ex.vm.to_vm(q0), ex.vm.aux_to_vm(aux0)
    step_ex = jax.jit(ex.step)
    wall_ex, q_ex, _ = _measure(step_ex, qe, auxe, dt_ex, nwarm,
                                nsteps_ex, k=nbatch)
    assert bool(jnp.all(jnp.isfinite(q_ex))), "explicit bench non-finite"
    gps_ex = npoints * nsteps_ex / wall_ex

    # --- IMEX north star: dt from the HORIZONTAL acoustic CFL -------------
    dt_im = 0.1 * min_node_distance(cfg.grid, "horizontal") / 350.0
    # snap to the f64 reference table's dt (computed on the f64 grid, so
    # it differs from the f32 grid's in the last bits) so the gate
    # compares the SAME trajectory, not one with a ~1e-7 dt offset
    _refstats = _load_refstats()
    if (_refstats is not None
            and abs(_refstats.dt - dt_im) < 1e-5 * dt_im):
        dt_im = _refstats.dt
    imex = IMEXSolverType().make(dg, q0, aux0, dt_im)
    imex.post_step = hsf.apply_vm if imex.vm is not None else hsf.apply
    qi, auxi = q0, aux0
    if imex.vm is not None:
        qi, auxi = imex.vm.to_vm(q0), imex.vm.aux_to_vm(aux0)
    # imex.step jits itself (factors enter as arguments, not constants)
    wall_im, q_im, _ = _measure(imex.step, qi, auxi, dt_im, nwarm,
                                nsteps_im, k=nbatch)
    assert bool(jnp.all(jnp.isfinite(q_im))), "IMEX bench non-finite"
    gps_im = npoints * nsteps_im / wall_im
    precision_gate = _precision_gate(cfg, imex, q_im, dt_im, on_cpu)

    # simulated-seconds per wall-second: the end-to-end win of IMEX
    rate_ex = dt_ex / (wall_ex / nsteps_ex)
    rate_im = dt_im / (wall_im / nsteps_im)

    base = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            base = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            base = None
    vs = (gps_im / base) if base else 1.0

    print(json.dumps({
        "metric": "held_suarez_p4_imex_gridpoints_per_s_per_chip",
        "value": round(gps_im, 1),
        "unit": "gridpoints/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "n_horz": n_horz, "n_vert": n_vert, "poly": poly,
            "gridpoints": npoints,
            "imex": {
                "solver": "ARK2GiraldoKellyConstantinescu+BlockTridiag",
                "dt_s": round(dt_im, 4), "steps": nsteps_im,
                "batches": nbatch,
                "time_per_step_ms": round(1e3 * wall_im / nsteps_im, 3),
                "gridpoints_per_s": round(gps_im, 1),
                "sim_s_per_wall_s": round(rate_im, 1),
                "layout": "vm" if imex.vm is not None else "grid",
                "mfu_f32_pct": round(100 * mfu_f32(
                    flops["imex_step"], wall_im / nsteps_im), 2),
            },
            "explicit": {
                "solver": "LSRK54",
                "dt_s": round(dt_ex, 4), "steps": nsteps_ex,
                "batches": nbatch,
                "time_per_step_ms": round(1e3 * wall_ex / nsteps_ex, 3),
                "gridpoints_per_s": round(gps_ex, 1),
                "sim_s_per_wall_s": round(rate_ex, 1),
                "layout": "vm" if ex.vm is not None else "grid",
                "mfu_f32_pct": round(100 * mfu_f32(
                    flops["explicit_step"], wall_ex / nsteps_ex), 2),
            },
            "imex_time_compression_vs_explicit": round(rate_im / rate_ex, 2),
            "platform": jax.devices()[0].platform,
            "dtype": "float32",
            "precision_gate": precision_gate,
            "step_filter": "ExponentialFilter(0,20) on perturbations "
                           "every step (reference heldsuarez.jl:261)",
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
