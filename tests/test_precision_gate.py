"""Standing f32 production-precision gate (VERDICT r3 #4).

BASELINE.md attaches a correctness gate to every perf number: the
prognostic state of a production-precision (f32) run must track the f64
trajectory within per-field StateCheck-style budgets (reference
Debug/StateCheck.jl:93).  The TPU bench gates its own run against a
stored f64 table (tests/refvals/bench_heldsuarez_p4.py via bench.py);
this test is the machine-independent anchor: the SAME solver assembly at
a reduced Held-Suarez p4 grid, run in both precisions on CPU, with
per-statistic drift budgets calibrated from the measured envelope
(documented below) at ~3x margin.

Default: 200 IMEX steps (~1.2 h simulated).  CLIMATE_SLOW_REFVALS=1
extends to 1000 steps with scaled budgets (f32 drift grows ~sqrt(n) in
the means and linearly in the extremes at worst).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.driver.solver_types import IMEXSolverType
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.solve import from_internal, to_internal


def _run(dtype, nsteps):
    cfg = held_suarez_config(n_horz=4, n_vert=3, poly_order=4, dtype=dtype)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    imex = IMEXSolverType().make(dg, q0, aux0, dt)
    # the reference config's every-step perturbation filter
    # (heldsuarez.jl:261-273) — required for long-run stability
    from climatemachine_tpu.experiments.held_suarez import \
        HeldSuarezStepFilter
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    imex.post_step = hsf.apply_vm if imex.vm is not None else hsf.apply
    q, aux = to_internal(imex, q0, aux0)
    t = 0.0
    for _ in range(nsteps):
        q, aux = imex.step(q, aux, t)
        t += dt
    q, _ = from_internal(imex, q, aux)
    assert bool(jnp.all(jnp.isfinite(q))), f"{np.dtype(dtype)} non-finite"
    return cfg, np.asarray(q, dtype=np.float64)


def _stats(a):
    return np.array([a.min(), a.max(), a.mean(), a.std(ddof=1)])


def test_f32_tracks_f64_heldsuarez_imex():
    slow = bool(os.environ.get("CLIMATE_SLOW_REFVALS"))
    nsteps = 1000 if slow else 200

    cfg, q64 = _run(np.float64, nsteps)
    _, q32 = _run(np.float32, nsteps)

    # per-STATISTIC relative drift budgets (min, max, mean, std),
    # normalized by the field's max magnitude — the reference's
    # per-field StateCheck parr concept.  Measured 200-step envelope:
    # means hold 1e-7..4e-6 (systematic bias would show here), rho/rhoe
    # extremes ~3e-5, momentum EXTREMES ~9e-3 — Held-Suarez is
    # baroclinically unstable, so f32 rounding grows at the instability
    # rate in the pointwise extremes while the statistics stay tight.
    # Budgets are the envelope x ~3.
    budgets = {"rho": (1e-4, 1e-4, 1e-5, 1e-4),
               "rhou": (3e-2, 3e-2, 1e-5, 1e-3),
               "rhoe": (1e-4, 1e-4, 2e-5, 1e-4)}
    if slow:
        budgets = {k: tuple(3.0 * b for b in v)
                   for k, v in budgets.items()}

    spec = cfg.model.prog_spec
    failures = []
    for name, budget in budgets.items():
        sl = spec.index(name)
        for comp in range(sl.stop - sl.start):
            a64 = q64[..., sl.start + comp]
            a32 = q32[..., sl.start + comp]
            scale = max(float(np.max(np.abs(a64))), 1e-300)
            s64, s32 = _stats(a64), _stats(a32)
            rel = np.abs(s32 - s64) / scale
            for stat, r, b in zip(("min", "max", "mean", "std"),
                                  rel, budget):
                if float(r) > b:
                    failures.append((name, comp, stat, float(r), b))
    assert not failures, failures
