"""Diagnose the bench precision-gate failure: replay the bench
trajectory (nwarm+nsteps_im = 35 IMEX steps at the 16x8 p4 grid) in f32
on CPU — strict f32 semantics, no TPU bf16-matmul risk — and print the
same per-field relative drifts vs the stored f64 table.

If CPU-f32 drift ~= TPU-f32 drift, the budget is miscalibrated for the
bench scale; if CPU-f32 is much tighter, the TPU vm/Pallas path loses
precision somewhere.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
    from climatemachine_tpu.ode.solve import from_internal, to_internal
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_refstats", os.path.join(
            os.path.dirname(__file__), "..", "tests", "refvals",
            "bench_heldsuarez_p4.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    dt = mod.dt
    imex = IMEXSolverType().make(dg, q0, aux0, dt)
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    imex.post_step = hsf.apply_vm if imex.vm is not None else hsf.apply
    q, aux = to_internal(imex, q0, aux0)
    t = 0.0
    t0 = time.perf_counter()
    for i in range(mod.nsteps):
        q, aux = imex.step(q, aux, t)
        t += dt
        if (i + 1) % 5 == 0:
            jax.block_until_ready(q)
            print(f"  step {i + 1}/{mod.nsteps} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    q, _ = from_internal(imex, q, aux)
    qn = np.asarray(q, dtype=np.float64)

    for i, name in enumerate(cfg.model.prog_spec.flattened_names()):
        ref = mod.stats[name]
        a = qn[..., i]
        got = [a.min(), a.max(), a.mean(), a.std(ddof=1)]
        scale = max(abs(ref[0]), abs(ref[1]), 1e-300)
        rels = [abs(g - r) / scale for g, r in zip(got, ref)]
        print(name, " ".join(f"{s}={r:.2e}" for s, r in
                             zip(("min", "max", "mean", "std"), rels)),
              flush=True)


if __name__ == "__main__":
    main()
