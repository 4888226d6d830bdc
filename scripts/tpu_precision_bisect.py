"""Bisect the TPU f32 precision leak: run the 35-step bench trajectory
under different RHS configurations and print drift vs the stored f64
table.  CPU-f32 envelope (scripts/out/precision_diag_cpu_f32.log):
rho max 1.6e-5, rhou max 7e-4, rhoe max 6e-6 — anything far above that
on TPU is a TPU-path numerics leak, not f32 chaos."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(mode):
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
    if mode == "grid":
        # force the generic node-major path end to end
        from climatemachine_tpu.dg import fast_rhs as _fr
        _fr_supports, _fr.supports = _fr.supports, lambda d: False
    imex = IMEXSolverType().make(dg, q0, aux0, dt)
    if mode == "grid":
        _fr.supports = _fr_supports
    elif mode == "xla_chain":
        imex.vm.chain_kernel = "xla"
    elif mode == "pallas_chain":
        imex.vm.chain_kernel = "pallas"
    elif mode == "pallas_chain_psurf":
        imex.vm.chain_kernel = "pallas"
        imex.vm.surface_kernel = "pallas"
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    imex.post_step = hsf.apply_vm if imex.vm is not None else hsf.apply
    q, aux = to_internal(imex, q0, aux0)
    t = 0.0
    for i in range(mod.nsteps):
        q, aux = imex.step(q, aux, t)
        t += dt
    q, _ = from_internal(imex, q, aux)
    qn = np.asarray(q, dtype=np.float64)

    print(f"--- mode={mode}", flush=True)
    for i, name in enumerate(cfg.model.prog_spec.flattened_names()):
        ref = mod.stats[name]
        a = qn[..., i]
        got = [a.min(), a.max(), a.mean(), a.std(ddof=1)]
        scale = max(abs(ref[0]), abs(ref[1]), 1e-300)
        rels = [abs(g - r) / scale for g, r in zip(got, ref)]
        print(f"{name:8s} " + " ".join(
            f"{s}={r:.2e}" for s, r in
            zip(("min", "max", "mean", "std"), rels)), flush=True)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["xla_chain", "pallas_chain"]:
        run(mode)
