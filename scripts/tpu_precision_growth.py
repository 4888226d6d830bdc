"""Drift-growth measurement on TPU: per-field relative drift vs the f64
table's trajectory statistics is only defined at the final step, so
instead compare the TPU f32 trajectory pointwise against the CPU f32
trajectory (saved by `save` mode) at steps 0,1,5,15,35.  If the TPU
deviation starts at transcendental-lowering scale (~1e-5 on init) and
grows at the same rate as f32-vs-f64 chaos, the bench-gate failure is
amplified libm fidelity, not a bf16 leak."""
import os
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "cmp"
if MODE == "save":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if MODE == "save":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "out", "prec_traj_cpu.npz")
CHECKS = (0, 1, 5, 15, 35)


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
    from climatemachine_tpu.ode.solve import to_internal
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
    imex.post_step = hsf.apply_vm
    q, aux = to_internal(imex, q0, aux0)
    snaps = {}
    t = 0.0
    if 0 in CHECKS:
        snaps["s0"] = np.asarray(q)
    for i in range(max(CHECKS)):
        q, aux = imex.step(q, aux, t)
        t += dt
        if (i + 1) in CHECKS:
            snaps[f"s{i + 1}"] = np.asarray(q)
    if MODE == "save":
        np.savez(OUT, **snaps)
        print("saved", OUT, flush=True)
        return
    ref = np.load(OUT)
    for k in snaps:
        a = snaps[k].astype(np.float64)
        b = ref[k].astype(np.float64)
        for v in range(a.shape[1]):
            scale = np.max(np.abs(b[:, v])) or 1.0
            rel = np.max(np.abs(a[:, v] - b[:, v])) / scale
            print(f"{k:4s} var{v} maxrel={rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
