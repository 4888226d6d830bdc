"""Component-level TPU-vs-CPU f32 comparison from an identical state:
thermo, chain, volume, surface, sources, one full RHS, one IMEX step.
Run `... save` on CPU first (writes scripts/out/prec_cpu_f32.npz), then
`... cmp` on TPU: any component whose relative deviation is far above
f32 roundoff (~1e-6) is where the TPU numerics leak lives."""
import os
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "cmp"
if MODE == "save":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if MODE == "save":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "out", "prec_cpu_f32.npz")


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import (
        held_suarez_config, HeldSuarezStepFilter)
    from climatemachine_tpu.ode.solve import to_internal

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux0 = init_ode_state(dg)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_refstats", os.path.join(
            os.path.dirname(__file__), "..", "tests", "refvals",
            "bench_heldsuarez_p4.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dt = mod.dt
    imex = IMEXSolverType().make(dg, q0, aux0, dt)
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    imex.post_step = hsf.apply_vm
    vm = imex.vm
    qv, auxv = to_internal(imex, q0, aux0)

    res = {}
    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    res["T"], res["p"], res["c_s"] = T, p, c_s
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)
    res["gl2"] = gl2
    dq, _ = vm(qv, auxv, 0.0)
    res["rhs"] = dq
    surf = vm._surface(qv, auxv2, p, c_s, 0.0, hyper=(gl2, nu))
    res["surf"] = surf
    res["src"] = vm._sources(qv, auxv2, T, p, 0.0)
    res["filter"] = hsf.apply_vm(qv, auxv)
    q1, _ = imex.step(qv, auxv, 0.0)
    res["step"] = q1
    # the implicit solve in isolation: solve (I - g dt L) x = q
    sv = imex.solver
    lay = getattr(sv, "state_layout", None) or sv.layout
    g0 = float(imex.A_im[1, 1])
    fac = imex._factors()[g0]
    qb = lay.to_blocks(qv)
    xb = sv.solve_blocks(qb, g0 * dt, factors=fac)
    res["solve"] = lay.from_blocks(xb)
    op_args = sv.op_args(getattr(sv, "op_dtype", None))
    res["applyop"] = lay.from_blocks(sv.apply_op_blocks(qb, op_args))

    res = {k: np.asarray(v) for k, v in res.items()}
    if MODE == "save":
        np.savez(OUT, **res)
        print("saved", OUT, flush=True)
        return
    ref = np.load(OUT)
    for k in res:
        a, b = res[k].astype(np.float64), ref[k].astype(np.float64)
        scale = np.max(np.abs(b)) or 1.0
        rel = np.max(np.abs(a - b)) / scale
        print(f"{k:10s} maxrel={rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
