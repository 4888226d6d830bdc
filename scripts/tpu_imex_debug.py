"""Debug the IMEX north-star at benchmark scale on TPU: track where
non-finite values first appear (per step, per field)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if os.environ.get("F64"):
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance

    n_horz = int(os.environ.get("NH", "16"))
    n_vert = int(os.environ.get("NV", "8"))
    ldg = os.environ.get("LDG", "auto")
    dtype = np.float64 if os.environ.get("F64") else np.float32
    tau = float(os.environ.get("TAU", str(8 * 3600.0)))
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=4,
                             dtype=dtype, hyperdiffusion_tau=tau)
    surf = os.environ.get("SURF", "auto")
    vol = os.environ.get("VOL", "auto")
    dg = DGModel(cfg.model, cfg.grid, ldg_kernel=ldg, surface_kernel=surf,
                 volume_kernel=vol)
    q, aux = init_ode_state(dg)
    cfl = float(os.environ.get("CFL", "0.1"))
    dt_im = cfl * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    print(f"nh={n_horz} nv={n_vert} ldg={ldg} dtype={dtype.__name__} "
          f"dt={dt_im:.2f}s", flush=True)
    imex = IMEXSolverType().make(dg, q, aux, dt_im)
    if os.environ.get("NO_IMPLIED_G"):
        imex.solver.exact_linear_solve = False
    print(f"surf={dg._fast_surface} vol={dg._pallas_volume} "
          f"impG={getattr(imex.solver, 'exact_linear_solve', False)}",
          flush=True)

    spec = cfg.model.prog_spec
    t = 0.0
    chunk = int(os.environ.get("CHUNK", "10"))
    for i in range(0, int(os.environ.get("STEPS", "30")), chunk):
        for _ in range(chunk):
            q, aux = imex.step(q, aux, t)
            t += dt_im
        # ONE fused fetch per chunk (tunnel round trips dominate)
        mx, fin = jax.jit(lambda q: (jnp.max(jnp.abs(q)),
                                     jnp.all(jnp.isfinite(q))))(q)
        mx, fin = float(mx), bool(fin)
        print(f"step {i + chunk:3d}: max|q| = {mx:.3e}  finite: {fin}",
              flush=True)
        if not fin:
            bad = [name for j, name in enumerate(spec.flattened_names())
                   if not bool(jnp.all(jnp.isfinite(q[..., j])))]
            print(f"nonfinite fields: {bad}", flush=True)
            break


if __name__ == "__main__":
    main()
