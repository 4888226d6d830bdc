"""Generalized GCM driver — mix-and-match initial/boundary conditions
(reference experiments/AtmosGCM/GCMDriver/GCMDriver.jl).

Select the experiment and swap its pieces from the command line, e.g.::

    python examples/gcm_driver.py --experiment baroclinic_wave \\
        --surface-flux bulk --timeend 300 --platform cpu
    python examples/gcm_driver.py --experiment heldsuarez \\
        --init-perturbation random --timeend 300 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.gcm_driver import gcm_driver_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", default="heldsuarez",
                   choices=["heldsuarez", "baroclinic_wave"])
    p.add_argument("--init-base-state", default=None,
                   choices=["zero", "heldsuarez", "bc_wave"])
    p.add_argument("--init-perturbation", default="deterministic",
                   choices=["zero", "deterministic", "random"])
    p.add_argument("--init-moisture-profile", default="moist_low_tropics",
                   choices=["zero", "moist_low_tropics"])
    p.add_argument("--surface-flux", default="default",
                   choices=["default", "bulk"])
    p.add_argument("--dry", action="store_true")
    p.add_argument("--n-horz", type=int, default=4)
    p.add_argument("--n-vert", type=int, default=3)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=600.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    dtype = np.float32
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)
        dtype = np.float64

    cfg = gcm_driver_config(
        experiment=args.experiment,
        init_base_state=args.init_base_state,
        init_perturbation=args.init_perturbation,
        init_moisture_profile=args.init_moisture_profile,
        surface_flux=args.surface_flux,
        moist=not args.dry,
        n_horz=args.n_horz, n_vert=args.n_vert, poly_order=args.poly,
        dtype=dtype)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = 0.3 * float(min_node_distance(cfg.grid)) / 350.0
    nsteps = max(int(args.timeend / dt), 1)
    print(f"{cfg.name}: dt = {dt:.2f} s, elements = {cfg.grid.nelem}, "
          f"steps = {nsteps}")

    step = jax.jit(LSRK54CarpenterKennedy(lambda a_, b, t: dg(a_, b, t),
                                          dt).step)
    m0 = float(weightedsum(cfg.grid, q, 0))
    t = 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    m1 = float(weightedsum(cfg.grid, q, 0))
    umax = float(jnp.max(jnp.linalg.norm(q[..., 1:4] / q[..., :1],
                                         axis=-1)))
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"mass rel drift: {abs(m1 - m0) / abs(m0):.2e}   "
          f"max |u|: {umax:.2f} m/s")


if __name__ == "__main__":
    main()
