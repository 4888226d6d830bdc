"""1-D box advection with switchable filters (reference
tutorials/Numerics/DGMethods/Box1D.jl).

Advects a profile (smooth sine or a non-smooth step) once around a
periodic box at order 4 and shows what each filter does to the Gibbs
oscillations: none / TMAR positivity / cutoff / exponential /
Boyd-Vandeven, applied every ``--filter-freq`` steps like the
reference's EveryXSimulationSteps callbacks (Box1D.jl:204-239).
Reports min/max/overshoot and L2 error against the exactly-advected
profile.  Smoke::

    python examples/box1d.py --case step --filter tmar --periods 0.1
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh import filters as flt
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.testing.advection_diffusion import AdvectionDiffusion


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", choices=["sine", "step"], default="step")
    p.add_argument("--filter", choices=["none", "tmar", "cutoff", "exp",
                                        "boyd"], default="none")
    p.add_argument("--nel", type=int, default=32)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--periods", type=float, default=1.0)
    p.add_argument("--filter-freq", type=int, default=1)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    L = 1.0

    def profile(x):
        if args.case == "sine":
            return 0.5 + 0.4 * jnp.sin(2 * np.pi * x / L)
        return jnp.where((x % L > 0.3) & (x % L < 0.7), 1.0, 0.0)

    def init(coords, t):
        return profile(coords[..., 0] - t)

    model = AdvectionDiffusion(u=(1.0, 0.0), init_fn=init, ncoord=2)
    ranges = [np.linspace(0.0, L, args.nel + 1),
              np.linspace(0.0, L / args.nel, 2)]
    topo = brick_topology(ranges, periodicity=(True, True))
    grid = make_grid(topo, args.poly, dtype=np.float64)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    filt = None
    if args.filter == "cutoff":
        filt = flt.CutoffFilter(grid, Nc=3)
    elif args.filter == "exp":
        filt = flt.ExponentialFilter(grid, Nc=1, s=8)
    elif args.filter == "boyd":
        filt = flt.BoydVandevenFilter(grid, Nc=1, s=8)

    dt = 0.3 * (L / args.nel) / (args.poly + 1) ** 2
    nsteps = max(int(args.periods * L / dt), 1)
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    t = 0.0
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
        if (i + 1) % args.filter_freq == 0:
            if args.filter == "tmar":
                q = flt.tmar(grid, q)
            elif filt is not None:
                q = filt(q)

    qe = init(grid.coords, t)[..., None]
    err = float(jnp.linalg.norm(q - qe) / jnp.linalg.norm(qe))
    print(f"case={args.case} filter={args.filter} steps={nsteps} "
          f"min={float(q.min()):+.4f} max={float(q.max()):+.4f} "
          f"L2err={err:.4f}")
    if args.filter == "tmar":
        assert float(q.min()) > -1e-12, "TMAR must remove negatives"
    assert bool(jnp.all(jnp.isfinite(q)))


if __name__ == "__main__":
    main()
