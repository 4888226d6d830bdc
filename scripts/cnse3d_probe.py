"""Probe: CNSE3D buoyancy column vs reference refvals_buoyancy."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climatemachine_tpu.cnse.three_dimensional import (
    Buoyancy, BuoyancyColumn, CNSE3DModel, CNSE3DRoeNumericalFlux)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.filters import MassPreservingCutoffFilter
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.ssprk import SSPRK22Heuns


def run(elems, base_order, nsteps=100, dt=0.001):
    pi = np.pi
    ranges = [np.linspace(-2 * pi, 2 * pi, elems + 1),
              np.linspace(-2 * pi, 2 * pi, elems + 1),
              np.linspace(0.0, 4 * pi, elems + 1)]
    topo = stacked_brick_topology(
        ranges, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 1]]))
    grid = make_grid(topo, base_order + 1, dtype=np.float64)
    problem = BuoyancyColumn()
    model = CNSE3DModel(problem, c_s=problem.c_s,
                        advection="nonlinear",
                        buoyancy=Buoyancy(alpha=1e-4, g=10.0))
    dg = DGModel(model, grid,
                 numerical_flux_first_order=CNSE3DRoeNumericalFlux())
    q0, aux0 = init_ode_state(dg)

    filt = MassPreservingCutoffFilter(grid, Nc=base_order + 1)
    q0 = filt(q0)

    def rhs(q, aux, t):
        dq, aux = dg(q, aux, t)
        return filt(dq), aux

    solver = SSPRK22Heuns(rhs, dt)
    step = jax.jit(solver.step)
    q, aux, t = q0, aux0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    q = np.asarray(q)
    s = model.prog_spec

    def stats(a):
        a = np.asarray(a, np.float64)
        return [a.min(), a.max(), a.mean(), a.std(ddof=1)]

    return {
        ("state", "rho"): stats(s.get(q, "rho")),
        ("state", "rhou[1]"): stats(s.get(q, "rhou")[..., 0]),
        ("state", "rhou[2]"): stats(s.get(q, "rhou")[..., 1]),
        ("state", "rhou[3]"): stats(s.get(q, "rhou")[..., 2]),
        ("state", "rhotheta"): stats(s.get(q, "rhotheta")),
    }


REF = {
    "second_order": {
        ("state", "rho"): [9.95252314022507689195e-01, 9.99992856011554298590e-01, 9.98330419819817738158e-01, 1.48639562654353791886e-03],
        ("state", "rhou[3]"): [-1.65133743521588883564e-03, 5.29367075398690075732e-09, -8.40309050919211468315e-04, 4.66618546037470417320e-04],
        ("state", "rhotheta"): [-9.95249493245247940365e+00, 1.99973806108054952236e-05, -4.98740538889376860965e+00, 2.91965149708573168397e+00],
    },
    "fourth_order": {
        ("state", "rho"): [9.95377495534709000324e-01, 9.99992951378667060958e-01, 9.98321272635789513927e-01, 1.50722816639464068413e-03],
        ("state", "rhou[3]"): [-1.66252523985503642377e-03, 5.55021884639224168229e-08, -8.13842490777055447768e-04, 4.76414940515918817511e-04],
        ("state", "rhotheta"): [-9.95373884733410818626e+00, -4.05672848142820462126e-07, -4.98722877855243940104e+00, 2.97859288054288384728e+00],
    },
}


def digits(got, ref):
    if ref == 0.0:
        return -np.log10(abs(got)) if got != 0 else 16.0
    if got == ref:
        return 16.0
    return -np.log10(abs((got - ref) / ref))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "second_order"
    elems, order = (5, 2) if which == "second_order" else (3, 4)
    f = run(elems, order)
    for k, row in REF[which].items():
        got = f[k]
        ds = [digits(g, r) for g, r in zip(got, row)]
        print(f"{k}: got={['%.6e' % g for g in got]}")
        print(f"   digits={['%.1f' % d for d in ds]}")
    for k in (("state", "rhou[1]"), ("state", "rhou[2]")):
        print(f"{k}: got={['%.2e' % g for g in f[k]]} (ref ~1e-15 noise)")
