"""Scratch: run the reference test_3D_spindown.jl config and print
agreement against the reference-shipped refvals (explicit table)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ocean.core import (FreeSlip, Impenetrable,
                                           Insulating, OceanBC, Penetrable)
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel)
from climatemachine_tpu.ocean.problems import Fixed, SimpleBox
from climatemachine_tpu.ode.lsrk import LSRK144NiegemannDiehlBusch

Lx = Ly = 1e6
H = 400.0
problem = SimpleBox(Lx, Ly, H, rotation=Fixed(), boundary_conditions=(
    OceanBC(Impenetrable(FreeSlip()), Insulating()),   # tag 1: bottom
    OceanBC(Penetrable(FreeSlip()), Insulating()),     # tag 2: surface
))
model = HydrostaticBoussinesqModel(
    problem, c_h=1.0, alpha_T=0.0, kappa_h=0.0, kappa_z=0.0,
    f_o=0.0, beta=0.0, momentum_advection=None)

ranges = [np.linspace(0.0, Lx, 6), np.linspace(0.0, Ly, 6),
          np.linspace(-H, 0.0, 9)]
topo = stacked_brick_topology(ranges, periodicity=(True, True, False),
                              boundary=np.array([[0, 0], [0, 0], [1, 2]]))
grid = make_grid(topo, 4, dtype=np.float64)

dg = DGModel(model, grid)
q, aux = init_ode_state(dg)
dt = 120.0
nsteps = 720
step = jax.jit(LSRK144NiegemannDiehlBusch(lambda a, b, t: dg(a, b, t),
                                          dt, pre_stage=dg.pre_stage).step)
t = 0.0
t0 = time.perf_counter()
for i in range(nsteps):
    q, aux = step(q, aux, t)
    t += dt
    if i == 9:
        q.block_until_ready()
        print(f"10 steps: {time.perf_counter()-t0:.1f}s")
q.block_until_ready()
print(f"{nsteps} steps: {time.perf_counter()-t0:.1f}s")

# analytic error
qe = problem.init_state(model, grid.coords, aux, t)
err = float(jnp.linalg.norm((q - qe)) / jnp.linalg.norm(qe))
print("analytic rel error =", err, "(reference: 0.0011289879366523504)")

# stats vs reference refvals
import importlib.util, os
spec = importlib.util.spec_from_file_location(
    "rv", os.path.join(os.path.dirname(__file__), "..", "tests", "refvals",
                       "hydrostatic_spindown_3d.py"))
rv = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rv)

qn = np.asarray(q)
an = np.asarray(aux)


def stats(a):
    return [float(a.min()), float(a.max()), float(a.mean()),
            float(a.std(ddof=1))]


fields = {}
for i, name in enumerate(model.prog_spec.flattened_names()):
    fields[("state", name)] = stats(qn[..., i])
for i, name in enumerate(model.aux_spec.flattened_names()):
    fields[("aux", name)] = stats(an[..., i])

print(f"{'field':24s} {'stat':5s} {'got':>24s} {'ref':>24s} {'rel':>10s}")
for key, ref in rv.explicit.items():
    got = fields.get(key)
    if got is None:
        print("MISSING", key)
        continue
    for s, (g, r) in zip(("min", "max", "mean", "std"), zip(got, ref)):
        rel = abs(g - r) / max(abs(r), 1e-30)
        print(f"{str(key):24s} {s:5s} {g:24.16e} {r:24.16e} {rel:10.2e}")
