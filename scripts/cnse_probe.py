"""Probe: CNSE2D Bickley jet vs reference refvals (short + full runs)."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climatemachine_tpu.cnse import (BickleyJet, CNSE2DModel,
                                     CNSERoeNumericalFlux)
from climatemachine_tpu.dg.numerical_fluxes import RusanovNumericalFlux
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def run(flux="rusanov", periodic=True, nover=0, nsteps=10000, dt=0.02):
    pi = np.pi
    ranges = [np.linspace(-2 * pi, 2 * pi, 17),
              np.linspace(-2 * pi, 2 * pi, 17)]
    bnd = np.array([[0, 0], [0, 0]]) if periodic else \
        np.array([[0, 0], [1, 1]])
    topo = brick_topology(ranges, periodicity=(True, periodic),
                          boundary=bnd)
    grid = make_grid(topo, 3 + nover, dtype=np.float64)
    problem = BickleyJet()
    model = CNSE2DModel(problem, g=10.0, c=2.0, advection="nonlinear")
    nf = (RusanovNumericalFlux() if flux == "rusanov"
          else CNSERoeNumericalFlux())
    dg = DGModel(model, grid, numerical_flux_first_order=nf)
    q0, aux0 = init_ode_state(dg)

    if nover > 0:
        from climatemachine_tpu.mesh.filters import MassPreservingCutoffFilter
        filt = MassPreservingCutoffFilter(grid, Nc=4)
        q0 = filt(q0)

        def rhs(q, aux, t):
            dq, aux = dg(q, aux, t)
            return filt(dq), aux
    else:
        rhs = lambda a, b, t: dg(a, b, t)

    solver = LSRK54CarpenterKennedy(rhs, dt)
    step = jax.jit(solver.step)

    q, aux = q0, aux0
    t = 0.0
    t0 = time.perf_counter()
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
        if (i + 1) % 2000 == 0:
            print(f"  step {i+1} t={t:.1f} "
                  f"({time.perf_counter()-t0:.1f}s)", flush=True)
    q.block_until_ready()
    print(f"  total {time.perf_counter()-t0:.1f}s")
    q = np.asarray(q)
    s = model.prog_spec

    def stats(a):
        a = np.asarray(a, np.float64)
        return [a.min(), a.max(), a.mean(), a.std(ddof=1)]

    return {
        ("state", "rho"): stats(s.get(q, "rho")),
        ("state", "rhou[1]"): stats(s.get(q, "rhou")[..., 0]),
        ("state", "rhou[2]"): stats(s.get(q, "rhou")[..., 1]),
        ("state", "rhotheta"): stats(s.get(q, "rhotheta")),
    }


def digits(got, ref):
    if ref == 0.0:
        return -np.log10(abs(got)) if got != 0 else 16.0
    if got == ref:
        return 16.0
    return -np.log10(abs((got - ref) / ref))


if __name__ == "__main__":
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "rv", os.path.join(os.path.dirname(__file__),
                           "../tests/refvals/bickley_jet.py"))
    rv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rv)

    name = sys.argv[1] if len(sys.argv) > 1 else "rusanov_periodic"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    flux = "roe" if name.startswith("roe") else "rusanov"
    periodic = name.endswith("periodic") and "overint" not in name
    nover = 1 if "overintegration" in name else 0
    print(f"run {name}: flux={flux} periodic={periodic} nover={nover} "
          f"nsteps={nsteps}")
    f = run(flux, periodic, nover, nsteps)
    ref = getattr(rv, name)
    for k, row in ref.items():
        got = f[k]
        ds = [digits(g, r) for g, r in zip(got, row)]
        print(f"{k}: got={['%.6e' % g for g in got]}")
        print(f"   digits={['%.1f' % d for d in ds]}")
