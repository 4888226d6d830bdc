"""Moist baroclinic wave tests (reference DCMIP2016 test case via
experiments/AtmosGCM/GCMDriver)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.baroclinic_wave import (
    baroclinic_wave_config, bcwave_base_state)
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics.parameters import EARTH


def test_base_state_hydrostatic():
    """The analytic base state satisfies ∂p/∂z = -ρg along a column."""
    ps = EARTH
    z = jnp.linspace(100.0, 25e3, 2001)
    phi = jnp.full_like(z, 0.5)
    T_v, p, u = bcwave_base_state(ps, phi, z)
    dz = z[1] - z[0]
    dpdz = (p[2:] - p[:-2]) / (2 * dz)
    rho = p / (ps.R_d * T_v)
    resid = dpdz + ps.grav * rho[1:-1]
    assert float(jnp.max(jnp.abs(resid / (ps.grav * rho[1:-1])))) < 2e-3
    # jet: westerlies peak in midlatitudes, zero at pole
    T_v0, p0, u0 = bcwave_base_state(ps, jnp.asarray([0.0, 0.8, 1.57]),
                                     jnp.full((3,), 10e3))
    assert float(u0[1]) > 5.0
    assert abs(float(u0[2])) < 1.0


def test_moist_bcwave_short_run():
    cfg = baroclinic_wave_config(n_horz=4, n_vert=3, poly_order=3,
                                 moist=True, dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux = init_ode_state(dg)
    assert bool(jnp.all(jnp.isfinite(q0)))
    qt = cfg.model.prog(q0, "moisture.rhoq_tot") / cfg.model.prog(q0, "rho")
    assert 0.0 <= float(jnp.min(qt)) and float(jnp.max(qt)) < 0.02

    dt = 0.25 * min_node_distance(cfg.grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(20):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    for sl_name in ["rho", "moisture.rhoq_tot"]:
        sl = cfg.model.prog_spec.index(sl_name).start
        m0 = float(weightedsum(cfg.grid, q0, sl))
        m1 = float(weightedsum(cfg.grid, q, sl))
        assert abs(m1 - m0) / abs(m0) < 1e-11, sl_name
    u = cfg.model.prog(q, "rhou") / cfg.model.prog(q, "rho")[..., None]
    assert float(jnp.max(jnp.abs(u))) < 150.0
