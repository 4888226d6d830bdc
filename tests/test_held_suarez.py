"""Held-Suarez GCM config tests (reference experiments/AtmosGCM/heldsuarez.jl)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import (held_suarez_config,
                                                        held_suarez_init)
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def test_held_suarez_rest_state_balanced():
    """q == ref state: momentum tendency vanishes discretely; poles must not
    produce NaN in the forcing (latitude clip regression)."""
    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    m = cfg.model

    def init_rest(model, coords, aux, t):
        rho = model.aux_get(aux, "ref_state.rho")
        rhoe = model.aux_get(aux, "ref_state.rhoe")
        return model.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                                    batch_shape=rho.shape)

    m.problem = AtmosProblem(init_state=init_rest,
                             boundary_conditions=m.problem.boundary_conditions)
    dg = DGModel(m, cfg.grid)
    q, aux = init_ode_state(dg)
    tend, _ = dg(q, aux, 0.0)
    assert bool(jnp.all(jnp.isfinite(tend)))
    assert float(jnp.max(jnp.abs(m.prog(tend, "rhou")))) < 1e-10


def test_held_suarez_runs_stably():
    """Full HS (perturbed init, all sources) is stable and mass-conserving
    over 50 explicit steps."""
    cfg = held_suarez_config(n_horz=4, n_vert=3, poly_order=4,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q0, aux = init_ode_state(dg)
    dt = 0.3 * min_node_distance(cfg.grid) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    m0 = float(weightedsum(cfg.grid, q0, 0))
    m1 = float(weightedsum(cfg.grid, q, 0))
    assert abs(m1 - m0) / m0 < 1e-12
    # winds stay physical (no gridscale blowup)
    u = cfg.model.prog(q, "rhou") / cfg.model.prog(q, "rho")[..., None]
    assert float(jnp.max(jnp.abs(u))) < 100.0
