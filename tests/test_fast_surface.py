"""Var-major fast surface pass vs the generic path (exact parity on the
supported dry configs; reference dgsem_interface_tendency!,
DGModel_kernels.jl:588)."""

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def test_supports_held_suarez():
    from climatemachine_tpu.dg import fast_surface
    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    assert fast_surface.supports(dg)


def test_fast_surface_matches_generic_held_suarez():
    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg0 = DGModel(cfg.model, cfg.grid)
    dg1 = DGModel(cfg.model, cfg.grid, surface_kernel="varmajor")
    assert dg1._fast_surface
    q, aux = init_ode_state(dg0)
    # perturb so the interface jumps are nontrivial
    rng = np.random.default_rng(3)
    q = q * (1 + 1e-3 * jnp.asarray(rng.standard_normal(q.shape)))
    t0, _ = dg0(q, aux, 0.0)
    t1, _ = dg1(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t0)))
    assert float(jnp.max(jnp.abs(t1 - t0))) < 1e-12 * scale


def test_fast_surface_matches_generic_brick():
    """Periodic-lateral brick with vertical walls (rising-bubble shape)."""
    import jax
    from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                          HydrostaticState)
    from climatemachine_tpu.atmos.model import AtmosProblem
    from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
    from climatemachine_tpu.common.orientations import FlatOrientation
    from climatemachine_tpu.mesh.grid import make_grid
    from climatemachine_tpu.mesh.topology import stacked_brick_topology
    from climatemachine_tpu.physics import thermodynamics as td
    from climatemachine_tpu.physics.parameters import EARTH
    from climatemachine_tpu.physics.temperature_profiles import \
        DryAdiabaticProfile

    ps = EARTH
    physics = AtmosPhysics(
        orientation=FlatOrientation(),
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        p = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        x = coords / 1e3
        rho = rho * (1 + 0.01 * jnp.sin(x[..., 0]) * jnp.cos(x[..., 2]))
        T = p / (ps.R_d * rho)
        u = 5.0 * jnp.stack([jnp.cos(x[..., 1]), jnp.sin(x[..., 0]),
                             0.1 * jnp.cos(x[..., 2])], axis=-1)
        rhou = rho[..., None] * u
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        rhoe = rho * (td.internal_energy(ps, T) + ke + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    model = AtmosModel(
        physics,
        AtmosProblem(init_state=init,
                     boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=(Gravity(),))
    r = [np.linspace(0, 1e3, 4), np.linspace(0, 1e3, 3),
         np.linspace(0, 1e3, 4)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0],
                                                     [1, 2]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    dg0 = DGModel(model, grid)
    dg1 = DGModel(model, grid, surface_kernel="varmajor")
    assert dg1._fast_surface
    q, aux = init_ode_state(dg0)
    t0, _ = dg0(q, aux, 0.0)
    t1, _ = dg1(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t0)))
    assert float(jnp.max(jnp.abs(t1 - t0))) < 1e-12 * scale


def test_fast_surface_remainder_matches_generic():
    """Fused-remainder fast surface (IMEX explicit stage) equals the
    generic remainder path at round-off (reference remainder.jl:37 +
    heldsuarez.jl:234-240 IMEX split)."""
    from climatemachine_tpu.atmos.linear import \
        AtmosAcousticGravityLinearModel
    from climatemachine_tpu.dg import fast_surface
    from climatemachine_tpu.dg.spatial import VERTICAL

    cfg = held_suarez_config(n_horz=2, n_vert=3, poly_order=3,
                             dtype=np.float64)
    lin = AtmosAcousticGravityLinearModel(cfg.model)
    rem = (lin, VERTICAL)
    dg0 = DGModel(cfg.model, cfg.grid, remainder=rem, surface_kernel="xla")
    dg1 = DGModel(cfg.model, cfg.grid, remainder=rem,
                  surface_kernel="varmajor")
    assert not dg0._fast_surface
    assert dg1._fast_surface and fast_surface.supports(dg1)
    q, aux = init_ode_state(dg0)
    rng = np.random.default_rng(7)
    q = q * (1 + 1e-3 * jnp.asarray(rng.standard_normal(q.shape)))
    t0, _ = dg0(q, aux, 0.0)
    t1, _ = dg1(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t0)))
    assert float(jnp.max(jnp.abs(t1 - t0))) < 1e-12 * scale
