"""Adaptive timestep callback, debug_init dumps, CustomFilter hook,
LES default-perturbations group (reference Callbacks.jl:340,
Driver.jl:315, custom_filter.jl, atmos_les_default_perturbations.jl)."""

import numpy as np
import jax.numpy as jnp

from climatemachine_tpu.diagnostics.atmos_les import \
    AtmosLESDefaultPerturbationsGroup
from climatemachine_tpu.mesh.filters import (CustomFilter,
                                             apply_custom_filter)
from climatemachine_tpu.mesh.interpolation import InterpolationBrick
from climatemachine_tpu.ode.solve import solve


class _DecaySolver:
    """q' = -q, forward Euler; dt mutable mid-run."""

    def __init__(self, dt):
        self.dt = dt

    def step(self, q, aux, t):
        return q * (1.0 - self.dt), aux


def test_adaptive_dt_midrun():
    """Changing solver.dt from a callback re-jits and re-derives the
    remaining step count against timeend."""
    solver = _DecaySolver(0.1)
    seen = []

    class Halver:
        def call(self, state):
            seen.append((state.step, solver.dt))
            if state.step == 2:
                solver.dt = 0.05

    q0 = jnp.ones(4)
    st = solve(q0, None, solver, timeend=1.0, t0=0.0,
               callbacks=(Halver(),))
    # 2 steps at 0.1 then 16 at 0.05 -> t = 1.0
    assert st.step == 18
    assert np.isclose(st.t, 1.0)
    expected = (1 - 0.1) ** 2 * (1 - 0.05) ** 16
    assert np.allclose(np.asarray(st.q), expected)


def test_adapt_timestep_callback():
    """AdaptTimestep recomputes dt from the CFL target via courant."""
    import tests.test_driver as _  # noqa: F401 (ensures driver importable)
    from climatemachine_tpu.driver import callbacks as cbs
    from climatemachine_tpu.driver.configs import AtmosLESConfiguration
    from climatemachine_tpu.driver.solver_configs import \
        make_solver_configuration
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.dg.courant import calculate_dt
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)

    class SC:  # minimal solver-config view
        pass

    sc = SC()
    sc.dg = dg
    sc.cfl = 0.3
    sc.cfl_direction = "every"
    sc.ode_solver_type = None

    class Solver:
        dt = 123.0
    sc.solver = Solver()

    cb = cbs.AdaptTimestep(sc, every_steps=1).make()

    class State:
        pass
    state = State()
    state.q, state.aux, state.step, state.t = q, aux, 1, 0.0
    cb.init(state)
    state.step = 2
    cb.call(state)
    expected = calculate_dt(cfg.grid, cfg.model, q, aux, 0.3, "every")
    assert np.isclose(sc.solver.dt, float(expected))
    assert sc.solver.dt != 123.0


def test_custom_filter():
    class Clip(CustomFilter):
        def filter(self, model, q, aux):
            return jnp.maximum(q, 0.0)

    q = jnp.asarray([[-1.0, 2.0], [3.0, -4.0]])
    out = apply_custom_filter(Clip(), None, q, None)
    assert np.all(np.asarray(out) >= 0)
    assert np.asarray(out)[0, 1] == 2.0


def test_debug_init_dumps(tmp_path, monkeypatch):
    from climatemachine_tpu.driver import driver as drv
    from climatemachine_tpu.driver.configs import AtmosLESConfiguration
    from climatemachine_tpu.driver.solver_configs import \
        make_solver_configuration
    from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics,
                                          Gravity, HydrostaticState)
    from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
    from climatemachine_tpu.atmos.model import AtmosProblem
    from climatemachine_tpu.physics.parameters import EARTH
    from climatemachine_tpu.physics.temperature_profiles import \
        DryAdiabaticProfile

    ps = EARTH

    def init(m, coords, aux, t):
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        e_int = ps.cv_d * (T - ps.T_0)
        return m.prog_spec.pack({"rho": rho, "rhoe": rho * (e_int + Phi)},
                                batch_shape=rho.shape)

    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)))
    model = AtmosModel(physics, AtmosProblem(
        init_state=init, boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=(Gravity(),))
    dc = AtmosLESConfiguration("dbg", 3, (200.0, 200.0, 200.0),
                               1000.0, 1000.0, 1000.0, model,
                               dtype=np.float64)
    monkeypatch.setattr(drv.SETTINGS, "debug_init", True)
    monkeypatch.setattr(drv.SETTINGS, "output_dir", str(tmp_path))
    sc = make_solver_configuration(0.0, 1.0, dc)
    import glob
    dumps = glob.glob(str(tmp_path / "dbg_init*"))
    assert dumps, "debug_init produced no VTK dump"
    assert sc.cfl == 0.4 and sc.cfl_direction == "every"


def test_les_default_perturbations():
    from tests.test_diagnostics_groups import _les_setup, L
    dg, q, aux = _les_setup(ux=10.0)
    pts = np.linspace(50, 950, 6)
    itp = InterpolationBrick(dg.grid, pts, pts, pts)
    grp = AtmosLESDefaultPerturbationsGroup(dg, itp)
    vals = grp.collect(q, aux)
    # u = 10 + sin(2 pi x / L): prime field recovers the sine
    up = vals["u_prime"]
    assert up.shape == (6, 6, 6)
    expected = np.sin(2 * np.pi * pts / L)
    assert np.allclose(up[:, 0, 0], expected, atol=1e-2)  # p3 interp error
    # temperature is horizontally uniform: prime ~ 0
    assert np.max(np.abs(vals["temp_prime"])) < 1e-8


def test_show_tendencies_table():
    """Equation-table introspection (reference show_tendencies.jl)."""
    import numpy as np
    from climatemachine_tpu.experiments.held_suarez import \
        held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=2,
                             dtype=np.float64)
    table = cfg.model.show_tendencies()
    assert "PressureGradient" in table
    assert "Hyperdiffusion" in table
    assert "HeldSuarezForcing" in table
    assert "Gravity" in table
    # sources are attributed to the right equations
    rhou_row = [ln for ln in table.splitlines()
                if ln.startswith("rhou")][0]
    assert "Coriolis" in rhou_row
    rho_row = [ln for ln in table.splitlines() if ln.startswith("rho ")][0]
    assert "Coriolis" not in rho_row


def test_external_ode_solver_bridge():
    """ExternalODESolver (jax.experimental.ode DP5 adaptive) behind the
    framework step surface reproduces the advection solution to the
    driver-loop protocol (reference DifferentialEquations.jl bridge)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from climatemachine_tpu.ode.external import ExternalODESolver
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
    from climatemachine_tpu.ode.solve import solve

    # stiff-free scalar system with known solution: dq/dt = -q + sin(t)
    def rhs(q, aux, t):
        return -q + jnp.sin(t), aux

    q0 = jnp.ones((4, 3), dtype=jnp.float64)
    aux = jnp.zeros((1,))
    dt = 0.25
    ext = ExternalODESolver(rhs, dt, rtol=1e-10, atol=1e-12)
    st = solve(q0, aux, ext, timeend=2.0)
    # exact: q(t) = (q0 + 1/2) e^-t + (sin t - cos t)/2
    t = st.t
    exact = (q0 + 0.5) * np.exp(-t) + (np.sin(t) - np.cos(t)) / 2
    assert float(jnp.max(jnp.abs(st.q - exact))) < 1e-8

    # the diffrax backend either works or raises a clear guidance error
    try:
        import diffrax  # noqa: F401
        have_diffrax = True
    except ImportError:
        have_diffrax = False
    if not have_diffrax:
        import pytest
        from climatemachine_tpu.ode.external import DiffraxSolver
        with pytest.raises(ImportError, match="diffrax"):
            DiffraxSolver(rhs, dt)
